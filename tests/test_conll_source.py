"""CoNLL reader: sentence segmentation, DOCSTART skip, blank-run collapse,
column-index configurability (reference: util.py:816-877, 1285-1320)."""

import textwrap

from horus_ner_spark.sources.conll import conll_sentence_stats, read_conll

RITTER_2COL = textwrap.dedent("""\
    -DOCSTART- -X-

    Obama B-person
    visited O
    Paris B-geo-loc

    yes O
    .. O


    EU B-org
""")

CONLL_4COL = textwrap.dedent("""\
    West NNP I-NP I-MISC
    Indian NNP I-NP I-MISC
    all-rounder NN I-NP O

    Their PRP$ I-NP O
""")


def test_ritter_two_col(spark, tmp_path):
    p = tmp_path / "ritter.txt"
    p.write_text(RITTER_2COL)
    rows = sorted(
        (r["sent_id"], r["word_idx"], r["token"], r["ner"])
        for r in read_conll(spark, str(p), token_index=0, ner_index=1).collect()
    )
    assert rows == [
        (0, 0, "Obama", "B-person"),
        (0, 1, "visited", "O"),
        (0, 2, "Paris", "B-geo-loc"),
        (1, 0, "yes", "O"),
        (1, 1, "..", "O"),
        (2, 0, "EU", "B-org"),  # double blank collapses to one boundary
    ]


def test_conll_four_col_and_stats(spark, tmp_path):
    p = tmp_path / "conll.txt"
    p.write_text(CONLL_4COL)
    df = read_conll(spark, str(p), token_index=0, ner_index=3)
    rows = sorted(
        (r["sent_id"], r["word_idx"], r["token"], r["ner"]) for r in df.collect()
    )
    assert rows == [
        (0, 0, "West", "I-MISC"),
        (0, 1, "Indian", "I-MISC"),
        (0, 2, "all-rounder", "O"),
        (1, 0, "Their", "O"),
    ]
    stats = conll_sentence_stats(df).collect()[0]
    assert (stats["n_sentences"], stats["n_tokens"], stats["n_entity_tokens"]) == (2, 4, 2)


def test_multi_file_parallel_parse(spark, tmp_path):
    (tmp_path / "a.txt").write_text("x O\n\ny O\n")
    (tmp_path / "b.txt").write_text("z B-org\n")
    df = read_conll(spark, str(tmp_path), token_index=0, ner_index=1)
    per_file = {
        r["file"]: r["n_sentences"] for r in conll_sentence_stats(df).collect()
    }
    assert per_file == {"a.txt": 2, "b.txt": 1}


def test_conll_tsv_export_roundtrip(spark, tmp_path):
    """S13: write_conll_tsv emits token<TAB>ner rows with blank separator
    rows between sentences; read_conll parses it back identically."""
    from horus_ner_spark.sources.feature_csv import write_conll_tsv

    p = tmp_path / "in.txt"
    p.write_text(RITTER_2COL)
    df = read_conll(spark, str(p), token_index=0, ner_index=1)
    out = str(tmp_path / "export")
    write_conll_tsv(df.select("sent_id", "word_idx", "token", "ner"), out)

    back = read_conll(spark, out, token_index=0, ner_index=1, separator="\t")
    a = sorted(
        (r["sent_id"], r["word_idx"], r["token"], r["ner"]) for r in df.collect()
    )
    b = sorted(
        (r["sent_id"], r["word_idx"], r["token"], r["ner"]) for r in back.collect()
    )
    assert a == b and len(a) == 6


def test_large_file_many_partitions_order(spark, tmp_path):
    """Line order must survive any input partitioning (round-1 review:
    monotonically_increasing_id mis-segmented split files).  wholetext
    reads one row per file, so maxPartitionBytes cannot reorder lines."""
    n = 2000
    body = "".join(f"tok{i} O\n\n" for i in range(n))  # n 1-token sentences
    p = tmp_path / "big.txt"
    p.write_text(body)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")  # force splits
        df = read_conll(spark, str(p), token_index=0, ner_index=1)
        rows = sorted((r["sent_id"], r["token"]) for r in df.collect())
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    assert rows == [(i, f"tok{i}") for i in range(n)]


def test_same_basename_in_subdirs_do_not_interleave(spark, tmp_path):
    """Regression: per-file windows must key on the FULL path — two files
    named train.txt in different subdirectories previously shared one
    window with tied line_ids and interleaved arbitrarily."""
    (tmp_path / "en").mkdir()
    (tmp_path / "de").mkdir()
    (tmp_path / "en" / "train.txt").write_text("en1 O\nen2 O\n\nen3 B-x\n")
    (tmp_path / "de" / "train.txt").write_text("de1 O\n\nde2 O\nde3 O\n")
    df = read_conll(spark, str(tmp_path / "*" / "train.txt"),
                    token_index=0, ner_index=1)
    rows = sorted(
        (r["token"], r["sent_id"], r["word_idx"]) for r in df.collect()
    )
    assert rows == [
        ("de1", 0, 0), ("de2", 1, 0), ("de3", 1, 1),
        ("en1", 0, 0), ("en2", 0, 1), ("en3", 1, 0),
    ]
