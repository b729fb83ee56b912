"""Posting-merge idempotence / associativity (north rule; SURVEY.md §5.1).

Strategy: split the sf0.001 corpus into 3 disjoint segments, SPIMI-build
each independently, then assert that every merge grouping produces an index
that (a) answers the reference query set identically to the single-shot
index built over the whole corpus, and (b) has byte-identical canonical
posting blocks."""

import pytest
from pyspark.sql import functions as F

from horus_ner_spark.corpus import query_set, write_corpus
from horus_ner_spark.index.build import build_index
from horus_ner_spark.index.merge import merge_indexes
from horus_ner_spark.index.query import bm25_wand


def _blocks_signature(spark, paths):
    rows = (
        spark.read.parquet(paths.postings)
        .select("term", "min_doc_id", "n_postings",
                F.md5(F.base64("doc_ids_vb")).alias("dh"),
                F.md5(F.base64("tfs_vb")).alias("th"),
                F.bround("block_max_tfnorm", 9).alias("bm"))
        .collect()
    )
    return sorted((r["term"], r["min_doc_id"], r["n_postings"], r["dh"], r["th"], r["bm"]) for r in rows)


def _results(spark, paths):
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in bm25_wand(spark, paths, query_set()).collect()
    )


@pytest.fixture(scope="module")
def segments(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("mrg")
    corpus_path = write_corpus(spark, str(root), sf=0.001)
    corpus = spark.read.parquet(corpus_path)
    seg_paths = []
    for i in range(3):
        p = str(root / f"seg{i}")
        corpus.filter(F.pmod(F.xxhash64("repo", "path"), F.lit(3)) == i).write.mode(
            "overwrite"
        ).parquet(p + "/corpus.parquet")
        seg_paths.append(build_index(spark, p + "/corpus.parquet", p + "/ix"))
    full = build_index(spark, corpus_path, str(root / "full_ix"))
    return root, seg_paths, full


def test_merge_equals_single_shot(spark, segments):
    root, segs, full = segments
    merged = merge_indexes(spark, segs, str(root / "m_abc"))
    assert _blocks_signature(spark, merged) == _blocks_signature(spark, full)
    assert _results(spark, merged) == _results(spark, full)


def test_merge_hot_term_reblocks_in_parallel_groups(spark, tmp_path):
    """Round-3 scale fix: a term whose MERGED df crosses the split
    threshold re-blocks per (term, rb) — many parallel groups — even when
    every input segment built it cold; output is byte-identical to the
    single-shot build; and the merge writes NO tf table by default."""
    import os

    import pandas as pd

    thr = 48  # lowered split threshold so a 120-doc term is "hot"
    docs = pd.DataFrame(
        {
            "repo": ["r"] * 120,
            "path": [f"f{i}.py" for i in range(120)],
            "commit": ["c0"] * 120,
            "lang": ["python"] * 120,
            "content": [f"hotterm filler{i} payload" for i in range(120)],
        }
    )
    seg_paths = []
    for i, sl in enumerate((slice(0, 40), slice(40, 80), slice(80, 120))):
        cp = str(tmp_path / f"c{i}.parquet")
        spark.createDataFrame(docs.iloc[sl]).write.parquet(cp)
        seg_paths.append(
            build_index(spark, cp, str(tmp_path / f"ix{i}"), split_threshold=thr)
        )
    full_cp = str(tmp_path / "call.parquet")
    spark.createDataFrame(docs).write.parquet(full_cp)
    full = build_index(spark, full_cp, str(tmp_path / "ixfull"), split_threshold=thr)

    merged = merge_indexes(
        spark, seg_paths, str(tmp_path / "m"), split_threshold=thr
    )
    assert _blocks_signature(spark, merged) == _blocks_signature(spark, full)
    # the hot term's merged postings span >1 range bucket => the merge's
    # (term, rb) grouping re-blocked it in parallel groups, never one task
    rbs = {
        r["rb"]
        for r in spark.read.parquet(merged.postings)
        .filter(F.col("term") == "hotterm")
        .select("rb")
        .collect()
    }
    assert len(rbs) > 1, f"hot term merged in a single rb group: {rbs}"
    # every cold-built input block had rb == 0 for this term
    for seg in seg_paths:
        seg_rbs = {
            r["rb"]
            for r in spark.read.parquet(seg.postings)
            .filter(F.col("term") == "hotterm")
            .select("rb")
            .collect()
        }
        assert seg_rbs == {0}
    # slim contract: no tf table in the merge output unless merge_tf=True
    assert not os.path.exists(merged.tf)
    with_tf = merge_indexes(
        spark, seg_paths, str(tmp_path / "m_tf"), split_threshold=thr,
        merge_tf=True,
    )
    assert os.path.exists(with_tf.tf)
    assert (
        spark.read.parquet(with_tf.tf).count()
        == spark.read.parquet(full.tf).count()
    )


def test_merge_associative_and_idempotent(spark, segments):
    root, segs, full = segments
    ab = merge_indexes(spark, segs[:2], str(root / "m_ab"))
    ab_c = merge_indexes(spark, [ab, segs[2]], str(root / "m_ab_c"))
    assert _blocks_signature(spark, ab_c) == _blocks_signature(spark, full)
    # merging a merged index with itself changes nothing (idempotence)
    self_merge = merge_indexes(spark, [ab_c, ab_c], str(root / "m_self"))
    assert _blocks_signature(spark, self_merge) == _blocks_signature(spark, ab_c)
    assert _results(spark, self_merge) == _results(spark, full)


def test_merge_accepts_pre_v5_segments(spark, segments, tmp_path):
    """Upgrade path: older-layout segments must merge cleanly — an all-v4
    set (no sub_* impact metadata), and a mixed v4 / true-v5 (stored
    sub_max_doc_ids) / v6 set — producing output byte-identical to the
    all-v6 merge (every block re-encodes through encode_run, so the
    merged index is always full v6)."""
    import pyarrow.parquet as pq
    import pyarrow as pa

    from horus_ner_spark.index.build import IndexPaths

    root, segs, full = segments
    _SUB = ["sub_min_doc_ids", "sub_max_doc_ids", "sub_max_tfnorms"]

    def _rewrite_postings(seg, dst, transform):
        import shutil

        shutil.copytree(seg.root, dst)
        out = IndexPaths(dst)
        t = transform(pq.read_table(out.postings))
        shutil.rmtree(out.postings)
        # preserve the hive pbucket layout the reader expects
        pdf = t.to_pandas()
        for pb, sub in pdf.groupby("pbucket", sort=True):
            d = f"{out.postings}/pbucket={int(pb)}"
            import os

            os.makedirs(d, exist_ok=True)
            pq.write_table(
                pa.Table.from_pandas(
                    sub.drop(columns=["pbucket"]), preserve_index=False
                ),
                f"{d}/part-00000.parquet",
            )
        open(f"{out.postings}/_SUCCESS", "w").close()
        return out

    def _strip_to_v4(seg, dst):
        return _rewrite_postings(
            seg, dst,
            lambda t: t.drop_columns(
                [c for c in _SUB if c in t.column_names]
            ),
        )

    def _to_v5(seg, dst):
        # a TRUE v5 segment stored sub_max_doc_ids alongside the other
        # sub_* columns; reconstruct it (maxs[j] = mins[j+1]-1, block-last
        # range ends at max_doc_id — what v5 materialized) so the merge's
        # drop-on-read normalization is exercised by a real input
        def add_maxs(t):
            pdf = t.to_pandas()
            maxs = []
            for mins, bmax in zip(
                pdf["sub_min_doc_ids"], pdf["max_doc_id"]
            ):
                m = list(mins[1:] - 1) + [bmax]
                maxs.append(m)
            pdf["sub_max_doc_ids"] = maxs
            return pa.Table.from_pandas(pdf, preserve_index=False)

        return _rewrite_postings(seg, dst, add_maxs)

    v4 = [
        _strip_to_v4(s, str(tmp_path / f"v4seg{i}"))
        for i, s in enumerate(segs)
    ]
    assert "sub_min_doc_ids" not in spark.read.parquet(v4[0].postings).columns
    v5seg = _to_v5(segs[1], str(tmp_path / "v5seg1"))
    assert "sub_max_doc_ids" in spark.read.parquet(v5seg.postings).columns

    ref_sig = _blocks_signature(spark, full)
    all_v4 = merge_indexes(spark, v4, str(tmp_path / "m_v4"))
    assert _blocks_signature(spark, all_v4) == ref_sig
    assert "sub_min_doc_ids" in spark.read.parquet(all_v4.postings).columns
    # mixed v4 + true-v5 (stored maxima) + v6 — the full upgrade matrix
    mixed = merge_indexes(
        spark, [v4[0], v5seg, segs[2]], str(tmp_path / "m_mix")
    )
    assert _blocks_signature(spark, mixed) == ref_sig
    assert "sub_max_doc_ids" not in spark.read.parquet(mixed.postings).columns
    assert _results(spark, mixed) == _results(spark, full)
