"""CoNLL / Ritter line-format reader — declarative sentence segmentation.

Reference: ``process_ds_conll_format`` (util.py:816-877, S1) and the 4-col
variant ``__processing_conll_ds`` (util.py:1285-1320, S2): line-based scan,
blank line = sentence boundary, ``-DOCSTART-`` lines skipped, per-line
column split by a configurable separator, token/tag column indexes
configurable per dataset (Ritter ner.txt is (token, ner); CoNLL2003 is
(token, pos, chunk, ner)).

Spark mapping: the reference's stateful line loop becomes a window
computation — ``sent_id`` is a running count of blank lines *within each
input file* (``Window.partitionBy(file)``), so a directory of CoNLL files
parses with per-file parallelism and no global sort.

Line order is taken from the file's own bytes: files read ``wholetext``
(one row per file) and split into (line_id, line) with ``posexplode`` —
deterministic at ANY partitioning.  The previous layout derived order from
``monotonically_increasing_id``, which silently mis-segments when a file
larger than ``spark.sql.files.maxPartitionBytes`` splits into several
bin-packed input partitions (round-1 review).  ``wholetext`` makes a file
one task — the correct trade-off for a line-delimited format whose
sentences are order-dependent; parallelism comes from the file count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def read_conll(
    spark: SparkSession,
    path: str,
    token_index: int = 0,
    ner_index: int = 1,
    separator: str = r"\s+",
    skip_prefix: str = "-DOCSTART-",
) -> DataFrame:
    """Parse CoNLL-ish files at ``path`` ->
    (file, sent_id, word_idx, token, ner).

    ``sent_id`` is 0-based per file; ``word_idx`` 0-based per sentence.
    Blank (whitespace-only) lines separate sentences; ``skip_prefix`` lines
    are dropped (reference: util.py:826-835).
    """
    # window keys use the FULL path: two files with the same basename in
    # different subdirectories must never share a window (their per-file
    # line_ids would tie on every row and interleave arbitrarily); the
    # output's `file` column stays the basename for display/grouping
    lines = (
        spark.read.option("wholetext", True).text(path)
        .select(
            F.input_file_name().alias("file_path"),
            F.posexplode(F.split(F.col("value"), "\r?\n")).alias(
                "line_id", "line"
            ),
        )
        .withColumn("file", F.element_at(F.split("file_path", "/"), -1))
    )
    wf = Window.partitionBy("file_path").orderBy("line_id")
    marked = lines.withColumn(
        "is_blank", F.trim(F.col("line")) == ""
    ).withColumn(
        # running blank count BEFORE this line = sentence index of this line
        "sent_id",
        F.sum(F.col("is_blank").cast("int")).over(
            wf.rowsBetween(Window.unboundedPreceding, -1)
        ),
    ).withColumn("sent_id", F.coalesce(F.col("sent_id"), F.lit(0)))
    toks = (
        marked.filter(~F.col("is_blank"))
        .filter(~F.col("line").startswith(skip_prefix))
        .withColumn("cols", F.split(F.trim(F.col("line")), separator))
        .withColumn(
            "word_idx",
            F.row_number().over(
                Window.partitionBy("file_path", "sent_id").orderBy("line_id")
            ) - 1,
        )
    )
    out = toks.select(
        "file_path",
        "file",
        "sent_id",
        "word_idx",
        F.element_at("cols", token_index + 1).alias("token"),
        F.element_at("cols", ner_index + 1).alias("ner"),
    )
    # blank-run collapse: renumber sent_ids densely per file (consecutive
    # blank lines or leading blanks would otherwise leave gaps)
    dense = out.select("file_path", "sent_id").distinct().withColumn(
        "dense_sent_id",
        F.row_number().over(
            Window.partitionBy("file_path").orderBy("sent_id")
        ) - 1,
    )
    return (
        out.join(dense, ["file_path", "sent_id"])
        .select(
            "file",
            F.col("dense_sent_id").alias("sent_id"),
            "word_idx",
            "token",
            "ner",
        )
    )


def conll_sentence_stats(df: DataFrame) -> DataFrame:
    """Per-file corpus stats of a parsed CoNLL frame — the reference's
    processing statistics (features.py:137-168): sentences, tokens,
    entity-tagged tokens (ner != 'O')."""
    return df.groupBy("file").agg(
        F.countDistinct("sent_id").alias("n_sentences"),
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum((F.col("ner") != "O").cast("int")).alias("n_entity_tokens"),
    )
