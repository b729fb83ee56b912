"""Structured Streaming surfaces of the engine.

The reference has no streaming; its closest shapes are the incremental
``processed``-flag reprocessing loop (definitions_sql.py:28-45,
README.BACKLOG:20-22) and the always-on REST annotator (rest.py:47-61).
Both map naturally onto Structured Streaming:

1. ``incremental_index_stream`` — a file-source stream over a corpus
   landing directory; each micro-batch is SPIMI-built into a segment index
   (build.py) and sort-merged into the serving index (merge.py) inside
   ``foreachBatch``.  Exactly-once comes from the pairing of the stream
   checkpoint (source offsets) with the build manifest (segment
   fingerprints): a replayed batch re-enters build_index, which no-ops on
   its manifest and re-merges idempotently (merge is canonical-form, see
   merge.py docstring).
2. ``windowed_event_counts`` — watermarked tumbling-window aggregation
   (the standard late-data pattern) over the events stream shape.

Both run with ``trigger(availableNow=True)`` in tests — the same code is a
continuous job on a real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORPUS_SCHEMA = "repo string, path string, commit string, lang string, content string"


def incremental_index_stream(
    spark: SparkSession,
    landing_dir: str,
    index_root: str,
    checkpoint_dir: str,
):
    """Start an availableNow stream: new corpus parquet files under
    ``landing_dir`` are built into per-batch segment indexes and merged
    into ``<index_root>/current``.  Returns the StreamingQuery."""
    from horus_ner_spark.index.build import IndexPaths, build_index
    from horus_ner_spark.index.merge import merge_indexes

    os.makedirs(index_root, exist_ok=True)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        seg_root = os.path.join(index_root, f"seg_{batch_id}")
        seg_corpus = os.path.join(seg_root, "corpus.parquet")
        if not os.path.exists(os.path.join(seg_corpus, "_SUCCESS")):
            batch_df.write.mode("overwrite").parquet(seg_corpus)
        build_index(spark, seg_corpus, os.path.join(seg_root, "ix"))
        segments = sorted(
            d for d in os.listdir(index_root) if d.startswith("seg_")
        )
        merge_indexes(
            spark,
            [IndexPaths(os.path.join(index_root, d, "ix")) for d in segments],
            os.path.join(index_root, "current"),
        )

    return (
        spark.readStream.schema(CORPUS_SCHEMA)
        .parquet(landing_dir)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(
    spark: SparkSession,
    events_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window per-type event counts with a late-data watermark.
    ``events_stream`` must carry (ts timestamp, event_type string, value
    double); works identically on a batch frame (watermark is a no-op)."""
    # watermarks require TIMESTAMP (with zone); parquet often carries NTZ
    df = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
