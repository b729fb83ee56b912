"""Streaming surfaces: incremental index maintenance equals the single-shot
build (exactly-once across restarts via checkpoint + manifest + canonical
merge), and the watermarked window agg equals its batch form."""

import os
import shutil

import pandas as pd

from horus_ner_spark.corpus import gen_corpus_pandas, query_set
from horus_ner_spark.index.build import IndexPaths, build_index
from horus_ner_spark.index.query import bm25_wand
from horus_ner_spark.streaming.incremental import (
    incremental_index_stream,
    windowed_event_counts,
)

SF_DIR = "/root/testdata/sf0.001"


def _results(spark, paths):
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in bm25_wand(spark, paths, query_set()).collect()
    )


def test_incremental_stream_equals_single_shot(spark, tmp_path):
    corpus = gen_corpus_pandas(sf=0.001).iloc[:300]
    landing = tmp_path / "landing"
    landing.mkdir()
    ix_root = str(tmp_path / "stream_ix")
    cp = str(tmp_path / "cp")

    # drop 1 -> one micro-batch -> segment 0 + merged current
    corpus.iloc[:180].to_parquet(landing / "drop1.parquet", index=False)
    q1 = incremental_index_stream(spark, str(landing), ix_root, cp)
    q1.awaitTermination(300)
    assert q1.exception() is None, q1.exception()

    # drop 2 -> restart from checkpoint -> ONLY the new file is processed
    corpus.iloc[180:].to_parquet(landing / "drop2.parquet", index=False)
    q2 = incremental_index_stream(spark, str(landing), ix_root, cp)
    q2.awaitTermination(300)
    assert q2.exception() is None, q2.exception()
    segs = [d for d in os.listdir(ix_root) if d.startswith("seg_")]
    assert len(segs) == 2, segs

    # single-shot reference build over the same 300 docs
    full_corpus = str(tmp_path / "full/corpus.parquet")
    spark.createDataFrame(corpus).write.parquet(full_corpus)
    full = build_index(spark, full_corpus, str(tmp_path / "full/ix"))

    current = IndexPaths(os.path.join(ix_root, "current"))
    assert _results(spark, current) == _results(spark, full)


def test_windowed_counts_stream_equals_batch(spark, tmp_path):
    events_dir = tmp_path / "events_in"
    events_dir.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", events_dir / "events.parquet")
    batch_df = spark.read.parquet(str(events_dir))

    expected = sorted(
        tuple(r) for r in windowed_event_counts(spark, batch_df).collect()
    )

    stream = spark.readStream.schema(batch_df.schema).parquet(str(events_dir))
    q = (
        windowed_event_counts(spark, stream)
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "cp2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = sorted(tuple(r) for r in spark.sql("SELECT * FROM win_counts").collect())
    assert got == expected and len(got) > 0
