#!/usr/bin/env python
"""Streaming-tier measurement: N micro-batches ingested through the
Structured Streaming path, tiered compaction running per batch, then the
live (multi-segment) serving plane checked for exact parity against a
single-shot build of the same corpus.

This is the steady-state lifecycle of the engine at scale — ingest →
log-structured tiers → fanout compaction → GC → serve — measured
end-to-end, complementing bench.py's single-shot build metric.  Prints
ONE JSON line.

Env: STREAM_BATCHES (default 8), STREAM_BATCH_DOCS (default 5000),
     STREAM_FANOUT (default 4), SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BATCHES = int(os.environ.get("STREAM_BATCHES", "8"))
BATCH_DOCS = int(os.environ.get("STREAM_BATCH_DOCS", "5000"))
FANOUT = int(os.environ.get("STREAM_FANOUT", "4"))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from horus_ner_spark.corpus import gen_doc, query_set
    from horus_ner_spark.index.build import IndexPaths, build_index
    from horus_ner_spark.index.serve import IndexServer
    from horus_ner_spark.session import get_spark
    from horus_ner_spark.streaming.incremental import (
        active_units,
        gc_absorbed_units,
        incremental_index_stream,
    )

    import pandas as pd

    spark = get_spark("horus-stream-bench", cores=CPUS,
                      shuffle_partitions=int(CPUS) if CPUS.isdigit() else 32)
    work = f"/tmp/horus_stream_bench_{BATCHES}x{BATCH_DOCS}"
    shutil.rmtree(work, ignore_errors=True)
    landing = f"{work}/landing"
    ix_root = f"{work}/ix_root"
    os.makedirs(landing)
    n = BATCHES * BATCH_DOCS
    n_repos = max(10, n // 100)

    # deterministic corpus, pre-staged as one parquet file per micro-batch
    t0 = time.perf_counter()
    for b in range(BATCHES):
        rows = [
            gen_doc(i, 7, n_repos)
            for i in range(b * BATCH_DOCS, (b + 1) * BATCH_DOCS)
        ]
        pd.DataFrame(rows).to_parquet(f"{work}/staged_{b}.parquet")
    gen_s = time.perf_counter() - t0

    # ingest: ONE warm availableNow stream over all pre-staged files,
    # maxFilesPerTrigger=1 -> one micro-batch per file (deterministic:
    # the file source lists in path order and the names are zero-padded),
    # compaction inside the batch hook.  Round 3 restarted the stream per
    # delivered file, paying checkpoint/listing setup per batch.
    for b in range(BATCHES):
        shutil.move(
            f"{work}/staged_{b}.parquet", f"{landing}/b{b:05d}.parquet"
        )
    # JVM/executor warmup outside the ingest clock: the corpus staging above
    # is pure pandas, so without this the FIRST Spark job of the process
    # (inside micro-batch 0) would bill session startup to ingest
    spark.read.parquet(landing).count()
    t0 = time.perf_counter()
    q = incremental_index_stream(
        spark, landing, ix_root, f"{work}/cp", fanout=FANOUT,
        max_files_per_trigger=1,
    )
    q.awaitTermination()
    ingest_s = time.perf_counter() - t0
    removed = gc_absorbed_units(ix_root)
    units = active_units(ix_root)

    # serving plane over the live tier set (no Spark in the query path)
    server = IndexServer([p for _lvl, p in units])
    lat = []
    for _ in range(2):
        for qd in query_set():
            t0 = time.perf_counter()
            server.search(qd["query_text"], qd["lang"], qd["k"])
            lat.append(time.perf_counter() - t0)
    lat.sort()

    # parity: single-shot build of the full corpus must give identical
    # top-k (rank, doc_id, score) for every reference query
    full_corpus = f"{work}/full/corpus.parquet"
    import pyarrow.parquet as pq
    import pyarrow as pa

    tbl = pa.concat_tables([
        pq.read_table(os.path.join(ix_root, d, "corpus.parquet"))
        for d in sorted(os.listdir(ix_root))
        if d.startswith("seg_")
        and os.path.isdir(os.path.join(ix_root, d, "corpus.parquet"))
    ])
    os.makedirs(os.path.dirname(full_corpus), exist_ok=True)
    spark.createDataFrame(tbl.to_pandas()).write.mode("overwrite").parquet(
        full_corpus
    )
    single = IndexServer(
        build_index(spark, full_corpus, f"{work}/full/ix").root
    )
    mismatches = 0
    for qd in query_set():
        a = server.search(qd["query_text"], qd["lang"], qd["k"])
        b = single.search(qd["query_text"], qd["lang"], qd["k"])
        if not a.equals(b):
            mismatches += 1

    print(json.dumps({
        "metric": "streaming_ingest_docs_per_sec",
        "value": round(n / ingest_s, 1),
        "unit": "docs/sec",
        "n_docs": n,
        "batches": BATCHES,
        "fanout": FANOUT,
        "ingest_s": round(ingest_s, 3),
        "corpus_gen_s": round(gen_s, 3),
        "active_units": len(units),
        "unit_levels": sorted({lvl for lvl, _p in units}),
        "gc_removed_units": len(removed),
        "serve_p50_s": round(lat[len(lat) // 2], 4),
        "serve_p99_s": round(lat[min(len(lat) - 1, int(0.99 * len(lat)))], 4),
        "parity_mismatches_vs_single_shot": mismatches,
        "cores": CPUS,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
