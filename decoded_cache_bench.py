#!/usr/bin/env python
"""A/B the serving path's decoded-postings memo (BENCH.md round 4).

Warm DISTINCT queries sharing terms were vb_decode-bound (~60% of warm
serving time at sf0.1 per cProfile): the term LRU caches COMPRESSED
frames, so every query re-decoded. IndexServer's postings-budgeted memo
of the exhaustive kernel's per-term decode product closes that. This
script measures warm p50/p99 over the reference query set with the memo
off (``decoded_cache_postings=0``) vs on (default), same index, same
process, same calibration window — prints one JSON line.

Usage: python decoded_cache_bench.py [sf]   (default 0.1)
Must run from the repo root (executors import horus_ner_spark by cwd).
"""

from __future__ import annotations

import json
import shutil
import statistics
import sys
import time

from bench import cpu_calibration
from horus_ner_spark.corpus import query_set, write_corpus
from horus_ner_spark.index.build import build_index
from horus_ner_spark.index.serve import IndexServer
from horus_ner_spark.session import get_spark

REPS = 3


def warm_latencies(server: IndexServer) -> list[float]:
    for q in query_set():  # cold pass fills the term LRU (and memo if on)
        server.search(q["query_text"], q["lang"], q["k"])
    lat = []
    for _ in range(REPS):
        for q in query_set():
            t0 = time.perf_counter()
            server.search(q["query_text"], q["lang"], q["k"])
            lat.append(time.perf_counter() - t0)
    return sorted(lat)


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
    spark = get_spark("decoded-cache-bench", cores="32", shuffle_partitions=32)
    work = f"/tmp/horus_decoded_ab_sf{sf}"
    shutil.rmtree(work, ignore_errors=True)
    corpus = write_corpus(spark, work, sf=sf)
    paths = build_index(spark, corpus, f"{work}/ix")
    calib = cpu_calibration()

    out: dict = {"metric": "decoded_cache_ab", "sf": sf, "calib_s": calib}
    servers = {
        "off": IndexServer(paths.root, decoded_cache_postings=0),
        "on": IndexServer(paths.root),
    }
    for name, srv in servers.items():
        lat = warm_latencies(srv)
        out[name] = {
            "warm_p50_ms": round(statistics.median(lat) * 1e3, 2),
            "warm_p99_ms": round(lat[int(0.99 * len(lat))] * 1e3, 2),
            "warm_mean_ms": round(statistics.mean(lat) * 1e3, 2),
            "n": len(lat),
        }
    on = servers["on"]
    out["memo"] = {
        "hits": on.decoded_hits,
        "misses": on.decoded_misses,
        "postings": on._decoded_postings,
    }
    out["speedup_p50"] = round(
        out["off"]["warm_p50_ms"] / out["on"]["warm_p50_ms"], 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
