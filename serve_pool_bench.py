"""Concurrent cold-miss serving bench: in-process daemon vs worker pool.

The round-4 concurrent32 bench replays the SAME query set from every
client, so the single-flight LRU absorbs almost all of the load and the
measured qps is a cache benchmark.  This script measures the opposite
regime — every request a DISTINCT query (zero cache hits possible) — which
is where the GIL serializes the in-process kernel and the spawn-context
worker pool (``ServeDaemon(workers=N)``) is supposed to win.

Usage: ``python serve_pool_bench.py [sf] [workers...]`` (defaults: sf=0.1,
workers 0 and 8).  Prints one JSON line per daemon config plus a summary.
Deterministic query list (seeded shuffle of ROOTS pairs); the same list is
replayed against every config, so result counts are comparable.
"""

from __future__ import annotations

import json
import os
import random
import statistics
import sys
import threading
import time
import urllib.request

N_QUERIES = 256
CLIENTS = 32


def distinct_queries(n: int) -> list[dict]:
    from horus_ner_spark.corpus import ROOTS

    rng = random.Random(42)
    pairs = [(a, b) for a in ROOTS for b in ROOTS if a < b]
    rng.shuffle(pairs)
    return [
        {"query_text": f"{a} {b}", "lang": "python", "k": 10}
        for a, b in pairs[:n]
    ]


def mixed_queries(n: int, hot_frac: float = 0.7, hot_set: int = 8) -> list[dict]:
    """Deterministic mixed hot/cold request stream: ``hot_frac`` of the n
    requests repeat one of ``hot_set`` hot queries (absorbable by the
    single-flight LRU), the rest are distinct cold queries (must score).
    This is the realistic serving regime between the two extremes the
    other benches measure (concurrent32 = all-hot, coldmiss = all-cold)."""
    cold_n = int(round(n * (1.0 - hot_frac)))
    pool = distinct_queries(hot_set + cold_n)
    hot = pool[:hot_set]
    cold = pool[hot_set:]
    rng = random.Random(7)
    stream = cold + [hot[rng.randrange(hot_set)] for _ in range(n - cold_n)]
    rng.shuffle(stream)
    return stream


def run_config(index_root: str, workers, queries: list[dict]) -> dict:
    from horus_ner_spark.daemon import ServeDaemon

    daemon = ServeDaemon(index_root, workers=workers).start()
    n_warm = max(1, daemon.workers)  # resolved count (workers may be "auto")
    try:
        # ProcessPoolExecutor spawns workers lazily as submissions queue,
        # so fire `workers` CONCURRENT warm-up requests: all workers finish
        # their IndexServer init outside the measured window (matches a
        # long-running daemon's steady state)
        warm_threads = [
            threading.Thread(target=_post, args=(daemon.port, q))
            for q in queries[-n_warm:]
        ]
        for t in warm_threads:
            t.start()
        for t in warm_threads:
            t.join()
        lat_ms: list[float] = []
        lat_lock = threading.Lock()
        it = iter(queries[:-n_warm])
        it_lock = threading.Lock()

        def client() -> None:
            while True:
                with it_lock:
                    q = next(it, None)
                if q is None:
                    return
                t0 = time.perf_counter()
                _post(daemon.port, q)
                dt = (time.perf_counter() - t0) * 1000
                with lat_lock:
                    lat_ms.append(dt)

        threads = [threading.Thread(target=client) for _ in range(CLIENTS)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        lat_ms.sort()
        return {
            "workers": daemon.workers,
            "clients": CLIENTS,
            "queries": len(lat_ms),
            "wall_s": round(wall, 3),
            "qps": round(len(lat_ms) / wall, 1),
            "p50_ms": round(statistics.median(lat_ms), 1),
            "p99_ms": round(lat_ms[int(0.99 * (len(lat_ms) - 1))], 1),
        }
    finally:
        daemon.shutdown()


def _post(port: int, q: dict) -> None:
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/search",
        data=json.dumps(q).encode(),
        method="POST",
    )
    urllib.request.urlopen(req, timeout=300).read()


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
    workers_list = [int(w) for w in sys.argv[2:]] or [0, 8]
    work = os.environ.get("POOL_BENCH_DIR", "/tmp/pool_bench")

    from horus_ner_spark.corpus import write_corpus
    from horus_ner_spark.index.build import build_index
    from horus_ner_spark.session import get_spark

    spark = get_spark("pool_bench", cores=8, shuffle_partitions=16)
    cp = write_corpus(spark, work, sf=sf)
    paths = build_index(spark, cp, f"{work}/ix")  # manifest resume if built
    spark.stop()

    queries = distinct_queries(N_QUERIES)
    results = [run_config(paths.root, w, queries) for w in workers_list]
    for r in results:
        print(json.dumps(r), flush=True)
    if len(results) >= 2:
        base = results[0]["wall_s"]
        print(json.dumps({
            "sf": sf,
            "speedups_vs_first": {
                str(r["workers"]): round(base / r["wall_s"], 2)
                for r in results[1:]
            },
        }), flush=True)


if __name__ == "__main__":
    main()
