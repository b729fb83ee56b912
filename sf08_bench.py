#!/usr/bin/env python
"""One-shot sf0.8 robustness run (800k docs): build + sha invariant +
hot-conjunctive serving measurements (the round-3 verdict's #1 evidence
target).  Prints ONE JSON line with calibration stamps.

Env: SF08_SF (default 0.8), SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF = float(os.environ.get("SF08_SF", "0.8"))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from bench import cpu_calibration
    from horus_ner_spark.corpus import n_docs_for_sf, write_corpus
    from horus_ner_spark.index.build import build_index, verify_sha_invariant
    from horus_ner_spark.index.query import bm25_distributed, bm25_wand
    from horus_ner_spark.index.serve import IndexServer
    from horus_ner_spark.session import get_spark

    spark = get_spark("horus-sf08", cores=CPUS,
                      shuffle_partitions=int(CPUS) if CPUS.isdigit() else 32)
    out: dict = {"metric": "sf08_robustness", "sf": SF, "cores": CPUS,
                 "unit": "sec"}
    out["cpu_calib_start_s"] = cpu_calibration()
    work = f"/tmp/horus_sf08_{SF}"
    shutil.rmtree(work, ignore_errors=True)
    t0 = time.perf_counter()
    cp = write_corpus(spark, work, sf=SF)
    out["corpus_gen_s"] = round(time.perf_counter() - t0, 1)
    n_docs = n_docs_for_sf(SF)
    t0 = time.perf_counter()
    paths = build_index(spark, cp, f"{work}/ix")
    build_s = time.perf_counter() - t0
    out["build_s"] = round(build_s, 1)
    out["docs_per_sec"] = round(n_docs / build_s, 1)
    out["sha_mismatches"] = verify_sha_invariant(spark, cp, paths)

    # 3 hottest terms -> the hot-conjunctive NEAR evidence query
    top3 = [
        r["term"]
        for r in spark.read.parquet(paths.term_stats)
        .orderBy("df", ascending=False).limit(3).collect()
    ]
    from pyspark.sql import functions as F

    out["hot_terms"] = top3
    out["hot_dfs"] = {
        r["term"]: r["df"]
        for r in spark.read.parquet(paths.term_stats)
        .filter(F.col("term").isin(top3)).select("term", "df").collect()
    }
    hot_q = " ".join(top3)

    # three serving configurations: the DEFAULT (lazy score-ordered
    # verification, AND-only fanning), explicit rb fan-out for all
    # conjunctive modes, and fanning fully disabled
    default = IndexServer(paths.root)
    fanned = IndexServer(paths.root,
                         fan_modes=("AND", "PHRASE", "NEAR"))
    single = IndexServer(paths.root, fanout_workers=0)
    servers = (("default", default), ("fanned", fanned),
               ("single_task", single))
    for name, srv in servers:
        srv.search(hot_q, "python", k=10, mode="NEAR", slop=8)  # warm
        t0 = time.perf_counter()
        res = srv.search(hot_q, "python", k=10, mode="NEAR", slop=8)
        out[f"serve_near_hot_{name}_s"] = round(time.perf_counter() - t0, 2)
        out[f"serve_near_hot_{name}_rows"] = len(res)
    a = default.search(hot_q, "python", 10, "NEAR", slop=8)
    b = fanned.search(hot_q, "python", 10, "NEAR", slop=8)
    c = single.search(hot_q, "python", 10, "NEAR", slop=8)
    out["fanned_equals_single"] = bool(a.equals(b) and a.equals(c))
    # PHRASE hot pair through all paths too
    pq_ = " ".join(top3[:2])
    for name, srv in servers:
        srv.search(pq_, "python", k=10, mode="PHRASE")  # warm
        t0 = time.perf_counter()
        srv.search(pq_, "python", k=10, mode="PHRASE")
        out[f"serve_phrase_hot_{name}_s"] = round(time.perf_counter() - t0, 2)
    # distributed reference point
    t0 = time.perf_counter()
    bm25_distributed(
        spark, paths,
        [{"query_id": 1, "query_text": hot_q, "lang": "python", "k": 10,
          "mode": "NEAR", "slop": 8}],
    ).collect()
    out["distributed_near_hot_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    bm25_wand(
        spark, paths,
        [{"query_id": 1, "query_text": hot_q, "lang": "python", "k": 10,
          "mode": "NEAR", "slop": 8}],
    ).collect()
    out["wand_1task_near_hot_s"] = round(time.perf_counter() - t0, 2)

    # hot-OR (round-4): the legacy agg plan shuffles O(matching docs);
    # the rb fan-out shuffles O(2^range_bits * k).  Same query, both
    # plans, plus the serve-path hybrid kernel (single + fanned OR).
    or_q = [{"query_id": 1, "query_text": hot_q, "lang": "python",
             "k": 10, "mode": "OR"}]
    rows_by_plan = {}
    for plan in ("agg", "fanout"):
        bm25_distributed(spark, paths, or_q, or_plan=plan).collect()  # warm
        t0 = time.perf_counter()
        rows_by_plan[plan] = sorted(
            map(tuple, bm25_distributed(
                spark, paths, or_q, or_plan=plan
            ).collect())
        )
        out[f"distributed_or_hot_{plan}_s"] = round(
            time.perf_counter() - t0, 2
        )
    out["or_fanout_equals_agg"] = rows_by_plan["agg"] == rows_by_plan["fanout"]
    or_fanned = IndexServer(paths.root, fan_modes=("AND", "OR"))
    for name, srv in (("default", default), ("fanned", or_fanned),
                      ("single_task", single)):
        srv.search(hot_q, "python", k=10, mode="OR")  # warm
        t0 = time.perf_counter()
        res = srv.search(hot_q, "python", k=10, mode="OR")
        out[f"serve_or_hot_{name}_s"] = round(time.perf_counter() - t0, 2)
        out[f"serve_or_hot_{name}_rows"] = len(res)
    out["serve_or_fanned_equals_single"] = bool(
        default.search(hot_q, "python", 10, "OR").equals(
            or_fanned.search(hot_q, "python", 10, "OR"))
        and default.search(hot_q, "python", 10, "OR").equals(
            single.search(hot_q, "python", 10, "OR"))
    )
    # WAND decoded-postings ratio at 8x data (layout v6 evidence): the
    # same reference-query-set counters bench.py records at sf0.1
    from bench import measure_wand_decode

    out["wand_decode"] = measure_wand_decode(spark, paths, default)

    out["cpu_calib_end_s"] = cpu_calibration()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
