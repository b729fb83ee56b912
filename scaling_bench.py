#!/usr/bin/env python
"""Two-parallelism scaling evidence for the north rule.

No real cluster exists in this sandbox, so the rule's "N vs 4N executors"
criterion is evidenced by running the IDENTICAL index-build job at
``local[8]`` and ``local[32]`` on the SAME corpus input and reporting
throughput at both plus scaling efficiency = (thr_32 / thr_8) / 4
(BASELINE.md "Target metric").  Each run is a fresh OS process (its own
JVM + python workers) building into its own index dir from one shared
corpus; results are appended to BENCH.md.

CPU affinity (default ON, SCALING_AFFINITY=0 reverts): each child runs
under ``taskset -c 0-(N-1)`` so level N gets EXACTLY N host cores — the
same quota a real N-core executor has.  Without it, local-mode Spark
under-reports scalability: every task is a JVM thread PLUS a separate
python worker process, so un-pinned ``local[2]`` burns up to ~4 host
cores and the small side of the ratio gets a hidden 2x subsidy that the
4N side (closer to host saturation) does not.

Usage:
  python scaling_bench.py                 # orchestrate both runs (sf=0.1)
  SCALING_SF=0.2 python scaling_bench.py  # bigger corpus
  python scaling_bench.py --run 8 <corpus_path> <index_dir>   # child mode
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF = float(os.environ.get("SCALING_SF", "0.1"))
# N and 4N parallelism levels.  Default 2->8: on this 32-core single host,
# both levels stay undersubscribed (each Spark task ~= 1 JVM thread + 1
# python worker), so the measurement reflects the JOB's scalability rather
# than host saturation; SCALING_LEVELS=8,32 measures the saturated regime
# (see BENCH.md for both + the pure-CPU calibration).
CORES_LEVELS = tuple(
    int(x) for x in os.environ.get("SCALING_LEVELS", "2,8").split(",")
)
AFFINITY = os.environ.get("SCALING_AFFINITY", "1") == "1"


def child(cores: int, corpus_path: str, index_dir: str) -> None:
    from horus_ner_spark.corpus import query_set
    from horus_ner_spark.index.build import build_index
    from horus_ner_spark.index.query import bm25_wand
    from horus_ner_spark.session import get_spark

    # 4 reduce tasks per core (Spark's own tuning guidance: 2-3+ tasks per
    # core so the scheduler can smooth stragglers), applied SYMMETRICALLY at
    # both levels.  One wave (= cores) lets the single largest (term, rb)
    # reduce partition gate the postings-stage wall at either level.
    spark = get_spark(f"scale-{cores}", cores=cores, shuffle_partitions=4 * cores)
    t0 = time.perf_counter()
    paths = build_index(spark, corpus_path, index_dir)
    build_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_results = bm25_wand(spark, paths, query_set()).count()
    query_s = time.perf_counter() - t0
    from horus_ner_spark.index.manifest import Manifest

    man = Manifest(index_dir)
    stage_walls = {
        s: (man.read_stage(s) or {}).get("totals", {}).get("wall_s")
        for s in ("docs", "tf", "stats", "term_stats", "postings")
    }
    print(json.dumps({
        "cores": cores, "build_s": round(build_s, 3),
        "query_batch_s": round(query_s, 3), "n_results": n_results,
        "stage_walls": stage_walls,
    }))
    spark.stop()


def orchestrate() -> None:
    from horus_ner_spark.corpus import n_docs_for_sf, write_corpus
    from horus_ner_spark.session import get_spark

    work = f"/tmp/horus_scaling_sf{SF}"
    shutil.rmtree(work, ignore_errors=True)
    spark = get_spark("scale-gen", cores=32)
    corpus_path = write_corpus(spark, work, sf=SF)
    spark.stop()
    n_docs = n_docs_for_sf(SF)

    # The sandbox host's delivered CPU drifts over time (measured ~40% swings
    # from co-tenancy), so levels are run ALTERNATING x REPS and the best
    # (min) build time per level is used — min-of-k is robust to slow-host
    # windows and alternation removes systematic drift bias between levels.
    reps = int(os.environ.get("SCALING_REPS", "1"))
    lo, hi = CORES_LEVELS
    pair_effs: list[float] = []
    results: dict[int, dict] = {}
    for r in range(reps):
        rep_rec: dict[int, dict] = {}
        for cores in CORES_LEVELS:
            shutil.rmtree(f"{work}/ix_{cores}", ignore_errors=True)
            cmd = [sys.executable, os.path.abspath(__file__), "--run",
                   str(cores), corpus_path, f"{work}/ix_{cores}"]
            if AFFINITY:
                cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
            out = subprocess.run(
                cmd, capture_output=True, text=True, timeout=3600,
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            rec = json.loads(line)
            print(f"rep{r} " + line)
            rep_rec[cores] = rec
            prev = results.get(cores)
            if prev is None or rec["build_s"] < prev["build_s"]:
                results[cores] = rec
        # paired efficiency within the rep: both levels as close in time as
        # possible, so host-speed drift cancels to first order
        pe = (rep_rec[lo]["build_s"] / rep_rec[hi]["build_s"]) / (hi / lo)
        pair_effs.append(round(pe, 3))
        stage_effs = {
            s: round((rep_rec[lo]["stage_walls"][s]
                      / rep_rec[hi]["stage_walls"][s]) / (hi / lo), 3)
            for s in rep_rec[lo].get("stage_walls", {})
            if rep_rec[lo]["stage_walls"].get(s)
            and rep_rec[hi]["stage_walls"].get(s)
        }
        print(f"rep{r} paired_efficiency {pe:.3f} stages {stage_effs}")

    import statistics

    eff = statistics.median(pair_effs)
    thr = {c: n_docs / results[c]["build_s"] for c in CORES_LEVELS}
    summary = {
        "sf": SF, "n_docs": n_docs,
        f"build_s_local{lo}": results[lo]["build_s"],
        f"build_s_local{hi}": results[hi]["build_s"],
        f"docs_per_sec_local{lo}": round(thr[lo], 1),
        f"docs_per_sec_local{hi}": round(thr[hi], 1),
        f"query_batch_s_local{lo}": results[lo]["query_batch_s"],
        f"query_batch_s_local{hi}": results[hi]["query_batch_s"],
        "paired_efficiencies": pair_effs,
        "scaling_efficiency": round(eff, 3),
        "stage_effs_last_rep": stage_effs,
        "affinity": AFFINITY,
    }
    print(json.dumps(summary))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.md"), "a") as f:
        aff = (
            "taskset-pinned to exactly N cores"
            if AFFINITY else "UNPINNED (pre-r4 method: local[N] tasks use a "
            "JVM thread + python worker each, ~2N host cores)"
        )
        f.write(
            f"\n## Scaling run (sf={SF}, {n_docs} docs, same corpus, fresh process per "
            f"level, {aff}, best of {reps} alternating rep(s))\n\n"
            f"| cores | build s | docs/s | query batch s |\n|---|---|---|---|\n"
            + "".join(
                f"| local[{c}] | {results[c]['build_s']} | {round(thr[c],1)} | {results[c]['query_batch_s']} |\n"
                for c in CORES_LEVELS
            )
            + f"\nPer-rep paired efficiencies: {pair_effs}; "
            f"median scaling efficiency = **{eff:.3f}**; "
            f"per-stage (last rep): {stage_effs}\n"
        )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--run":
        child(int(sys.argv[2]), sys.argv[3], sys.argv[4])
    else:
        orchestrate()
