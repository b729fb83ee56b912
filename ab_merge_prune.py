"""Interleaved same-window A/B of compact-merge + prune: HEAD (layout v7)
vs a baseline checkout (pass its repo path as argv[1]).  Each leg runs in a
FRESH python process (its own SparkSession) so neither codebase warms the
other; legs alternate A,B,A,B,... so host drift hits both equally.

Usage: python ab_merge_prune.py /tmp/wt_prev7 [reps]
Child: python ab_merge_prune.py --child <repo_path> <workdir>
"""
import json
import os
import subprocess
import sys

REPS = 3
CHILD_SRC = r"""
import sys, time
repo = sys.argv[1]
work = sys.argv[2]
sys.path.insert(0, repo)
from horus_ner_spark.session import get_spark
from horus_ner_spark.corpus import write_corpus
from horus_ner_spark.index.build import build_index
from horus_ner_spark.index.merge import merge_indexes
from horus_ner_spark.index.prune import prune_index
spark = get_spark("ab", cores=32)
corpus = write_corpus(spark, f"{work}/c1", sf=0.1, seed=7)
paths = build_index(spark, corpus, f"{work}/ix")
c2 = write_corpus(spark, f"{work}/c2", sf=0.01, seed=77)
paths2 = build_index(spark, c2, f"{work}/ix2")
t0 = time.perf_counter()
merge_indexes(spark, [paths, paths2], f"{work}/merged")
m = time.perf_counter() - t0
t0 = time.perf_counter()
prune_index(spark, paths, f"{work}/pruned")
p = time.perf_counter() - t0
print(f"RESULT {m:.3f} {p:.3f}")
"""


def run_leg(repo: str, tag: str, rep: int) -> tuple[float, float]:
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix=f"ab_{tag}_{rep}_")
    try:
        # cwd must be the leg's own checkout: pickled-by-reference kernels
        # re-import horus_ner_spark on workers, and the worker resolves the
        # package from the inherited cwd before the addPyFile zip — with a
        # mismatched cwd the A leg's workers would run the B leg's code
        out = subprocess.run(
            [sys.executable, "-c", CHILD_SRC, repo, work],
            capture_output=True, text=True, timeout=900, cwd=repo,
        )
        if out.returncode != 0:
            sys.stderr.write(out.stderr[-2000:])
            raise RuntimeError(f"leg {tag} rep {rep} failed")
        line = [l for l in out.stdout.splitlines() if l.startswith("RESULT")][-1]
        _, m, p = line.split()
        return float(m), float(p)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main():
    baseline = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else REPS
    head = os.path.dirname(os.path.abspath(__file__))
    rows = []
    for r in range(reps):
        for tag, repo in (("head", head), ("base", baseline)):
            m, p = run_leg(repo, tag, r)
            rows.append({"rep": r, "leg": tag, "merge_s": m, "prune_s": p})
            print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"rows": rows}))


if __name__ == "__main__":
    main()
