"""Stage-level profile of compact_merge_110pct + prune_index_25pct.

Reproduces the bench's merge/prune inputs (same corpus seeds/SF) and times
each catalog.write_table / action inside merge_indexes and prune_index by
monkeypatching the write path.  Diagnostic only — not part of the bench.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from horus_ner_spark import catalog
from horus_ner_spark.session import get_spark
from horus_ner_spark.corpus import write_corpus
from horus_ner_spark.index.build import build_index
from horus_ner_spark.index.merge import merge_indexes
from horus_ner_spark.index.prune import prune_index

CORPUS_SF = float(os.environ.get("PROFILE_SF", "0.1"))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="prof_merge_")
    spark = get_spark(f"local[{CPUS}]")

    t0 = time.perf_counter()
    corpus = write_corpus(spark, f"{work}/c1", sf=CORPUS_SF, seed=7)
    print(f"corpus_gen: {time.perf_counter()-t0:.2f}s", flush=True)
    t0 = time.perf_counter()
    paths = build_index(spark, corpus, f"{work}/ix")
    print(f"build: {time.perf_counter()-t0:.2f}s", flush=True)
    t0 = time.perf_counter()
    c2 = write_corpus(spark, f"{work}/c2", sf=CORPUS_SF / 10, seed=77)
    paths2 = build_index(spark, c2, f"{work}/ix2")
    print(f"seg2: {time.perf_counter()-t0:.2f}s", flush=True)

    orig_write = catalog.write_table
    stamps = []

    def timed_write(df, ref, **kw):
        t = time.perf_counter()
        out = orig_write(df, ref, **kw)
        stamps.append((ref.rsplit("/", 2)[-1], time.perf_counter() - t))
        return out

    catalog.write_table = timed_write
    try:
        t0 = time.perf_counter()
        merge_indexes(spark, [paths, paths2], f"{work}/merged")
        total = time.perf_counter() - t0
        print(f"\nmerge total: {total:.2f}s")
        acc = 0.0
        for ref, dt in stamps:
            print(f"  write {ref}: {dt:.2f}s")
            acc += dt
        print(f"  (non-write driver/action time: {total-acc:.2f}s)")

        stamps.clear()
        t0 = time.perf_counter()
        prune_index(spark, paths, f"{work}/pruned")
        total = time.perf_counter() - t0
        print(f"\nprune total: {total:.2f}s")
        acc = 0.0
        for ref, dt in stamps:
            print(f"  write {ref}: {dt:.2f}s")
            acc += dt
        print(f"  (non-write driver/action time: {total-acc:.2f}s)")
    finally:
        catalog.write_table = orig_write
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
