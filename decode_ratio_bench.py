#!/usr/bin/env python
"""Standalone WAND decoded-postings ratio measurement: build a fresh index
at BENCH_CORPUS_SF and run bench.py's shared measure_wand_decode over the
reference query set + the hot 3-term query (sub-range vs block-max
metadata).  Used to attribute layout changes without a full bench run."""
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CORPUS_SF = float(os.environ.get("BENCH_CORPUS_SF", "0.1"))


def main():
    from bench import measure_wand_decode
    from horus_ner_spark.corpus import write_corpus
    from horus_ner_spark.index.build import build_index
    from horus_ner_spark.index.serve import IndexServer
    from horus_ner_spark.session import get_spark

    spark = get_spark("decode-ratio", cores="16", shuffle_partitions=16)
    work = f"/tmp/horus_ratio_sf{CORPUS_SF}"
    shutil.rmtree(work, ignore_errors=True)
    corpus_path = write_corpus(spark, work, sf=CORPUS_SF)
    paths = build_index(spark, corpus_path, f"{work}/ix")
    print(measure_wand_decode(spark, paths, IndexServer(paths.root)))
    spark.stop()


if __name__ == "__main__":
    main()
