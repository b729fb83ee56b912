"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Operator inventory: SURVEY.md §2; implementations under
``horus_ner_spark/ops/`` (relational + text/dedup/similarity catalogs) and
``horus_ner_spark/index/`` (the inverted-index engine itself, exercised by
the ``engine_bm25_*`` entries).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from horus_ner_spark.ops import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: block-max WAND BM25 over the compressed inverted index
    built from the sf0.001 documents table."""
    from horus_ner_spark.ops.engine_entries import engine_bm25_wand_docs

    return engine_bm25_wand_docs(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
