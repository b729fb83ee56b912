"""Unified operator registry: name -> (spark_fn(spark, sf_dir) -> DataFrame,
duckdb_oracle_sql or None).  Consumed by __spark_entry__.py and by
tests/test_ops_catalog.py (which runs the same comparison the driver runs)."""

from __future__ import annotations

from horus_ner_spark.ops import (
    catalog_relational,
    catalog_text,
    engine_entries,
    io_entries,
    multimodal,
)

ALL_ENTRIES: dict[str, tuple] = {}
ALL_ENTRIES.update(catalog_relational.ENTRIES)
ALL_ENTRIES.update(catalog_text.ENTRIES)
ALL_ENTRIES.update(engine_entries.ENTRIES)
ALL_ENTRIES.update(io_entries.ENTRIES)
ALL_ENTRIES.update(multimodal.ENTRIES)


def queries():
    return {name: fn for name, (fn, _sql) in ALL_ENTRIES.items()}


def oracle_sql():
    return {name: sql for name, (_fn, sql) in ALL_ENTRIES.items() if sql is not None}
