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

# The driver records CORRECTNESS rows for at most 50 entries (rounds 3/4
# dropped entries past that cap).  Round 5 consolidated the registry to
# exactly 50 first-class entries (mm_feature_stub's f0..f3 folded into
# mm_decode_metadata; html/quote normalize merged into text_normalize_docs)
# so every operator — including the engine_bm25_brute_docs oracle twin —
# emits a current-round row.  Guarded here so a future addition that would
# silently fall past the cap fails loudly instead.
_DRIVER_ROW_CAP = 50
assert len(ALL_ENTRIES) <= _DRIVER_ROW_CAP, (
    f"{len(ALL_ENTRIES)} registry entries exceed the driver's "
    f"{_DRIVER_ROW_CAP}-row CORRECTNESS cap — consolidate before adding"
)


def queries():
    return {name: fn for name, (fn, _sql) in ALL_ENTRIES.items()}


def oracle_sql():
    return {name: sql for name, (_fn, sql) in ALL_ENTRIES.items() if sql is not None}
