#!/usr/bin/env python
"""Pre-flight for the driver's CORRECTNESS gate: run every registry entry on
Spark AND its DuckDB oracle at sf0.01 (the driver's SF) and compare with the
driver's own semantics — row count, column-name set, order-insensitive value
hash with columns sorted by name.  Prints one line per entry + a summary.

Usage: python driver_parity_check.py [sf_dir]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


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


def main() -> int:
    from horus_ner_spark.ops.registry import ALL_ENTRIES
    from horus_ner_spark.session import get_spark

    spark = get_spark()
    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    n_pass = n_fail = 0
    failures = []
    for name in sorted(ALL_ENTRIES):
        fn, sql = ALL_ENTRIES[name]
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            if sql is None:
                status = f"rows-only ({len(srows)} rows)"
                n_pass += 1
            else:
                res = duck.execute(sql)
                dcols = [d[0] for d in res.description]
                drows = res.fetchall()
                ok_cols = sorted(scols) == sorted(dcols)
                ok_rows = len(srows) == len(drows)
                ok_vals = ok_cols and ok_rows and _canon(srows, scols) == _canon(drows, dcols)
                if ok_cols and ok_rows and ok_vals:
                    status = f"PASS ({len(srows)} rows)"
                    n_pass += 1
                else:
                    status = f"FAIL cols={ok_cols} rows={ok_rows}({len(srows)}/{len(drows)}) vals={ok_vals}"
                    n_fail += 1
                    failures.append(name)
        except Exception as e:  # noqa: BLE001 — report, keep going
            status = f"ERROR {type(e).__name__}: {e}"
            n_fail += 1
            failures.append(name)
        print(f"{name:32s} {status:40s} {time.perf_counter() - t0:6.2f}s", flush=True)

    print(f"\n{n_pass} pass / {n_fail} fail of {len(ALL_ENTRIES)}")
    if failures:
        print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
