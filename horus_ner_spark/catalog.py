"""Table IO indirection — plain Parquet by default, Iceberg by config.

The north rule targets Iceberg tables; this sandbox ships no Iceberg
runtime jar, so the engine runs on directory-partitioned Parquet with the
SAME layout semantics (partition columns, sorted files) and this module is
the single switch point.  On a real cluster set:

    export HORUS_TABLE_FORMAT=iceberg
    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<v> \
      --conf spark.sql.catalog.horus=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.horus.type=hadoop \
      --conf spark.sql.catalog.horus.warehouse=<warehouse-uri> ...

and pass table identifiers (``horus.db.postings``) instead of paths.  The
Parquet branch is what every test exercises; the Iceberg branch is the
config-documented equivalent (partitionBy -> partitioned table,
overwrite -> createOrReplace, append -> append) and fails fast with a
clear error when the runtime is absent.

Note: the low-latency server (index/serve.py) reads Parquet layouts
directly with pyarrow, and the build's manifest fingerprints + metrics
resolve file lists via ``list_data_files``; under Iceberg these would go
through pyiceberg / ``ref.files`` metadata instead — same pruning,
different manifest source.  Components that need that routing call
``require_path_refs`` and fail fast with a clear error under a non-path
table format instead of mis-reading identifiers as paths.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

FORMAT_ENV = "HORUS_TABLE_FORMAT"


def table_format() -> str:
    return os.environ.get(FORMAT_ENV, "parquet").lower()


def require_path_refs(what: str) -> None:
    """Fail fast when a component that resolves file layouts directly
    (manifest fingerprints, footer-metadata metrics, the pyarrow serving
    path) runs under a table format whose refs are not filesystem paths.

    Under Iceberg these reads would come from the table's own metadata
    (``SELECT ... FROM ref.files`` / pyiceberg manifests) — that routing
    needs the Iceberg runtime, which this sandbox does not ship, so the
    honest behavior is a clear error instead of mis-reading a path."""
    if table_format() != "parquet":
        raise NotImplementedError(
            f"{what} resolves parquet file layouts directly; under "
            f"HORUS_TABLE_FORMAT={table_format()!r} it must be routed "
            "through the table format's metadata (e.g. Iceberg `ref.files`)."
        )


def list_data_files(ref: str, suffix: str | None = None) -> list[tuple[str, int]]:
    """Sorted (relative path, size) of a table's data files — the single
    listing primitive used by manifest fingerprints and metrics, so only
    this function needs reimplementing per storage/format."""
    require_path_refs("list_data_files")
    out: list[tuple[str, int]] = []
    for root, _dirs, files in os.walk(ref):
        for f in files:
            if f.startswith(("_", ".")):
                continue
            if suffix is not None and not f.endswith(suffix):
                continue
            p = os.path.join(root, f)
            out.append((os.path.relpath(p, ref), os.path.getsize(p)))
    out.sort()
    return out


def read_table(spark: SparkSession, ref: str) -> DataFrame:
    """Read a table by path (parquet) or identifier (iceberg)."""
    if table_format() == "iceberg":
        return spark.read.table(ref)
    return spark.read.parquet(ref)


def write_table(
    df: DataFrame,
    ref: str,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
) -> None:
    """Write ``df`` to ``ref`` preserving the engine's layout contract:
    partition columns become directory/identity partitions; any
    sortWithinPartitions applied upstream is preserved by both writers."""
    if table_format() == "iceberg":
        from pyspark.sql.functions import col

        w = df.writeTo(ref)
        if partition_by:
            w = w.partitionedBy(*[col(c) for c in partition_by])
        if mode == "overwrite":
            w.createOrReplace()
        elif mode == "append":
            w.append()
        else:
            raise ValueError(f"unsupported mode for iceberg: {mode}")
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(ref)
