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
directly with pyarrow; under Iceberg it would resolve file lists through
pyiceberg instead — same pruning, different manifest source.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

FORMAT_ENV = "HORUS_TABLE_FORMAT"


def table_format() -> str:
    return os.environ.get(FORMAT_ENV, "parquet").lower()


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
