"""SparkSession factory with scale-appropriate defaults.

Tuned for correctness-at-scale, not just the sandbox: AQE on (runtime
coalesce + skew-join), Arrow on (every custom kernel is a pandas UDF),
shuffle partitions sized to cores locally but overridable for a real
cluster via SPARK_CONF_* env or builder args.
"""

from __future__ import annotations

import os
import zipfile

from pyspark.sql import SparkSession

_PKG_MARKER = "_horus_pkg_shipped"


def build_package_zip(zpath: str | None = None) -> str:
    """Zip this package for distribution — the artifact handed to
    ``spark-submit --py-files`` (see submit_job.py) and to addPyFile."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = zpath or os.path.join("/tmp", f"horus_ner_spark_pkg_{os.getpid()}.zip")
    tmp = zpath + ".tmp"  # rebuilt per process so code edits are never stale
    with zipfile.ZipFile(tmp, "w") as z:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    arc = os.path.join(
                        "horus_ner_spark", os.path.relpath(p, pkg_dir)
                    )
                    z.write(p, arc)
    os.replace(tmp, zpath)
    return zpath


def ensure_package_on_executors(spark: SparkSession) -> None:
    """Ship horus_ner_spark to executor Python workers via addPyFile.

    Required whenever the session was created by an external harness whose
    working directory / PYTHONPATH does not include this repo: pandas-UDF
    closures pickle references to this package and unpickle on workers.
    This is the local-mode equivalent of the north rule's
    ``spark-submit --py-files`` distribution. Idempotent per session.
    """
    if getattr(spark, _PKG_MARKER, False):
        return
    spark.sparkContext.addPyFile(build_package_zip())
    setattr(spark, _PKG_MARKER, True)


def get_spark(
    app_name: str = "horus_ner_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cores = cores or os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 32))
        # Spark disables whole-stage codegen for plans wider than
        # maxFields (default 100) — the 128-permutation MinHash signature
        # aggregation silently fell back to interpreted mode (measured
        # 1.9x slower cold, 4x warm at sf0.1, round 5).  256 keeps every
        # plan in this engine inside codegen; the widest is 129 fields.
        .config("spark.sql.codegen.maxFields", "256")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
