"""Schema-first CSV / JSON IO (SURVEY §2 S3, S4, S10, S13).

Reference analogs:
- feature-file CSV scan with an explicit schema + NA handling
  (reference: src/training/horus_to_conll.py:29 — pandas ``read_csv`` with
  ``na_values`` and explicit dtypes, sep sniffing at :21-24);
- CSV/TSV/JSON matrix export with a header row
  (reference: src/core/feature_extraction/features.py:117-135);
- CoNLL TSV export with blank separator rows between sentences
  (reference: src/training/horus_to_conll.py:117-164).

All paths are plain DataFrameReader/Writer composition — schema-first
(never inferSchema: a schema scan over 10^12 files is a full extra pass,
and silent type drift is worse), FAILFAST by default so malformed rows
surface instead of nulling out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_feature_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    sep: str = ",",
    header: bool = True,
    null_value: str = "",
    mode: str = "FAILFAST",
) -> DataFrame:
    """Schema-first CSV scan.  ``schema`` is a DDL string; column pruning
    and filter pushdown apply as with any file source."""
    return (
        spark.read.schema(schema)
        .option("sep", sep)
        .option("header", header)
        .option("nullValue", null_value)
        .option("mode", mode)
        .csv(path)
    )


def write_csv_export(
    df: DataFrame, path: str, sep: str = ",", header: bool = True,
    null_value: str = "",
) -> None:
    """Header-carrying CSV export (one file per partition — the scalable
    layout; readers glob the directory)."""
    (
        df.write.mode("overwrite")
        .option("sep", sep)
        .option("header", header)
        .option("nullValue", null_value)
        .csv(path)
    )


def write_json_export(df: DataFrame, path: str) -> None:
    """JSON-lines export (one object per row, one file per partition)."""
    df.write.mode("overwrite").json(path)


def read_json_export(spark: SparkSession, path: str, schema: str) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_conll_tsv(
    df: DataFrame, path: str, sep: str = "\t"
) -> None:
    """CoNLL-style TSV export: one ``token<sep>ner`` line per word, a BLANK
    line between sentences (the separator-row reshape of
    horus_to_conll.py:117-164), entirely JVM-side.

    ``df`` must carry (sent_id long, word_idx long, token string, ner
    string).  Sentences never split across output files (one row per
    sentence until the final explode-free write), so every part file is a
    valid CoNLL fragment — the layout distributed consumers expect."""
    lines = (
        df.groupBy("sent_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("word_idx", "token", "ner"))
                    ),
                    lambda x: F.concat_ws(sep, x["token"], x["ner"]),
                ),
                "\n",
            ).alias("sentence")
        )
        .orderBy("sent_id")
        # trailing \n: write.text appends one more -> blank separator row
        .select(F.concat(F.col("sentence"), F.lit("\n")).alias("value"))
    )
    lines.write.mode("overwrite").text(path)
