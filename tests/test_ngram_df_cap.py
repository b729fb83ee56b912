"""dedup_ngram_jaccard hot-shingle df cap (round-4 verdict item 2).

A boilerplate shingle shared by m docs contributes m^2 rows to the
shingle self-join; the cap drops shingles with df > cap from the
CANDIDATE join (sizes still count them).  These tests assert:

1. adversarial boilerplate: the join input excludes the hot shingle, so
   the candidate-join row count is bounded by cap^2 per shingle, not m^2;
2. pairs whose only overlap is boilerplate disappear; genuinely
   near-duplicate pairs survive with jaccard computed over cold shingles
   (a lower bound of the true jaccard, as documented);
3. Spark and the DuckDB oracle SQL agree row-for-row with the cap active
   (same cap constant baked into both).
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from horus_ner_spark.ops import catalog_text as ct


def _write_docs(spark, tmp_path, rows):
    p = str(tmp_path / "documents.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1) \
        .write.mode("overwrite").parquet(p)
    return str(tmp_path)


BOILER = "license header common to all"  # 3 shingles, shared by every doc


@pytest.fixture(scope="module")
def boiler_dir(spark, tmp_path_factory):
    """40 docs sharing a boilerplate prefix; docs 0/1 are near-dups of
    each other beyond the boilerplate; the rest are pairwise disjoint."""
    tmp = tmp_path_factory.mktemp("ngramcap")
    rows = [
        (0, BOILER + " alpha beta gamma delta epsilon zeta"),
        (1, BOILER + " alpha beta gamma delta epsilon eta"),
    ]
    rows += [
        (i, BOILER + f" uniq{i}a uniq{i}b uniq{i}c uniq{i}d")
        for i in range(2, 40)
    ]
    return _write_docs(spark, tmp, rows)


def test_hot_shingles_excluded_from_join_input(spark, boiler_dir):
    # with cap=8 every boilerplate shingle (df=40) must leave the join
    sh = ct._shingles_df(spark, boiler_dir)
    hot = (
        sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > 8)
    )
    hot_set = {r["shingle"] for r in hot.collect()}
    assert hot_set  # the boilerplate shingles really are hot
    cold = sh.join(hot.select("shingle"), "shingle", "left_anti")
    cold_max_df = (
        cold.groupBy("shingle").count().agg(F.max("count")).collect()[0][0]
    )
    # join input per shingle is bounded by the cap -> per-shingle pair
    # fanout is <= cap^2 instead of n_docs^2
    assert cold_max_df <= 8


def test_boilerplate_only_pairs_dropped_near_dups_survive(spark, boiler_dir):
    out = ct.dedup_ngram_jaccard(spark, boiler_dir, shingle_df_cap=8)
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in out.collect()}
    # docs 2..39 overlap ONLY via boilerplate -> no pair emitted
    assert all({a, b} <= {0, 1} for (a, b) in pairs)
    # the genuine near-dup pair survives; its cold-shingle jaccard is a
    # lower bound of the true jaccard (boilerplate counted in sizes only)
    assert (0, 1) in pairs
    assert 0 < pairs[(0, 1)] <= 1


def test_uncapped_join_is_quadratic_capped_is_not(spark, boiler_dir):
    sh = ct._shingles_df(spark, boiler_dir)
    a, b = sh.alias("a"), sh.alias("b")
    uncapped_pairs = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .count()
    )
    # 40 docs x 3 shared shingles -> >= 3 * C(40,2) = 2340 join rows
    assert uncapped_pairs >= 3 * (40 * 39) // 2
    hot = (
        sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > 8)
    )
    cold = sh.join(hot.select("shingle"), "shingle", "left_anti")
    ca, cb = cold.alias("a"), cold.alias("b")
    capped_pairs = (
        ca.join(cb, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .count()
    )
    assert capped_pairs < 100  # only the uniq-overlap of docs 0/1 remains


def test_spark_matches_duckdb_oracle_with_cap(spark, boiler_dir):
    """The default cap (256) is mirrored verbatim in the oracle SQL; run
    both on a corpus whose hot shingles exceed the default cap."""
    tmp = boiler_dir
    rows = [
        (i, BOILER + f" only{i}x only{i}y only{i}z")
        for i in range(300)  # df(boilerplate) = 300 > 256 default cap
    ]
    rows[1] = (1, BOILER + " only0x only0y zzz")  # near-dup of doc 0
    import tempfile, os
    d = tempfile.mkdtemp()
    sf_dir = _write_docs(spark, __import__("pathlib").Path(d), rows)
    got = sorted(
        tuple(r) for r in ct.dedup_ngram_jaccard(spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    want = sorted(
        tuple(r) for r in con.execute(ct.DEDUP_NGRAM_JACCARD_SQL).fetchall()
    )
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[1] == w[1]
        assert abs(g[2] - w[2]) < 1e-9
