"""functions/xxhash.py must be bit-identical to Spark's xxhash64 — the
small-segment build path derives doc_ids with it, and a single differing
bit would silently fork a document's identity between build paths."""

import random
import string

from pyspark.sql import functions as F

from horus_ner_spark.functions.xxhash import (
    doc_ids_from_cols,
    spark_xxhash64_str_cols,
)


def test_xxhash64_matches_spark_all_tail_lengths(spark):
    rng = random.Random(7)
    rows = []
    # every tail-length class of the XXH64 algorithm: 0..49 covers the
    # <32 path and all (8/4/1)-byte tail combinations; 63/64/100/1000
    # cover the 32-byte stripe loop and its boundaries
    for n in list(range(0, 50)) + [63, 64, 100, 1000]:
        s = "".join(rng.choice(string.printable[:94]) for _ in range(n))
        rows.append((s, "p/" + s[:5], "c" + s[-7:]))
    rows += [
        ("répo/üml", "päth/ß", "cömmit"),          # multi-byte utf-8
        ("日本語リポ", "path/日本", "コミット"),
        ("", "", ""),
    ]
    df = spark.createDataFrame(rows, "repo string, path string, commit string")
    got = df.select(
        F.xxhash64("repo").alias("h1"),
        F.xxhash64("repo", "path", "commit").alias("h3"),
        "repo", "path", "commit",
    ).collect()
    for r in got:
        assert spark_xxhash64_str_cols(r["repo"]) == r["h1"], repr(r["repo"])
        assert (
            spark_xxhash64_str_cols(r["repo"], r["path"], r["commit"])
            == r["h3"]
        )
    # vector form agrees with the scalar chain
    ids = doc_ids_from_cols(
        [r["repo"] for r in got],
        [r["path"] for r in got],
        [r["commit"] for r in got],
    )
    assert list(ids) == [r["h3"] for r in got]


def test_xxhash64_null_columns_match_spark(spark):
    """Spark's xxhash64 SKIPS null inputs (running hash unchanged); a
    null commit/path row must therefore hash identically through the
    local path — it previously crashed on ``None.encode`` and, had it
    not, would have forked the doc identity between build paths."""
    rows = [
        ("r0", "a.py", None),
        ("r1", None, "c1"),
        (None, None, None),
        ("r2", "b.py", "c2"),
    ]
    df = spark.createDataFrame(rows, "repo string, path string, commit string")
    got = df.select(
        F.xxhash64("repo", "path", "commit").alias("h3"),
        "repo", "path", "commit",
    ).collect()
    for r in got:
        assert (
            spark_xxhash64_str_cols(r["repo"], r["path"], r["commit"])
            == r["h3"]
        ), rows
    ids = doc_ids_from_cols(
        [r["repo"] for r in got],
        [r["path"] for r in got],
        [r["commit"] for r in got],
    )
    assert list(ids) == [r["h3"] for r in got]
