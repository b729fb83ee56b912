"""Build/query robustness at the corpus edges: empty content, whitespace,
entity-laden, unicode, and single-doc corpora must index and answer without
crashing, and zero-token docs count in n_docs but never match."""

import pandas as pd

from horus_ner_spark.index.build import build_index
from horus_ner_spark.index.query import bm25_bruteforce, bm25_wand
from horus_ner_spark.index.serve import IndexServer


def test_edge_corpus_builds_and_answers(spark, tmp_path):
    docs = pd.DataFrame(
        {
            "repo": ["r"] * 6,
            "path": [f"f{i}" for i in range(6)],
            "commit": ["c"] * 6,
            "lang": ["python"] * 6,
            "content": [
                "",                              # zero tokens
                "   \n\t  ",                     # whitespace only
                "def return import",             # fully stoplisted -> zero tokens
                "café naïve Ünicode tokens",  # accents
                "cats &amp; dogs &lt;tag&gt;",   # entities
                "parse_config read_buffer parse_config",
            ],
        }
    )
    cp = str(tmp_path / "c.parquet")
    spark.createDataFrame(docs).write.parquet(cp)
    paths = build_index(spark, cp, str(tmp_path / "ix"))

    stats = spark.read.parquet(paths.corpus_stats).collect()[0]
    assert stats["n_docs"] == 6  # zero-token docs still count
    # avgdl over ALL docs: 4 (accents) + 3 (entities) + 6 (split compounds
    # x2 occurrences each) kept tokens across the 6 docs
    assert abs(float(stats["avgdl"]) - 13 / 6) < 1e-9

    for q, expect in [
        ("parse_config", 1),
        ("cats dogs", 1),
        ("cafe", 1),              # accent-stripped match
        ("def return", 0),        # stoplisted query -> no terms
        ("nosuchtoken", 0),
    ]:
        res = bm25_wand(
            spark, paths,
            [{"query_id": 1, "query_text": q, "lang": "python", "k": 10}],
        ).collect()
        brute = bm25_bruteforce(
            spark, paths,
            [{"query_id": 1, "query_text": q, "lang": "python", "k": 10}],
        ).collect()
        assert len(res) == expect, q
        assert [tuple(r) for r in res] == [tuple(r) for r in brute], q

    srv = IndexServer(paths.root)
    assert len(srv.search("parse_config", "python")) == 1
    assert len(srv.search("", "python")) == 0
    assert len(srv.search("cats &amp; dogs", "python", mode="PHRASE")) == 1


def test_single_doc_corpus(spark, tmp_path):
    docs = pd.DataFrame(
        {
            "repo": ["r"], "path": ["f"], "commit": ["c"],
            "lang": ["python"], "content": ["hello world hello"],
        }
    )
    cp = str(tmp_path / "c.parquet")
    spark.createDataFrame(docs).write.parquet(cp)
    paths = build_index(spark, cp, str(tmp_path / "ix"))
    res = bm25_wand(
        spark, paths,
        [{"query_id": 1, "query_text": "hello", "lang": "python", "k": 5}],
    ).collect()
    assert len(res) == 1 and res[0]["rank"] == 1
