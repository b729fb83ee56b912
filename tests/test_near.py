"""NEAR (positional proximity) mode: differential-tested against a
brute-force tokenization truth, with set relationships to PHRASE/AND and
engine-path equality (serve == bm25_wand == bm25_distributed)."""

import numpy as np
import pandas as pd
import pytest

from horus_ner_spark.functions.tokenizer import tokenize
from horus_ner_spark.index.query import (
    _near_window_match,
    bm25_distributed,
    bm25_wand,
)
from horus_ner_spark.index.serve import IndexServer

QUERIES = [
    {"query_id": 1, "query_text": "parse config", "lang": "python",
     "k": 2000, "mode": "NEAR", "slop": 4},
    {"query_id": 2, "query_text": "hash join merge", "lang": "python",
     "k": 2000, "mode": "NEAR", "slop": 8},
    {"query_id": 3, "query_text": "stream buffer", "lang": "python",
     "k": 2000, "mode": "NEAR", "slop": 2},
]


def test_near_window_match_unit():
    a = np.array([5, 40])
    b = np.array([9, 100])
    assert _near_window_match([a, b], 4)       # 5..9 span 4
    assert not _near_window_match([a, b], 3)   # no tighter window
    # three lists, only the middle occurrence works
    c = np.array([7])
    assert _near_window_match([a, b, c], 4)
    assert not _near_window_match([a, b, np.array([200])], 50)
    # single list: any occurrence matches
    assert _near_window_match([a], 0)


def _brute_near(corpus_pdf: pd.DataFrame, query: dict) -> set[int]:
    """Truth: token-stream window check straight off the corpus text."""
    terms = sorted(set(tokenize(query["query_text"], query["lang"])))
    out = set()
    for row in corpus_pdf.itertuples(index=False):
        toks = tokenize(row.content, row.lang)
        pos = {
            t: np.flatnonzero(np.array(toks, dtype=object) == t)
            for t in terms
        }
        if any(len(p) == 0 for p in pos.values()):
            continue
        if _near_window_match([pos[t] for t in terms], query["slop"]):
            out.add(int(row.doc_id))
    return out


@pytest.fixture(scope="module")
def corpus_with_ids(spark, sf001_index):
    corpus_path, paths = sf001_index
    from horus_ner_spark.index.build import with_doc_id

    pdf = with_doc_id(spark.read.parquet(corpus_path)).select(
        "doc_id", "lang", "content"
    ).toPandas()
    return pdf, paths


def test_near_matches_bruteforce_and_path_equality(spark, corpus_with_ids):
    pdf, paths = corpus_with_ids
    srv = IndexServer(paths.root)
    wand = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in bm25_wand(spark, paths, QUERIES).collect()
    }
    dist = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in bm25_distributed(spark, paths, QUERIES).collect()
    }
    assert wand == dist  # distributed fan-out == single-kernel path
    any_hits = False
    for q in QUERIES:
        truth = _brute_near(pdf, q)
        got = srv.search(
            q["query_text"], q["lang"], k=q["k"], mode="NEAR",
            slop=q["slop"],
        )
        assert set(int(d) for d in got["doc_id"]) == truth, q["query_id"]
        any_hits = any_hits or bool(truth)
        # serve == wand (same rows, same scores)
        wq = {d: s for (qid, d), s in wand.items() if qid == q["query_id"]}
        assert {int(d): float(s) for d, s in
                zip(got["doc_id"], got["score"])} == wq
    assert any_hits, "fixture corpus produced no NEAR matches at all"


def test_near_set_relationships(spark, corpus_with_ids):
    _pdf, paths = corpus_with_ids
    srv = IndexServer(paths.root)
    text, lang = "parse_config", "python"
    phrase = set(
        int(d) for d in srv.search(text, lang, k=2000, mode="PHRASE")["doc_id"]
    )
    n_toks = len(tokenize(text, lang))
    near = set(
        int(d) for d in srv.search(
            text, lang, k=2000, mode="NEAR", slop=max(1, n_toks - 1)
        )["doc_id"]
    )
    conj = set(
        int(d) for d in srv.search(text, lang, k=2000, mode="AND")["doc_id"]
    )
    assert phrase and phrase <= near <= conj
