"""Prefix (trailing-*) wildcard queries: dictionary expansion, OR
disjunction semantics, grouped-AND (every plain term + >=1 expansion per
prefix), NOT-prefix veto, and the Spark bulk rewrite — all against
independent oracles built from the uncompressed tf table.

Reference analog: the reference's retrieval surface matches terms
case/shape-insensitively through its search-engine backend
(src/core/feature_extraction/features.py term queries); for a real index
the analog every search user expects is Lucene-style prefix expansion —
top-df dictionary terms under the stem, each contributing its own BM25.
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from horus_ner_spark.functions.tokenizer import tokenize
from horus_ner_spark.index import bm25
from horus_ner_spark.index.query import (
    bm25_bruteforce,
    expand_prefix_spark,
    rewrite_prefix_queries,
)
from horus_ner_spark.index.serve import IndexServer, _split_prefix_tokens

STEM = "st"  # fixture-guaranteed multi-term expansion (start/stop/stream/...)


def _vocab_expansion(paths, stem, cap=32):
    """Independent oracle: the stem's expansion straight from term_stats
    parquet — top-df, ties term-asc."""
    ts = pq.read_table(paths.term_stats, columns=["term", "df"]).to_pylist()
    hits = [(r["term"], int(r["df"])) for r in ts if r["term"].startswith(stem)]
    hits.sort(key=lambda kv: (-kv[1], kv[0]))
    return [t for t, _ in hits[:cap]], len(hits) > cap


def _docs_with_any(paths, terms):
    tf = pq.read_table(paths.tf, columns=["doc_id", "term"])
    mask = pc.is_in(tf["term"], value_set=pa.array(list(terms)))
    return set(pc.filter(tf["doc_id"], mask).to_pylist())


def _rows(df):
    return [(int(r.rank), int(r.doc_id), round(float(r.score), 6))
            for r in df.itertuples()]


def test_expansion_matches_vocabulary_scan(sf001_index):
    _cp, paths = sf001_index
    srv = IndexServer(paths.root)
    got, trunc = srv.expand_prefix(STEM)
    want, wtrunc = _vocab_expansion(paths, STEM)
    assert got == want and trunc == wtrunc
    assert len(got) >= 4  # fixture guarantees a real multi-term expansion
    # cap: top-df selection, truncation reported
    got2, trunc2 = srv.expand_prefix(STEM, max_expansions=2)
    assert got2 == want[:2] and trunc2 is True


def test_expansion_normalizes_stem_like_the_index(sf001_index):
    _cp, paths = sf001_index
    srv = IndexServer(paths.root)
    upper, _ = srv.expand_prefix("St")  # tokenizer lowercases
    plain, _ = srv.expand_prefix("st")
    assert upper == plain


def test_or_prefix_equals_expanded_disjunction(sf001_index):
    """`cache st*` in OR mode is exactly the OR query over cache + every
    expansion (Lucene multi-term semantics) — rank- and score-identical."""
    _cp, paths = sf001_index
    srv = IndexServer(paths.root)
    exp, _ = srv.expand_prefix(STEM)
    # expansions are single-token dictionary terms; assert the explicit
    # query below means what we think it means
    for t in exp:
        assert tokenize(t, "python") == [t]
    got = srv.search(f"cache {STEM}*", mode="OR", k=10)
    want = srv.search(" ".join(["cache"] + exp), mode="OR", k=10)
    assert _rows(got) == _rows(want) and len(got)


def test_grouped_and_against_tf_oracle(sf001_index):
    """AND with a prefix group, checked against a pure-pandas BM25 oracle
    over the uncompressed tf table: hits are exactly the top-k docs
    containing `cache` AND at least one st-term, scored as the sum of
    BM25 contributions over ALL their matching query terms."""
    _cp, paths = sf001_index
    srv = IndexServer(paths.root)
    exp, _ = srv.expand_prefix(STEM)
    terms = ["cache"] + exp
    stats = pq.read_table(paths.corpus_stats).to_pylist()[0]
    n_docs, avgdl = int(stats["n_docs"]), float(stats["avgdl"])
    ts = {r["term"]: int(r["df"])
          for r in pq.read_table(paths.term_stats,
                                 columns=["term", "df"]).to_pylist()}
    tf = pq.read_table(
        paths.tf, columns=["doc_id", "term", "tf", "doclen"]
    ).to_pandas()
    tf = tf[tf["term"].isin(terms)]
    scores: dict[int, float] = {}
    matched: dict[int, set] = {}
    for r in tf.itertuples():
        d = int(r.doc_id)
        scores[d] = scores.get(d, 0.0) + bm25.score_term(
            float(r.tf), ts[r.term], float(r.doclen), n_docs, avgdl
        )
        matched.setdefault(d, set()).add(r.term)
    allowed = [
        d for d, m in matched.items()
        if "cache" in m and any(t in m for t in exp)
    ]
    ranked = sorted(
        ((bm25.quantize(scores[d]), d) for d in allowed),
        key=lambda e: (-e[0], e[1]),
    )[:10]
    want = [(i + 1, d, round(s, 6)) for i, (s, d) in enumerate(ranked)]
    got = srv.search(f"cache {STEM}*", mode="AND", k=10)
    assert _rows(got) == want and len(want)


def test_grouped_and_requires_an_expansion(sf001_index):
    """A doc with the plain terms but NO expansion never ranks: grouped
    AND over a magic-rare prefix returns only docs that truly contain a
    matching term."""
    _cp, paths = sf001_index
    srv = IndexServer(paths.root)
    exp, _ = srv.expand_prefix(STEM)
    hits = srv.search(f"cache {STEM}*", mode="AND", k=50)
    need = _docs_with_any(paths, exp) & _docs_with_any(paths, ["cache"])
    assert all(int(d) in need for d in hits["doc_id"])
    # and a prefix matching nothing empties the conjunction
    assert len(srv.search("cache zzzz*", mode="AND", k=10)) == 0
    # ...but only widens an OR (still the plain-term hits)
    or_hits = srv.search("cache zzzz*", mode="OR", k=10)
    assert _rows(or_hits) == _rows(srv.search("cache", mode="OR", k=10))


def test_not_prefix_equals_postfiltered_full_search(sf001_index):
    _cp, paths = sf001_index
    srv = IndexServer(paths.root)
    exp, _ = srv.expand_prefix("se")
    banned = _docs_with_any(paths, exp)
    full = srv.search("cache node", mode="OR", k=srv.n_docs)
    kept = [(int(r.doc_id), round(float(r.score), 6))
            for r in full.itertuples() if int(r.doc_id) not in banned]
    want = [(i + 1, d, s) for i, (d, s) in enumerate(kept[:10])]
    got = srv.search_text("cache node -se*", k=10)
    assert _rows(got) == want


def test_spark_bulk_rewrite_rank_identical_to_serve(spark, sf001_index):
    _cp, paths = sf001_index
    srv = IndexServer(paths.root)
    # expansion twins agree (same normalization, selection, cap)
    sexp = expand_prefix_spark(spark, paths, STEM)
    assert sexp == srv.expand_prefix(STEM)
    qs = rewrite_prefix_queries(
        spark, paths, [{"query_id": 7, "query_text": f"cache {STEM}*", "k": 10}]
    )
    assert "terms" in qs[0]
    bf = bm25_bruteforce(spark, paths, qs).toPandas()
    got = srv.search(f"cache {STEM}*", mode="OR", k=10)
    assert _rows(got) == [
        (int(r.rank), int(r.doc_id), round(float(r.score), 6))
        for r in bf.itertuples()
    ]


def test_wand_path_prefix_and_exclude_rewrite(spark, sf001_index):
    """The compressed-index bulk path (bm25_wand) serves rewritten prefix
    queries — including a wildcard NOT — rank-identical to serve."""
    from horus_ner_spark.index.query import bm25_wand

    _cp, paths = sf001_index
    srv = IndexServer(paths.root)
    qs = rewrite_prefix_queries(spark, paths, [
        {"query_id": 1, "query_text": f"cache {STEM}*", "k": 8},
        {"query_id": 2, "query_text": "cache node", "k": 8,
         "exclude": "se*"},
    ])
    assert "terms" in qs[0] and "exclude_terms" in qs[1]
    got = bm25_wand(spark, paths, qs).toPandas()
    w1 = got[got["query_id"] == 1][["rank", "doc_id", "score"]]
    w2 = got[got["query_id"] == 2][["rank", "doc_id", "score"]]
    assert _rows(w1) == _rows(srv.search(f"cache {STEM}*", mode="OR", k=8))
    assert _rows(w2) == _rows(
        srv.search("cache node", mode="OR", k=8, exclude_text="se*")
    )


def test_search_batch_routes_wildcards(sf001_index):
    _cp, paths = sf001_index
    srv = IndexServer(paths.root)
    out = srv.search_batch([
        {"query_id": 1, "query_text": f"cache {STEM}*", "mode": "OR", "k": 5},
        {"query_id": 2, "query_text": "cache node", "mode": "OR", "k": 5},
    ])
    one = out[out["query_id"] == 1][["rank", "doc_id", "score"]]
    assert _rows(one) == _rows(srv.search(f"cache {STEM}*", mode="OR", k=5))
    assert (out["query_id"] == 2).sum() == 5


def test_multisegment_prefix_matches_single(sf001_index):
    """Duplicated segment set (all later copies stale) serves prefix
    queries rank- and score-identical to the single segment."""
    _cp, paths = sf001_index
    single = IndexServer(paths.root)
    multi = IndexServer([paths.root, paths.root])
    for mode in ("OR", "AND"):
        assert _rows(multi.search(f"cache {STEM}*", mode=mode, k=10)) == \
            _rows(single.search(f"cache {STEM}*", mode=mode, k=10))


def test_wildcard_errors(sf001_index):
    _cp, paths = sf001_index
    srv = IndexServer(paths.root)
    with pytest.raises(ValueError, match="OR/AND modes only"):
        srv.search(f"{STEM}*", mode="PHRASE")
    with pytest.raises(ValueError, match="OR/AND modes only"):
        srv.search(f"cache {STEM}*", mode="NEAR")
    # a 1-char stem is refused: the tokenizer drops single chars, so it
    # arrives as a 0-sub-token stem (and a kept-but-short stem would hit
    # the O(vocabulary) length guard)
    with pytest.raises(ValueError, match="prefix stem"):
        srv.search("s*", mode="OR")
    with pytest.raises(ValueError, match="trailing character"):
        srv.search("se*ver", mode="OR")
    with pytest.raises(ValueError, match="sub-token"):
        srv.search("parse_json*", mode="OR")  # stem splits: refused loudly
    with pytest.raises(ValueError):
        _split_prefix_tokens("a**")


def test_match_positions_terms_override(sf001_index):
    _cp, paths = sf001_index
    srv = IndexServer(paths.root)
    hits = srv.search(f"cache {STEM}*", mode="AND", k=3, with_positions=True)
    exp, _ = srv.expand_prefix(STEM)
    for p in hits["positions"]:
        assert p  # every hit has at least one matched term with positions
        assert set(p) <= set(exp) | {"cache"}
        assert all(len(v) > 0 for v in p.values())
