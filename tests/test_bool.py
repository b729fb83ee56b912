"""Parenthesized boolean queries: parser unit tests, algebraic
differentials against the flat (already rank-equality-verified) modes,
and a sum-of-term-scores oracle built from per-term searches."""
import numpy as np
import pandas as pd
import pytest

from horus_ner_spark.index.boolexpr import (
    AndNode,
    Leaf,
    NotNode,
    OrNode,
    parse_bool,
    positive_leaves,
)
from horus_ner_spark.index.qsyntax import parse_query
from horus_ner_spark.index.serve import IndexServer


# ── parser ───────────────────────────────────────────────────────────────


def test_parse_structures():
    assert parse_bool("cache") == Leaf("cache")
    assert parse_bool("(cache)") == Leaf("cache")
    assert parse_bool("a b") == OrNode((Leaf("a"), Leaf("b")))
    assert parse_bool("a OR b") == OrNode((Leaf("a"), Leaf("b")))
    assert parse_bool("a AND b AND c") == AndNode(
        (Leaf("a"), Leaf("b"), Leaf("c"))
    )
    assert parse_bool("(a OR b) AND c") == AndNode(
        (OrNode((Leaf("a"), Leaf("b"))), Leaf("c"))
    )
    # precedence: AND binds tighter than OR
    assert parse_bool("a AND b OR c") == OrNode(
        (AndNode((Leaf("a"), Leaf("b"))), Leaf("c"))
    )
    assert parse_bool("a AND NOT b") == AndNode(
        (Leaf("a"), NotNode(Leaf("b")))
    )
    assert parse_bool("a AND -b") == AndNode((Leaf("a"), NotNode(Leaf("b"))))
    assert parse_bool("a AND NOT (b OR c)") == AndNode(
        (Leaf("a"), NotNode(OrNode((Leaf("b"), Leaf("c")))))
    )
    assert positive_leaves(parse_bool("(a OR b) AND c AND NOT d")) == [
        "a", "b", "c",
    ]


@pytest.mark.parametrize("bad", [
    "",
    "(",
    ")",
    "(a",
    "a)",
    "a AND",
    "AND a",
    "a OR",
    "NOT a",                 # pure negative
    "-a",                    # pure negative
    "NOT a AND NOT b",       # conjunction of only NOTs... parses as AND of NOTs
    "a OR NOT b",            # NOT under OR: unbounded candidate set
    "(a b) AND NOT NOT c",   # double negation
    "a b AND c",             # adjacency mixed with AND in one group
    "()",
])
def test_parse_errors(bad):
    with pytest.raises(ValueError):
        parse_bool(bad)


def test_parse_query_routes_bool():
    p = parse_query("(cache OR buffer) AND stream")
    assert p.mode == "BOOL"
    assert p.query_text == "(cache OR buffer) AND stream"
    p = parse_query("lang:go (cache OR buffer)")
    assert p.mode == "BOOL" and p.lang == "go"
    with pytest.raises(ValueError):
        parse_query("(cache OR")  # malformed fails at parse time


# ── execution differentials over the sf0.001 engine corpus ───────────────


@pytest.fixture(scope="module")
def server(sf001_index):
    _cp, paths = sf001_index
    return IndexServer(paths.root)


def _frame_equal(a: pd.DataFrame, b: pd.DataFrame):
    assert list(a["doc_id"]) == list(b["doc_id"])
    np.testing.assert_allclose(
        a["score"].to_numpy(dtype=float),
        b["score"].to_numpy(dtype=float),
        rtol=1e-9,
    )


def test_bool_or_group_equals_flat_or(server):
    flat = server.search("cache buffer", "python", k=10, mode="OR")
    boolq = server.search("(cache OR buffer)", "python", k=10, mode="BOOL")
    _frame_equal(flat, boolq)


def test_bool_and_equals_flat_and(server):
    flat = server.search("cache stream", "python", k=10, mode="AND")
    boolq = server.search("(cache AND stream)", "python", k=10, mode="BOOL")
    _frame_equal(flat, boolq)


def test_bool_and_not_equals_flat_exclude(server):
    flat = server.search("cache", "python", k=10, mode="OR",
                         exclude_text="stream")
    boolq = server.search("(cache AND NOT stream)", "python", k=10,
                          mode="BOOL")
    _frame_equal(flat, boolq)


def test_bool_prefix_group_equals_flat_grouped_and(server):
    flat = server.search("cach* stream", "python", k=10, mode="AND")
    boolq = server.search("(cach* AND stream)", "python", k=10, mode="BOOL")
    _frame_equal(flat, boolq)


def _term_scores(server, term, lang="python"):
    """doc_id -> BM25 contribution of one term (exhaustive, k huge)."""
    df = server.search(term, lang, k=100_000, mode="OR")
    return dict(zip(df["doc_id"].astype(int), df["score"].astype(float)))


def _oracle_topk(term_scores_list, match_docs, k=10):
    rows = []
    for d in sorted(match_docs):
        s = sum(ts.get(d, 0.0) for ts in term_scores_list)
        rows.append((d, s))
    rows.sort(key=lambda e: (-e[1], e[0]))
    return rows[:k]


def test_bool_nested_vs_per_term_oracle(server):
    """((cache AND node) OR (encode AND decode)) AND NOT mutex — match
    set from per-term doc sets, scores = sum over positive terms."""
    terms = ["cache", "node", "encode", "decode", "mutex"]
    ts = {t: _term_scores(server, t) for t in terms}
    docs = {t: set(s) for t, s in ts.items()}
    match = (
        ((docs["cache"] & docs["node"])
         | (docs["encode"] & docs["decode"]))
        - docs["mutex"]
    )
    assert match, "fixture corpus should produce a non-empty match set"
    want = _oracle_topk(
        [ts["cache"], ts["node"], ts["encode"], ts["decode"]], match, k=10
    )
    got = server.search(
        "((cache AND node) OR (encode AND decode)) AND NOT mutex",
        "python", k=10, mode="BOOL",
    )
    assert [int(d) for d in got["doc_id"]] == [d for d, _ in want]
    # oracle sums ROUNDED per-term scores (search emits 6-decimal
    # scores), so allow that rounding to accumulate
    np.testing.assert_allclose(
        got["score"].to_numpy(dtype=float),
        [s for _, s in want], atol=5e-6,
    )


def test_bool_not_group_subtracts(server):
    ts = {t: _term_scores(server, t) for t in ("cache", "node", "tree")}
    docs = {t: set(s) for t, s in ts.items()}
    match = docs["cache"] - (docs["node"] | docs["tree"])
    want = _oracle_topk([ts["cache"]], match, k=10)
    got = server.search("(cache AND NOT (node OR tree))", "python",
                        k=10, mode="BOOL")
    assert [int(d) for d in got["doc_id"]] == [d for d, _ in want]


def test_bool_multi_token_leaf_requires_all_subtokens(server):
    """A camelCase leaf splits and requires ALL sub-tokens; scoring
    credits each."""
    ts = {t: _term_scores(server, t) for t in ("parse", "config", "stream")}
    docs = {t: set(s) for t, s in ts.items()}
    match = (docs["parse"] & docs["config"]) | docs["stream"]
    want = _oracle_topk(
        [ts["parse"], ts["config"], ts["stream"]], match, k=10
    )
    got = server.search("(parseConfig OR stream)", "python", k=10,
                        mode="BOOL")
    assert [int(d) for d in got["doc_id"]] == [d for d, _ in want]


def test_bool_absent_term_and_empty(server):
    out = server.search("(qqqzzzabsent AND cache)", "python", k=10,
                        mode="BOOL")
    assert out.empty
    out = server.search("(qqqzzzabsent OR cache)", "python", k=10,
                        mode="BOOL")
    flat = server.search("cache", "python", k=10, mode="OR")
    _frame_equal(flat, out)


def test_bool_search_text_and_facets(server):
    via_text = server.search_text("(cache OR buffer) AND stream", k=10)
    direct = server.search("(cache OR buffer) AND stream", "python",
                           k=10, mode="BOOL")
    _frame_equal(direct, via_text)
    f = server.facets("(cache OR buffer) AND stream", "python",
                      mode="BOOL", by=("lang",))
    # facet totals == match-set size
    ts = {t: _term_scores(server, t)
          for t in ("cache", "buffer", "stream")}
    docs = {t: set(s) for t, s in ts.items()}
    n_match = len((docs["cache"] | docs["buffer"]) & docs["stream"])
    assert int(f["n_docs"].sum()) == n_match


def test_bool_rejects_phrase_and_bad_wildcards(server):
    with pytest.raises(ValueError):
        server.search('("cache node" AND stream)', "python", mode="BOOL")
    with pytest.raises(ValueError):
        server.search("(ca*che AND stream)", "python", mode="BOOL")


def test_bool_via_daemon(server, sf001_index):
    """HTTP `q` with parens routes through the boolean planner and
    matches the library surface; malformed boolean input is a 400 that
    doesn't kill the daemon."""
    import urllib.error

    from horus_ner_spark.daemon import ServeDaemon

    from tests.test_daemon import _post

    _cp, paths = sf001_index
    daemon = ServeDaemon(paths.root).start()
    try:
        q = "(cache OR buffer) AND stream"
        code, resp = _post(daemon.port, "/search", {"q": q, "k": 10})
        assert code == 200
        want = [
            {"rank": int(r.rank), "doc_id": int(r.doc_id),
             "score": float(r.score)}
            for r in server.search(q, "python", 10, "BOOL").itertuples()
        ]
        assert resp["results"] == want
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(daemon.port, "/search", {"q": "(cache OR", "k": 5})
        assert exc.value.code == 400
        # still alive after the 400
        code, _resp = _post(daemon.port, "/search", {"q": q, "k": 10})
        assert code == 200
    finally:
        daemon.shutdown()


# ── Spark bulk twin ──────────────────────────────────────────────────────


@pytest.mark.parametrize("expr", [
    "(cache OR buffer) AND stream",
    "((cache AND node) OR (encode AND decode)) AND NOT mutex",
    "(cache AND NOT (node OR tree))",
    "(parseConfig OR stream)",
    "(cach* AND stream)",
    "(qqqzzzabsent OR cache)",
])
def test_bm25_bool_matches_serve(spark, sf001_index, server, expr):
    from horus_ner_spark.index.query import bm25_bool

    _cp, paths = sf001_index
    got = bm25_bool(spark, paths, expr, "python", k=10).toPandas()
    want = server.search(expr, "python", k=10, mode="BOOL")
    assert [int(d) for d in got["doc_id"]] == [int(d) for d in want["doc_id"]]
    np.testing.assert_allclose(
        got["score"].to_numpy(dtype=float),
        want["score"].to_numpy(dtype=float), rtol=1e-9,
    )


def test_bm25_bool_empty_and_errors(spark, sf001_index):
    from horus_ner_spark.index.query import bm25_bool

    _cp, paths = sf001_index
    out = bm25_bool(spark, paths, "(qqqzzzabsent AND cache)", "python", k=10)
    assert out.count() == 0
    with pytest.raises(ValueError):
        bm25_bool(spark, paths, "(cache OR", "python")
    with pytest.raises(ValueError):
        bm25_bool(spark, paths, "(NOT cache)", "python")


def test_bulk_paths_reject_bool_mode(spark, sf001_index):
    """mode=BOOL must never fall through to flat OR scoring on the bulk
    kernels — loud ValueError pointing at bm25_bool."""
    from horus_ner_spark.index.query import bm25_wand

    _cp, paths = sf001_index
    with pytest.raises(ValueError, match="bm25_bool"):
        bm25_wand(spark, paths, [
            {"query_id": 0, "query_text": "(cache OR buffer)",
             "mode": "BOOL", "k": 5},
        ])


def test_quoted_phrase_with_parens_routes_to_phrase():
    """A fully-quoted phrase containing parens is PHRASE, not BOOL
    (review fix: is_bool_query ran before quote handling)."""
    p = parse_query('"(cache node)"')
    assert p.mode == "PHRASE" and p.query_text == "(cache node)"


def test_facets_bool_rejects_quotes(server):
    with pytest.raises(ValueError, match="phrase"):
        server.facets('("cache" AND stream)', "python", mode="BOOL")


def test_bm25_bool_rejects_embedded_wildcard(spark, sf001_index):
    from horus_ner_spark.index.query import bm25_bool

    _cp, paths = sf001_index
    with pytest.raises(ValueError, match="single trailing"):
        bm25_bool(spark, paths, "(ca*che* AND stream)", "python")


def test_snippets_for_bool_query(server, sf001_index):
    """Snippets over a boolean query's hits score lines by the positive
    leaves' expanded terms."""
    cp, _paths = sf001_index
    q = "(cache OR buffer) AND stream AND NOT mutex"
    hits = server.search(q, "python", k=5, mode="BOOL")
    assert not hits.empty
    sn = server.snippets(q, hits["doc_id"], cp)
    assert len(sn) == len(hits)
    assert (sn["n_query_terms"] >= 1).all()
    # each best line actually contains at least one positive query term
    for r in sn.itertuples():
        from horus_ner_spark.functions.tokenizer import tokenize

        line_terms = set(tokenize(r.snippet, "python"))
        assert line_terms & {"cache", "buffer", "stream"}


def test_facet_counts_bool_matches_serve(spark, sf001_index, server,
                                         sample_meta_bool):
    from horus_ner_spark.index.query import facet_counts_bool

    _cp, paths = sf001_index
    expr = "(cache OR buffer) AND stream AND NOT mutex"
    got = facet_counts_bool(spark, paths, expr, "python",
                            by=("lang", "repo")).toPandas()
    want = server.facets(expr, "python", mode="BOOL", by=("lang", "repo"))
    g = sorted(map(tuple, got[["facet", "value", "n_docs"]].itertuples(
        index=False)))
    w = sorted(map(tuple, want[["facet", "value", "n_docs"]].itertuples(
        index=False)))
    assert g == w
    # with a metadata filter too
    repo = sample_meta_bool
    got = facet_counts_bool(spark, paths, expr, "python", by=("repo",),
                            filters={"repo": repo}).toPandas()
    want = server.facets(expr, "python", mode="BOOL", by=("repo",),
                         filters={"repo": repo})
    assert sorted(map(tuple, got.itertuples(index=False))) == \
        sorted(map(tuple, want.itertuples(index=False)))


@pytest.fixture(scope="module")
def sample_meta_bool(server):
    """A repo present in the bool query's match set."""
    hit = server.search("(cache OR buffer) AND stream AND NOT mutex",
                        "python", k=1, mode="BOOL")
    return server.doc_keys(hit["doc_id"]).iloc[0]["repo"]
