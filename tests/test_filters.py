"""Metadata filter selectors (repo: exact, path: prefix): qsyntax
extraction, serve-side doc-value compilation in every mode, Lucene
filter-context score invariance (post-filter oracle), Spark bulk twin,
daemon e2e."""
import numpy as np
import pytest

from horus_ner_spark.index.qsyntax import parse_query
from horus_ner_spark.index.serve import IndexServer


@pytest.fixture(scope="module")
def server(sf001_index):
    _cp, paths = sf001_index
    return IndexServer(paths.root)


@pytest.fixture(scope="module")
def sample_meta(server):
    """A (repo, path-prefix) actually present in the fixture corpus,
    chosen so the filter keeps some docs and drops some."""
    ids, codes, cats = server._doc_values("repo")
    # most common repo -> guaranteed non-trivial match set
    top = int(np.bincount(codes).argmax())
    repo = cats[top]
    pids, pcodes, pcats = server._doc_values("path")
    prefix = pcats[0].split("/")[0] + "/"
    return repo, prefix


def test_parse_query_extracts_filters():
    p = parse_query("repo:org0/proj1 cache buffer")
    assert p.filters == (("repo", "org0/proj1"),)
    assert p.query_text == "cache buffer" and p.mode == "OR"
    p = parse_query("path:src/ cache AND stream")
    assert p.filters == (("path", "src/"),) and p.mode == "AND"
    p = parse_query('repo:r path:p/ "parse config"')
    assert p.mode == "PHRASE"
    assert p.filters == (("path", "p/"), ("repo", "r"))
    p = parse_query("repo:r (cache OR buffer)")
    assert p.mode == "BOOL" and p.filters == (("repo", "r"),)
    with pytest.raises(ValueError):
        parse_query("repo:a repo:b cache")
    with pytest.raises(ValueError):
        parse_query("repo:onlyfilter")  # nothing left to match


def _post_filter_oracle(server, query, mode, repo=None, prefix=None,
                        k=10, **kw):
    """Unfiltered search with a huge k, post-filtered on doc metadata,
    re-cut to k — valid because filters must not change scores."""
    big = server.search(query, "python", k=100_000, mode=mode, **kw)
    if big.empty:
        return big
    keys = server.doc_keys(big["doc_id"]).set_index("doc_id")
    keep = []
    for r in big.itertuples():
        m = keys.loc[int(r.doc_id)]
        if repo is not None and m["repo"] != repo:
            continue
        if prefix is not None and not str(m["path"]).startswith(prefix):
            continue
        keep.append((int(r.doc_id), float(r.score)))
    keep.sort(key=lambda e: (-e[1], e[0]))
    return keep[:k]


@pytest.mark.parametrize("mode,query,kw", [
    ("OR", "cache buffer stream", {}),
    ("AND", "cache stream", {}),
    ("NEAR", "cache node", {"slop": 8}),
    ("PHRASE", "parse config", {}),
    ("BOOL", "(cache OR buffer) AND stream", {}),
])
def test_filters_match_post_filter_oracle(server, sample_meta, mode,
                                          query, kw):
    repo, prefix = sample_meta
    for filt, rkw in [
        ({"repo": repo}, {"repo": repo}),
        ({"path": prefix}, {"prefix": prefix}),
        ({"repo": repo, "path": prefix}, {"repo": repo, "prefix": prefix}),
    ]:
        got = server.search(query, "python", k=10, mode=mode,
                            filters=filt, **kw)
        want = _post_filter_oracle(server, query, mode, k=10, **rkw, **kw)
        assert [int(d) for d in got["doc_id"]] == [d for d, _ in want], \
            (mode, filt)
        np.testing.assert_allclose(
            got["score"].to_numpy(dtype=float),
            [s for _, s in want], rtol=1e-9,
        )


def test_filters_all_hits_satisfy_filter(server):
    # pick (repo, path-prefix) from an actual hit so the conjunction of
    # both filters is non-empty by construction
    hit0 = server.search("cache buffer stream", "python", k=1, mode="OR")
    meta = server.doc_keys(hit0["doc_id"]).iloc[0]
    repo = meta["repo"]
    prefix = str(meta["path"]).split("/")[0] + "/"
    got = server.search("cache buffer stream", "python", k=50, mode="OR",
                        filters={"repo": repo, "path": prefix})
    assert not got.empty
    keys = server.doc_keys(got["doc_id"])
    assert (keys["repo"] == repo).all()
    assert keys["path"].str.startswith(prefix).all()


def test_filters_unknown_values_and_errors(server):
    out = server.search("cache", "python", k=10, mode="OR",
                        filters={"repo": "no/such-repo"})
    assert out.empty
    with pytest.raises(ValueError):
        server.search("cache", "python", filters={"commit": "x"})
    with pytest.raises(ValueError):
        server.search("cache", "python", filters={"repo": ""})


def test_filters_search_text_and_facets(server, sample_meta):
    repo, _ = sample_meta
    via_text = server.search_text(f"repo:{repo} cache buffer", k=10)
    direct = server.search("cache buffer", "python", k=10, mode="OR",
                           filters={"repo": repo})
    assert list(via_text["doc_id"]) == list(direct["doc_id"])
    f = server.facets("cache buffer", "python", mode="OR", by=("repo",),
                      filters={"repo": repo})
    assert set(f["value"]) <= {repo}
    unf = server.facets("cache buffer", "python", mode="OR", by=("repo",))
    row = unf[unf["value"] == repo]
    assert int(f["n_docs"].sum()) == int(row["n_docs"].sum())


def test_bm25_bool_filters_match_serve(spark, sf001_index, server,
                                       sample_meta):
    from horus_ner_spark.index.query import bm25_bool

    repo, prefix = sample_meta
    _cp, paths = sf001_index
    expr = "(cache OR buffer) AND stream"
    filt = {"repo": repo, "path": prefix}
    got = bm25_bool(spark, paths, expr, "python", k=10,
                    filters=filt).toPandas()
    want = server.search(expr, "python", k=10, mode="BOOL", filters=filt)
    assert [int(d) for d in got["doc_id"]] == \
        [int(d) for d in want["doc_id"]]
    np.testing.assert_allclose(
        got["score"].to_numpy(dtype=float),
        want["score"].to_numpy(dtype=float), rtol=1e-9,
    )


def test_filters_via_daemon(server, sf001_index, sample_meta):
    from horus_ner_spark.daemon import ServeDaemon

    from tests.test_daemon import _post

    repo, _ = sample_meta
    _cp, paths = sf001_index
    daemon = ServeDaemon(paths.root).start()
    try:
        # freeform selector and explicit filters object agree
        code, via_q = _post(daemon.port, "/search",
                            {"q": f"repo:{repo} cache buffer", "k": 10})
        assert code == 200
        code, via_f = _post(
            daemon.port, "/search",
            {"query_text": "cache buffer", "mode": "OR", "k": 10,
             "filters": {"repo": repo}},
        )
        assert code == 200
        assert via_q["results"] == via_f["results"]
        want = server.search("cache buffer", "python", 10, "OR",
                             filters={"repo": repo})
        assert [r["doc_id"] for r in via_f["results"]] == \
            [int(d) for d in want["doc_id"]]
    finally:
        daemon.shutdown()


def test_search_batch_routes_bool_and_filters(server, sample_meta):
    repo, _ = sample_meta
    out = server.search_batch([
        {"query_id": 0, "query_text": "(cache OR buffer) AND stream",
         "mode": "BOOL", "k": 10},
        {"query_id": 1, "query_text": "cache buffer", "mode": "OR",
         "k": 10, "filters": {"repo": repo}},
        {"query_id": 2, "query_text": "cache buffer", "mode": "OR",
         "k": 10},
    ])
    want0 = server.search("(cache OR buffer) AND stream", "python", 10,
                          "BOOL")
    want1 = server.search("cache buffer", "python", 10, "OR",
                          filters={"repo": repo})
    want2 = server.search("cache buffer", "python", 10, "OR")
    for qid, want in [(0, want0), (1, want1), (2, want2)]:
        got = out[out["query_id"] == qid]
        assert list(got["doc_id"]) == list(want["doc_id"]), qid


def test_selectors_not_extracted_inside_quotes():
    """'\"see path:src/ docs\"' is a literal phrase — the selector regex
    must never mutate quoted text (review fix)."""
    p = parse_query('"see path:src/ docs"')
    assert p.mode == "PHRASE"
    assert p.query_text == "see path:src/ docs"
    assert p.filters == ()
    # selectors OUTSIDE the quotes still work alongside a phrase
    p = parse_query('repo:org1/p "see path:src/ docs"')
    assert p.mode == "PHRASE"
    assert p.query_text == "see path:src/ docs"
    assert p.filters == (("repo", "org1/p"),)
    # lang: has the same protection
    p = parse_query('"use lang:python here"')
    assert p.mode == "PHRASE" and p.lang == "python"
    assert p.query_text == "use lang:python here"


def test_bulk_kernels_reject_filters(spark, sf001_index):
    from horus_ner_spark.index.query import bm25_bruteforce, bm25_wand

    _cp, paths = sf001_index
    q = [{"query_id": 0, "query_text": "cache", "k": 5,
          "filters": {"repo": "r"}}]
    with pytest.raises(ValueError, match="metadata filters"):
        bm25_wand(spark, paths, q)
    with pytest.raises(ValueError, match="metadata filters"):
        bm25_bruteforce(spark, paths, q)


def test_daemon_rejects_nonstring_filters(sf001_index):
    import urllib.error

    from horus_ner_spark.daemon import ServeDaemon

    from tests.test_daemon import _post

    _cp, paths = sf001_index
    daemon = ServeDaemon(paths.root).start()
    try:
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(daemon.port, "/search",
                  {"query_text": "cache", "k": 5,
                   "filters": {"repo": 123}})
        assert exc.value.code == 400
        # daemon survives; valid request still works
        code, _ = _post(daemon.port, "/search",
                        {"query_text": "cache", "k": 5})
        assert code == 200
    finally:
        daemon.shutdown()


def test_filter_exclusion_cache_reused(server, sample_meta):
    repo, _ = sample_meta
    server._filter_cache.clear()
    a = server.search("cache", "python", k=5, filters={"repo": repo})
    assert ("repo", repo) in server._filter_cache
    cached = server._filter_cache[("repo", repo)]
    b = server.search("buffer", "python", k=5, filters={"repo": repo})
    assert server._filter_cache[("repo", repo)] is cached
    assert not a.empty or not b.empty
