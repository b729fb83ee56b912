"""Facet counts over the full match set (hits per lang / repo) — the
code-search result-page aggregation, on both surfaces: serve-side
in-memory doc-values (IndexServer.facets) and the Spark bulk twin
(query.facet_counts).  Oracle: pure-pandas recomputation from the
uncompressed tf table + docs metadata.

Reference analog: the reference aggregates per-term evidence counts
across its retrieved documents (src/core/feature_extraction/features.py
class-vote counting); for an index the user-facing analog is facet
counts over the match set."""

import pandas as pd
import pyarrow.parquet as pq
import pytest

from horus_ner_spark.functions.tokenizer import tokenize
from horus_ner_spark.index.query import facet_counts, rewrite_prefix_queries
from horus_ner_spark.index.serve import IndexServer


def _tables(paths):
    tf = pq.read_table(paths.tf, columns=["doc_id", "term"]).to_pandas()
    docs = pq.read_table(
        paths.docs, columns=["doc_id", "lang", "repo"]
    ).to_pandas()
    return tf, docs


def _oracle(paths, match_docs, by=("lang", "repo")):
    _tf, docs = _tables(paths)
    sub = docs[docs["doc_id"].isin(match_docs)]
    rows = []
    for col in by:
        for v, n in sub[col].value_counts().items():
            rows.append((col, str(v), int(n)))
    return sorted(rows)


def _match_or(tf, terms):
    return set(tf[tf["term"].isin(terms)]["doc_id"])


def _got(df):
    return sorted(
        (str(r.facet), str(r.value), int(r.n_docs)) for r in df.itertuples()
    )


def test_or_facets_match_pandas_oracle(sf001_index):
    _cp, paths = sf001_index
    srv = IndexServer(paths.root)
    tf, _docs = _tables(paths)
    terms = sorted(set(tokenize("cache node tree", "python")))
    want = _oracle(paths, _match_or(tf, terms))
    got = srv.facets("cache node tree", mode="OR")
    assert _got(got) == want and len(got)
    # ordering contract: n_docs desc then value asc within each facet
    for col in ("lang", "repo"):
        sub = got[got["facet"] == col]
        keys = [(-int(n), str(v)) for v, n in zip(sub["value"], sub["n_docs"])]
        assert keys == sorted(keys)


def test_and_prefix_group_facets(sf001_index):
    _cp, paths = sf001_index
    srv = IndexServer(paths.root)
    tf, _docs = _tables(paths)
    exp, _ = srv.expand_prefix("st")
    per_doc = tf[tf["term"].isin(["cache"] + exp)].groupby("doc_id")["term"].agg(set)
    match = {d for d, m in per_doc.items()
             if "cache" in m and any(t in m for t in exp)}
    want = _oracle(paths, match)
    got = srv.facets("cache st*", mode="AND")
    assert _got(got) == want and len(got)


def test_not_veto_in_facets(sf001_index):
    _cp, paths = sf001_index
    srv = IndexServer(paths.root)
    tf, _docs = _tables(paths)
    match = _match_or(tf, ["cache"]) - _match_or(tf, ["stream"])
    want = _oracle(paths, match)
    got = srv.facets("cache", mode="OR", exclude_text="stream")
    assert _got(got) == want


def test_spark_bulk_twin_matches_serve(spark, sf001_index):
    _cp, paths = sf001_index
    srv = IndexServer(paths.root)
    qs = [
        {"query_id": 1, "query_text": "cache node tree", "mode": "OR"},
        {"query_id": 2, "query_text": "cache node", "mode": "AND"},
        {"query_id": 3, "query_text": "cache", "mode": "OR",
         "exclude": "stream"},
        {"query_id": 4, "query_text": "cache st*", "mode": "OR"},
    ]
    out = facet_counts(
        spark, paths, rewrite_prefix_queries(spark, paths, qs)
    ).toPandas()
    serve_by_qid = {
        1: srv.facets("cache node tree", mode="OR"),
        2: srv.facets("cache node", mode="AND"),
        3: srv.facets("cache", mode="OR", exclude_text="stream"),
        4: srv.facets("cache st*", mode="OR"),
    }
    for qid, want_df in serve_by_qid.items():
        sub = out[out["query_id"] == qid][["facet", "value", "n_docs"]]
        assert _got(sub) == _got(want_df), f"query {qid}"
        assert len(sub)


def test_multisegment_facets_live_copy_only(sf001_index):
    _cp, paths = sf001_index
    single = IndexServer(paths.root)
    multi = IndexServer([paths.root, paths.root])
    got_s = single.facets("cache node tree", mode="OR")
    got_m = multi.facets("cache node tree", mode="OR")
    assert _got(got_s) == _got(got_m)


def test_facets_errors_and_empty(sf001_index):
    _cp, paths = sf001_index
    srv = IndexServer(paths.root)
    with pytest.raises(ValueError, match="OR/AND"):
        srv.facets("cache node", mode="PHRASE")
    with pytest.raises(ValueError, match="unknown facet column"):
        srv.facets("cache", by=("commit",))
    # "path" became a legal doc-values column with the metadata-filter
    # feature (filters={"path": prefix}); faceting by it works too
    assert len(srv.facets("cache node", by=("path",))) > 0
    assert len(srv.facets("qqqzzz", mode="OR")) == 0


def test_daemon_facets_e2e(sf001_index):
    import json
    import urllib.request

    from horus_ner_spark.daemon import ServeDaemon

    _cp, paths = sf001_index
    daemon = ServeDaemon(paths.root).start()
    try:
        srv = IndexServer(paths.root)
        body = json.dumps({
            "query_text": "cache node tree", "mode": "OR", "k": 5,
            "facets": ["lang", "repo"],
        }).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{daemon.port}/search", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=30) as r:
            resp = json.loads(r.read())
        want = srv.facets("cache node tree", mode="OR").to_dict(
            orient="records"
        )
        assert resp["facets"] == want and len(want)
        assert len(resp["results"]) == 5
        # second call serves facets from the request cache (same payload)
        with urllib.request.urlopen(
            urllib.request.Request(
                f"http://127.0.0.1:{daemon.port}/search", data=body,
                headers={"Content-Type": "application/json"},
            ), timeout=30,
        ) as r:
            assert json.loads(r.read())["facets"] == want
    finally:
        daemon.shutdown()


def test_facet_counts_rejects_phrase(spark, sf001_index):
    _cp, paths = sf001_index
    with pytest.raises(ValueError, match="OR/AND only"):
        facet_counts(spark, paths,
                     [{"query_id": 1, "query_text": "a b",
                       "mode": "PHRASE"}])
