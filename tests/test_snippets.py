"""Snippet extraction: best-matching source line per hit with context —
the code-search result surface (reference analog: annotated spans over the
input text, webservice/rest.py:47-61; for source code the span unit is the
line).

Oracle: an independent pure-Python recompute — split each hit's content
into lines, tokenize each line with the engine tokenizer, count DISTINCT
query terms per line, best = max count with earliest line on ties.  The
per-row content sha256 invariant is enforced: a corpus whose content
drifted from the indexed text fails loudly.
"""

import json
import urllib.request

import pandas as pd
import pytest

from horus_ner_spark.corpus import query_set
from horus_ner_spark.daemon import ServeDaemon
from horus_ner_spark.functions.tokenizer import tokenize
from horus_ner_spark.index.serve import IndexServer

_Q = "cache node tree"


def _oracle_best_line(content: str, terms: set, lang: str):
    """(line_no 1-based, n_distinct_terms) or None."""
    best = None
    for i, line in enumerate(content.split("\n"), start=1):
        n = len(terms & set(tokenize(line, lang)))
        if n > 0 and (best is None or n > best[1]):
            best = (i, n)
    return best


def _corpus_df(corpus_path):
    import pyarrow.dataset as pads

    return pads.dataset(corpus_path).to_table().to_pandas()


def test_snippets_match_independent_oracle(spark, sf001_index):
    cp, paths = sf001_index
    srv = IndexServer(paths.root)
    res = srv.search(_Q, "python", k=10)
    assert len(res) == 10
    sn = srv.snippets(_Q, res["doc_id"], cp, context=1)
    assert list(sn.columns) == ["doc_id", "repo", "path", "line_no",
                                "n_query_terms", "snippet"]
    terms = set(tokenize(_Q, "python"))
    keys = srv.doc_keys(res["doc_id"]).set_index("doc_id")
    corpus = _corpus_df(cp).set_index(["repo", "path", "commit"])
    assert len(sn) > 0
    got = {int(r.doc_id): (int(r.line_no), int(r.n_query_terms))
           for r in sn.itertuples()}
    for did in res["doc_id"].astype("int64"):
        k = keys.loc[int(did)]
        content = corpus.loc[(k["repo"], k["path"], k["commit"])]["content"]
        expected = _oracle_best_line(content, terms, k["lang"])
        assert got.get(int(did)) == expected
        if expected is not None:
            # the snippet window really is content lines around line_no
            lines = content.split("\n")
            ln = expected[0]
            lo, hi = max(0, ln - 2), min(len(lines), ln + 1)
            r = sn[sn["doc_id"] == int(did)].iloc[0]
            assert r["snippet"] == "\n".join(lines[lo:hi])


def test_snippets_sha_invariant_rejects_drifted_corpus(
        spark, sf001_index, tmp_path):
    cp, paths = sf001_index
    srv = IndexServer(paths.root)
    res = srv.search(_Q, "python", k=3)
    corpus = _corpus_df(cp)
    keys = srv.doc_keys(res["doc_id"])
    k0 = keys.iloc[0]
    sel = ((corpus["repo"] == k0["repo"]) & (corpus["path"] == k0["path"])
           & (corpus["commit"] == k0["commit"]))
    assert sel.any()
    corpus.loc[sel, "content"] = corpus.loc[sel, "content"] + "\n# drifted"
    drifted = str(tmp_path / "drifted.parquet")
    corpus.to_parquet(drifted)
    with pytest.raises(RuntimeError, match="sha256 mismatch"):
        srv.snippets(_Q, res["doc_id"], drifted)
    # a corpus MISSING a hit doc also fails loudly, never silently skips
    partial = corpus[~sel]
    missing = str(tmp_path / "partial.parquet")
    partial.to_parquet(missing)
    with pytest.raises(RuntimeError, match="absent from corpus"):
        srv.snippets(_Q, res["doc_id"], missing)


def test_snippets_empty_and_oov(spark, sf001_index):
    cp, paths = sf001_index
    srv = IndexServer(paths.root)
    assert len(srv.snippets(_Q, [], cp)) == 0
    res = srv.search(_Q, "python", k=2)
    # all-stoplisted query text -> no terms -> empty frame, same columns
    out = srv.snippets("the and of", res["doc_id"], cp)
    assert len(out) == 0 and "snippet" in out.columns


def test_daemon_snippets_field(spark, sf001_index):
    cp, paths = sf001_index
    daemon = ServeDaemon(paths.root, corpus=cp).start()
    try:
        def post(obj):
            req = urllib.request.Request(
                f"http://{daemon.host}:{daemon.port}/search",
                data=json.dumps(obj).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=60) as r:
                return json.loads(r.read())

        out = post({"query_text": _Q, "k": 5, "snippets": True})
        assert len(out["results"]) == 5
        srv = IndexServer(paths.root)
        lib = srv.snippets(
            _Q, [r["doc_id"] for r in out["results"]], cp)
        by_doc = {int(r.doc_id): r for r in lib.itertuples()}
        hit_any = False
        for r in out["results"]:
            if r["doc_id"] in by_doc:
                hit_any = True
                exp = by_doc[r["doc_id"]]
                assert r["line_no"] == int(exp.line_no)
                assert r["snippet"] == exp.snippet
        assert hit_any
        # plain search (cached scoring) is unchanged by the snippet pass
        plain = post({"query_text": _Q, "k": 5})
        assert [(r["rank"], r["doc_id"]) for r in plain["results"]] == [
            (r["rank"], r["doc_id"]) for r in out["results"]
        ]
        assert all("snippet" not in r for r in plain["results"])
    finally:
        daemon.shutdown()


def test_snippets_multi_segment_live_copy(spark, tmp_path):
    """A doc updated in a later segment snippets from its LIVE (newest
    live-copy semantics: first-wins across the OLDEST-FIRST tier set means
    the doc's live copy is the one not marked stale)."""
    from horus_ner_spark.corpus import gen_corpus_pandas
    from horus_ner_spark.index.build import build_index

    q = query_set()[0]
    pdf = gen_corpus_pandas(sf=0.001)
    c1 = str(tmp_path / "c1.parquet")
    pdf.to_parquet(c1)
    p1 = build_index(spark, c1, str(tmp_path / "ix1"))
    p2 = build_index(spark, c1, str(tmp_path / "ix2"))
    srv = IndexServer([p1.root, p2.root])
    res = srv.search(q["query_text"], q["lang"], k=5)
    sn = srv.snippets(q["query_text"], res["doc_id"], c1, lang=q["lang"])
    single = IndexServer(p1.root)
    sn1 = single.snippets(q["query_text"], res["doc_id"], c1,
                          lang=q["lang"])
    pd.testing.assert_frame_equal(
        sn.sort_values("doc_id").reset_index(drop=True),
        sn1.sort_values("doc_id").reset_index(drop=True),
    )
