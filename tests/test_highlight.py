"""Match-position highlighting: `IndexServer.match_positions` /
`search(with_positions=True)` return, per hit, each query term's token
positions in the document's emitted token stream — the span-annotation
surface (the reference's product is per-token span annotation over input
text, webservice/rest.py:47-61; a search engine's analog is "where did
each term match", which drives snippets/highlighting).

Ground truth: re-tokenize the document content with the SAME tokenizer
the build used and enumerate the emitted stream — positions must match
exactly (the indices PHRASE/NEAR arithmetic runs on).
"""

import json
import urllib.request

import pandas as pd
import pytest

from horus_ner_spark.corpus import query_set
from horus_ner_spark.daemon import ServeDaemon
from horus_ner_spark.functions.tokenizer import tokenize
from horus_ner_spark.index.serve import IndexServer


def _expected_positions(content: str, lang: str, term: str) -> list[int]:
    return [i for i, t in enumerate(tokenize(content, lang)) if t == term]


@pytest.fixture(scope="module")
def content_of(spark, sf001_index):
    corpus_path, _paths = sf001_index
    from horus_ner_spark.index.build import with_doc_id

    rows = with_doc_id(spark.read.parquet(corpus_path)).select(
        "doc_id", "lang", "content"
    ).collect()
    return {int(r["doc_id"]): (r["lang"], r["content"]) for r in rows}


def test_positions_match_retokenized_content(spark, sf001_index, content_of):
    _cp, paths = sf001_index
    srv = IndexServer(paths.root)
    for q in (query_set()[3], query_set()[4]):  # multi-term OR queries
        res = srv.search(q["query_text"], q["lang"], k=10,
                         with_positions=True)
        assert len(res) > 0 and "positions" in res.columns
        terms = set(tokenize(q["query_text"], q["lang"]))
        for r in res.itertuples():
            lang, content = content_of[int(r.doc_id)]
            assert r.positions  # a hit matches at least one term
            for t, got in r.positions.items():
                assert t in terms
                assert got == _expected_positions(content, lang, t)
            # terms absent from the dict truly don't occur
            for t in terms - set(r.positions):
                assert _expected_positions(content, lang, t) == []


def test_phrase_hit_positions_are_contiguous(spark, sf001_index, content_of):
    _cp, paths = sf001_index
    srv = IndexServer(paths.root)
    res = srv.search("parse_config", "python", k=5, mode="PHRASE",
                     with_positions=True)
    assert len(res) > 0
    for r in res.itertuples():
        p1, p2 = r.positions.get("parse", []), r.positions.get("config", [])
        assert any(b == a + 1 for a in p1 for b in p2)


def test_positions_from_live_copy_multi_segment(spark, tmp_path):
    """A doc re-ingested into a later segment reports positions from its
    LIVE (oldest) copy — the same first-wins rule scoring follows."""
    from horus_ner_spark.index.build import build_index

    base = pd.DataFrame(
        {
            "repo": ["r"] * 3,
            "path": ["f0", "f1", "f2"],
            "commit": ["c"] * 3,
            "lang": ["en"] * 3,
            "content": ["alpha beta alpha", "beta gamma", "alpha gamma"],
        }
    )
    seg_a, seg_b = base, base.iloc[0:1]  # f0 duplicated into segment b
    segs = []
    for name, part in (("a", seg_a), ("b", seg_b)):
        cp = str(tmp_path / f"{name}.parquet")
        spark.createDataFrame(part).write.parquet(cp)
        segs.append(build_index(spark, cp, str(tmp_path / f"ix_{name}")))
    srv = IndexServer([s.root for s in segs])
    res = srv.search("alpha", "en", k=10, with_positions=True)
    assert res["doc_id"].is_unique
    hit = {int(r.doc_id): r.positions for r in res.itertuples()}
    # every alpha-hit's positions match its own content exactly once
    vals = sorted(tuple(p["alpha"]) for p in hit.values())
    assert vals == [(0,), (0, 2)]


def test_daemon_positions_field(spark, sf001_index):
    _cp, paths = sf001_index
    q = query_set()[4]
    daemon = ServeDaemon(paths.root).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{daemon.port}/search",
            data=json.dumps({"query_text": q["query_text"],
                             "lang": q["lang"], "k": 5,
                             "positions": True}).encode(),
            headers={"Content-Type": "application/json"}, method="POST",
        )
        with urllib.request.urlopen(req, timeout=30) as r:
            resp = json.loads(r.read())
        assert resp["results"]
        srv = IndexServer(paths.root)
        lib = srv.search(q["query_text"], q["lang"], k=5,
                         with_positions=True)
        for rec, row in zip(resp["results"], lib.itertuples()):
            assert rec["doc_id"] == int(row.doc_id)
            assert rec["positions"] == row.positions
    finally:
        daemon.shutdown()
