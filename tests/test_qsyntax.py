"""Freeform query syntax: parser units + rank-identity with the explicit
enum API through both the library (IndexServer.search_text) and the
daemon ({"q": ...} on /search)."""

import json
import urllib.request

import pytest

from horus_ner_spark.daemon import ServeDaemon
from horus_ner_spark.index.qsyntax import ParsedQuery, parse_query
from horus_ner_spark.index.serve import IndexServer


def _post(port, path, obj):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:  # noqa: F821 (urllib.error below)
        return e.code, json.loads(e.read())


import urllib.error  # noqa: E402


# ---------------------------------------------------------------- parser

@pytest.mark.parametrize(
    "text,want",
    [
        ("foo bar", ParsedQuery("foo bar", "python", "OR", 8)),
        ('"read parquet file"',
         ParsedQuery("read parquet file", "python", "PHRASE", 8)),
        ("foo AND bar", ParsedQuery("foo bar", "python", "AND", 8)),
        ("foo AND bar AND baz",
         ParsedQuery("foo bar baz", "python", "AND", 8)),
        ("foo NEAR/3 bar", ParsedQuery("foo bar", "python", "NEAR", 3)),
        ("foo NEAR bar", ParsedQuery("foo bar", "python", "NEAR", 8)),
        ("a NEAR/4 b NEAR c", ParsedQuery("a b c", "python", "NEAR", 4)),
        ("lang:go foo bar", ParsedQuery("foo bar", "go", "OR", 8)),
        ('lang:rust "spawn thread"',
         ParsedQuery("spawn thread", "rust", "PHRASE", 8)),
        ("foo lang:go AND bar", ParsedQuery("foo bar", "go", "AND", 8)),
        # lowercase and/near are plain terms, not operators
        ("foo and bar", ParsedQuery("foo and bar", "python", "OR", 8)),
    ],
)
def test_parse_query(text, want):
    assert parse_query(text) == want


@pytest.mark.parametrize(
    "bad",
    [
        "",
        "   ",
        '""',
        "lang:py",              # lang selector with no terms
        "AND foo",
        "foo AND",
        "NEAR/3",
        "foo AND bar NEAR/2 baz",   # mixed operator families
        "foo NEAR/2 bar NEAR/5 baz",  # conflicting explicit slops
        "foo NEAR/0 bar",
        '"phrase" extra',           # phrase mixed with bare terms
        'pre "phrase"',
        "lang:a lang:b foo",
        "foo AND AND bar",
    ],
)
def test_parse_query_rejects(bad):
    with pytest.raises(ValueError):
        parse_query(bad)


def test_parse_defaults_flow_through():
    p = parse_query("x NEAR y", default_lang="go", default_slop=2)
    assert p == ParsedQuery("x y", "go", "NEAR", 2)


# ------------------------------------------------- rank identity (library)

def test_search_text_rank_identical(spark, sf001_index):
    _cp, paths = sf001_index
    srv = IndexServer(paths.root)
    # corpus terms (parse/config/cache/node survive the stoplist), so the
    # rank-identity comparisons below are over NON-EMPTY result sets
    cases = [
        ("parse config buffer", ("parse config buffer", "python", "OR", 8)),
        ("parse AND config", ("parse config", "python", "AND", 8)),
        ("parse NEAR/4 config", ("parse config", "python", "NEAR", 4)),
        ('"token index"', ("token index", "python", "PHRASE", 8)),
        ("lang:python cache AND node", ("cache node", "python", "AND", 8)),
    ]
    nonempty = 0
    for text, (qt, lang, mode, slop) in cases:
        got = srv.search_text(text, k=10)
        want = srv.search(qt, lang, 10, mode, slop=slop)
        assert got.equals(want), text
        nonempty += bool(len(got))
    assert nonempty >= 4  # identity must be exercised on real results


# -------------------------------------------------- rank identity (daemon)

def test_daemon_freeform_q(spark, sf001_index):
    _cp, paths = sf001_index
    daemon = ServeDaemon(paths.root).start()
    try:
        lib = IndexServer(paths.root)
        nonempty = 0
        for text, explicit in [
            ("parse NEAR/4 config",
             {"query_text": "parse config", "mode": "NEAR", "slop": 4}),
            ('"token index"',
             {"query_text": "token index", "mode": "PHRASE"}),
            ("cache AND node", {"query_text": "cache node", "mode": "AND"}),
        ]:
            code, free = _post(daemon.port, "/search", {"q": text, "k": 10})
            assert code == 200
            code, expl = _post(
                daemon.port, "/search", {"k": 10, **explicit}
            )
            assert code == 200
            assert free["results"] == expl["results"]
            want = [
                {"rank": int(r.rank), "doc_id": int(r.doc_id),
                 "score": float(r.score)}
                for r in lib.search(
                    explicit["query_text"], "python", 10,
                    explicit["mode"], slop=explicit.get("slop", 8),
                ).itertuples()
            ]
            assert free["results"] == want
            nonempty += bool(free["results"])
        assert nonempty >= 2  # identity exercised on real results
        # malformed syntax is a client error, and the daemon survives it
        code, resp = _post(daemon.port, "/search", {"q": "foo AND"})
        assert code == 400 and "error" in resp
        code, resp = _post(daemon.port, "/search", {"q": "ok query"})
        assert code == 200
    finally:
        daemon.shutdown()
