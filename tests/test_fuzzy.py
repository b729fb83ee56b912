"""Fuzzy (trailing-~, edit-distance ≤ 1) queries: delete-1 sidecar
build, expansion vs a brute-force dictionary oracle, OR/AND/NOT search
semantics, the Spark bulk rewrite, and staleness detection.

Reference analog: the reference's annotate surface takes raw user text
with no typo tolerance (reference: webservice/rest.py:47-61); Lucene's
FuzzyQuery is what a search user expects.  The index-side answer here is
the symmetric-delete scheme — candidates via exact delete-key fetch,
verified with exact edit distance — never an O(vocabulary) scan.
"""

import itertools
import json
import random
import shutil

import pyarrow.parquet as pq
import pytest

from horus_ner_spark.functions.tokenizer import tokenize
from horus_ner_spark.index.build import IndexPaths
from horus_ner_spark.index.fuzzy import (
    FUZZY_MAX_EXPANSIONS,
    build_fuzzy_sidecar,
    check_fuzzy_fresh,
    delete1_keys,
    ed_le_1,
    expand_fuzzy_spark,
    fuzzy_is_stale,
    rewrite_fuzzy_queries,
    split_fuzzy_tokens,
    _meta_path,
)
from horus_ner_spark.index.serve import IndexServer


def _ed(a: str, b: str) -> int:
    """Full Levenshtein DP — the independent oracle for ed_le_1."""
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                     prev + (ca != cb))
    return dp[len(b)]


def _vocab(paths) -> dict[str, int]:
    return {
        r["term"]: int(r["df"])
        for r in pq.read_table(paths.term_stats,
                               columns=["term", "df"]).to_pylist()
    }


def _oracle_expansion(paths, tok, cap=FUZZY_MAX_EXPANSIONS):
    """Brute-force ED ≤ 1 over the whole dictionary (fine at sf0.001;
    exactly what the sidecar exists to avoid at scale)."""
    hits = [(t, d) for t, d in _vocab(paths).items() if ed_le_1(tok, t)]
    hits.sort(key=lambda kv: (kv[0] != tok, -kv[1], kv[0]))
    return [t for t, _ in hits[:cap]], len(hits) > cap


def _rows(df):
    return [(int(r.rank), int(r.doc_id), round(float(r.score), 6))
            for r in df.itertuples()]


@pytest.fixture(scope="module")
def fuzzy_index(spark, sf001_index):
    """The shared sf0.001 index with its delete-1 sidecar built, plus a
    fixture-derived (token, typo) pair: a dictionary term with ≥ 2
    tokenizer-stable ED≤1 neighbours, and a first-char typo of it that
    is NOT itself a dictionary term (the interesting fuzzy case — a
    prefix index can never recover a first-char edit)."""
    _cp, paths = sf001_index
    build_fuzzy_sidecar(spark, paths)
    vocab = _vocab(paths)
    stable = [t for t in vocab
              if len(t) >= 4 and t.isalpha() and tokenize(t, "python") == [t]]

    def n_neighbours(t):
        return sum(1 for u in stable if u != t and ed_le_1(t, u))

    tok = max(stable, key=lambda t: (n_neighbours(t), t))
    assert n_neighbours(tok) >= 2, "fixture corpus lost its fuzzy cluster"
    typo = next(
        c + tok[1:]
        for c in "qxjzvwk"
        if (c + tok[1:]) not in vocab
        and tokenize(c + tok[1:], "python") == [c + tok[1:]]
    )
    return paths, tok, typo


def test_ed_le_1_and_key_completeness():
    """ed_le_1 agrees with full DP, and any ED≤1 pair shares a delete-1
    key (the sidecar's correctness invariant — no candidate can be
    missed, only over-generated then verified away)."""
    rng = random.Random(7)
    words = ["".join(rng.choice("abc") for _ in range(rng.randint(0, 6)))
             for _ in range(300)]
    for a, b in itertools.combinations(words, 2):
        want = _ed(a, b) <= 1
        assert ed_le_1(a, b) == want
        if want:
            assert set(delete1_keys(a)) & set(delete1_keys(b))


def test_expansion_matches_bruteforce_oracle(fuzzy_index):
    paths, tok, typo = fuzzy_index
    srv = IndexServer(paths.root)
    for stem in (tok, typo):
        got, trunc = srv.expand_fuzzy(stem)
        want, wtrunc = _oracle_expansion(paths, stem)
        assert (got, trunc) == (want, wtrunc), stem
    # the exact term ranks first in its own expansion
    assert srv.expand_fuzzy(tok)[0][0] == tok
    # cap: reported, deterministic
    got2, trunc2 = srv.expand_fuzzy(tok, max_expansions=1)
    assert got2 == srv.expand_fuzzy(tok)[0][:1] and trunc2 is True


def test_first_char_typo_recovers_term(fuzzy_index):
    """The case a prefix index can never serve: an edit at position 0."""
    paths, tok, typo = fuzzy_index
    srv = IndexServer(paths.root)
    exp, _ = srv.expand_fuzzy(typo)
    assert tok in exp


def test_or_fuzzy_equals_expanded_disjunction(fuzzy_index):
    paths, tok, typo = fuzzy_index
    srv = IndexServer(paths.root)
    exp, _ = srv.expand_fuzzy(typo)
    for t in exp:
        assert tokenize(t, "python") == [t]
    got = srv.search(f"cache {typo}~", mode="OR", k=10)
    want = srv.search(" ".join(["cache"] + exp), mode="OR", k=10)
    assert _rows(got) == _rows(want) and len(got)


def test_and_fuzzy_is_required_group(fuzzy_index):
    """AND with a fuzzy token = every hit contains `cache` AND ≥ 1
    expansion — same grouped-AND contract as prefix (the group filter +
    unfiltered score sums are asserted exhaustively in test_prefix; here
    the group membership)."""
    paths, tok, typo = fuzzy_index
    srv = IndexServer(paths.root)
    exp, _ = srv.expand_fuzzy(typo)
    tf = pq.read_table(paths.tf, columns=["doc_id", "term"]).to_pandas()
    with_exp = set(tf[tf["term"].isin(exp)]["doc_id"])
    with_cache = set(tf[tf["term"] == "cache"]["doc_id"])
    hits = srv.search(f"cache {typo}~", mode="AND", k=50)
    assert len(hits)
    assert all(int(d) in (with_exp & with_cache) for d in hits["doc_id"])


def test_not_fuzzy_equals_postfiltered_full_search(fuzzy_index):
    paths, tok, typo = fuzzy_index
    srv = IndexServer(paths.root)
    exp, _ = srv.expand_fuzzy(typo)
    tf = pq.read_table(paths.tf, columns=["doc_id", "term"]).to_pandas()
    banned = set(tf[tf["term"].isin(exp)]["doc_id"])
    full = srv.search("cache node", mode="OR", k=srv.n_docs)
    kept = [(int(r.doc_id), round(float(r.score), 6))
            for r in full.itertuples() if int(r.doc_id) not in banned]
    want = [(i + 1, d, s) for i, (d, s) in enumerate(kept[:10])]
    got = srv.search_text(f"cache node -{typo}~", k=10)
    assert _rows(got) == want


def test_spark_expansion_and_bulk_rewrite(spark, fuzzy_index):
    from horus_ner_spark.index.query import bm25_wand

    paths, tok, typo = fuzzy_index
    srv = IndexServer(paths.root)
    for stem in (tok, typo):
        assert expand_fuzzy_spark(spark, paths, stem) == \
            srv.expand_fuzzy(stem)
    qs = rewrite_fuzzy_queries(spark, paths, [
        {"query_id": 1, "query_text": f"cache {typo}~", "k": 8},
        {"query_id": 2, "query_text": "cache node", "k": 8,
         "exclude": f"{typo}~"},
    ])
    assert "terms" in qs[0] and "exclude_terms" in qs[1]
    got = bm25_wand(spark, paths, qs).toPandas()
    w1 = got[got["query_id"] == 1][["rank", "doc_id", "score"]]
    w2 = got[got["query_id"] == 2][["rank", "doc_id", "score"]]
    assert _rows(w1) == _rows(srv.search(f"cache {typo}~", mode="OR", k=8))
    assert _rows(w2) == _rows(
        srv.search("cache node", mode="OR", k=8, exclude_text=f"{typo}~"))


def test_multisegment_fuzzy_matches_single(fuzzy_index):
    paths, tok, typo = fuzzy_index
    single = IndexServer(paths.root)
    multi = IndexServer([paths.root, paths.root])
    for mode in ("OR", "AND"):
        assert _rows(multi.search(f"cache {typo}~", mode=mode, k=10)) == \
            _rows(single.search(f"cache {typo}~", mode=mode, k=10))


def test_fuzzy_errors(fuzzy_index):
    paths, tok, typo = fuzzy_index
    srv = IndexServer(paths.root)
    with pytest.raises(ValueError, match="OR/AND modes only"):
        srv.search(f"{typo}~", mode="PHRASE")
    with pytest.raises(ValueError, match="OR/AND modes only"):
        srv.search(f"cache {typo}~", mode="NEAR")
    with pytest.raises(ValueError, match="fuzzy stem"):
        srv.search("ab~", mode="OR")  # too short
    with pytest.raises(ValueError, match="trailing character"):
        srv.search("se~ver", mode="OR")
    with pytest.raises(ValueError, match="sub-token"):
        srv.search("parse_json~", mode="OR")
    with pytest.raises(ValueError, match="not both"):
        srv.search(f"{tok}~*", mode="OR")
    with pytest.raises(ValueError):
        split_fuzzy_tokens("a~~")


def test_missing_sidecar_is_loud(sf001_index, tmp_path):
    """A server over an index without the sidecar serves plain queries
    fine and fails a ~ query with the build instruction."""
    _cp, paths = sf001_index
    bare = str(tmp_path / "bare")
    shutil.copytree(paths.root, bare)
    import os
    shutil.rmtree(os.path.join(bare, "fuzzy.parquet"), ignore_errors=True)
    meta = os.path.join(bare, "fuzzy_meta.json")
    if os.path.exists(meta):
        os.remove(meta)
    srv = IndexServer(bare)
    assert len(srv.search("cache", mode="OR", k=3))
    with pytest.raises(FileNotFoundError, match="build_fuzzy_sidecar"):
        srv.search("cachee~", mode="OR", k=3)


def test_stale_sidecar_is_loud_and_fsck_flags_it(spark, fuzzy_index,
                                                 tmp_path):
    from horus_ner_spark.index.fsck import fsck

    paths, tok, typo = fuzzy_index
    stale = str(tmp_path / "stale")
    shutil.copytree(paths.root, stale)
    sp = IndexPaths(stale)
    with open(_meta_path(sp), "w") as f:
        json.dump({"term_stats_fingerprint": "0" * 64, "n_pbuckets": 32}, f)
    assert fuzzy_is_stale(sp) is True
    with pytest.raises(RuntimeError, match="STALE"):
        check_fuzzy_fresh(sp)
    with pytest.raises(RuntimeError, match="STALE"):
        IndexServer(stale).search(f"{typo}~", mode="OR", k=3)
    rep = fsck(spark, sp, deep=False)
    assert rep["by_check"].get("fuzzy_sidecar_stale") == 1
    # the live index's sidecar is fresh: fsck stays clean
    assert fuzzy_is_stale(paths) is False


def test_search_batch_and_daemon_route_fuzzy(fuzzy_index):
    paths, tok, typo = fuzzy_index
    srv = IndexServer(paths.root)
    out = srv.search_batch([
        {"query_id": 1, "query_text": f"cache {typo}~", "mode": "OR",
         "k": 5},
    ])
    one = out[out["query_id"] == 1][["rank", "doc_id", "score"]]
    assert _rows(one) == _rows(
        srv.search(f"cache {typo}~", mode="OR", k=5))
