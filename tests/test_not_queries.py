"""NOT / exclusion queries: documents containing any excluded term are
dropped BEFORE scoring, in every mode (OR / AND / PHRASE / NEAR), through
the library (`IndexServer.search(exclude_text=...)`), the freeform syntax
(``-term`` / ``NOT term`` / ``a AND NOT b``), and the daemon (`"exclude"`
field, cache-key-distinct from the unexcluded query).

Oracle: exclusion is a pure pre-scoring filter — remaining docs' BM25
scores are unchanged (idf stays the index's df; the NOT operator is a
veto, not a stats rewrite).  So the expected top-k is the UNEXCLUDED
search at k = n_docs, post-filtered by the excluded doc set (read
independently from the index's tf table), reranked.  Reference analog:
the reference gates retrieval evidence by per-term filters
(src/core/feature_extraction/features.py term-level gating) — exclusion
is the standard boolean NOT a search user expects.
"""

import json
import urllib.error
import urllib.request

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from horus_ner_spark.corpus import query_set
from horus_ner_spark.daemon import ServeDaemon
from horus_ner_spark.functions.tokenizer import tokenize
from horus_ner_spark.index.serve import IndexServer

# one query per mode over fixture-guaranteed vocabulary ("cache node tree"
# is a hot multi-term OR query in query_set; "parse_config" matches as a
# phrase — asserted by test_serve's batch-PHRASE regression test)
_MODE_QUERIES = {
    "OR": ("cache node tree", 0),
    "AND": ("cache node", 0),
    "PHRASE": ("parse_config", 0),
    "NEAR": ("cache node", 8),
}


def _docs_with_terms(paths, exclude_text: str, lang: str) -> set[int]:
    """Doc ids containing ANY engine-token of exclude_text — computed
    independently from the index's uncompressed tf table."""
    terms = sorted(set(tokenize(exclude_text, lang)))
    tf = pq.read_table(paths.tf, columns=["doc_id", "term"])
    mask = pc.is_in(tf["term"], value_set=pa.array(terms))
    return set(pc.filter(tf["doc_id"], mask).to_pylist())


def _postfilter(full, banned: set[int], k: int):
    kept = [
        (int(r.doc_id), float(r.score))
        for r in full.itertuples()
        if int(r.doc_id) not in banned
    ]
    return [(i + 1, d, s) for i, (d, s) in enumerate(kept[:k])]


def _rows(df):
    return [(int(r.rank), int(r.doc_id), float(r.score))
            for r in df.itertuples()]


@pytest.mark.parametrize("mode", ["OR", "AND", "PHRASE", "NEAR"])
def test_not_equals_postfiltered_full_search(spark, sf001_index, mode):
    _cp, paths = sf001_index
    srv = IndexServer(paths.root)
    text, slop = _MODE_QUERIES[mode]
    lang, excl = "python", "stream"  # hot single-term veto, not in any query
    full = srv.search(text, lang, k=srv.n_docs, mode=mode, slop=slop)
    assert len(full) > 0
    banned = _docs_with_terms(paths, excl, lang)
    # the veto must actually bite for the test to mean anything
    assert any(int(r.doc_id) in banned for r in full.itertuples())
    expected = _postfilter(full, banned, k=10)
    got = _rows(srv.search(text, lang, k=10, mode=mode, slop=slop,
                           exclude_text=excl))
    assert got == expected


def test_not_oov_term_is_noop_and_self_exclusion_empties(spark, sf001_index):
    _cp, paths = sf001_index
    srv = IndexServer(paths.root)
    q = query_set()[0]
    base = _rows(srv.search(q["query_text"], q["lang"], k=10))
    noop = _rows(srv.search(q["query_text"], q["lang"], k=10,
                            exclude_text="zzz_not_in_vocab_qq"))
    assert noop == base
    # excluding every query term vetoes every candidate
    gone = srv.search(q["query_text"], q["lang"], k=10,
                      exclude_text=q["query_text"])
    assert len(gone) == 0


def test_not_multi_segment_equals_merged(spark, tmp_path):
    from horus_ner_spark.corpus import gen_corpus_pandas
    from horus_ner_spark.index.build import build_index
    from horus_ner_spark.index.merge import merge_indexes

    corpus = gen_corpus_pandas(sf=0.001).iloc[:240]
    segs = []
    for i, sl in enumerate((slice(0, 90), slice(90, 240))):
        cp = str(tmp_path / f"c{i}.parquet")
        spark.createDataFrame(corpus.iloc[sl]).write.parquet(cp)
        segs.append(build_index(spark, cp, str(tmp_path / f"ix{i}")))
    merged = merge_indexes(spark, segs, str(tmp_path / "merged"))
    multi, single = IndexServer([s.root for s in segs]), IndexServer(merged.root)
    q = query_set()[0]
    excl = query_set()[1]["query_text"].split()[0]
    a = _rows(multi.search(q["query_text"], q["lang"], k=10,
                           exclude_text=excl))
    b = _rows(single.search(q["query_text"], q["lang"], k=10,
                            exclude_text=excl))
    assert a == b and len(a) > 0


def test_search_text_not_syntax_equals_explicit(spark, sf001_index):
    _cp, paths = sf001_index
    srv = IndexServer(paths.root)
    q = query_set()[0]
    excl = query_set()[1]["query_text"].split()[0]
    explicit = _rows(srv.search(q["query_text"], q["lang"], k=10,
                                exclude_text=excl))
    for syntax in (
        f"lang:{q['lang']} {q['query_text']} -{excl}",
        f"lang:{q['lang']} {q['query_text']} NOT {excl}",
    ):
        assert _rows(srv.search_text(syntax, k=10)) == explicit


def test_daemon_exclude_field_and_cache_key(spark, sf001_index):
    _cp, paths = sf001_index
    q = query_set()[0]
    excl = query_set()[1]["query_text"].split()[0]
    daemon = ServeDaemon(paths.root).start()
    try:
        def post(obj):
            req = urllib.request.Request(
                f"http://127.0.0.1:{daemon.port}/search",
                data=json.dumps(obj).encode(),
                headers={"Content-Type": "application/json"}, method="POST",
            )
            with urllib.request.urlopen(req, timeout=30) as r:
                return json.loads(r.read())

        base = post({"query_text": q["query_text"], "lang": q["lang"], "k": 10})
        notted = post({"query_text": q["query_text"], "lang": q["lang"],
                       "k": 10, "exclude": excl})
        freeform = post({"q": f"lang:{q['lang']} {q['query_text']} -{excl}",
                         "k": 10})
        assert notted["results"] == freeform["results"]
        # the veto changed the result set (cache keys must differ)
        assert notted["results"] != base["results"]
        srv = IndexServer(paths.root)
        lib = srv.search(q["query_text"], q["lang"], k=10, exclude_text=excl)
        assert [(r["rank"], r["doc_id"]) for r in notted["results"]] == [
            (int(r.rank), int(r.doc_id)) for r in lib.itertuples()
        ]
    finally:
        daemon.shutdown()


def test_search_batch_per_query_exclude(spark, sf001_index):
    _cp, paths = sf001_index
    srv = IndexServer(paths.root)
    q0, q1 = query_set()[0], query_set()[1]
    excl = q1["query_text"].split()[0]
    batch = srv.search_batch([
        {**q0, "exclude": excl},
        {**q1},
    ])
    a = batch[batch["query_id"] == q0["query_id"]]
    expected = _rows(srv.search(q0["query_text"], q0["lang"],
                                q0.get("k", 10), exclude_text=excl))
    assert [(int(r.rank), int(r.doc_id), float(r.score))
            for r in a.itertuples()] == expected


# ───────────────── Spark batch path (bm25_wand + CLI dict surface) ─────────


def _spark_rows(df):
    return [(int(r["rank"]), int(r["doc_id"]), float(r["score"]))
            for r in df.collect()]


@pytest.mark.parametrize("mode", ["OR", "AND", "PHRASE", "NEAR"])
def test_wand_exclude_equals_serve_exclude(spark, sf001_index, mode):
    """bm25_wand's per-query "exclude" matches IndexServer's exclude_text
    (itself validated against the independent tf-table post-filter oracle
    above), per mode."""
    from horus_ner_spark.index.query import bm25_wand

    _cp, paths = sf001_index
    srv = IndexServer(paths.root)
    text, slop = _MODE_QUERIES[mode]
    lang, excl = "python", "stream"
    rdf = bm25_wand(spark, paths, [
        {"query_id": 0, "query_text": text, "lang": lang, "k": 10,
         "mode": mode, "slop": slop, "exclude": excl},
    ])
    got = _spark_rows(rdf)
    assert len(got) > 0
    expected = _rows(srv.search(text, lang, k=10, mode=mode, slop=slop,
                                exclude_text=excl))
    assert got == expected


def test_wand_exclude_rank_identical_to_bruteforce(spark, sf001_index):
    """OR-mode exclude: the WAND kernel path and the pure-DataFrame
    brute-force path (anti-join veto) stay rank-identical, and force_wand
    agrees with the hybrid dispatcher."""
    from horus_ner_spark.index.query import bm25_bruteforce, bm25_wand

    _cp, paths = sf001_index
    qs = [{**q, "exclude": "stream"} for q in query_set()
          if q.get("mode", "OR") == "OR"][:4]
    assert qs
    wand = _spark_rows(bm25_wand(spark, paths, qs))
    brute = _spark_rows(bm25_bruteforce(spark, paths, qs))
    forced = _spark_rows(bm25_wand(spark, paths, qs, force_wand=True))
    assert len(wand) > 0
    assert wand == brute == forced


def test_wand_exclude_oov_noop_and_distributed_raises(spark, sf001_index):
    from horus_ner_spark.index.query import bm25_distributed, bm25_wand

    _cp, paths = sf001_index
    q = dict(query_set()[0])
    base = _spark_rows(bm25_wand(spark, paths, [q]))
    noop = _spark_rows(bm25_wand(
        spark, paths, [{**q, "exclude": "zzz_not_in_vocab_qq"}]))
    assert noop == base
    with pytest.raises(ValueError, match="NOT operator"):
        bm25_distributed(spark, paths, [{**q, "exclude": "stream"}])
