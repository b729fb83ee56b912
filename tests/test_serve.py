"""Serving path: rank-identical to the distributed WAND path, and the
driver-side crc32 bucket hash is bit-identical to the one Spark wrote the
partition directories with."""

import random
import string

from pyspark.sql import functions as F

from horus_ner_spark.corpus import query_set
from horus_ner_spark.functions.bucketing import term_bucket, term_bucket_col
from horus_ner_spark.index.query import bm25_wand
from horus_ner_spark.index.serve import IndexServer


def test_bucket_hash_parity_with_spark(spark):
    rng = random.Random(7)
    words = ["config", "a", "héllo", "日本語"] + [
        "".join(rng.choices(string.ascii_lowercase + "0123456789_", k=rng.randint(1, 40)))
        for _ in range(300)
    ]
    df = spark.createDataFrame([(w,) for w in words], "term string").withColumn(
        "b", term_bucket_col("term", 32)
    )
    assert all(r["b"] == term_bucket(r["term"], 32) for r in df.collect())


def test_serve_rank_identical_to_wand(spark, sf001_index):
    _corpus_path, paths = sf001_index
    qs = query_set()
    expected = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in bm25_wand(spark, paths, qs).collect()
    )
    server = IndexServer(paths.root)
    got = sorted(
        (int(r.query_id), int(r.rank), int(r.doc_id), float(r.score))
        for r in server.search_batch(qs).itertuples()
    )
    assert got == expected
    # single-query surface agrees with the batch surface + warm-cache rerun
    q0 = qs[0]
    single = server.search(q0["query_text"], q0["lang"], q0["k"])
    batch_q0 = [(r, d, s) for (qid, r, d, s) in got if qid == q0["query_id"]]
    assert [(int(r.rank), int(r.doc_id), float(r.score)) for r in single.itertuples()] == batch_q0
    again = server.search(q0["query_text"], q0["lang"], q0["k"])
    assert again.equals(single)


def test_serve_and_mode(spark, sf001_index):
    """Conjunctive mode: every returned doc contains ALL query terms; OR-mode
    superset relation holds; unmatched conjunctions are empty."""
    from horus_ner_spark.index.build import IndexPaths

    _corpus_path, paths = sf001_index
    server = IndexServer(paths.root)
    q = "cache node tree"
    both = server.search(q, "python", 50, mode="AND")
    any_ = server.search(q, "python", 10_000, mode="OR")
    assert len(both) > 0
    # AND results are a subset of OR results with identical scores
    or_scores = {int(r.doc_id): float(r.score) for r in any_.itertuples()}
    for r in both.itertuples():
        assert or_scores[int(r.doc_id)] == float(r.score)
    # verify the containment property against the raw tf table
    tf = spark.read.parquet(paths.tf)
    for term in ["cache", "node", "tree"]:
        with_term = {r["doc_id"] for r in tf.filter(tf.term == term).collect()}
        assert {int(r.doc_id) for r in both.itertuples()} <= with_term
    assert len(server.search("cache qqneverappearsxq", "python", 10, mode="AND")) == 0


def test_multi_segment_serving_equals_merged(spark, tmp_path):
    """IndexServer over a LIST of segment dirs (the streaming tier set)
    answers rank-identically to serving the fully merged index."""
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

    multi = IndexServer([s.root for s in segs])
    single = IndexServer(merged.root)
    assert multi.n_docs == single.n_docs
    assert multi.avgdl == single.avgdl  # bit-identical via integer total_len
    qs = query_set()
    a = sorted(
        (int(r.query_id), int(r.rank), int(r.doc_id), float(r.score))
        for r in multi.search_batch(qs).itertuples()
    )
    b = sorted(
        (int(r.query_id), int(r.rank), int(r.doc_id), float(r.score))
        for r in single.search_batch(qs).itertuples()
    )
    assert a == b and len(a) > 0
    # phrase mode over segments too
    pa_ = multi.search("parse_config", lang="python", k=5, mode="PHRASE")
    pb = single.search("parse_config", lang="python", k=5, mode="PHRASE")
    assert pa_.values.tolist() == pb.values.tolist()


def test_phrase_empty_query_returns_empty(spark, sf001_index):
    """Regression: a phrase that tokenizes to zero terms (stoplisted /
    punctuation / 1-char tokens) must return empty, not crash."""
    _corpus_path, paths = sf001_index
    srv = IndexServer(paths.root)
    for q in ("+++", "x y", "def return import", ""):
        res = srv.search(q, "python", k=5, mode="PHRASE")
        assert len(res) == 0, q


def test_duplicate_doc_across_segments_served_once(spark, tmp_path):
    """Regression: a doc re-ingested into a second segment before
    compaction must not appear twice in multi-segment top-k (first-wins
    dedupe, matching merge.py's compaction rule) — on both the
    distributed segment path and the multi-segment server."""
    import pandas as pd

    from horus_ner_spark.index.build import IndexPaths, build_index
    from horus_ner_spark.index.query import bm25_wand_segments

    base = pd.DataFrame(
        {
            "repo": ["r"] * 4,
            "path": [f"f{i}" for i in range(4)],
            "commit": ["c"] * 4,
            "lang": ["en"] * 4,
            "content": [
                "alpha beta gamma",
                "alpha delta",
                "beta gamma delta",
                "epsilon zeta",
            ],
        }
    )
    seg_a = base.iloc[:3]
    seg_b = pd.concat([base.iloc[1:2], base.iloc[3:4]])  # f1 duplicated
    segs = []
    for name, part in (("a", seg_a), ("b", seg_b)):
        cp = str(tmp_path / f"{name}.parquet")
        spark.createDataFrame(part).write.parquet(cp)
        segs.append(build_index(spark, cp, str(tmp_path / f"ix_{name}")))

    res = bm25_wand_segments(
        spark, segs,
        [{"query_id": 1, "query_text": "alpha delta", "lang": "en", "k": 10}],
    ).collect()
    docs = [r["doc_id"] for r in res]
    assert len(docs) == len(set(docs)), f"doc served twice: {docs}"
    ranks = [r["rank"] for r in res]
    assert ranks == list(range(1, len(ranks) + 1))

    srv = IndexServer([s.root for s in segs])
    out = srv.search("alpha delta", "en", k=10)
    assert out["doc_id"].is_unique


def test_duplicate_doc_stats_reconciled_exactly(spark, tmp_path):
    """Round-3 exactness: with a doc re-ingested into a second segment
    (and a third), multi-segment results — distributed AND served, in OR,
    AND and PHRASE modes — are SCORE- and RANK-identical to the compacted
    index, not just dedup-consistent.  This pins the round-2 idf drift
    (inflated n_docs/df until compaction) and the borderline top-k drop:
    n_docs/avgdl/df are reconciled to first-wins and stale copies are
    excluded inside the kernels."""
    import pandas as pd

    from horus_ner_spark.index.build import build_index
    from horus_ner_spark.index.merge import merge_indexes
    from horus_ner_spark.index.query import bm25_wand, bm25_wand_segments

    base = pd.DataFrame(
        {
            "repo": ["r"] * 6,
            "path": [f"f{i}" for i in range(6)],
            "commit": ["c"] * 6,
            "lang": ["en"] * 6,
            "content": [
                "alpha beta gamma delta",
                "alpha delta epsilon",
                "beta gamma delta zeta",
                "epsilon zeta alpha",
                "alpha beta delta delta",
                "gamma gamma epsilon",
            ],
        }
    )
    seg_a = base.iloc[:3]
    seg_b = pd.concat([base.iloc[1:2], base.iloc[3:5]])  # f1 re-ingested
    seg_c = pd.concat([base.iloc[4:5], base.iloc[5:6]])  # f4 re-ingested
    segs = []
    for name, part in (("a", seg_a), ("b", seg_b), ("c", seg_c)):
        cp = str(tmp_path / f"{name}.parquet")
        spark.createDataFrame(part).write.parquet(cp)
        segs.append(build_index(spark, cp, str(tmp_path / f"ix_{name}")))
    merged = merge_indexes(spark, segs, str(tmp_path / "merged"))

    queries = [
        {"query_id": 1, "query_text": "alpha delta", "lang": "en", "k": 3},
        {"query_id": 2, "query_text": "alpha delta", "lang": "en", "k": 10,
         "mode": "AND"},
        {"query_id": 3, "query_text": "beta gamma", "lang": "en", "k": 10,
         "mode": "PHRASE"},
        {"query_id": 4, "query_text": "epsilon", "lang": "en", "k": 10},
    ]
    want = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in bm25_wand(spark, merged, queries).collect()
    )
    got = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in bm25_wand_segments(spark, segs, queries).collect()
    )
    assert got == want and len(want) > 0

    multi = IndexServer([s.root for s in segs])
    single = IndexServer(merged.root)
    assert multi.n_docs == single.n_docs == 6
    assert multi.avgdl == single.avgdl
    for q in queries:
        a = multi.search(
            q["query_text"], "en", q["k"], q.get("mode", "OR")
        ).values.tolist()
        b = single.search(
            q["query_text"], "en", q["k"], q.get("mode", "OR")
        ).values.tolist()
        assert a == b, (q, a, b)
    assert len(multi.search("alpha delta", "en", 10).values.tolist()) > 0


def test_search_batch_phrase_and_mode_validation(spark, sf001_index):
    """Regression (round-3 review): search_batch with mode=PHRASE must
    return the same rows as per-query search (it used to silently return
    empty — no phrase tokens, no pos_vb); unknown modes must raise, not
    fall through to OR scoring."""
    import pytest

    _corpus_path, paths = sf001_index
    srv = IndexServer(paths.root)
    single = srv.search("parse_config", "python", k=5, mode="PHRASE")
    assert len(single) > 0  # the fixture corpus contains the phrase
    batch = srv.search_batch([
        {"query_id": 1, "query_text": "parse_config", "lang": "python",
         "k": 5, "mode": "PHRASE"},
        {"query_id": 2, "query_text": "stream buffer", "lang": "python",
         "k": 5},
    ])
    got = batch[batch["query_id"] == 1][["rank", "doc_id", "score"]]
    assert got.values.tolist() == single.values.tolist()
    assert len(batch[batch["query_id"] == 2]) > 0
    with pytest.raises(ValueError, match="unknown query mode"):
        srv.search("stream", "python", k=5, mode="PHARSE")


def test_fetch_empty_terms_returns_empty(spark, sf001_index):
    """_fetch([]) must return empty results, not trip pyarrow's isin([])
    type error (post-v6 review finding: every public caller guards, but
    the private API should be total)."""
    from horus_ner_spark.index.serve import _BLOCK_COLS

    _corpus_path, paths = sf001_index
    srv = IndexServer(paths.root)
    dfs, blocks = srv._fetch([], _BLOCK_COLS)
    assert dfs == {} and len(blocks) == 0
    assert "seg" in blocks.columns
    # the public empty-query path stays empty through every mode
    for mode in ("OR", "AND", "PHRASE", "NEAR"):
        assert len(srv.search("", "python", k=5, mode=mode)) == 0


def test_serve_hot_conjunctive_fanout_rank_identical(spark, tmp_path):
    """Round-4: IndexServer fans hot AND/PHRASE/NEAR queries over doc-id
    range buckets (a thread pool over the blocks it fetched anyway) —
    results must be rank-identical to the single-task kernel AND to
    bm25_distributed's rb fan-out, for every conjunctive mode."""
    import pandas as pd

    from horus_ner_spark.index.build import build_index
    from horus_ner_spark.index.query import bm25_distributed

    thr = 32
    rows = []
    for i in range(160):
        if i % 4 == 0:
            body = "hotword nextword tail"
        elif i % 4 == 1:
            body = "hotword filler nextword"  # NEAR hit, PHRASE miss
        else:
            body = "hotword filler only"
        rows.append(f"{body} pad{i}")
    docs = pd.DataFrame(
        {
            "repo": ["r"] * 160,
            "path": [f"f{i}" for i in range(160)],
            "commit": ["c"] * 160,
            "lang": ["en"] * 160,
            "content": rows,
        }
    )
    cp = str(tmp_path / "c.parquet")
    spark.createDataFrame(docs).write.parquet(cp)
    paths = build_index(spark, cp, str(tmp_path / "ix"), split_threshold=thr)

    fanned = IndexServer(paths.root, split_threshold=thr,
                         fanout_min_postings=0,
                         fan_modes=("AND", "PHRASE", "NEAR"))
    single = IndexServer(paths.root, split_threshold=thr, fanout_workers=0)
    queries = [
        {"query_id": 1, "query_text": "hotword nextword", "lang": "en",
         "k": 200, "mode": "PHRASE"},
        {"query_id": 2, "query_text": "hotword nextword", "lang": "en",
         "k": 200, "mode": "AND"},
        {"query_id": 3, "query_text": "hotword nextword", "lang": "en",
         "k": 200, "mode": "NEAR", "slop": 3},
    ]
    dist = {}
    for r in bm25_distributed(
        spark, paths, queries, split_threshold=thr
    ).collect():
        dist.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score"])
        )
    n_hits = 0
    for q in queries:
        a = fanned.search(q["query_text"], "en", q["k"], q["mode"],
                          slop=q.get("slop", 8))
        b = single.search(q["query_text"], "en", q["k"], q["mode"],
                          slop=q.get("slop", 8))
        assert a.equals(b), q["mode"]
        got = list(zip(a["rank"], a["doc_id"], a["score"]))
        assert [(int(r), int(d), float(s)) for r, d, s in got] == sorted(
            dist.get(q["query_id"], [])
        ), q["mode"]
        n_hits += len(got)
    assert n_hits > 0


def test_stale_collect_capped_on_adversarial_dup_segments(
    spark, tmp_path, monkeypatch
):
    """Round-4 (#7): the stale-duplicate reconciliation collects to the
    driver because the designed lifecycle keeps it empty; a pathological
    tier set (every doc duplicated) must fail loudly at a bounded size —
    in the Spark path AND the pyarrow serving path — not drag the whole
    doc set to the driver."""
    import pytest as _pytest

    from horus_ner_spark.corpus import write_corpus
    from horus_ner_spark.index.build import build_index
    from horus_ner_spark.index.query import bm25_wand_segments

    cp = write_corpus(spark, str(tmp_path), sf=0.0003)
    a = build_index(spark, cp, str(tmp_path / "a"))
    b = build_index(spark, cp, str(tmp_path / "b"))  # 100% duplicates

    monkeypatch.setenv("HORUS_MAX_STALE_COLLECT", "5")
    with _pytest.raises(RuntimeError, match="compact the tier set"):
        bm25_wand_segments(
            spark, [a, b],
            [{"query_id": 1, "query_text": "stream", "lang": "python",
              "k": 5}],
        )

    monkeypatch.setenv("HORUS_SERVE_MAX_DOC_SCAN", "10")
    with _pytest.raises(RuntimeError, match="compact the tier set"):
        IndexServer([a.root, b.root])

    # defaults: same tier set serves fine, duplicates reconciled exactly
    monkeypatch.delenv("HORUS_MAX_STALE_COLLECT")
    monkeypatch.delenv("HORUS_SERVE_MAX_DOC_SCAN")
    srv = IndexServer([a.root, b.root])
    one = IndexServer(a.root)
    res = srv.search("stream", "python", 5)
    assert res.equals(one.search("stream", "python", 5))
    assert srv.n_docs == one.n_docs
