"""Distributed hot-OR via the doc-id range-bucket fan-out.

Round-4 scale item: the legacy OR plan shuffles one partial row per
matching (query, doc) into a hash-agg — O(matching docs).  Hot-OR now
routes through the same rb fan-out as AND/PHRASE (hot blocks are
rb-pure; cold lists broadcast + range-filter), so the post-kernel
shuffle carries at most 2^range_bits * k rows per query.

Correctness traps these tests pin down:

* a doc with hot AND cold contributions must appear ONCE, scored fully
  (cold lists reach every bucket; without the kernel's doc_range filter
  the doc would surface in 64 buckets with partial scores);
* a doc matching ONLY cold terms can live in a bucket no hot block
  covers — the skeleton rows must force that group to exist;
* WAND with doc_range partitions exactly (per-bucket merge == global),
  and theta0 seeding never changes results.
"""

import numpy as np
import pandas as pd
import pytest

from horus_ner_spark.index.build import build_index
from horus_ner_spark.index.query import (
    _wand_one_query,
    bm25_bruteforce,
    bm25_distributed,
)

THR = 32  # lowered split threshold: "hot" within a few hundred docs


def _mixed_corpus(tmp_path, spark, n=240, seed=7):
    """Every doc holds the hot term; thirds add cold1/cold2/neither, with
    varied lengths so scores differ."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        body = ["hotword"] * int(rng.integers(1, 4))
        if i % 3 == 0:
            body += ["coldalpha"]
        if i % 5 == 0:
            body += ["coldbeta", "coldbeta"]
        body += [f"pad{j}" for j in rng.integers(0, 50, int(rng.integers(1, 9)))]
        rows.append(
            ("r", f"f{i}", "c", "en", " ".join(body))
        )
    docs = pd.DataFrame(
        rows, columns=["repo", "path", "commit", "lang", "content"]
    )
    cp = str(tmp_path / "c.parquet")
    spark.createDataFrame(docs).write.parquet(cp)
    paths = build_index(spark, cp, str(tmp_path / "ix"), split_threshold=THR)
    return cp, paths


def _rows(df):
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in df.collect()
    )


def test_or_fanout_rank_identical_and_no_duplicate_docs(spark, tmp_path):
    cp, paths = _mixed_corpus(tmp_path, spark)
    queries = [
        {"query_id": 1, "query_text": "hotword coldalpha", "lang": "en",
         "k": 300, "mode": "OR"},
        {"query_id": 2, "query_text": "coldalpha coldbeta", "lang": "en",
         "k": 300, "mode": "OR"},
        # mixed batch: a conjunctive query must still route correctly
        {"query_id": 3, "query_text": "hotword coldbeta", "lang": "en",
         "k": 300, "mode": "AND"},
    ]
    fan = _rows(bm25_distributed(
        spark, paths, queries, split_threshold=THR, or_plan="fanout"
    ))
    agg = _rows(bm25_distributed(
        spark, paths, queries, split_threshold=THR, or_plan="agg"
    ))
    assert fan == agg
    # bruteforce is the OR-semantics oracle; compare the OR queries only
    brute = _rows(bm25_bruteforce(spark, paths, queries[:2]))
    assert [r for r in fan if r[0] != 3] == brute
    # the duplicate-doc trap: every (query, doc) pair exactly once
    pairs = [(q, d) for q, _r, d, _s in fan]
    assert len(pairs) == len(set(pairs))
    # non-vacuous: q1 matches every doc, q2 only the cold thirds
    assert sum(1 for q, *_ in fan if q == 1) == 240
    assert 0 < sum(1 for q, *_ in fan if q == 2) < 240


def test_or_auto_routes_hot_to_fanout_and_cold_to_agg(spark, tmp_path):
    cp, paths = _mixed_corpus(tmp_path, spark)
    queries = [
        {"query_id": 1, "query_text": "hotword coldalpha", "lang": "en",
         "k": 300, "mode": "OR"},
        {"query_id": 2, "query_text": "coldalpha coldbeta", "lang": "en",
         "k": 300, "mode": "OR"},
    ]
    auto = _rows(bm25_distributed(
        spark, paths, queries, split_threshold=THR, or_plan="auto"
    ))
    brute = _rows(bm25_bruteforce(spark, paths, queries))
    assert auto == brute


def test_or_fanout_covers_cold_only_buckets(spark, tmp_path):
    """Docs that match ONLY cold terms sit in range buckets the hot term's
    blocks may not cover — the skeleton rows must keep them reachable."""
    rows = []
    # 40 hot docs (df=40 > THR=32 -> salted, but covers at most 40 of the
    # 64 buckets) and 200 disjoint cold-only docs spread over all buckets
    for i in range(40):
        rows.append(("r", f"h{i}", "c", "en", f"hotterm pad{i}"))
    for i in range(200):
        rows.append(("r", f"c{i}", "c", "en", f"coldterm pad{i}"))
    docs = pd.DataFrame(
        rows, columns=["repo", "path", "commit", "lang", "content"]
    )
    cp = str(tmp_path / "c.parquet")
    spark.createDataFrame(docs).write.parquet(cp)
    paths = build_index(spark, cp, str(tmp_path / "ix"), split_threshold=36)
    queries = [{"query_id": 1, "query_text": "hotterm coldterm",
                "lang": "en", "k": 300, "mode": "OR"}]
    fan = _rows(bm25_distributed(
        spark, paths, queries, split_threshold=36, or_plan="fanout"
    ))
    brute = _rows(bm25_bruteforce(spark, paths, queries))
    assert fan == brute
    assert len(fan) == 240  # every doc matches exactly one term


def test_wand_doc_range_partitions_and_theta0_is_sound(spark, tmp_path):
    """Per-bucket _wand_one_query(doc_range) merged over all buckets equals
    the unrestricted call; seeding theta0 with the true k-th best score
    changes nothing (it is the tightest legal bound)."""
    from horus_ner_spark.index.serve import IndexServer

    cp, paths = _mixed_corpus(tmp_path, spark)
    srv = IndexServer(paths.root)
    terms = ["hotword", "coldalpha", "coldbeta"]
    loaded = srv._load_terms(terms)
    term_blocks = {t: b for t, (_df, b) in loaded.items()}
    term_df = {t: d for t, (d, _b) in loaded.items()}
    k = 10
    full = _wand_one_query(
        term_blocks, term_df, k, srv.n_docs, srv.avgdl
    )
    shift = 58  # 64 - range_bits(6)
    pooled = []
    for rb in range(-32, 32):
        lo = rb << shift
        part = _wand_one_query(
            term_blocks, term_df, k, srv.n_docs, srv.avgdl,
            doc_range=(lo, lo + (1 << shift) - 1),
        )
        pooled.extend((s, d) for _r, d, s in part)
    pooled.sort(key=lambda e: (-e[0], e[1]))
    merged = [(r + 1, d, s) for r, (s, d) in enumerate(pooled[:k])]
    assert merged == full

    theta0 = full[k - 1][2]
    seeded = _wand_one_query(
        term_blocks, term_df, k, srv.n_docs, srv.avgdl, theta0=theta0
    )
    assert seeded == full


def test_serve_fanned_or_rank_identical(spark, tmp_path):
    from horus_ner_spark.index.serve import IndexServer

    # hot ORs fan by DEFAULT since layout v6 (theta0 carried across
    # serially-visited buckets; measured 1.4x at sf0.8, neutral at sf0.1)
    import inspect

    fan_default = inspect.signature(
        IndexServer.__init__).parameters["fan_modes"].default
    assert "OR" in fan_default and "AND" in fan_default

    cp, paths = _mixed_corpus(tmp_path, spark)
    ix = str(tmp_path / "ix")
    plain = IndexServer(ix, fanout_workers=0)
    fanned = IndexServer(
        ix, split_threshold=THR, fanout_min_postings=0,
        fan_modes=("AND", "OR"),
    )
    for qtext, k in [("hotword coldalpha", 25), ("hotword coldbeta", 7),
                     ("coldalpha coldbeta", 50)]:
        a = plain.search(qtext, "en", k=k, mode="OR")
        b = fanned.search(qtext, "en", k=k, mode="OR")
        pd.testing.assert_frame_equal(
            a.reset_index(drop=True), b.reset_index(drop=True)
        )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_or_fanout_randomized_differential(spark, tmp_path, seed):
    """Seeded random mini-corpora: fanout == agg == brute for random OR
    queries mixing hot and cold terms."""
    rng = np.random.default_rng(seed)
    vocab_cold = [f"w{j}" for j in range(30)]
    rows = []
    for i in range(150):
        body = []
        if rng.random() < 0.8:
            body += ["hh"] * int(rng.integers(1, 3))
        body += list(rng.choice(vocab_cold, size=int(rng.integers(1, 6))))
        rows.append(("r", f"f{i}", "c", "en", " ".join(body)))
    docs = pd.DataFrame(
        rows, columns=["repo", "path", "commit", "lang", "content"]
    )
    cp = str(tmp_path / f"c{seed}.parquet")
    spark.createDataFrame(docs).write.parquet(cp)
    paths = build_index(
        spark, cp, str(tmp_path / f"ix{seed}"), split_threshold=THR
    )
    queries = []
    for qid in range(4):
        qterms = ["hh"] + list(
            rng.choice(vocab_cold, size=int(rng.integers(1, 4)), replace=False)
        )
        queries.append(
            {"query_id": qid, "query_text": " ".join(qterms), "lang": "en",
             "k": int(rng.integers(3, 200)), "mode": "OR"}
        )
    fan = _rows(bm25_distributed(
        spark, paths, queries, split_threshold=THR, or_plan="fanout"
    ))
    agg = _rows(bm25_distributed(
        spark, paths, queries, split_threshold=THR, or_plan="agg"
    ))
    brute = _rows(bm25_bruteforce(spark, paths, queries))
    assert fan == agg == brute
