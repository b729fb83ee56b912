"""Decoded-postings memo in the serving path (round 4).

The term LRU caches COMPRESSED block frames, so warm DISTINCT queries
sharing terms re-ran vb_decode every time (~60% of warm serving time at
sf0.1).  IndexServer now memoizes the exhaustive kernel's per-term decode
product (docs, scores) in a postings-budgeted LRU.  Contract under test:

- results are bit-identical with the memo on, off, hot, and cold
  (cached entries ARE a previous invocation's arrays);
- the budget is enforced by whole-term LRU eviction;
- multi-segment servers and per-bucket fan-out subsets never populate
  the memo (their frames are not the full per-term block sets).
"""

import pandas as pd

from horus_ner_spark.corpus import query_set
from horus_ner_spark.index.serve import IndexServer


def test_decoded_cache_rank_identical_and_hits(spark, sf001_index):
    _cp, paths = sf001_index
    on = IndexServer(paths.root)
    off = IndexServer(paths.root, decoded_cache_postings=0)
    for rep in range(2):  # cold then memo-hot
        for q in query_set():
            for mode in ("OR", "AND"):
                a = on.search(q["query_text"], q["lang"], q["k"], mode=mode)
                b = off.search(q["query_text"], q["lang"], q["k"], mode=mode)
                pd.testing.assert_frame_equal(a, b)
    assert on.decoded_hits > 0
    assert len(off._decoded) == 0 and off.decoded_hits == 0
    assert on._decoded_postings == sum(
        len(d) for d, _s in on._decoded.values()
    )


def test_decoded_cache_budget_evicts_lru(spark, sf001_index):
    _cp, paths = sf001_index
    tiny = IndexServer(paths.root, decoded_cache_postings=500)
    for q in query_set():
        tiny.search(q["query_text"], q["lang"], q["k"])
    assert tiny._decoded_postings <= 500
    assert tiny._decoded_postings == sum(
        len(d) for d, _s in tiny._decoded.values()
    )
    # results still correct under constant eviction
    ref = IndexServer(paths.root, decoded_cache_postings=0)
    for q in query_set()[:4]:
        pd.testing.assert_frame_equal(
            tiny.search(q["query_text"], q["lang"], q["k"]),
            ref.search(q["query_text"], q["lang"], q["k"]),
        )


def test_decoded_cache_skips_multi_segment(spark, sf001_index, tmp_path):
    _cp, paths = sf001_index
    multi = IndexServer([paths.root, paths.root])
    for q in query_set()[:4]:
        multi.search(q["query_text"], q["lang"], q["k"])
        multi.search(q["query_text"], q["lang"], q["k"], mode="NEAR", slop=8)
    # per-segment frames are subsets -> the memos must stay empty
    assert len(multi._decoded) == 0 and multi.decoded_hits == 0
    assert len(multi._decoded_pos) == 0 and multi._decoded_pos_postings == 0


PHRASES = [
    ("hash_join mergeSort", 0),  # hot pair, PHRASE
    ("hash_join mergeSort", 8),  # hot pair, NEAR
    ("binary search", 0),
    ("binary search tree", 4),
]


def test_pos_memo_rank_identical_and_hits(spark, sf001_index):
    """PHRASE/NEAR results are bit-identical with the pass-1 memo on, off,
    hot, and cold; the memo only populates for PHRASE/NEAR."""
    _cp, paths = sf001_index
    on = IndexServer(paths.root)
    off = IndexServer(paths.root, pos_cache_postings=0)
    for _rep in range(2):  # cold then memo-hot
        for text, slop in PHRASES:
            mode = "NEAR" if slop else "PHRASE"
            a = on.search(text, "python", 10, mode=mode, slop=slop)
            b = off.search(text, "python", 10, mode=mode, slop=slop)
            pd.testing.assert_frame_equal(a, b)
    assert on.decoded_hits > 0
    assert len(off._decoded_pos) == 0
    assert on._decoded_pos_postings == sum(
        len(m[0]) for m in on._decoded_pos.values()
    )
    # the two memos are populated by disjoint mode sets
    assert len(on._decoded_pos) > 0 and len(on._decoded) == 0
    on.search("hash_join", "python", 10)  # OR fills only _decoded
    assert len(on._decoded) > 0


def test_pos_memo_budget_evicts_lru(spark, sf001_index):
    _cp, paths = sf001_index
    tiny = IndexServer(paths.root, pos_cache_postings=200)
    ref = IndexServer(paths.root, pos_cache_postings=0)
    for text, slop in PHRASES:
        mode = "NEAR" if slop else "PHRASE"
        pd.testing.assert_frame_equal(
            tiny.search(text, "python", 10, mode=mode, slop=slop),
            ref.search(text, "python", 10, mode=mode, slop=slop),
        )
    assert tiny._decoded_pos_postings <= 200
    assert tiny._decoded_pos_postings == sum(
        len(m[0]) for m in tiny._decoded_pos.values()
    )
