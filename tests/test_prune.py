"""Static index pruning (index/prune.py): the pruned copy is smaller,
serves through the unchanged serving stack, scores surviving postings
bit-identically to the full index, and keeps recall@10 high on the
reference query set."""

import numpy as np
import pytest

from horus_ner_spark.corpus import query_set
from horus_ner_spark.index.prune import prune_index
from horus_ner_spark.index.serve import IndexServer


@pytest.fixture(scope="module")
def pruned(spark, sf001_index, tmp_path_factory):
    _cp, paths = sf001_index
    out = prune_index(
        spark, paths, str(tmp_path_factory.mktemp("pruned") / "ix"),
        keep_fraction=0.25, min_keep=16,
    )
    return paths, out


def test_pruned_is_smaller_and_score_consistent(spark, pruned):
    full, cut = pruned
    n_full = (
        spark.read.parquet(full.postings).agg({"n_postings": "sum"}).collect()
    )[0][0]
    n_cut = (
        spark.read.parquet(cut.postings).agg({"n_postings": "sum"}).collect()
    )[0][0]
    assert n_cut < n_full  # hot lists actually shrank
    # rare terms (df <= min_keep) survive intact
    ts = spark.read.parquet(full.term_stats)
    rare = [r["term"] for r in ts.filter("df <= 16").limit(5).collect()]
    if rare:
        cut_postings = spark.read.parquet(cut.postings)
        got = (
            cut_postings.filter(cut_postings["term"].isin(rare))
            .groupBy("term").agg({"n_postings": "sum"}).collect()
        )
        want = {
            r["term"]: r["df"]
            for r in ts.filter(ts["term"].isin(rare)).collect()
        }
        for r in got:
            assert r["sum(n_postings)"] == want[r["term"]]

    # score consistency: a surviving posting contributes bit-identically
    # (same idf, same tf-norm), so a doc's pruned score is a LOWER BOUND
    # of its full-index score (some of its other query terms' postings may
    # be pruned), with equality guaranteed for single-term queries
    sf, sc = IndexServer(full.root), IndexServer(cut.root)
    assert sf.n_docs == sc.n_docs and sf.avgdl == sc.avgdl
    for q in query_set():
        a = sf.search(q["query_text"], q["lang"], k=50)
        b = sc.search(q["query_text"], q["lang"], k=50)
        fa = dict(zip(a["doc_id"], a["score"]))
        for d, s in zip(b["doc_id"], b["score"]):
            if d in fa:
                assert s <= fa[d] + 1e-9, (q["query_id"], d)
    # single-term query: every served doc scores exactly as in the full
    # index (one term -> the posting either survived intact or is absent)
    one = sf.search("stream", "python", k=20)
    cut_one = sc.search("stream", "python", k=20)
    fa = dict(zip(one["doc_id"], one["score"]))
    for d, s in zip(cut_one["doc_id"], cut_one["score"]):
        if d in fa:
            assert s == fa[d], d


def test_pruned_recall_at_10(spark, pruned):
    full, cut = pruned
    sf, sc = IndexServer(full.root), IndexServer(cut.root)
    recalls = []
    for q in query_set():
        a = sf.search(q["query_text"], q["lang"], k=10)
        if not len(a):
            continue
        b = sc.search(q["query_text"], q["lang"], k=10)
        inter = np.intersect1d(
            a["doc_id"].to_numpy(), b["doc_id"].to_numpy()
        )
        recalls.append(len(inter) / len(a))
    assert recalls, "query set produced no results"
    mean_recall = float(np.mean(recalls))
    # keep_fraction=0.25 with min_keep=16 on the sf0.001 fixture: the
    # measured recall has headroom above this bound; the bound guards
    # against the selection quietly breaking (e.g. keeping the LOWEST
    # impact postings would crater it)
    assert mean_recall >= 0.7, mean_recall
