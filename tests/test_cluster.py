"""Differential tests for ops/cluster.py: connected components vs a
pure-Python union-find oracle, on adversarial graph shapes and on the
engine's own LSH candidate pairs."""
import random

import pytest

from horus_ner_spark.ops.cluster import connected_components, dedup_cluster_df


class _UnionFind:
    def __init__(self):
        self.p = {}

    def find(self, x):
        self.p.setdefault(x, x)
        root = x
        while self.p[root] != root:
            root = self.p[root]
        while self.p[x] != root:  # path compression
            self.p[x], x = root, self.p[x]
        return root

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # min-root convention, matching the Spark label
            lo, hi = min(ra, rb), max(ra, rb)
            self.p[hi] = lo


def _oracle(edges):
    uf = _UnionFind()
    for a, b in edges:
        uf.union(a, b)
    return {n: uf.find(n) for n in uf.p}


def _spark_labels(spark, edges):
    if not edges:
        return {}
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "doc_a long, doc_b long"
    )
    out = connected_components(df).collect()
    labels = {}
    for r in out:
        assert r["node"] not in labels, "node labeled twice"
        labels[r["node"]] = r["component"]
    return labels


CASES = {
    "empty": [],
    "one_edge": [(5, 9)],
    "self_dup_edges": [(1, 2), (2, 1), (1, 2)],
    # worst case for label propagation: a long chain (O(n) diameter)
    "chain_500": [(i, i + 1) for i in range(500)],
    "two_chains_bridge": (
        [(i, i + 1) for i in range(100)]
        + [(1000 + i, 1001 + i) for i in range(100)]
        + [(50, 1050)]
    ),
    "clique_30": [(i, j) for i in range(30) for j in range(i + 1, 30)],
    "star_hub_high": [(10_000, i) for i in range(200)],
    "star_hub_low": [(0, i) for i in range(1, 200)],
    "disjoint_mix": (
        [(i, i + 1) for i in range(0, 40, 2)]          # 20 singleton edges
        + [(100 + i, 100 + i + 1) for i in range(30)]  # chain
        + [(500 + i, 500 + j) for i in range(10) for j in range(i + 1, 10)]
    ),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_components_match_union_find(spark, name):
    edges = CASES[name]
    assert _spark_labels(spark, edges) == _oracle(edges)


def test_components_random_graphs(spark):
    rng = random.Random(1234)
    for trial in range(3):
        n = 300
        edges = [
            (rng.randrange(n) * 7, rng.randrange(n) * 7)
            for _ in range(250)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        assert _spark_labels(spark, edges) == _oracle(edges), f"trial {trial}"


def test_dedup_cluster_on_lsh_pairs(spark, tmp_path):
    """End-to-end: documents -> banded LSH pairs -> clusters -> one
    survivor per component; differential vs union-find over the SAME
    pairs, plus the survivor-convention invariants."""
    import os

    from horus_ner_spark.ops.catalog_text import lsh_banded_pairs

    sf_dir = os.environ.get("SPARK_GRAFT_SF001", "/root/testdata/sf0.001")
    if not os.path.isdir(sf_dir):
        pytest.skip("testdata not present")
    pairs = lsh_banded_pairs(spark, sf_dir).select("doc_a", "doc_b")
    pair_rows = [(r["doc_a"], r["doc_b"]) for r in pairs.collect()]
    assert pair_rows, "fixture corpus should contain near-dup candidates"
    oracle = _oracle(pair_rows)

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    docs = docs.selectExpr("cast(doc_id as long) as doc_id")
    out = dedup_cluster_df(docs, pairs).collect()

    n_docs = docs.count()
    assert len(out) == n_docs
    by_doc = {r["doc_id"]: r for r in out}
    for doc_id, row in by_doc.items():
        want = oracle.get(doc_id, doc_id)  # singleton -> own cluster
        assert row["cluster_id"] == want, doc_id
        assert row["is_survivor"] == (doc_id == want)
    # exactly one survivor per cluster, and it is the min member
    clusters = {}
    for r in out:
        clusters.setdefault(r["cluster_id"], []).append(r)
    for cid, members in clusters.items():
        survivors = [m for m in members if m["is_survivor"]]
        assert len(survivors) == 1
        assert survivors[0]["doc_id"] == min(m["doc_id"] for m in members)
        assert cid == min(m["doc_id"] for m in members)


def test_dedup_corpus_keeps_exactly_survivors(spark):
    """dedup_corpus == corpus filtered to dedup_cluster_df survivors,
    all columns untouched."""
    from horus_ner_spark.ops.cluster import dedup_corpus

    edges = [(1, 2), (2, 3), (10, 11), (3, 1)]
    docs = spark.createDataFrame(
        [(i, f"body-{i}") for i in [1, 2, 3, 5, 10, 11, 99]],
        "doc_id long, content string",
    )
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    out = dedup_corpus(docs, pairs).collect()
    kept = sorted(r["doc_id"] for r in out)
    # components {1,2,3} -> survivor 1; {10,11} -> 10; singletons 5, 99
    assert kept == [1, 5, 10, 99]
    assert {r["content"] for r in out} == {f"body-{i}" for i in kept}

    surv = dedup_cluster_df(docs, pairs)
    assert kept == sorted(
        r["doc_id"] for r in surv.filter("is_survivor").collect()
    )
