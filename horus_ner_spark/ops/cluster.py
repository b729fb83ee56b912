"""Near-duplicate CLUSTERING: candidate pairs -> connected components ->
one survivor per cluster.

The dedup family in ``ops/catalog_text.py`` ends at PAIRS (exact groups,
n-gram Jaccard, banded MinHash-LSH, SimHash, embedding cosine).  A
training-data pipeline needs one more step: transitive closure.  If A~B
and B~C, keeping "one of each pair" can still keep two near-copies of
the same boilerplate (A and C); the correct unit of deduplication is the
connected component of the similarity graph, with one survivor per
component (the convention everywhere from the C4/MassiveText pipelines
to Lee et al. 2022, "Deduplicating Training Data Makes Language Models
Better").

Reference analogy: HORUS-NER's cache dedupes by a unique term key
(``/root/reference/src/horus/components/sqlite_helper.py:42-48`` —
keyed, never transitive); a corpus-level near-dup pass has no reference
analog, so the semantics here follow the published pipelines above.

Algorithm: alternating large-star / small-star (Kiveris et al. 2014,
"Connected Components in MapReduce and Beyond").  Why not label
propagation: propagation converges in O(diameter) rounds — a 10^6-doc
boilerplate CHAIN (each file near-dups its neighbor) is O(10^6) shuffle
rounds.  Star alternation converges in O(log n) rounds on any graph,
each round a bounded number of hash shuffles on the edge set, which is
the property that survives 10^12 docs.  Per-round ``localCheckpoint``
cuts the iterative lineage so Catalyst never sees an O(rounds)-deep
plan.

Correctness is differential: ``tests/test_cluster.py`` checks component
assignments bit-equal to a pure-Python union-find oracle on adversarial
shapes (chains, cliques, stars, random Erdős–Rényi draws) and on the
engine's own LSH pairs at sandbox scale.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["connected_components", "dedup_cluster_df", "dedup_corpus"]


def _canon(e: DataFrame) -> DataFrame:
    """Canonical undirected edge set: (u, v) with u < v, self-loops
    dropped, exact dups collapsed."""
    return (
        e.select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every neighbor LARGER than u to the minimum of u's
    neighborhood (including u itself)."""
    sym = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    m = sym.groupBy("u").agg(F.least(F.min("v"), F.col("u")).alias("m"))
    return (
        sym.join(m, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Connect every neighbor SMALLER-OR-EQUAL of u (plus u) to the
    minimum of that set."""
    o = e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
    m = o.groupBy("u").agg(F.min("v").alias("m"))
    nbr = o.join(m, "u").select(F.col("v").alias("u"), F.col("m").alias("v"))
    own = m.select(F.col("u"), F.col("m").alias("v"))
    return (
        nbr.unionByName(own)
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _fingerprint(e: DataFrame) -> tuple:
    """Order-insensitive fingerprint of an edge set in ONE aggregate job:
    (count, xor-ish hash sum, sum(u), sum(v)).  Used only to detect the
    fixpoint — equal fingerprints on consecutive rounds terminate the
    loop.  xxhash64 over both endpoints makes an accidental collision of
    DIFFERENT edge sets with equal count and coordinate sums
    astronomically unlikely; the differential tests would catch a
    termination bug regardless."""
    dec = "decimal(38,0)"  # ANSI-safe: no long overflow on the sums
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("u", "v").cast(dec)).alias("h"),
        F.sum(F.col("u").cast(dec)).alias("su"),
        F.sum(F.col("v").cast(dec)).alias("sv"),
    ).collect()[0]
    return (row["n"], row["h"], row["su"], row["sv"])


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 100,
) -> DataFrame:
    """Pairs (src, dst) -> (node, component) for every node that appears
    in at least one pair; ``component`` is the MINIMUM node id of the
    connected component (deterministic, join-stable label).

    Nodes with no pairs are their own singleton components — they never
    enter the edge set, so callers union them back (``dedup_cluster_df``
    does).  O(log n) alternating-star rounds, each round ~3 hash
    shuffles of the current edge set; ``max_iter`` is a loud backstop,
    never a silent truncation."""
    e = _canon(
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    ).localCheckpoint()
    if not e.take(1):
        return e.select(
            F.col("u").alias("node"), F.col("v").alias("component")
        )
    fp = _fingerprint(e)
    for _ in range(max_iter):
        e2 = _small_star(_large_star(e)).localCheckpoint()
        fp2 = _fingerprint(e2)
        e = e2
        if fp2 == fp:
            break
        fp = fp2
    else:
        raise RuntimeError(
            f"connected_components: no fixpoint in {max_iter} rounds "
            "(graph far deeper than any near-dup corpus; raise max_iter)"
        )
    # fixpoint of small∘large is a disjoint star forest rooted at each
    # component's minimum: every edge is (member, root)
    return (
        e.select(F.col("u").alias("node"), F.col("v").alias("component"))
        .unionByName(
            e.select(F.col("v").alias("node"), F.col("v").alias("component"))
        )
        .distinct()
    )


def dedup_cluster_df(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """(doc_id, ...) x near-dup pairs -> (doc_id, cluster_id,
    is_survivor): transitive-closure clusters with the min-doc_id
    survivor convention.

    Docs untouched by any pair keep ``cluster_id = doc_id`` and survive
    — expressed as a LEFT join against the (small relative to corpus)
    component labels, so the full corpus is never shuffled by cluster:
    the labels side is the only aggregated input, and at 10^12 docs it
    is bounded by the near-dup population, not the corpus."""
    labels = connected_components(pairs)
    return (
        docs.select("doc_id")
        .join(labels, docs["doc_id"] == labels["node"], "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("cluster_id"),
        )
        .withColumn("is_survivor", F.col("doc_id") == F.col("cluster_id"))
    )


def dedup_corpus(corpus: DataFrame, pairs: DataFrame,
                 doc_id_col: str = "doc_id") -> DataFrame:
    """Near-dup-cleaned corpus: keep exactly the survivor rows.

    The training-data pipeline's terminal step (pairs -> components ->
    survivors -> filtered corpus), expressed as one left-ANTI join of
    the corpus against the non-survivor label rows — the anti side is
    bounded by the near-dup population (every labeled node minus the
    component roots), never the corpus, so the corpus itself is
    streamed through one broadcast-or-shuffle anti join and its columns
    are untouched.  Feed the result to ``index.build.build_index`` for
    a dedup-cleaned index."""
    labels = connected_components(pairs)
    losers = labels.where(F.col("node") != F.col("component")) \
                   .select(F.col("node").alias(doc_id_col))
    return corpus.join(losers, doc_id_col, "left_anti")
