"""End-to-end gates (SURVEY.md §5 items 2-4): BM25 rank equality across all
three execution paths, per-row sha256 invariant, corpus determinism, resume."""

import os

import pytest

from horus_ner_spark.corpus import (
    RARE_TERM,
    ABSENT_TERM,
    gen_corpus_pandas,
    query_set,
    write_corpus,
)
from horus_ner_spark.index.build import build_index, verify_sha_invariant, with_doc_id
from horus_ner_spark.index.manifest import Manifest
from horus_ner_spark.index.query import bm25_bruteforce, bm25_wand
from horus_ner_spark.oracle import OracleIndex


def _collect_results(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
    for v in out.values():
        v.sort()
    return out


@pytest.fixture(scope="module")
def oracle_results(spark, sf001_index):
    corpus_path, paths = sf001_index
    rows = [
        (r["doc_id"], r["lang"], r["content"])
        for r in with_doc_id(spark.read.parquet(corpus_path)).collect()
    ]
    ix = OracleIndex.build(rows)
    out = {}
    for q in query_set():
        res = ix.search(q["query_text"], q["lang"], q["k"])
        out[q["query_id"]] = [(i + 1, d, s) for i, (d, s) in enumerate(res)]
    return out


def test_corpus_is_partition_invariant(spark, tmp_path):
    from pyspark.sql import functions as F

    p1 = write_corpus(spark, str(tmp_path / "a"), sf=0.001, n_partitions=2)
    p2 = write_corpus(spark, str(tmp_path / "b"), sf=0.001, n_partitions=16)
    a = spark.read.parquet(p1)
    b = spark.read.parquet(p2)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # matches driver-side generation too
    pdf = gen_corpus_pandas(0.001)
    assert a.count() == len(pdf)
    sample = a.orderBy("repo", "path").limit(5).collect()
    ref = pdf.sort_values(["repo", "path"]).head(5)
    assert [r["content"] for r in sample] == list(ref["content"])


def test_sha_invariant_and_rare_term(spark, sf001_index):
    corpus_path, paths = sf001_index
    assert verify_sha_invariant(spark, corpus_path, paths) == 0
    term_stats = spark.read.parquet(paths.term_stats)
    rare = term_stats.filter(term_stats.term == RARE_TERM).collect()
    assert len(rare) == 1 and rare[0]["df"] == 1
    assert term_stats.filter(term_stats.term == ABSENT_TERM).count() == 0


def test_bruteforce_matches_oracle(spark, sf001_index, oracle_results):
    _, paths = sf001_index
    got = _collect_results(bm25_bruteforce(spark, paths, query_set()))
    for q in query_set():
        qid = q["query_id"]
        exp = oracle_results.get(qid, [])
        assert got.get(qid, []) == exp, f"query {qid} ({q['query_text']!r})"


def test_wand_matches_bruteforce_and_oracle(spark, sf001_index, oracle_results):
    """All four execution paths agree: DataFrame brute force, the pinned
    block-max WAND kernel, the hybrid default (vectorized exhaustive at this
    scale), and the pure-Python oracle."""
    _, paths = sf001_index
    brute = _collect_results(bm25_bruteforce(spark, paths, query_set()))
    wand = _collect_results(bm25_wand(spark, paths, query_set(), force_wand=True))
    hybrid = _collect_results(bm25_wand(spark, paths, query_set()))
    for q in query_set():
        qid = q["query_id"]
        assert wand.get(qid, []) == brute.get(qid, []), f"query {qid} wand!=brute"
        assert wand.get(qid, []) == oracle_results.get(qid, []), f"query {qid} wand!=oracle"
        assert hybrid.get(qid, []) == wand.get(qid, []), f"query {qid} hybrid!=wand"


def test_empty_and_rare_queries(spark, sf001_index, oracle_results):
    _, paths = sf001_index
    res = _collect_results(bm25_wand(spark, paths, query_set()))
    qids = {q["query_text"]: q["query_id"] for q in query_set()}
    assert qids[ABSENT_TERM] not in res or res[qids[ABSENT_TERM]] == []
    assert qids["def return import"] not in res  # fully stoplisted
    assert len(res[qids[RARE_TERM]]) == 1  # df=1 planted term


def test_resume_after_injected_failure(spark, tmp_path):
    corpus_path = write_corpus(spark, str(tmp_path), sf=0.001, n_partitions=4)
    ixdir = str(tmp_path / "ix")
    with pytest.raises(RuntimeError, match="injected failure"):
        build_index(spark, corpus_path, ixdir, fail_after_stage="stats")
    man = Manifest(ixdir)
    assert man.read_stage("stats")["status"] == "complete"
    assert man.read_stage("postings") is None
    # mtime marker: completed stages must NOT be recomputed on resume
    tf_mtime = os.path.getmtime(os.path.join(ixdir, "tf.parquet", "_SUCCESS"))
    paths = build_index(spark, corpus_path, ixdir)  # resume
    assert os.path.getmtime(os.path.join(ixdir, "tf.parquet", "_SUCCESS")) == tf_mtime
    assert man.read_stage("postings")["status"] == "complete"
    # resumed index answers identically to a from-scratch build
    full = build_index(spark, corpus_path, str(tmp_path / "ix2"))
    a = _collect_results(bm25_wand(spark, paths, query_set()))
    b = _collect_results(bm25_wand(spark, full, query_set()))
    assert a == b


def test_manifest_metrics_consistent(spark, sf001_index):
    _, paths = sf001_index
    man = Manifest(paths.root)
    postings = man.read_stage("postings")
    total = spark.read.parquet(paths.postings).groupBy().sum("n_postings").collect()[0][0]
    assert postings["totals"]["postings_emitted"] == total
    tf_total = spark.read.parquet(paths.tf).count()
    assert postings["totals"]["postings_emitted"] == tf_total
    assert man.read_stage("tf")["totals"]["postings_raw"] == tf_total
    assert postings["totals"]["bytes_compressed"] > 0


def test_distributed_matches_bruteforce(spark, sf001_index, oracle_results):
    """Partition-parallel scoring (bm25_distributed): rank-identical to the
    brute force / oracle, and a SINGLE query genuinely fans out across
    multiple kernel tasks (the round-1 review's one-task-per-query gap)."""
    from pyspark.sql import functions as F

    from horus_ner_spark.index.query import bm25_distributed

    _, paths = sf001_index
    got = _collect_results(bm25_distributed(spark, paths, query_set(), n_tasks=8))
    for q in query_set():
        qid = q["query_id"]
        assert got.get(qid, []) == oracle_results.get(qid, []), f"query {qid}"

    # single-query fan-out evidence: the pruned block set for ONE query
    # really spreads across >1 of the 8 repartitioned kernel tasks
    one = [q for q in query_set() if q["query_text"] == "hash join merge sort"]
    blocks = (
        spark.read.parquet(paths.postings)
        .filter(F.col("term").isin(["hash", "join", "merge", "sort"]))
        .repartition(8)
        .select(F.spark_partition_id().alias("pid"))
        .distinct()
    )
    assert blocks.count() > 1
    single = _collect_results(bm25_distributed(spark, paths, one, n_tasks=8))
    assert single.get(one[0]["query_id"], []) == oracle_results.get(one[0]["query_id"], [])


def test_distributed_rejects_unknown_mode(spark, sf001_index):
    """Regression (round-3 review): an unrecognized mode must raise, not
    silently route into the conjunctive fan-out and score via the OR
    kernel with doc replication."""
    import pytest

    from horus_ner_spark.index.query import bm25_distributed

    _, paths = sf001_index
    bad = [{"query_id": 1, "query_text": "stream", "lang": "python",
            "k": 5, "mode": "PHARSE"}]
    with pytest.raises(ValueError, match="unknown query mode"):
        bm25_distributed(spark, paths, bad)
