"""Small-segment fast path (index/smallseg.py): byte-identical to the
distributed builder — blocks, stats, docs, doc_ids — and interoperable
(query paths, serving, resume, merge) on the same corpus."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from horus_ner_spark.corpus import query_set, write_corpus
from horus_ner_spark.index.build import build_index
from horus_ner_spark.index.query import bm25_wand
from horus_ner_spark.index.smallseg import build_index_small
from horus_ner_spark.index.serve import IndexServer


def _sig(spark, path):
    rows = (
        spark.read.parquet(path)
        .select("term", "rb", "block_id", "min_doc_id", "max_doc_id",
                "n_postings",
                F.md5(F.base64("doc_ids_vb")).alias("dh"),
                F.md5(F.base64("tfs_vb")).alias("th"),
                F.md5(F.base64("doclens_vb")).alias("lh"),
                F.md5(F.base64("pos_vb")).alias("ph"),
                F.bround("block_max_tfnorm", 9).alias("bm"),
                "sub_min_doc_ids")
        .collect()
    )
    return sorted(
        (r["term"], r["rb"], r["block_id"], r["min_doc_id"],
         r["max_doc_id"], r["n_postings"], r["dh"], r["th"], r["lh"],
         r["ph"], r["bm"], tuple(r["sub_min_doc_ids"]))
        for r in rows
    )


@pytest.fixture(scope="module")
def both_builds(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("smallseg")
    cp = write_corpus(spark, str(root), sf=0.001)
    dist = build_index(spark, cp, str(root / "dist_ix"))
    small = build_index_small(spark, cp, str(root / "small_ix"))
    return spark, cp, dist, small


def test_blocks_byte_identical(both_builds):
    spark, _cp, dist, small = both_builds
    assert _sig(spark, small.postings) == _sig(spark, dist.postings)


def test_stats_and_docs_identical(both_builds):
    spark, _cp, dist, small = both_builds
    for attr in ("docs", "doclens", "term_stats"):
        a = sorted(
            map(tuple, spark.read.parquet(getattr(small, attr)).collect())
        )
        b = sorted(
            map(tuple, spark.read.parquet(getattr(dist, attr)).collect())
        )
        assert a == b, attr
    sa = spark.read.parquet(small.corpus_stats).collect()[0]
    sb = spark.read.parquet(dist.corpus_stats).collect()[0]
    assert tuple(sa) == tuple(sb)


def test_queries_and_serving_identical(both_builds):
    spark, _cp, dist, small = both_builds
    a = sorted(map(tuple, bm25_wand(spark, small, query_set()).collect()))
    b = sorted(map(tuple, bm25_wand(spark, dist, query_set()).collect()))
    assert a == b and len(a) > 0
    sa, sb = IndexServer(small.root), IndexServer(dist.root)
    for q in ("token index", "parse_config", "stream"):
        assert sa.search(q, "python", 10).equals(sb.search(q, "python", 10))
    assert sa.search("parse config", "python", 10, "NEAR", slop=4).equals(
        sb.search("parse config", "python", 10, "NEAR", slop=4)
    )


def test_small_path_resume_and_routing(spark, tmp_path):
    import time

    cp = write_corpus(spark, str(tmp_path), sf=0.0003)
    ix = str(tmp_path / "ix")
    with pytest.raises(RuntimeError, match="injected failure"):
        build_index(
            spark, cp, ix, fail_after_stage="stats",
            small_max_bytes=1 << 30,
        )
    paths = build_index(spark, cp, ix, small_max_bytes=1 << 30)
    t0 = time.perf_counter()
    build_index(spark, cp, ix, small_max_bytes=1 << 30)  # warm resume
    assert time.perf_counter() - t0 < 1.0
    assert spark.read.parquet(paths.postings).count() > 0
    # the gate: a tiny small_max_bytes falls back to the distributed path
    # (same corpus, fresh dir) and produces the same blocks
    dist = build_index(spark, cp, str(tmp_path / "ix2"), small_max_bytes=1)
    assert _sig(spark, dist.postings) == _sig(spark, paths.postings)


def test_small_merges_with_distributed_segment(spark, tmp_path):
    """A small-built segment and a Spark-built segment merge into the same
    canonical index as the single-shot distributed build of the union."""
    from horus_ner_spark.index.merge import merge_indexes

    corpus = spark.read.parquet(write_corpus(spark, str(tmp_path), sf=0.001))
    h = F.pmod(F.xxhash64("repo", "path"), F.lit(2))
    pa_, pb_ = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    corpus.filter(h == 0).write.parquet(pa_)
    corpus.filter(h == 1).write.parquet(pb_)
    seg_a = build_index_small(spark, pa_, str(tmp_path / "ix_a"))
    seg_b = build_index(spark, pb_, str(tmp_path / "ix_b"))
    merged = merge_indexes(spark, [seg_a, seg_b], str(tmp_path / "m"))
    full = build_index(
        spark,
        write_corpus(spark, str(tmp_path / "full"), sf=0.001),
        str(tmp_path / "full_ix"),
    )
    assert _sig(spark, merged.postings) == _sig(spark, full.postings)


def test_small_merge_canonical_identical(spark, tmp_path):
    """merge_indexes_small == distributed merge == single-shot build, on
    OVERLAPPING segments (first-wins dedupe + hot/cold demotion paths)."""
    from horus_ner_spark.index.merge import merge_indexes
    from horus_ner_spark.index.smallseg import merge_indexes_small

    cp = write_corpus(spark, str(tmp_path), sf=0.001)
    corpus = spark.read.parquet(cp)
    h = F.pmod(F.xxhash64("repo", "path"), F.lit(3))
    pa_, pb_ = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    corpus.filter(h < 2).write.parquet(pa_)     # overlaps with b on h == 1
    corpus.filter(h >= 1).write.parquet(pb_)
    seg_a = build_index_small(spark, pa_, str(tmp_path / "ix_a"))
    seg_b = build_index_small(spark, pb_, str(tmp_path / "ix_b"))
    small = merge_indexes_small(
        spark, [seg_a, seg_b], str(tmp_path / "m_small")
    )
    dist = merge_indexes(spark, [seg_a, seg_b], str(tmp_path / "m_dist"))
    assert _sig(spark, small.postings) == _sig(spark, dist.postings)
    full = build_index(spark, cp, str(tmp_path / "full_ix"))
    assert _sig(spark, small.postings) == _sig(spark, full.postings)
    for attr in ("docs", "doclens", "term_stats"):
        a = sorted(map(tuple, spark.read.parquet(getattr(small, attr)).collect()))
        b = sorted(map(tuple, spark.read.parquet(getattr(dist, attr)).collect()))
        assert a == b, attr
    sa = spark.read.parquet(small.corpus_stats).collect()[0]
    sb = spark.read.parquet(dist.corpus_stats).collect()[0]
    assert tuple(sa) == tuple(sb)
