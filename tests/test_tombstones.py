"""Document deletes (index/tombstones.py): tombstoned docs are excluded
on every serving surface with RECONCILED stats — results rank- AND
score-identical to a fresh build of the surviving corpus — and the purge
merge removes them physically (byte-identical to that fresh build).

Reference analog: the reference retires processed rows with in-place
UPDATE flags (src/core/util/sqlite_helper.py); the log-structured index's
analog is Lucene-style tombstones + compaction purge.
"""

import numpy as np
import pytest

from horus_ner_spark.corpus import gen_corpus_pandas, query_set
from horus_ner_spark.index import tombstones
from horus_ner_spark.index.build import build_index
from horus_ner_spark.index.serve import IndexServer


def _batch_rows(srv, qs):
    return sorted(
        (int(r.query_id), int(r.rank), int(r.doc_id), float(r.score))
        for r in srv.search_batch(qs).itertuples()
    )


def _rows(df):
    return [
        (int(r.rank), int(r.doc_id), float(r.score)) for r in df.itertuples()
    ]


@pytest.fixture(scope="module")
def split_build(spark, tmp_path_factory):
    """One corpus built twice: FULL (240 docs) and SURVIVORS-only (the
    fresh-rebuild oracle), plus the doc_ids of the 40 deleted docs."""
    root = tmp_path_factory.mktemp("tomb")
    corpus = gen_corpus_pandas(sf=0.001).iloc[:240]
    full_cp = str(root / "full.parquet")
    spark.createDataFrame(corpus).write.parquet(full_cp)
    full = build_index(spark, full_cp, str(root / "ix_full"))

    surv_cp = str(root / "surv.parquet")
    spark.createDataFrame(corpus.iloc[40:]).write.parquet(surv_cp)
    surv = build_index(spark, surv_cp, str(root / "ix_surv"))

    # the deleted docs' GLOBAL ids, read back from the full build's docs
    # table by key (doc_id derivation is content-independent of the split)
    import pyarrow.parquet as pq

    docs = pq.read_table(full.docs).to_pandas()
    key = docs.set_index(["repo", "path", "commit"])["doc_id"]
    dead = corpus.iloc[:40]
    dead_ids = [
        int(key.loc[(r.repo, r.path, r.commit)])
        for r in dead.itertuples()
    ]
    assert len(set(dead_ids)) == 40
    return root, full, surv, dead_ids


def test_delete_docs_module_roundtrip(tmp_path):
    d = str(tmp_path / "ix")
    import os

    os.makedirs(d)
    assert tombstones.delete_docs(d, []) is None
    assert len(tombstones.read_tombstones(d)) == 0
    f1 = tombstones.delete_docs(d, [5, 3, 5, -7])
    f2 = tombstones.delete_docs(d, [3, 11])
    assert f1 != f2 and len(tombstones.tombstone_files(d)) == 2
    got = tombstones.read_tombstones(d)
    assert got.tolist() == [-7, 3, 5, 11]  # union, sorted unique
    assert got.dtype == np.int64
    assert tombstones.clear_tombstones(d) == 2
    assert len(tombstones.read_tombstones(d)) == 0


def test_read_tombstones_cap(tmp_path, monkeypatch):
    d = str(tmp_path / "ix")
    import os

    os.makedirs(d)
    tombstones.delete_docs(d, range(10))
    monkeypatch.setenv("HORUS_MAX_TOMBSTONES", "5")
    with pytest.raises(RuntimeError, match="compaction/purge"):
        tombstones.read_tombstones(d)


def test_serve_tombstones_score_identical_to_rebuild(split_build):
    """The core contract: delete docs -> every serve surface answers
    exactly as a fresh build of the surviving corpus (rank AND score),
    before any purge merge."""
    _root, full, surv, dead_ids = split_build
    tombstones.delete_docs(full.root, dead_ids[:25])
    tombstones.delete_docs(full.root, dead_ids[25:])
    try:
        tomb_srv = IndexServer(full.root)
        oracle = IndexServer(surv.root)
        # reconciled corpus stats match the rebuild bit-exactly
        assert tomb_srv.n_docs == oracle.n_docs
        assert tomb_srv.avgdl == oracle.avgdl
        qs = query_set()
        assert _batch_rows(tomb_srv, qs) == _batch_rows(oracle, qs)
        # every mode, the facet surface, and a NOT veto on top
        for kw in (
            dict(mode="AND"),
            dict(mode="PHRASE"),
            dict(mode="NEAR", slop=6),
            dict(mode="OR", exclude_text="cache"),
        ):
            a = tomb_srv.search("parse config node", k=25, **kw)
            b = oracle.search("parse config node", k=25, **kw)
            assert _rows(a) == _rows(b), kw
        fa = tomb_srv.facets("config", by=("lang", "repo"))
        fb = oracle.facets("config", by=("lang", "repo"))
        assert fa.values.tolist() == fb.values.tolist()
        # no tombstoned doc ever surfaces, even at k >> corpus
        big = tomb_srv.search("config parse tree node cache", k=100_000)
        assert not set(big["doc_id"].astype("int64")) & set(dead_ids)
    finally:
        tombstones.clear_tombstones(full.root)


def test_multi_segment_tombstones(spark, tmp_path):
    """Streaming-shaped case: tombstones at an EXTRA root dir apply across
    the whole tier set, including a doc duplicated across segments (its
    stale copy and its live copy are both dead)."""
    corpus = gen_corpus_pandas(sf=0.001).iloc[:180]
    segs = []
    # overlap: docs 60:90 appear in BOTH segments (first-wins dedupe)
    for i, sl in enumerate((slice(0, 90), slice(60, 180))):
        cp = str(tmp_path / f"c{i}.parquet")
        spark.createDataFrame(corpus.iloc[sl]).write.parquet(cp)
        segs.append(build_index(spark, cp, str(tmp_path / f"ix{i}")))
    surv_cp = str(tmp_path / "surv.parquet")
    spark.createDataFrame(corpus.iloc[75:]).write.parquet(surv_cp)
    surv = build_index(spark, surv_cp, str(tmp_path / "ix_surv"))

    import pyarrow.parquet as pq

    docs = pq.read_table(segs[0].docs).to_pandas()
    key = docs.set_index(["repo", "path", "commit"])["doc_id"]
    dead_ids = [
        int(key.loc[(r.repo, r.path, r.commit)])
        for r in corpus.iloc[:75].itertuples()
    ]
    stream_root = str(tmp_path / "stream_root")
    import os

    os.makedirs(stream_root)
    tombstones.delete_docs(stream_root, dead_ids)
    multi = IndexServer(
        [s.root for s in segs],
        extra_tombstone_dirs=(tombstones.tombstones_dir(stream_root),),
    )
    oracle = IndexServer(surv.root)
    assert multi.n_docs == oracle.n_docs
    assert multi.avgdl == oracle.avgdl
    qs = query_set()
    assert _batch_rows(multi, qs) == _batch_rows(oracle, qs)
    ph_a = multi.search("parse_config", k=10, mode="PHRASE")
    ph_b = oracle.search("parse_config", k=10, mode="PHRASE")
    assert _rows(ph_a) == _rows(ph_b)


def _sig(spark, paths):
    from pyspark.sql import functions as F

    rows = (
        spark.read.parquet(paths.postings)
        .select("term", "rb", "min_doc_id", "n_postings", "block_cf",
                F.md5(F.base64("doc_ids_vb")).alias("dh"),
                F.md5(F.base64("tfs_vb")).alias("th"),
                F.md5(F.base64("pos_vb")).alias("ph"),
                F.bround("block_max_tfnorm", 9).alias("bm"))
        .collect()
    )
    return sorted(map(tuple, rows))


def test_purge_merge_byte_identical_to_rebuild(spark, split_build, tmp_path):
    """The physical half: a purge merge drops the tombstoned docs from
    docs/doclens/postings, recomputes stats, and its canonical block form
    is BYTE-IDENTICAL to a fresh build of the surviving corpus."""
    from horus_ner_spark.index.merge import merge_indexes

    _root, full, surv, dead_ids = split_build
    tombstones.delete_docs(full.root, dead_ids)
    try:
        tomb = tombstones.read_tombstones(full.root)
        purged = merge_indexes(
            spark, [full], str(tmp_path / "purged"), tombstones=tomb
        )
    finally:
        tombstones.clear_tombstones(full.root)

    assert _sig(spark, purged) == _sig(spark, surv)
    stats = lambda p: sorted(  # noqa: E731
        map(tuple, spark.read.parquet(p.term_stats)
            .select("term", "df", "cf").collect())
    )
    assert stats(purged) == stats(surv)
    a, b = IndexServer(purged.root), IndexServer(surv.root)
    assert (a.n_docs, a.avgdl) == (b.n_docs, b.avgdl)
    qs = query_set()
    assert _batch_rows(a, qs) == _batch_rows(b, qs)
    # fsck accepts the purged index end-to-end
    from horus_ner_spark.index.fsck import fsck

    report = fsck(spark, purged.root, deep=True)
    assert report["ok"], report


def test_gc_tombstones_drops_only_fully_purged_files(
        spark, split_build, tmp_path):
    """gc removes a tombstone file only when NO active segment still holds
    any of its ids — a file naming one live doc survives."""
    from horus_ner_spark.index.merge import merge_indexes

    _root, full, _surv, dead_ids = split_build
    root = str(tmp_path)
    f_dead = tombstones.delete_docs(root, dead_ids[:10])
    tomb = tombstones.read_tombstones(root)
    purged = merge_indexes(
        spark, [full], str(tmp_path / "purged_gc"), tombstones=tomb
    )
    # one file fully purged, one naming a doc still live in the new index
    import pyarrow.parquet as pq

    live_id = int(pq.read_table(
        purged.docs, columns=["doc_id"]
    )["doc_id"][0].as_py())
    f_mixed = tombstones.delete_docs(root, [dead_ids[0], live_id])
    removed = tombstones.gc_tombstones(root, [purged.root])
    assert removed == [f_dead]
    assert tombstones.tombstone_files(root) == [f_mixed]


def test_smallseg_purge_canonical(spark, split_build, tmp_path):
    """The local (smallseg) purge merge and the distributed purge merge
    produce the same canonical block form — the streaming compaction
    ladder purges deletes without leaving the fast path."""
    from horus_ner_spark.index.merge import merge_indexes

    _root, full, surv, dead_ids = split_build
    tomb = np.asarray(sorted(dead_ids), dtype=np.int64)
    local = merge_indexes(
        spark, [full], str(tmp_path / "p_local"),
        small_max_bytes=1 << 40, tombstones=tomb,
    )
    dist = merge_indexes(
        spark, [full], str(tmp_path / "p_dist"), tombstones=tomb
    )
    assert _sig(spark, local) == _sig(spark, dist) == _sig(spark, surv)
    a, b = IndexServer(local.root), IndexServer(surv.root)
    assert (a.n_docs, a.avgdl) == (b.n_docs, b.avgdl)


def test_streaming_delete_lifecycle(spark, tmp_path):
    """delete -> ingest-gate -> compaction purge -> tombstone GC ->
    re-add: the full streaming delete lifecycle.

    1. two micro-batch units; root tombstones delete 30 docs across both;
    2. re-delivering 10 of the deleted docs while the tombstone is LIVE
       does NOT resurrect them (ingest gate);
    3. enough batches + fanout=2 cascades compaction over every unit:
       deletes are purged physically and the tombstone files GC;
    4. after GC, the same documents ingest fresh and serve again.
    """
    from horus_ner_spark.streaming.incremental import (
        active_units,
        incremental_index_stream,
    )

    corpus = gen_corpus_pandas(sf=0.001).iloc[:300]
    landing = tmp_path / "landing"
    landing.mkdir()
    ix_root = str(tmp_path / "stream_ix")
    cp = str(tmp_path / "cp")

    def run(fanout=8):
        q = incremental_index_stream(
            spark, str(landing), ix_root, cp, fanout=fanout
        )
        q.awaitTermination(300)
        assert q.exception() is None, q.exception()

    corpus.iloc[:150].to_parquet(landing / "d1.parquet", index=False)
    run()
    corpus.iloc[150:260].to_parquet(landing / "d2.parquet", index=False)
    run()

    from horus_ner_spark.functions.xxhash import doc_ids_from_cols

    dead = corpus.iloc[100:130]
    dead_ids = doc_ids_from_cols(
        dead["repo"].tolist(), dead["path"].tolist(), dead["commit"].tolist()
    )
    tombstones.delete_docs(ix_root, dead_ids)
    tomb_dirs = (tombstones.tombstones_dir(ix_root),)

    def serve():
        return IndexServer(
            [p for _l, p in active_units(ix_root)],
            extra_tombstone_dirs=tomb_dirs,
        )

    n_live = serve().n_docs
    assert n_live == 260 - 30

    # 2. re-delivery of deleted docs while the tombstone is live: gated
    dead.iloc[:10].to_parquet(landing / "d3_redeliver.parquet", index=False)
    run()
    assert serve().n_docs == n_live  # nothing resurrected

    # 3. cascade compaction over every unit -> physical purge + GC
    corpus.iloc[260:280].to_parquet(landing / "d4.parquet", index=False)
    run(fanout=2)
    corpus.iloc[280:300].to_parquet(landing / "d5.parquet", index=False)
    run(fanout=2)
    assert tombstones.tombstone_files(ix_root) == [], (
        "all deleted ids purged -> tombstone files must GC"
    )
    srv = serve()
    assert srv.n_docs == 300 - 30
    r = srv.search("parse config node", k=100_000)
    assert not set(r["doc_id"].astype("int64")) & set(
        int(x) for x in dead_ids
    )

    # 4. after GC the same docs ingest fresh and serve again
    dead.iloc[:10].to_parquet(landing / "d6_readd.parquet", index=False)
    run(fanout=2)
    assert serve().n_docs == 300 - 30 + 10


def test_delete_matching_predicate(spark, split_build, tmp_path):
    """Predicate deletes tombstone exactly the matching docs, and the cap
    is a loud error, not a silent truncation."""
    import pyarrow.parquet as pq

    _root, full, _surv, _dead = split_build
    docs = pq.read_table(full.docs).to_pandas()
    victim_repo = docs["repo"].iloc[0]
    expect = set(
        docs.loc[docs["repo"] == victim_repo, "doc_id"].astype("int64")
    )
    try:
        n = tombstones.delete_matching(
            spark, full.root, f"repo = '{victim_repo}'"
        )
        assert n == len(expect)
        assert set(tombstones.read_tombstones(full.root).tolist()) == expect
        with pytest.raises(RuntimeError, match="narrower batches"):
            tombstones.delete_matching(
                spark, full.root, "doc_id IS NOT NULL", max_delete=10
            )
    finally:
        tombstones.clear_tombstones(full.root)
