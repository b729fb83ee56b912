"""Streaming surfaces: the log-structured tiered segment index equals the
single-shot build (exactly-once across restarts via checkpoint + manifest +
deterministic compaction), compaction does bounded work, and the
watermarked window agg equals its batch form."""

import os
import shutil

import pytest

from horus_ner_spark.corpus import gen_corpus_pandas, query_set
from horus_ner_spark.index.build import IndexPaths, build_index
from horus_ner_spark.index.query import bm25_wand, bm25_wand_segments
from horus_ner_spark.streaming import incremental
from horus_ner_spark.streaming.incremental import (
    active_units,
    incremental_index_stream,
    segment_paths,
    windowed_event_counts,
)

SF_DIR = "/root/testdata/sf0.001"


def _merged_results(spark, paths):
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in bm25_wand(spark, paths, query_set()).collect()
    )


def _segment_results(spark, ix_root):
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in bm25_wand_segments(
            spark, segment_paths(ix_root), query_set()
        ).collect()
    )


def test_incremental_stream_equals_single_shot(spark, tmp_path):
    corpus = gen_corpus_pandas(sf=0.001).iloc[:300]
    landing = tmp_path / "landing"
    landing.mkdir()
    ix_root = str(tmp_path / "stream_ix")
    cp = str(tmp_path / "cp")

    # drop 1 -> one micro-batch -> segment 0
    corpus.iloc[:180].to_parquet(landing / "drop1.parquet", index=False)
    q1 = incremental_index_stream(spark, str(landing), ix_root, cp)
    q1.awaitTermination(300)
    assert q1.exception() is None, q1.exception()

    # drop 2 -> restart from checkpoint -> ONLY the new file is processed
    corpus.iloc[180:].to_parquet(landing / "drop2.parquet", index=False)
    q2 = incremental_index_stream(spark, str(landing), ix_root, cp)
    q2.awaitTermination(300)
    assert q2.exception() is None, q2.exception()
    segs = [d for d in os.listdir(ix_root) if d.startswith("seg_")]
    assert len(segs) == 2, segs
    assert len(active_units(ix_root)) == 2  # below fanout: no compaction

    # single-shot reference build over the same 300 docs
    full_corpus = str(tmp_path / "full/corpus.parquet")
    spark.createDataFrame(corpus).write.parquet(full_corpus)
    full = build_index(spark, full_corpus, str(tmp_path / "full/ix"))

    # query-time segment merge is rank-identical to the merged index
    assert _segment_results(spark, ix_root) == _merged_results(spark, full)

    # phrase + AND modes are segment-local too
    for mode in ("PHRASE", "AND"):
        q = [{"query_id": 1, "query_text": "parse_config", "lang": "python",
              "k": 10, "mode": mode}]
        seg = sorted(
            tuple(r) for r in bm25_wand_segments(
                spark, segment_paths(ix_root), q
            ).collect()
        )
        ref = sorted(tuple(r) for r in bm25_wand(spark, full, q).collect())
        assert seg == ref and len(seg) > 0, mode


def test_tiered_compaction_bounds_merge_work(spark, tmp_path, monkeypatch):
    """fanout=2, 4 drops: compaction must run exactly 3 bounded merges
    (s0+s1 -> T1; s2+s3 -> T1'; T1+T1' -> T2) — each with exactly `fanout`
    inputs — instead of re-merging every segment per batch (round-1
    behavior: 2+3+4 segment re-encodes).  The final tier set collapses to
    one unit and still answers rank-identically to a single-shot build."""
    from horus_ner_spark.index import merge as merge_mod

    calls = []
    real_merge = merge_mod.merge_indexes

    def counting_merge(spark_, segments, out_dir, **kw):
        calls.append(len(segments))
        return real_merge(spark_, segments, out_dir, **kw)

    monkeypatch.setattr(
        "horus_ner_spark.index.merge.merge_indexes", counting_merge
    )

    corpus = gen_corpus_pandas(sf=0.001).iloc[:200]
    landing = tmp_path / "landing"
    landing.mkdir()
    ix_root = str(tmp_path / "stream_ix")
    cp = str(tmp_path / "cp")
    for i in range(4):
        corpus.iloc[i * 50 : (i + 1) * 50].to_parquet(
            landing / f"drop{i}.parquet", index=False
        )
        q = incremental_index_stream(spark, str(landing), ix_root, cp, fanout=2)
        q.awaitTermination(300)
        assert q.exception() is None, q.exception()

    assert calls == [2, 2, 2], calls  # 3 merges, each exactly fanout inputs
    assert len(active_units(ix_root)) == 1
    (lvl, _p) = active_units(ix_root)[0]
    assert lvl == 2

    # replayed compaction is a skip (deterministic tier names)
    n = incremental.compact_tiers(spark, ix_root, fanout=2)
    assert n == 0 and calls == [2, 2, 2]

    full_corpus = str(tmp_path / "full/corpus.parquet")
    spark.createDataFrame(corpus).write.parquet(full_corpus)
    full = build_index(spark, full_corpus, str(tmp_path / "full/ix"))
    assert _segment_results(spark, ix_root) == _merged_results(spark, full)

    # retention: absorbed unit data deletes; the live tier set and results
    # are untouched, and bookkeeping (inputs.json) survives
    removed = incremental.gc_absorbed_units(ix_root)
    assert len(removed) >= 5  # 4 seg ix dirs + >=1 absorbed tier
    assert len(active_units(ix_root)) == 1
    assert not os.path.exists(os.path.join(ix_root, "seg_0", "ix"))
    assert os.path.exists(os.path.join(ix_root, "seg_0", "corpus.parquet"))
    assert _segment_results(spark, ix_root) == _merged_results(spark, full)


def test_windowed_counts_stream_equals_batch(spark, tmp_path):
    events_dir = tmp_path / "events_in"
    events_dir.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", events_dir / "events.parquet")
    batch_df = spark.read.parquet(str(events_dir))

    expected = sorted(
        tuple(r) for r in windowed_event_counts(spark, batch_df).collect()
    )

    stream = spark.readStream.schema(batch_df.schema).parquet(str(events_dir))
    q = (
        windowed_event_counts(spark, stream)
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "cp2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = sorted(tuple(r) for r in spark.sql("SELECT * FROM win_counts").collect())
    assert got == expected and len(got) > 0


def test_unit_age_key_orders_numerically():
    """Regression: seg_10 must compact AFTER seg_2 (numeric batch order,
    not lexicographic)."""
    from horus_ner_spark.streaming.incremental import _unit_age_key

    paths = [f"/ix/seg_{i}/ix" for i in (0, 2, 10, 11, 3)]
    ordered = sorted(paths, key=_unit_age_key)
    assert ordered == [f"/ix/seg_{i}/ix" for i in (0, 2, 3, 10, 11)]
    tiers = ["/ix/tiers/L1_aa", "/ix/tiers/L1_bb"]
    assert sorted(tiers, key=_unit_age_key) == tiers
    assert _unit_age_key(paths[0]) < _unit_age_key(tiers[0])


def test_tier_seq_ignores_legacy_fallback_keys():
    """Round-4 (advice): a legacy tier without ``seq`` has fallback age key
    (1, 0, name); its 0 must not masquerade as batch id 0 when a new tier
    computes its creation sequence."""
    from horus_ner_spark.streaming.incremental import _tier_seq

    # seg_3 + legacy tier: seq comes from the segment, not the fallback 0
    assert _tier_seq([(0, 3, ""), (1, 0, "L1_abc")]) == 3
    # seq-carrying tiers: plain min
    assert _tier_seq([(0, 5, "L1_a"), (0, 2, "L1_b")]) == 2
    # all-legacy inputs: no seq at all (stays name-ordered)
    assert _tier_seq([(1, 0, "L1_a"), (1, 0, "L1_b")]) is None


def test_compaction_crash_mid_merge_replays_clean(spark, tmp_path, monkeypatch):
    """A merge that dies AFTER writing partial tier output but BEFORE the
    atomic inputs.json commit must leave the tier invisible (active_units
    ignores dirs without inputs.json) and be redone in full on the next
    compaction pass — final results rank-identical to a single-shot
    build.  This is the crash window between merge_indexes and
    fs_write_json_atomic in compact_tiers."""
    from horus_ner_spark.index import merge as merge_mod

    corpus = gen_corpus_pandas(sf=0.001).iloc[:120]
    landing = tmp_path / "landing"
    landing.mkdir()
    ix_root = str(tmp_path / "crash_ix")
    cp = str(tmp_path / "cp")
    # two drops below fanout -> no compaction inside the stream yet
    for i in range(2):
        corpus.iloc[i * 60 : (i + 1) * 60].to_parquet(
            landing / f"drop{i}.parquet", index=False
        )
        q = incremental_index_stream(
            spark, str(landing), ix_root, cp, fanout=8
        )
        q.awaitTermination(300)
        assert q.exception() is None, q.exception()
    assert len(active_units(ix_root)) == 2

    real_merge = merge_mod.merge_indexes

    def crashing_merge(spark_, segments, out_dir, **kw):
        real_merge(spark_, segments, out_dir, **kw)  # full partial output…
        raise RuntimeError("injected crash before inputs.json")

    monkeypatch.setattr(
        "horus_ner_spark.index.merge.merge_indexes", crashing_merge
    )
    with pytest.raises(RuntimeError, match="injected crash"):
        incremental.compact_tiers(spark, ix_root, fanout=2)
    # the partial tier exists on disk but is NOT live
    tdir = os.path.join(ix_root, "tiers")
    partials = os.listdir(tdir)
    assert len(partials) == 1
    assert not os.path.exists(os.path.join(tdir, partials[0], "inputs.json"))
    assert len(active_units(ix_root)) == 2  # still serving the segments

    # replay without the fault: merge redone into the SAME deterministic
    # dir, inputs.json committed, one live tier
    monkeypatch.setattr(
        "horus_ner_spark.index.merge.merge_indexes", real_merge
    )
    n = incremental.compact_tiers(spark, ix_root, fanout=2)
    assert n == 1
    units = active_units(ix_root)
    assert len(units) == 1 and units[0][0] == 1
    assert os.path.exists(os.path.join(tdir, partials[0], "inputs.json"))

    full_corpus = str(tmp_path / "full/corpus.parquet")
    spark.createDataFrame(corpus).write.parquet(full_corpus)
    full = build_index(spark, full_corpus, str(tmp_path / "full/ix"))
    assert _segment_results(spark, ix_root) == _merged_results(spark, full)
