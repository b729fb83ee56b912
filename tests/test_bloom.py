"""Bloom-gated ingest dedup (streaming/bloom.py): filter correctness
(no false negatives, bounded fpr, IO round-trip) and the exact-dedup
contract through the streaming path with re-delivered documents."""

import os

import numpy as np
import pytest

from horus_ner_spark.streaming.bloom import (
    DocIdBloom,
    bloom_path,
    load_combined_bloom,
)


def test_bloom_no_false_negatives_and_fpr():
    rng = np.random.default_rng(7)
    members = rng.integers(-(2**62), 2**62, size=20_000, dtype=np.int64)
    bl = DocIdBloom.sized_for(len(members), fpr=0.01)
    bl.add(members)
    # zero false negatives, ever
    assert bl.may_contain(members).all()
    # false-positive rate near the design point (generous 3x bound)
    probes = rng.integers(-(2**62), 2**62, size=50_000, dtype=np.int64)
    probes = np.setdiff1d(probes, members)
    fpr = bl.may_contain(probes).mean()
    assert fpr < 0.03, fpr


def test_bloom_roundtrip_union(tmp_path):
    a = DocIdBloom.sized_for(100, fpr=0.01)
    b = DocIdBloom(a.n_bits, a.k)
    ids_a = np.arange(0, 100, dtype=np.int64)
    ids_b = np.arange(1000, 1100, dtype=np.int64)
    a.add(ids_a)
    b.add(ids_b)
    u = a.union(b)
    assert u.may_contain(ids_a).all() and u.may_contain(ids_b).all()
    p = str(tmp_path / "x" / "docs.bloom")
    os.makedirs(os.path.dirname(p))
    u.save(p)
    loaded = DocIdBloom.load(p)
    assert loaded.n_bits == u.n_bits and loaded.k == u.k
    assert (loaded.bits == u.bits).all()
    # shape mismatch refuses to union...
    with pytest.raises(ValueError):
        a.union(DocIdBloom.sized_for(10_000))
    # ...but BloomSet composes mixed shapes (the normal multi-unit case)
    from horus_ner_spark.streaming.bloom import BloomSet

    big = DocIdBloom.sized_for(10_000)
    big.add(np.arange(5000, 5100, dtype=np.int64))
    bs = BloomSet([a, b, big])
    assert bs.may_contain(ids_a).all() and bs.may_contain(ids_b).all()
    assert bs.may_contain(np.arange(5000, 5100, dtype=np.int64)).all()
    rt = BloomSet.from_spec(bs.to_spec())
    assert rt.may_contain(ids_a).all()
    # same-shape members compact into one bit array; the odd shape stays
    assert len(bs.filters) == 2
    # combined load falls back (None) when a sidecar is missing or torn
    assert load_combined_bloom([str(tmp_path / "x"), str(tmp_path / "y")]) is None
    assert load_combined_bloom([str(tmp_path / "x")]) is not None
    with open(p, "wb") as f:
        f.write(b"HBLM1\n999999 7\ntrunc")
    assert load_combined_bloom([str(tmp_path / "x")]) is None


def test_stream_bloom_dedup_exact_with_redelivery(spark, tmp_path):
    """Re-delivered docs in a later batch are dropped exactly (bloom gate +
    exact anti-join); every live unit carries a sidecar; the second
    segment holds only the genuinely new docs."""
    from horus_ner_spark.corpus import gen_corpus_pandas
    from horus_ner_spark.streaming.incremental import (
        active_units,
        incremental_index_stream,
    )

    corpus = gen_corpus_pandas(sf=0.001).iloc[:240]
    landing = tmp_path / "landing"
    landing.mkdir()
    ix_root = str(tmp_path / "ix_root")
    cp = str(tmp_path / "cp")

    corpus.iloc[:160].to_parquet(landing / "d1.parquet", index=False)
    q = incremental_index_stream(spark, str(landing), ix_root, cp)
    q.awaitTermination(300)
    assert q.exception() is None, q.exception()
    units = active_units(ix_root)
    assert all(os.path.exists(bloom_path(p)) for _l, p in units)

    # batch 2: 80 re-delivered + 80 new
    corpus.iloc[80:].to_parquet(landing / "d2.parquet", index=False)
    q = incremental_index_stream(spark, str(landing), ix_root, cp)
    q.awaitTermination(300)
    assert q.exception() is None, q.exception()

    seg1_docs = spark.read.parquet(
        os.path.join(ix_root, "seg_1", "ix", "docs.parquet")
    )
    assert seg1_docs.count() == 80  # only the new docs survived dedup
    # no doc_id appears in two segments
    seg0_docs = spark.read.parquet(
        os.path.join(ix_root, "seg_0", "ix", "docs.parquet")
    )
    assert seg0_docs.join(seg1_docs, "doc_id").count() == 0
    units = active_units(ix_root)
    assert all(os.path.exists(bloom_path(p)) for _l, p in units)

    # batch 3: re-delivery spanning BOTH live units (whose filters have
    # different shapes — 160 vs 80 docs) + 30 new docs: the BloomSet gate
    # must implicate both units and keep only the new docs
    import pandas as pd

    big = gen_corpus_pandas(sf=0.001).iloc[:270]
    pd.concat([big.iloc[40:200], big.iloc[240:270]]).to_parquet(
        landing / "d3.parquet", index=False
    )
    q = incremental_index_stream(spark, str(landing), ix_root, cp)
    q.awaitTermination(300)
    assert q.exception() is None, q.exception()
    seg2_docs = spark.read.parquet(
        os.path.join(ix_root, "seg_2", "ix", "docs.parquet")
    )
    assert seg2_docs.count() == 30
    for older in (seg0_docs, seg1_docs):
        assert older.join(seg2_docs, "doc_id").count() == 0


def test_stream_bloom_all_duplicates_batch(spark, tmp_path):
    """A batch that is 100% re-delivery dedupes to nothing: no unit is
    built for it (no empty-corpus build), the stream keeps running, and
    the live set still serves the original content."""
    from horus_ner_spark.corpus import gen_corpus_pandas
    from horus_ner_spark.streaming.incremental import (
        active_units,
        incremental_index_stream,
    )

    corpus = gen_corpus_pandas(sf=0.001).iloc[:120]
    landing = tmp_path / "landing"
    landing.mkdir()
    ix_root = str(tmp_path / "ix_root")
    cp = str(tmp_path / "cp")
    corpus.to_parquet(landing / "d1.parquet", index=False)
    q = incremental_index_stream(spark, str(landing), ix_root, cp)
    q.awaitTermination(300)
    assert q.exception() is None, q.exception()
    corpus.to_parquet(landing / "d2.parquet", index=False)  # pure re-delivery
    q = incremental_index_stream(spark, str(landing), ix_root, cp)
    q.awaitTermination(300)
    assert q.exception() is None, q.exception()
    # seg_1 holds the (empty) deduped corpus but never became a live unit
    assert not os.path.exists(
        os.path.join(ix_root, "seg_1", "ix", "postings.parquet", "_SUCCESS")
    )
    assert [lvl for lvl, _p in active_units(ix_root)] == [0]
