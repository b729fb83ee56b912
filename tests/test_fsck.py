"""Index-integrity audit (fsck): a healthy index is violation-free, and
each injected corruption class is flagged by the check designed for it.
Corruption is injected by rewriting single parquet files with pyarrow —
the same thing bit rot / a partial overwrite / a buggy writer would do."""

import glob
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from horus_ner_spark.index.build import IndexPaths
from horus_ner_spark.index.fsck import fsck


def _copy_index(paths: IndexPaths, dst: str) -> IndexPaths:
    shutil.copytree(paths.root, dst)
    # drop Hadoop's .crc sidecars: tampering simulates LOGICAL corruption
    # (bad writer, mixed-version merge), the layer fsck audits; keeping a
    # stale crc would short-circuit the read before fsck sees the bytes
    for crc in glob.glob(os.path.join(dst, "**", ".*.crc"), recursive=True):
        os.remove(crc)
    return IndexPaths(dst)


def _postings_files(paths: IndexPaths) -> list[str]:
    return sorted(glob.glob(
        os.path.join(paths.postings, "pbucket=*", "*.parquet")))


def _rewrite(path: str, fn) -> None:
    """Read one parquet file, apply fn(dict-of-column-lists) -> same dict,
    write it back in place."""
    tbl = pq.read_table(path)
    cols = {name: tbl.column(name).to_pylist() for name in tbl.schema.names}
    fn(cols)
    out = pa.table(
        {name: pa.array(cols[name], type=tbl.schema.field(name).type)
         for name in tbl.schema.names})
    pq.write_table(out, path)


def _first_nonempty(paths: IndexPaths):
    for f in _postings_files(paths):
        if pq.read_metadata(f).num_rows > 0:
            return f
    raise AssertionError("no postings rows in fixture index")


def test_fsck_clean_shallow_and_deep(spark, sf001_index):
    _corpus, paths = sf001_index
    for deep in (False, True):
        rep = fsck(spark, paths, deep=deep)
        assert rep["ok"], rep
        assert rep["violations_total"] == 0
        assert rep["by_check"] == {}


def test_fsck_flags_metadata_payload_divergence(spark, sf001_index, tmp_path):
    """min_doc_id metadata tampered away from the encoded payload."""
    _corpus, paths = sf001_index
    ix = _copy_index(paths, str(tmp_path / "ix"))
    f = _first_nonempty(ix)

    def tamper(cols):
        cols["min_doc_id"][0] = cols["min_doc_id"][0] - 1

    _rewrite(f, tamper)
    rep = fsck(spark, ix, deep=True)
    assert not rep["ok"]
    assert rep["by_check"].get("min_doc_id_mismatch", 0) >= 1


def test_fsck_flags_truncated_payload(spark, sf001_index, tmp_path):
    """One byte cut off a tfs varbyte stream -> decoded count diverges."""
    _corpus, paths = sf001_index
    ix = _copy_index(paths, str(tmp_path / "ix"))
    f = _first_nonempty(ix)

    def tamper(cols):
        for i, (b, n) in enumerate(zip(cols["tfs_vb"], cols["n_postings"])):
            if n > 1:
                cols["tfs_vb"][i] = b[:-1]
                return
        raise AssertionError("no multi-posting block to truncate")

    _rewrite(f, tamper)
    rep = fsck(spark, ix, deep=True)
    assert not rep["ok"]
    hit = (rep["by_check"].get("block_count_mismatch", 0)
           + rep["by_check"].get("block_decode_error", 0))
    assert hit >= 1
    # shallow pass reads metadata only -> must NOT see payload corruption
    assert fsck(spark, ix, deep=False)["ok"]


def test_fsck_flags_term_stats_drift(spark, sf001_index, tmp_path):
    """Dictionary df bumped without touching postings."""
    _corpus, paths = sf001_index
    ix = _copy_index(paths, str(tmp_path / "ix"))
    f = sorted(glob.glob(
        os.path.join(ix.term_stats, "pbucket=*", "*.parquet")))[0]

    def tamper(cols):
        cols["df"][0] = cols["df"][0] + 1

    _rewrite(f, tamper)
    rep = fsck(spark, ix, deep=False)  # metadata tier alone must catch it
    assert not rep["ok"]
    assert rep["by_check"].get("term_df_mismatch", 0) == 1


def test_fsck_flags_misplaced_pbucket_file(spark, sf001_index, tmp_path):
    """A postings file moved into the wrong hash partition: invisible to
    partition-pruned queries, caught by the placement check."""
    _corpus, paths = sf001_index
    ix = _copy_index(paths, str(tmp_path / "ix"))
    files = _postings_files(ix)
    src = _first_nonempty(ix)
    src_bucket = os.path.basename(os.path.dirname(src))
    dst_dir = next(
        os.path.dirname(f) for f in files
        if os.path.basename(os.path.dirname(f)) != src_bucket)
    shutil.move(src, os.path.join(dst_dir, os.path.basename(src)))
    rep = fsck(spark, ix, deep=False)
    assert not rep["ok"]
    assert rep["by_check"].get("pbucket_misplaced", 0) >= 1


def test_fsck_flags_duplicate_doc_row(spark, sf001_index, tmp_path):
    """A doc row duplicated into the docs table (double ingest)."""
    _corpus, paths = sf001_index
    ix = _copy_index(paths, str(tmp_path / "ix"))
    f = sorted(glob.glob(os.path.join(ix.docs, "*.parquet")))[0]
    tbl = pq.read_table(f)
    pq.write_table(pa.concat_tables([tbl, tbl.slice(0, 1)]), f)
    rep = fsck(spark, ix, deep=False)
    assert not rep["ok"]
    assert rep["by_check"].get("docs_duplicate_doc_id", 0) == 1
    assert rep["by_check"].get("corpus_stats_ndocs_mismatch", 0) == 1
    assert rep["by_check"].get("docid_set_mismatch", 0) == 0  # same id set


def test_fsck_flags_block_cf_drift(spark, sf001_index, tmp_path):
    """block_cf metadata off by one: deep decode catches the block, and
    the metadata tier catches the term_stats cf sum."""
    _corpus, paths = sf001_index
    ix = _copy_index(paths, str(tmp_path / "ix"))
    f = _first_nonempty(ix)
    tampered_term = {}

    def tamper(cols):
        cols["block_cf"][0] = cols["block_cf"][0] + 1
        tampered_term["t"] = cols["term"][0]

    _rewrite(f, tamper)
    rep = fsck(spark, ix, deep=True)
    assert not rep["ok"]
    assert rep["by_check"].get("block_cf_mismatch", 0) == 1
    assert rep["by_check"].get("term_cf_mismatch", 0) == 1
    terms = {s["term"] for s in rep["sample"]}
    assert tampered_term["t"] in terms


def test_fsck_sample_is_bounded(spark, sf001_index, tmp_path):
    _corpus, paths = sf001_index
    ix = _copy_index(paths, str(tmp_path / "ix"))
    f = _first_nonempty(ix)

    def tamper(cols):
        cols["n_postings"] = [n + 1 for n in cols["n_postings"]]

    _rewrite(f, tamper)
    rep = fsck(spark, ix, deep=True, sample=5)
    assert not rep["ok"]
    assert len(rep["sample"]) == 5
    assert rep["violations_total"] > 5
