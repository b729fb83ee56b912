"""Catalog guardrails: components whose metrics/serving reads resolve file
layouts directly must fail fast (not mis-read) under a non-path table
format, and the manifest must expose per-stage wall-clock."""

import pytest

from horus_ner_spark import catalog
from horus_ner_spark.index.build import build_index
from horus_ner_spark.index.merge import merge_indexes
from horus_ner_spark.index.serve import IndexServer


def test_iceberg_refs_fail_fast(monkeypatch):
    monkeypatch.setenv(catalog.FORMAT_ENV, "iceberg")
    with pytest.raises(NotImplementedError, match="build_index"):
        build_index(None, "/nonexistent", "/tmp/_guard_ix")
    with pytest.raises(NotImplementedError, match="merge_indexes"):
        merge_indexes(None, [], "/tmp/_guard_merge")
    with pytest.raises(NotImplementedError, match="IndexServer"):
        IndexServer("/nonexistent")
    with pytest.raises(NotImplementedError, match="list_data_files"):
        catalog.list_data_files("/nonexistent")


def test_fs_layer_local_roundtrip(tmp_path):
    """The pyarrow.fs-backed helpers (the object-store switch point) behave
    on local paths: atomic JSON round-trip, dir listing, recursive file
    listing, tree removal."""
    root = str(tmp_path / "fsroot")
    catalog.fs_makedirs(root + "/a/b")
    catalog.fs_makedirs(root + "/c")
    assert catalog.fs_list_dirs(root) == ["a", "c"]
    assert catalog.fs_list_dirs(root + "/missing") == []
    meta = root + "/a/inputs.json"
    catalog.fs_write_json_atomic(meta, {"inputs": ["x"], "seq": 3})
    assert catalog.fs_exists(meta)
    assert catalog.fs_read_json(meta) == {"inputs": ["x"], "seq": 3}
    # no stray .tmp left behind; listing sees the data file, skips _ files
    with open(root + "/a/data.parquet", "w") as f:
        f.write("d")
    with open(root + "/a/_SUCCESS", "w") as f:
        f.write("")
    files = catalog.list_data_files(root)
    assert [p for p, _ in files] == ["a/data.parquet", "a/inputs.json"]
    catalog.fs_remove_tree(root + "/a")
    assert not catalog.fs_exists(meta)
    assert catalog.fs_list_dirs(root) == ["c"]


def test_fs_layer_uri_routing():
    """A URI ref routes through pyarrow.fs scheme dispatch — the object
    store deployment is a path-string switch (mock scheme must reach
    FileSystem.from_uri and fail THERE, not in a POSIX call)."""
    import pyarrow.lib

    with pytest.raises((pyarrow.lib.ArrowInvalid, OSError)):
        catalog.filesystem("notascheme://bucket/key")


def test_manifest_exposes_wall_s(spark, tmp_path):
    from horus_ner_spark.corpus import write_corpus
    from horus_ner_spark.index.manifest import load_manifest_df

    cp = write_corpus(spark, str(tmp_path), sf=0.0002)
    build_index(spark, cp, str(tmp_path / "ix"))
    mdf = load_manifest_df(spark, str(tmp_path / "ix")).toPandas()
    per_stage = mdf.groupby("stage")["wall_s"].max()
    assert set(per_stage.index) >= {"docs", "tf", "stats", "term_stats", "postings"}
    assert (per_stage > 0).all()
