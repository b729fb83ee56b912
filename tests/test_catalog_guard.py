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


def test_manifest_exposes_wall_s(spark, tmp_path):
    from horus_ner_spark.corpus import write_corpus
    from horus_ner_spark.index.manifest import load_manifest_df

    cp = write_corpus(spark, str(tmp_path), sf=0.0002)
    build_index(spark, cp, str(tmp_path / "ix"))
    mdf = load_manifest_df(spark, str(tmp_path / "ix")).toPandas()
    per_stage = mdf.groupby("stage")["wall_s"].max()
    assert set(per_stage.index) >= {"docs", "tf", "stats", "term_stats", "postings"}
    assert (per_stage > 0).all()
