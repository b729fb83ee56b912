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


def test_iceberg_branch_routes_identifiers(monkeypatch):
    """Round-4 (#4): the Iceberg runtime is absent in this sandbox, so the
    branch is exercised with stubs — read_table must route identifiers
    through spark.read.table (never .parquet), and write_table through the
    DataFrameWriterV2 (partitionedBy / createOrReplace / append) — proving
    the switch point is real routing, not dead config."""
    monkeypatch.setenv(catalog.FORMAT_ENV, "iceberg")

    calls = []

    class StubReader:
        def table(self, ref):
            calls.append(("read.table", ref))
            return "df-" + ref

        def parquet(self, ref):  # pragma: no cover - must never run
            raise AssertionError("iceberg read routed to parquet")

    class StubSpark:
        read = StubReader()

    assert catalog.read_table(StubSpark(), "horus.db.postings") == (
        "df-horus.db.postings"
    )
    assert calls == [("read.table", "horus.db.postings")]

    class StubWriterV2:
        def __init__(self, ref):
            self.ref = ref

        def partitionedBy(self, *cols):
            calls.append(("partitionedBy", len(cols)))
            return self

        def createOrReplace(self):
            calls.append(("createOrReplace", self.ref))

        def append(self):
            calls.append(("append", self.ref))

    class StubDF:
        def writeTo(self, ref):
            calls.append(("writeTo", ref))
            return StubWriterV2(ref)

        @property
        def write(self):  # pragma: no cover - must never run
            raise AssertionError("iceberg write routed to parquet writer")

    calls.clear()
    catalog.write_table(StubDF(), "horus.db.postings",
                        partition_by=("pbucket",))
    assert calls == [
        ("writeTo", "horus.db.postings"),
        ("partitionedBy", 1),
        ("createOrReplace", "horus.db.postings"),
    ]

    calls.clear()
    catalog.write_table(StubDF(), "horus.db.tf", mode="append")
    assert calls == [("writeTo", "horus.db.tf"), ("append", "horus.db.tf")]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unsupported mode"):
        catalog.write_table(StubDF(), "horus.db.tf", mode="ignore")


def test_iceberg_snapshot_and_branch_routing(monkeypatch):
    """Round-5 (#4 follow-up): pyiceberg / the Iceberg runtime jar cannot
    be installed in this sandbox (no network; attempt recorded in README),
    so snapshot/branch semantics are pinned with stubs: time-travel knobs
    must reach spark.read.option(...) EXACTLY as Iceberg's documented
    option names, must be mutually exclusive, and must hard-error under
    plain parquet (which has no snapshot log) instead of silently reading
    latest."""
    calls = []

    class StubReader:
        def option(self, k, v):
            calls.append(("option", k, v))
            return self

        def table(self, ref):
            calls.append(("table", ref))
            return "df-" + ref

        def parquet(self, ref):  # pragma: no cover - must never run
            raise AssertionError("iceberg read routed to parquet")

    class StubSpark:
        read = StubReader()

    monkeypatch.setenv(catalog.FORMAT_ENV, "iceberg")
    assert catalog.read_table(
        StubSpark(), "horus.db.postings", snapshot_id=123
    ) == "df-horus.db.postings"
    assert calls == [
        ("option", "snapshot-id", 123),
        ("table", "horus.db.postings"),
    ]

    calls.clear()
    catalog.read_table(StubSpark(), "horus.db.postings", branch="staging")
    assert calls == [
        ("option", "branch", "staging"),
        ("table", "horus.db.postings"),
    ]

    calls.clear()
    catalog.read_table(
        StubSpark(), "horus.db.postings", as_of_timestamp=1700000000000
    )
    assert calls == [
        ("option", "as-of-timestamp", 1700000000000),
        ("table", "horus.db.postings"),
    ]

    # conflicting knobs rejected
    with pytest.raises(ValueError, match="at most one"):
        catalog.read_table(
            StubSpark(), "horus.db.postings", snapshot_id=1, branch="b"
        )

    # parquet has no snapshot log: time travel is a hard error, and the
    # plain read still works
    monkeypatch.setenv(catalog.FORMAT_ENV, "parquet")
    with pytest.raises(NotImplementedError, match="snapshot log"):
        catalog.read_table(StubSpark(), "/some/path", snapshot_id=1)
