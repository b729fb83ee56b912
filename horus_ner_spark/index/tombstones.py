"""Document deletes via tombstone sidecars — the index's third lifecycle
verb (build, merge, DELETE).

The reference mutates rows in place to retire processed work
(reference: src/core/util/sqlite_helper.py UPDATE flows); an immutable
log-structured index cannot — the Lucene answer is tombstones: deletes
append doc_id sets next to the index, every serving surface excludes
tombstoned docs at query time, and compaction purges them physically.

This engine goes one step further than Lucene's "df drifts until merge":
tombstoned docs are folded into the SAME per-segment exclusion + stats
reconciliation machinery that multi-segment serving uses for stale
duplicates (serve.IndexServer._stale), so n_docs / avgdl / per-term df
are all corrected at query time and results are rank- AND
score-identical to a fresh build of the surviving corpus — before any
compaction runs.

Storage layout (pyarrow via the catalog fs layer — object-store safe):

    <index_or_stream_root>/tombstones/tomb-<seq>-<uuid>.parquet

Each file is one delete batch: a single sorted-unique int64 ``doc_id``
column.  Files are append-only and individually immutable; the set of
live tombstones is the union of all files.  A tombstone names a GLOBAL
doc_id (xxhash64 of the doc key), so one file covers every segment of a
streaming tier set; ``gc_tombstones`` drops a file once none of its ids
survive in any active segment (i.e. compaction has purged them all).

Scale shape: tombstone volume is bounded by the delete rate between
compactions, not by corpus size — the read path enforces a cap
(HORUS_MAX_TOMBSTONES) and fails loudly with "compact first", the same
contract as serve's stale-scan cap.  At 10^12 files the per-segment
intersection in the server costs one column-pruned doc_id scan per
segment (already paid for multi-segment stale detection) and the purge
rides the merge's existing decode/re-encode — no extra shuffle.
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from horus_ner_spark import catalog

TOMB_DIRNAME = "tombstones"
_FILE_PREFIX = "tomb-"


def tombstones_dir(index_dir: str) -> str:
    """The tombstone directory for an index root (or stream root)."""
    return os.path.join(index_dir, TOMB_DIRNAME)


def _max_tombstones() -> int:
    return int(os.environ.get("HORUS_MAX_TOMBSTONES", 10_000_000))


def tombstone_files(index_dir: str) -> list[str]:
    """Full refs of the tombstone files under ``index_dir`` (sorted)."""
    d = tombstones_dir(index_dir)
    return [
        os.path.join(d, name)
        for name in catalog.fs_list_files(d)
        if name.startswith(_FILE_PREFIX) and name.endswith(".parquet")
    ]


def _canon_ids(doc_ids) -> np.ndarray:
    ids = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
    return ids


def delete_docs(index_dir: str, doc_ids) -> str | None:
    """Append one delete batch (iterable of int64 doc_ids) as a new
    tombstone file; returns its ref, or None for an empty batch.

    The write is a single new file (atomic on POSIX rename / object-store
    PUT), never a rewrite of an existing one — concurrent deleters append
    independent files and the union stays correct."""
    ids = _canon_ids(doc_ids)
    if not len(ids):
        return None
    d = tombstones_dir(index_dir)
    catalog.fs_makedirs(d)
    seq = len(catalog.fs_list_files(d))
    ref = os.path.join(
        d, f"{_FILE_PREFIX}{seq:06d}-{uuid.uuid4().hex[:12]}.parquet"
    )
    tbl = pa.table({"doc_id": pa.array(ids, type=pa.int64())})
    fs, path = catalog.filesystem(ref)
    pq.write_table(tbl, path, filesystem=fs, compression="zstd")
    return ref


def delete_matching(spark, index_dir: str, predicate: str,
                    max_delete: int = 1_000_000) -> int:
    """Predicate delete: tombstone every doc of ``index_dir`` whose docs-table
    row matches the SQL ``predicate`` (e.g. ``"repo = 'acme/legacy'"``).

    Runs one column-pruned Spark filter over the docs table and collects
    ONLY the matching doc_ids, capped at ``max_delete`` — a predicate
    matching more is a loud error (delete in narrower batches), never an
    unbounded driver collect.  Returns the number of docs tombstoned."""
    from horus_ner_spark.index.build import IndexPaths

    docs = catalog.read_table(spark, IndexPaths(index_dir).docs)
    hit = docs.filter(predicate).select("doc_id").limit(max_delete + 1)
    ids = [r["doc_id"] for r in hit.collect()]
    if len(ids) > max_delete:
        raise RuntimeError(
            f"delete_matching predicate {predicate!r} matches more than "
            f"{max_delete} docs; delete in narrower batches (or raise "
            "max_delete)"
        )
    if ids:
        delete_docs(index_dir, ids)
    return len(ids)


def read_tombstones(index_dirs, extra_dirs=()) -> np.ndarray:
    """Sorted unique int64 union of every tombstone file under each of
    ``index_dirs`` (a ref or list of refs) plus each dir in
    ``extra_dirs`` (already-tombstone-dirs, e.g. a streaming root's).

    Capped at HORUS_MAX_TOMBSTONES — a set past the cap means compaction
    is overdue, and silently absorbing it would turn every query into a
    large-set exclusion scan."""
    dirs = [index_dirs] if isinstance(index_dirs, str) else list(index_dirs)
    refs: list[str] = []
    for d in dirs:
        refs.extend(tombstone_files(d))
    for td in extra_dirs:
        refs.extend(
            os.path.join(td, name)
            for name in catalog.fs_list_files(td)
            if name.startswith(_FILE_PREFIX) and name.endswith(".parquet")
        )
    if not refs:
        return np.array([], dtype=np.int64)
    parts = []
    for ref in refs:
        fs, path = catalog.filesystem(ref)
        parts.append(
            pq.read_table(path, filesystem=fs, columns=["doc_id"])
            ["doc_id"].to_numpy()
        )
    ids = np.unique(np.concatenate(parts)).astype(np.int64, copy=False)
    cap = _max_tombstones()
    if len(ids) > cap:
        raise RuntimeError(
            f"{len(ids)} tombstoned doc_ids across {len(refs)} files "
            f"exceed the cap ({cap}); run a compaction/purge merge first "
            "(or raise HORUS_MAX_TOMBSTONES)"
        )
    return ids


def clear_tombstones(index_dir: str) -> int:
    """Remove ALL tombstone files under ``index_dir`` (post-purge
    bookkeeping for a single-index purge merge, where the output dir is
    new and carries no tombstones).  Returns the number removed."""
    refs = tombstone_files(index_dir)
    for ref in refs:
        catalog.fs_remove_file(ref)
    return len(refs)


def gc_tombstones(root: str, active_dirs: list[str]) -> list[str]:
    """Drop tombstone files under ``root`` whose doc_ids no longer exist
    in ANY active segment's docs table — i.e. compaction has physically
    purged every doc the file named.  Returns the removed refs.

    Cost: one column-pruned doc_id read per active segment (the same
    scan multi-segment serving already pays, same cap) + a sorted
    membership test per file.  Per-unit Bloom sidecars
    (streaming/bloom.py) could pre-screen segments, but GC runs at
    compaction cadence, not query cadence, so the exact scan is fine."""
    from horus_ner_spark.index.build import IndexPaths

    refs = tombstone_files(root)
    if not refs:
        return []
    live_parts = []
    cap = int(os.environ.get("HORUS_SERVE_MAX_DOC_SCAN", 50_000_000))
    total = 0
    for d in active_dirs:
        fs, path = catalog.filesystem(IndexPaths(d).docs)
        ids = pq.read_table(
            path, filesystem=fs, columns=["doc_id"]
        )["doc_id"].to_numpy()
        total += len(ids)
        if total > cap:
            raise RuntimeError(
                f"gc_tombstones doc scan over {total}+ docs exceeds the "
                f"cap ({cap}); compact the tier set first"
            )
        live_parts.append(ids)
    live = (
        np.unique(np.concatenate(live_parts))
        if live_parts else np.array([], dtype=np.int64)
    )
    removed = []
    for ref in refs:
        fs, path = catalog.filesystem(ref)
        ids = pq.read_table(
            path, filesystem=fs, columns=["doc_id"]
        )["doc_id"].to_numpy()
        pos = np.searchsorted(live, ids)
        pos = np.minimum(pos, max(len(live) - 1, 0))
        any_live = bool(len(live)) and bool(np.any(live[pos] == ids))
        if not any_live:
            catalog.fs_remove_file(ref)
            removed.append(ref)
    return removed
