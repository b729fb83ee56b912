"""Per-unit doc-id Bloom filters — the ingest-dedup scale path.

``incremental_index_stream(dedup_ingest=True)`` anti-joins each
micro-batch against every live unit's doc_id column.  Exact and fine at
small unit counts, but the work is O(total indexed docs) per batch.  The
scale contract (stated in incremental.py round 2) is: keep the EXACT
anti-join, but consult per-unit Bloom filters first so that docs the
filters rule out — the overwhelming majority of a fresh batch — skip the
join entirely.  Bloom hits (includes all true re-deliveries plus an
``fpr`` sliver of false positives) still go through the exact join, so
the dedup stays exact; the filters only bound its input size.

Layout: one sidecar file ``<unit>/ix/docs.bloom`` per unit, written when
the unit is built/compacted; a few MiB per million docs at 1% fpr.  At
serve/ingest time the sidecars (tiny) are OR-combined and broadcast.

Hashing: k indexes per key via the standard double-hashing construction
h1 + i*h2 over two independent 64-bit avalanche mixes (splitmix64
finalizers with distinct constants) — pure vectorized numpy, no Python
loop per key, deterministic across runs and hosts.
"""

from __future__ import annotations

import math
import os

import numpy as np

_MAGIC = b"HBLM1\n"


def _mix(x: np.ndarray, c1: np.uint64, c2: np.uint64) -> np.ndarray:
    """splitmix64-style avalanche finalizer (vectorized, uint64)."""
    with np.errstate(over="ignore"):
        x = x.astype(np.uint64, copy=True)
        x ^= x >> np.uint64(30)
        x *= c1
        x ^= x >> np.uint64(27)
        x *= c2
        x ^= x >> np.uint64(31)
    return x


def _h1(keys: np.ndarray) -> np.ndarray:
    return _mix(keys, np.uint64(0xBF58476D1CE4E5B9), np.uint64(0x94D049BB133111EB))


def _h2(keys: np.ndarray) -> np.ndarray:
    # distinct constants -> independent mix; force odd so the double-hash
    # stride never collapses to 0 for every i
    h = _mix(keys, np.uint64(0xFF51AFD7ED558CCD), np.uint64(0xC4CEB9FE1A85EC53))
    return h | np.uint64(1)


class DocIdBloom:
    """Bit-array Bloom filter over int64 doc_ids."""

    def __init__(self, n_bits: int, k: int, bits: np.ndarray | None = None):
        if n_bits <= 0 or n_bits % 8:
            raise ValueError("n_bits must be a positive multiple of 8")
        self.n_bits = n_bits
        self.k = k
        self.bits = (
            bits if bits is not None else np.zeros(n_bits // 8, dtype=np.uint8)
        )

    @classmethod
    def sized_for(cls, n_keys: int, fpr: float = 0.01) -> "DocIdBloom":
        n_keys = max(1, n_keys)
        n_bits = int(-n_keys * math.log(fpr) / (math.log(2) ** 2))
        n_bits = max(64, (n_bits + 7) // 8 * 8)
        k = max(1, round(n_bits / n_keys * math.log(2)))
        return cls(n_bits, k)

    def _positions(self, doc_ids: np.ndarray) -> np.ndarray:
        """(len(doc_ids), k) bit positions."""
        keys = np.asarray(doc_ids, dtype=np.int64).view(np.uint64)
        a, b = _h1(keys), _h2(keys)
        i = np.arange(self.k, dtype=np.uint64)
        with np.errstate(over="ignore"):
            pos = a[:, None] + i[None, :] * b[:, None]
        return (pos % np.uint64(self.n_bits)).astype(np.int64)

    def add(self, doc_ids: np.ndarray) -> None:
        pos = self._positions(doc_ids).ravel()
        np.bitwise_or.at(
            self.bits, pos >> 3, np.left_shift(np.uint8(1), (pos & 7).astype(np.uint8))
        )

    def may_contain(self, doc_ids: np.ndarray) -> np.ndarray:
        """Vectorized membership: False -> definitely absent."""
        if not len(doc_ids):
            return np.zeros(0, dtype=bool)
        pos = self._positions(doc_ids)
        byte = self.bits[pos >> 3]
        bit = np.left_shift(np.uint8(1), (pos & 7).astype(np.uint8))
        return ((byte & bit) != 0).all(axis=1)

    def union(self, other: "DocIdBloom") -> "DocIdBloom":
        if (self.n_bits, self.k) != (other.n_bits, other.k):
            raise ValueError("bloom shapes differ; cannot union")
        return DocIdBloom(self.n_bits, self.k, self.bits | other.bits)

    # ── sidecar IO (through the catalog fs layer: object-store ready) ───────
    def save(self, ref: str) -> None:
        from horus_ner_spark import catalog

        header = _MAGIC + f"{self.n_bits} {self.k}\n".encode()
        # atomic (tmp+rename / single PUT): a reader racing a replay's
        # rebuild must see the old or the new sidecar, never a torn one
        catalog.fs_write_bytes_atomic(ref, header + self.bits.tobytes())

    @classmethod
    def load(cls, ref: str) -> "DocIdBloom":
        from horus_ner_spark import catalog

        fs, path = catalog.filesystem(ref)
        with fs.open_input_stream(path) as f:
            data = f.read()
        if not data.startswith(_MAGIC):
            raise ValueError(f"not a bloom sidecar: {ref}")
        head, _, rest = data[len(_MAGIC):].partition(b"\n")
        n_bits, k = (int(x) for x in head.split())
        bits = np.frombuffer(rest, dtype=np.uint8).copy()
        if len(bits) != n_bits // 8:
            raise ValueError(f"bloom sidecar truncated: {ref}")
        return cls(n_bits, k, bits)


def bloom_path(unit_ix_dir: str) -> str:
    return os.path.join(unit_ix_dir, "docs.bloom")


def build_unit_bloom(spark, unit_ix_dir: str, fpr: float = 0.01) -> DocIdBloom:
    """Build + persist the sidecar for one built unit (idempotent: always
    rebuilt from the unit's docs table, so a replayed build overwrites a
    torn file).  Small units (streaming micro-batch segments) read their
    doc_id column driver-side with pyarrow — no Spark job; larger units
    build partial filters executor-side over the pruned doc_id column and
    OR-merge them driver-side — the driver never sees doc ids, only
    fixed-size bit arrays."""
    import pandas as pd

    from horus_ner_spark import catalog
    from horus_ner_spark.index.smallseg import SMALL_BUILD_MAX_BYTES, table_bytes

    docs_ref = os.path.join(unit_ix_dir, "docs.parquet")
    if table_bytes(docs_ref) <= SMALL_BUILD_MAX_BYTES:
        import pyarrow.parquet as pq

        fs, base = catalog.filesystem(docs_ref)
        ids = pq.read_table(
            base, filesystem=fs, columns=["doc_id"]
        )["doc_id"].to_numpy()
        bl = DocIdBloom.sized_for(len(ids), fpr)
        bl.add(np.asarray(ids, dtype=np.int64))
        bl.save(bloom_path(unit_ix_dir))
        return bl

    docs = spark.read.parquet(docs_ref)
    n = docs.count()
    proto = DocIdBloom.sized_for(n, fpr)
    shape = (proto.n_bits, proto.k)

    def partial(batches):
        bl = DocIdBloom(*shape)
        for pdf in batches:
            bl.add(pdf["doc_id"].to_numpy(np.int64))
        yield pd.DataFrame({"bits": [bl.bits.tobytes()]})

    for row in (
        docs.select("doc_id").mapInPandas(partial, "bits binary").collect()
    ):
        proto.bits |= np.frombuffer(row["bits"], dtype=np.uint8)
    proto.save(bloom_path(unit_ix_dir))
    return proto


class BloomSet:
    """Several filters probed as one: ``may_contain`` is the OR across all
    member filters, so filters sized for different unit doc counts (the
    normal case — every batch and tier differs) compose without resizing.
    Same-shape members are unioned into one bit array at construction."""

    def __init__(self, filters: list[DocIdBloom]):
        by_shape: dict[tuple[int, int], DocIdBloom] = {}
        for f in filters:
            key = (f.n_bits, f.k)
            by_shape[key] = f if key not in by_shape else by_shape[key].union(f)
        self.filters = list(by_shape.values())

    def may_contain(self, doc_ids: np.ndarray) -> np.ndarray:
        out = np.zeros(len(doc_ids), dtype=bool)
        for f in self.filters:
            out |= f.may_contain(doc_ids)
        return out

    def to_spec(self) -> list[tuple[int, int, bytes]]:
        """Picklable form for shipping into a pandas UDF closure."""
        return [(f.n_bits, f.k, f.bits.tobytes()) for f in self.filters]

    @classmethod
    def from_spec(cls, spec: list[tuple[int, int, bytes]]) -> "BloomSet":
        return cls([
            DocIdBloom(nb, k, np.frombuffer(b, dtype=np.uint8).copy())
            for nb, k, b in spec
        ])


def load_unit_blooms(unit_ix_dirs: list[str]) -> list["DocIdBloom"] | None:
    """One filter per unit, or None if ANY unit lacks a readable sidecar —
    a unit the gate cannot vouch for would turn bloom misses into false
    'definitely absent' answers, so callers must fall back to the exact
    path for every doc.  A torn/corrupt sidecar counts as missing."""
    from horus_ner_spark import catalog

    out: list[DocIdBloom] = []
    for d in unit_ix_dirs:
        p = bloom_path(d)
        if not catalog.fs_exists(p):
            return None
        try:
            out.append(DocIdBloom.load(p))
        except (ValueError, OSError):
            return None
    return out


def load_combined_bloom(unit_ix_dirs: list[str]) -> "BloomSet | None":
    """BloomSet over every unit's sidecar, or None if any is missing or
    unreadable (callers then fall back to the exact path for all docs)."""
    filters = load_unit_blooms(unit_ix_dirs)
    return BloomSet(filters) if filters is not None else None
