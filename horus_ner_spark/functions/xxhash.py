"""XXH64 matching Spark's ``xxhash64`` expression, in Python.

The engine's doc_id is ``xxhash64(repo, path, commit)`` (build.with_doc_id).
The small-segment build path (index/smallseg.py) computes everything
driver/task-locally with pyarrow+numpy, so it needs the SAME hash without a
Spark job.  Spark chains multi-column hashing as
``h = XXH64(utf8(col_i), seed=h)`` starting from seed 42, with each column
hashed by the standard XXH64 byte algorithm (public spec; Spark's
implementation follows it for byte inputs).  Bit-equality with
``F.xxhash64`` is asserted property-style in tests/test_xxhash.py —
doc_ids from the two build paths MUST be interchangeable.
"""

from __future__ import annotations

import numpy as np

_M = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * P2) & _M
    return (_rotl(acc, 31) * P1) & _M


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * P1 + P4) & _M


def xxh64(data: bytes, seed: int) -> int:
    """Reference XXH64 of ``data`` with ``seed`` (unsigned 64-bit out)."""
    seed &= _M
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & _M
        v2 = (seed + P2) & _M
        v3 = seed
        v4 = (seed - P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * P1 + P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * P1) & _M
        h = (_rotl(h, 23) * P2 + P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * P5) & _M
        h = (_rotl(h, 11) * P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * P2) & _M
    h ^= h >> 29
    h = (h * P3) & _M
    h ^= h >> 32
    return h


def spark_xxhash64_str_cols(*cols: str, seed: int = 42) -> int:
    """Spark's ``xxhash64(col, ...)`` over string values: the per-column
    XXH64 chains through the running hash as seed.  A NULL column leaves
    the running hash unchanged (Spark's HashExpression skips null inputs),
    so a null-commit row hashes identically here and in ``F.xxhash64`` —
    the doc_ids of the local and distributed build paths stay
    interchangeable.  Returns SIGNED int64 (Spark's LongType)."""
    h = seed
    for c in cols:
        if c is None or (isinstance(c, float) and c != c):  # None / NaN
            continue
        h = xxh64(c.encode("utf-8"), h)
    return h - (1 << 64) if h >= (1 << 63) else h


def doc_ids_from_cols(repo, path, commit) -> np.ndarray:
    """Vector form over aligned sequences -> int64 doc_ids, identical to
    ``F.xxhash64("repo", "path", "commit")``."""
    return np.fromiter(
        (spark_xxhash64_str_cols(r, p, c) for r, p, c in zip(repo, path, commit)),
        dtype=np.int64,
        count=len(repo),
    )
