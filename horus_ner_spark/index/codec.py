"""Delta-gap + varbyte posting-block codec (numpy-vectorized).

No reference analog — HORUS-NER stores its per-term document cache as
uncompressed SQLite TEXT rows (reference: horus0.1.5.db.sql:60-79); a real
index at 10^12-file scale needs compressed postings.  Required by
BASELINE.json north_star: "delta-gap + varbyte block compression with
per-block max-score metadata".

Design:
- doc_ids are signed int64 (xxhash64 of (repo,path,commit)).  We flip the
  sign bit to map them order-preservingly onto uint64, then delta-gap:
  first value absolute, subsequent values store (gap - 1) since sorted
  doc_ids within a posting list are strictly increasing.
- Every block is self-contained (first doc_id stored absolute), so blocks
  encode/decode independently -> the SPIMI build can emit blocks of one hot
  term from many partitions in parallel with zero cross-block state, and
  block-max WAND can skip blocks without decoding predecessors.
- Encode/decode are fully vectorized over the block (<= 10 fixed-bound
  numpy passes for 64-bit varbyte), never per-posting Python -- the decode
  cost is amortized per Arrow batch per BASELINE hard-part (e).
"""

from __future__ import annotations

import numpy as np

_SIGN_FLIP = np.uint64(0x8000000000000000)
_MAX_VB_BYTES = 10  # ceil(64 / 7)


def vb_encode(values: np.ndarray) -> bytes:
    """Varbyte-encode a uint64 array (little-endian 7-bit groups,
    continuation bit set on every byte except the last of each value)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return b""
    # byte length per value: 1 + number of times v >> 7 stays nonzero
    nbytes = np.ones(n, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nbytes += (tmp > 0).astype(np.int64)
        tmp >>= np.uint64(7)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    for j in range(_MAX_VB_BYTES):
        mask = nbytes > j
        if not mask.any():
            break
        byte = ((v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[mask] - 1 > j).astype(np.uint8) << 7
        out[starts[mask] + j] = byte | cont
    return out.tobytes()


def vb_decode(data: bytes) -> np.ndarray:
    """Decode a varbyte stream back to a uint64 array."""
    arr = np.frombuffer(data, dtype=np.uint8)
    if arr.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = arr < 0x80
    n_values = int(is_last.sum())
    # value index of each byte; byte position within its value
    value_idx = np.zeros(arr.size, dtype=np.int64)
    value_idx[1:] = np.cumsum(is_last[:-1])
    ends = np.nonzero(is_last)[0]
    starts = np.empty(n_values, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    byte_pos = np.arange(arr.size, dtype=np.int64) - starts[value_idx]
    contrib = (arr & 0x7F).astype(np.uint64) << (np.uint64(7) * byte_pos.astype(np.uint64))
    values = np.zeros(n_values, dtype=np.uint64)
    np.add.at(values, value_idx, contrib)
    return values


def encode_block(doc_ids: np.ndarray, tfs: np.ndarray) -> tuple[bytes, bytes]:
    """Encode one posting block.  ``doc_ids`` must be strictly increasing
    int64; ``tfs`` positive int64 aligned with doc_ids."""
    d = np.ascontiguousarray(doc_ids, dtype=np.int64)
    u = d.view(np.uint64) ^ _SIGN_FLIP  # order-preserving signed->unsigned
    gaps = np.empty(len(u), dtype=np.uint64)
    if len(u):
        gaps[0] = u[0]
        gaps[1:] = u[1:] - u[:-1] - np.uint64(1)  # strictly increasing => gap>=1
    return vb_encode(gaps), vb_encode(np.ascontiguousarray(tfs, dtype=np.uint64))


def decode_block(doc_bytes: bytes, tf_bytes: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Decode one posting block -> (doc_ids int64 ascending, tfs int64)."""
    gaps = vb_decode(doc_bytes)
    if len(gaps):
        gaps[1:] += np.uint64(1)
        u = np.cumsum(gaps, dtype=np.uint64)
    else:
        u = gaps
    doc_ids = (u ^ _SIGN_FLIP).view(np.int64)
    tfs = vb_decode(tf_bytes).view(np.int64)
    return doc_ids, tfs


# ─────────────────────────── position streams ───────────────────────────
# A posting's positions (strictly increasing token indexes within its doc)
# are encoded like a doc_id run: first value absolute, then (gap - 1),
# varbyte.  A BLOCK's pos stream is the byte-concatenation of its postings'
# streams in posting order — each posting's sub-stream is self-contained,
# so merge re-blocking moves byte slices verbatim (no re-encode), and
# decode splits the stream with the block's tf counts.


def encode_positions(positions: np.ndarray) -> bytes:
    """Encode ONE posting's strictly-increasing position list."""
    p = np.ascontiguousarray(positions, dtype=np.uint64)
    gaps = np.empty(len(p), dtype=np.uint64)
    if len(p):
        gaps[0] = p[0]
        gaps[1:] = p[1:] - p[:-1] - np.uint64(1)
    return vb_encode(gaps)


def pos_slice_offsets(data: bytes, tfs: np.ndarray) -> np.ndarray:
    """Byte offsets (len == n_postings + 1) splitting a block's pos stream
    into its per-posting sub-streams — value boundaries are bytes with the
    continuation bit clear, posting i spans tfs[i] values."""
    arr = np.frombuffer(data, dtype=np.uint8)
    ends = np.flatnonzero(arr < 0x80) + 1  # byte offset after each value
    bounds = np.cumsum(np.asarray(tfs, dtype=np.int64))
    out = np.zeros(len(bounds) + 1, dtype=np.int64)
    out[1:] = ends[bounds - 1] if len(ends) else 0
    return out


def decode_positions(data: bytes, tfs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Decode a block's pos stream -> (absolute positions int64, posting
    start offsets int64 of len n_postings + 1): posting i's positions are
    ``values[starts[i]:starts[i+1]]``."""
    tfs = np.asarray(tfs, dtype=np.int64)
    starts = np.zeros(len(tfs) + 1, dtype=np.int64)
    np.cumsum(tfs, out=starts[1:])
    vals = vb_decode(data).astype(np.int64)
    if len(vals) == 0:
        return vals, starts
    is_first = np.zeros(len(vals), dtype=bool)
    is_first[starts[:-1][tfs > 0]] = True
    vals[~is_first] += 1
    # per-posting cumulative sum: global cumsum minus the carry-in at each
    # posting start, vectorized
    csum = np.cumsum(vals)
    carry = np.repeat(csum[starts[:-1]] - vals[starts[:-1]], tfs)
    return csum - carry, starts
