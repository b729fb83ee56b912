"""SPIMI-style inverted-index build — the engine's batch pipeline.

Replaces the reference's "index": per-term web-search results memoized into
SQLite with a (term, search_type) unique key and B-tree secondary indexes
(reference: src/core/util/sqlite_helper.py:42-48, horus0.1.5.db.sql:124-139).
Here the postings are built from the corpus itself, declaratively:

    corpus ──(A docs)──> docs(doc_id, repo, path, commit, lang, content_sha256)
    corpus ──(B tf)────> tf(doc_id, term, tf)              [tokenize ONCE]
    tf ──(C stats)─────> doclens(doc_id, doclen) + corpus_stats(n_docs, avgdl)
    tf ──(D terms)─────> term_stats(term, df, cf)   [pbucket-partitioned]
    tf ──(E postings)──> compressed block table     [no joins; one shuffle]

Scale decisions (the parts that must survive 1000 executors / 10^12 files):
- **One tokenization pass, zero shuffle for tf.** Stage B is the only
  pandas-UDF scan of ``content``; tf and doclen are both per-document-local
  facts, so they are computed INSIDE the tokenize kernel (Counter per doc)
  and emitted as finished ``(doc_id, term, tf, doclen)`` rows — the naive
  ``explode -> groupBy(doc_id, term)`` plan would shuffle every token
  occurrence (~10^14 rows at target scale) to compute a count that never
  needed to leave its partition.
- **Join-free posting assembly.** Blocks store ``block_max_tfnorm`` — the
  idf-free part of the BM25 upper bound (idf is constant per term, applied
  at query time from term_stats) — and doclen rides in the tf rows, so
  stage E is a single shuffle: ``tf -> groupBy(term, rb) -> encode``.  No
  join with term_stats (df), no join with doclens.
- **Hot-term skew** (Zipfian ``config``/``get``/...): terms with
  ``df > SPLIT_THRESHOLD`` are salted across ``2^RANGE_BITS`` groups by
  ``range_bucket = doc_id >> (64 - RANGE_BITS)`` — a deterministic,
  order-preserving split, keyed on doc_id ranges instead of random salt so
  each group encodes sorted, self-contained blocks with no second merge
  pass (blocks store their first doc_id absolute — see codec.py).  Cold
  terms keep ``rb = 0``: salting everything would explode the group count
  (measured: 10k-term corpus -> 649k groups -> 3-posting blocks) and
  destroy both build throughput and WAND skip efficiency.  The hot set is
  the Zipf head — tiny — and ships as a broadcast join.
- **Group-spanning encode kernel**: posting assembly is ONE
  ``repartition(term, rb) -> sortWithinPartitions -> mapInArrow`` pass,
  not per-group applyInPandas — one Arrow batch carries thousands of
  groups, so per-group overhead is a numpy slice, not a Spark task-side
  frame build.  Groups split across batch boundaries are carried over
  inside the kernel (deterministic; hash partitioning guarantees a group
  never spans partitions).
- **Aggregation skew** on groupBy(term) for df/cf needs no salting: Spark's
  hash aggregate does map-side partial aggregation, so a hot term
  contributes one partial row per task, not per posting.
- **Partition pruning at query time**: the postings table is written
  ``partitionBy(pbucket)`` with ``pbucket = pmod(crc32(term), N_PBUCKETS)`` (bucketing.py)
  — the Spark-native analog of the reference's B-tree term index; a query
  touches only the buckets its terms hash to.
- **Resume**: every stage is fingerprint-gated through the checkpoint
  manifest (manifest.py); a crashed build redoes only missing stages.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from horus_ner_spark import catalog
from horus_ner_spark.functions.bucketing import term_bucket_col
from horus_ner_spark.index import bm25
from horus_ner_spark.index.manifest import Manifest, corpus_fingerprint

BLOCK_SIZE = 128       # postings per compressed block
RANGE_BITS = 6         # hot-term split: 2^6 = 64 doc_id-range groups per term
N_PBUCKETS = 32        # term-hash partitions of the postings table
SPLIT_THRESHOLD = 8192  # df above which a term is salted across rb groups
SUB_POSTINGS = 8       # target postings per impact sub-range (k = n/8, capped)
SUB_BLOCKS_MAX = 16    # sub-range cap per block

# Blocks are self-contained for scoring: doc_ids (delta-gap), tfs, doclens,
# and token positions all ride in the block, so the WAND/phrase kernels need
# no per-doc side table — at 10^12 docs a broadcast doclen array would not
# fit an executor.  ``rb`` is the hot-term range-bucket (0 for cold terms);
# block_id is the block's index WITHIN its (term, rb) group, so ids are
# canonical regardless of how Arrow batches or partitions split the input
# (layout v4; v3 chained ids across rb groups, which hash partitioning
# cannot guarantee).  ``pos_vb`` is the per-posting position stream
# (codec.py) powering phrase queries.
POSTINGS_SCHEMA = (
    "term string, rb int, block_id int, min_doc_id long, max_doc_id long, "
    "n_postings int, block_cf long, block_max_tfnorm double, "
    "doc_ids_vb binary, tfs_vb binary, "
    "doclens_vb binary, pos_vb binary, sub_min_doc_ids array<long>, "
    "sub_max_tfnorms array<double>"
)

TF_SCHEMA = "doc_id long, term string, tf long, doclen long, pos_vb binary"


@dataclass(frozen=True)
class IndexPaths:
    root: str

    @property
    def docs(self) -> str:
        return os.path.join(self.root, "docs.parquet")

    @property
    def tf(self) -> str:
        return os.path.join(self.root, "tf.parquet")

    @property
    def doclens(self) -> str:
        return os.path.join(self.root, "doclens.parquet")

    @property
    def corpus_stats(self) -> str:
        return os.path.join(self.root, "corpus_stats.parquet")

    @property
    def term_stats(self) -> str:
        return os.path.join(self.root, "term_stats.parquet")

    @property
    def postings(self) -> str:
        return os.path.join(self.root, "postings.parquet")


def read_corpus_stats(paths: IndexPaths) -> dict:
    """The one-row corpus_stats table, read driver-side with pyarrow (via
    the catalog fs routing — object stores included).  Every query/build
    path needs (n_docs, avgdl) up front; launching a Spark job to fetch
    one row was a fixed ~0.5 s tax on every query batch and every
    streaming micro-batch build."""
    import pyarrow.parquet as pq

    from horus_ner_spark import catalog

    catalog.require_path_refs("read_corpus_stats")
    fs, base = catalog.filesystem(paths.corpus_stats)
    return pq.read_table(base, filesystem=fs).to_pylist()[0]


def corpus_stats_df(
    spark: SparkSession, n_docs: int, total_len: int, avgdl: float
) -> DataFrame:
    """The one-row corpus_stats table, built JVM-side as literals over
    range(1).  ``createDataFrame([...]).coalesce(1)`` routes the row
    through a Python-RDD-backed single task — a measured fixed ~4-5 s per
    write (so per index build AND per compaction merge) on local[32];
    this plan is pure codegen and writes in ~0.2 s."""
    return spark.range(0, 1, 1, 1).select(
        F.lit(int(n_docs)).cast("long").alias("n_docs"),
        F.lit(int(total_len)).cast("long").alias("total_len"),
        F.lit(float(avgdl)).cast("double").alias("avgdl"),
    )


def with_doc_id(corpus: DataFrame) -> DataFrame:
    """doc_id = xxhash64(repo, path, commit) — per FIXTURES.md §1.

    A corpus that already carries a ``doc_id`` column (e.g. an external
    document table mapped onto the corpus schema) keeps its ids."""
    if "doc_id" in corpus.columns:
        return corpus
    return corpus.withColumn("doc_id", F.xxhash64("repo", "path", "commit"))


def _encode_stream(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    doclens: np.ndarray,
    bstarts: np.ndarray,
    bends: np.ndarray,
    avgdl: float,
):
    """Vectorized block encoding of one or many doc_id-sorted runs.

    ``bstarts``/``bends`` delimit the blocks (the boundaries must include
    every run boundary).  The three varbyte streams are encoded in ONE
    codec call each over the whole input and sliced per block — byte-
    identical to per-block encoding (varbyte is per-value; each block's
    first doc_id is stored absolute via the gap mask), but without the
    ~0.1 ms fixed numpy cost per tiny call that dominated the encode stage
    (round-4 profile: 43k vb_encode calls were 5 s of a 5k-doc build).

    Returns per-block columns: min/max_doc_id, n_postings,
    block_max_tfnorm, the three vb byte slices, and the sub_* impact
    metadata arrays.
    """
    from horus_ner_spark.index.codec import _SIGN_FLIP, vb_encode

    n = len(doc_ids)
    if n == 0:
        # empty run (e.g. prune with keep_fraction=0 dropping a whole
        # term): return empty columns so encode_run yields no blocks —
        # the v6 sub-range concatenation below requires >=1 block
        e64 = np.empty(0, dtype=np.int64)
        return {
            "min_doc_id": e64,
            "max_doc_id": e64,
            "n_postings": e64,
            "block_cf": e64,
            "block_max_tfnorm": np.empty(0, dtype=np.float64),
            "doc_ids_vb": [],
            "tfs_vb": [],
            "doclens_vb": [],
            "sub_min_doc_ids": [],
            "sub_max_tfnorms": [],
        }
    tfnorms = tfs * (bm25.K1 + 1.0) / (
        tfs + bm25.K1 * (1.0 - bm25.B + bm25.B * doclens.astype(np.float64) / avgdl)
    )
    u = np.ascontiguousarray(doc_ids, dtype=np.int64).view(np.uint64) ^ _SIGN_FLIP
    gaps = np.empty(n, dtype=np.uint64)
    if n > 1:
        gaps[1:] = u[1:] - u[:-1] - np.uint64(1)
    gaps[bstarts] = u[bstarts]  # block-first doc_ids stored absolute

    def _ends(stream: bytes) -> np.ndarray:
        arr = np.frombuffer(stream, dtype=np.uint8)
        return np.flatnonzero(arr < 0x80) + 1  # byte end of each value

    enc_d = vb_encode(gaps)
    enc_t = vb_encode(np.ascontiguousarray(tfs, dtype=np.int64).view(np.uint64))
    enc_l = vb_encode(doclens.astype(np.uint64))
    vend_d, vend_t, vend_l = _ends(enc_d), _ends(enc_t), _ends(enc_l)

    def _slices(enc: bytes, vend: np.ndarray) -> list[bytes]:
        starts = np.where(bstarts > 0, vend[bstarts - 1], 0)
        ends = vend[bends - 1]
        return [enc[s:e] for s, e in zip(starts, ends)]

    # impact-ISOLATING sub-ranges (layout v6).  Each block gets
    # k = clip(n // SUB_POSTINGS, 1, SUB_BLOCKS_MAX) doc-id-ordered
    # sub-ranges whose boundaries isolate the top-m impact postings
    # (m = 3k/8) into single-posting ranges, spending the rest of the
    # budget on an even grid.  Equal slices (v5) left every slice's bound
    # poisoned by its hottest posting; isolating the hot postings exactly
    # is what tightens WAND's shallow bounds (sf0.1 reference query set:
    # decoded-postings ratio 0.838 with equal quarters -> ~0.53 here).
    # Only sub_min_doc_ids + sub_max_tfnorms are STORED: range maxima
    # derive in the kernel (maxs[j] = mins[j+1] - 1 inside a block; the
    # last range ends at the block's exact max_doc_id), so ranges tile
    # the block span and metadata stays ~16 bytes per range.
    ns = bends - bstarts
    ks = np.clip(ns // SUB_POSTINGS, 1, SUB_BLOCKS_MAX)
    blk_parts, start_parts = [], []
    for k in np.unique(ks):
        idx = np.flatnonzero(ks == k)
        m = int(k) * 3 // 8
        g = int(k) - 1 - 2 * m
        nsc = ns[idx]
        width = int(nsc.max())
        rowpos = np.arange(width, dtype=np.int64)[None, :]
        in_blk = rowpos < nsc[:, None]
        cands = []
        if m:
            gidx = np.minimum(bstarts[idx][:, None] + rowpos, n - 1)
            mat = np.where(in_blk, tfnorms[gidx], -np.inf)
            # stable argsort, not argpartition: tie-breaking must be a
            # pure function of the block's own postings (later position
            # wins), or chunk-dependent padding would make build /
            # smallseg / merge outputs diverge on tied impacts
            top = np.argsort(mat, axis=1, kind="stable")[:, width - m:]
            cands.extend((top, top + 1))
        if g:
            grid = nsc[:, None] * np.arange(1, g + 1)[None, :] // (g + 1)
            cands.append(grid)
        if cands:
            cand = np.sort(np.concatenate(cands, axis=1), axis=1)
            ok = (cand > 0) & (cand < nsc[:, None])
            ok[:, 1:] &= cand[:, 1:] != cand[:, :-1]  # dups are adjacent
        else:
            cand = np.empty((len(idx), 0), dtype=np.int64)
            ok = np.empty((len(idx), 0), dtype=bool)
        ones = np.ones((len(idx), 1), dtype=bool)
        keep = np.concatenate([ones, ok], axis=1)  # range start 0 always
        full = np.concatenate(
            [np.zeros((len(idx), 1), dtype=np.int64), cand], axis=1)
        counts = keep.sum(axis=1)
        rep = np.repeat(idx, counts)
        blk_parts.append(rep)
        start_parts.append(bstarts[rep] + full[keep])
    blk_of = np.concatenate(blk_parts)
    sub_starts = np.sort(np.concatenate(start_parts), kind="stable")
    sub_counts = np.bincount(blk_of, minlength=len(bstarts))
    cuts = np.cumsum(sub_counts)[:-1]
    return {
        "min_doc_id": doc_ids[bstarts],
        "max_doc_id": doc_ids[bends - 1],
        "n_postings": ns,
        # layout v7: per-block collection-frequency sum, stored so merged
        # term_stats (cf) is a pure metadata column sum — no tf decode.
        # reduceat is valid because blocks tile [0, n) (bends[i] ==
        # bstarts[i+1]), the same contract maximum.reduceat relies on.
        "block_cf": np.add.reduceat(
            np.ascontiguousarray(tfs, dtype=np.int64), bstarts
        ),
        "block_max_tfnorm": np.maximum.reduceat(tfnorms, bstarts),
        "doc_ids_vb": _slices(enc_d, vend_d),
        "tfs_vb": _slices(enc_t, vend_t),
        "doclens_vb": _slices(enc_l, vend_l),
        "sub_min_doc_ids": np.split(doc_ids[sub_starts], cuts),
        "sub_max_tfnorms": np.split(
            np.maximum.reduceat(tfnorms, sub_starts), cuts
        ),
    }


def encode_run(
    term: str,
    rb: int,
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    doclens: np.ndarray,
    pos_buf,
    pos_offsets: np.ndarray,
    avgdl: float,
    block_size: int,
) -> list[dict]:
    """Encode one (term, rb) doc_id-sorted posting run into block rows.

    Shared by the build kernel and the merge/prune re-blockers so chunk
    boundaries are canonical by construction.  ``pos_buf``/``pos_offsets``
    address the run's per-posting position sub-streams (already encoded —
    codec.py); a block's pos_vb is the contiguous byte slice covering its
    postings, so no position ever re-encodes here.
    """
    n = len(doc_ids)
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    bstarts = np.arange(0, n, block_size, dtype=np.int64)
    bends = np.minimum(bstarts + block_size, n)
    cols = _encode_stream(doc_ids, tfs, doclens, bstarts, bends, avgdl)
    view = memoryview(pos_buf)
    rows = []
    for i in range(len(bstarts)):
        s, e = int(bstarts[i]), int(bends[i])
        rows.append(
            {
                "term": term,
                "rb": int(rb),
                "block_id": i,
                "min_doc_id": int(cols["min_doc_id"][i]),
                "max_doc_id": int(cols["max_doc_id"][i]),
                "n_postings": int(cols["n_postings"][i]),
                "block_cf": int(cols["block_cf"][i]),
                "block_max_tfnorm": float(cols["block_max_tfnorm"][i]),
                "doc_ids_vb": cols["doc_ids_vb"][i],
                "tfs_vb": cols["tfs_vb"][i],
                "doclens_vb": cols["doclens_vb"][i],
                "pos_vb": bytes(view[pos_offsets[s] : pos_offsets[e]]),
                "sub_min_doc_ids": [int(x) for x in cols["sub_min_doc_ids"][i]],
                "sub_max_tfnorms": [
                    float(x) for x in cols["sub_max_tfnorms"][i]
                ],
            }
        )
    return rows


_BLOCK_COLS = [
    "term", "rb", "block_id", "min_doc_id", "max_doc_id", "n_postings",
    "block_cf", "block_max_tfnorm", "doc_ids_vb", "tfs_vb", "doclens_vb",
    "pos_vb", "sub_min_doc_ids", "sub_max_tfnorms",
]


def _encode_arrow_factory(avgdl: float, block_size: int):
    """Build the mapInArrow posting encoder: consumes a partition sorted by
    (term, rb, doc_id) whose (term, rb) groups are complete within the
    partition (hash repartitioning guarantees it), emits block rows.

    mapInArrow, not mapInPandas, deliberately: a pandas kernel would box
    every term of every posting row into a Python string (~10^7 objects per
    task — measured 2/3 of stage time); here group boundaries are computed
    on the Arrow string array with C-level compares and Python only ever
    sees one term string PER GROUP and one bytes object per block.  Groups
    split across batch boundaries are carried into the next batch.
    """
    import pyarrow as pa

    def encode_partition(batches):
        carry: pa.Table | None = None
        for rb in batches:
            tbl = pa.Table.from_batches([rb])
            if carry is not None:
                tbl = pa.concat_tables([carry, tbl])
            n = tbl.num_rows
            if n == 0:
                carry = None
                continue
            terms = tbl.column("term").combine_chunks()
            rbs = tbl.column("rb").to_numpy()
            # group change where term or rb differs from previous row (C-level)
            if n > 1:
                tneq = pa.compute.invert(
                    pa.compute.equal(terms.slice(1), terms.slice(0, n - 1))
                ).to_numpy(zero_copy_only=False)
                change = np.flatnonzero(tneq | (rbs[1:] != rbs[:-1])) + 1
            else:
                change = np.empty(0, dtype=np.int64)
            # hold back the trailing (possibly incomplete) group
            tail_start = int(change[-1]) if len(change) else 0
            carry = tbl.slice(tail_start) if tail_start < n else None
            if tail_start:
                yield _encode_table(
                    tbl.slice(0, tail_start), terms, change[:-1], tail_start,
                    avgdl, block_size,
                )
        if carry is not None and carry.num_rows:
            terms = carry.column("term").combine_chunks()
            rbs = carry.column("rb").to_numpy()
            n = carry.num_rows
            if n > 1:
                tneq = pa.compute.invert(
                    pa.compute.equal(terms.slice(1), terms.slice(0, n - 1))
                ).to_numpy(zero_copy_only=False)
                change = np.flatnonzero(tneq | (rbs[1:] != rbs[:-1])) + 1
            else:
                change = np.empty(0, dtype=np.int64)
            yield _encode_table(carry, terms, change, n, avgdl, block_size)

    return encode_partition


def _binary_buffers(arr):
    """(data buffer, absolute int64 offsets) of an Arrow binary array —
    per-row byte slices without materializing per-row Python bytes."""
    off = np.frombuffer(arr.buffers()[1], dtype=np.int32).astype(np.int64)
    return arr.buffers()[2], off[arr.offset : arr.offset + len(arr) + 1]


def _encode_table(tbl, terms, change, n_rows: int, avgdl: float, block_size: int):
    """Encode complete (term, rb) groups of an Arrow table slice into one
    output RecordBatch.  ``change`` holds group-start offsets (excluding 0)
    within the first ``n_rows`` rows."""
    import pyarrow as pa

    doc_ids = np.ascontiguousarray(tbl.column("doc_id").to_numpy()[:n_rows])
    tfs = np.ascontiguousarray(tbl.column("tf").to_numpy()[:n_rows])
    doclens = tbl.column("doclen").to_numpy()[:n_rows]
    rbs = tbl.column("rb").to_numpy()[:n_rows]
    pos_buf, pos_off = _binary_buffers(tbl.column("pos_vb").combine_chunks())
    starts = np.concatenate(([0], change)).astype(np.int64)
    ends = np.concatenate((change, [n_rows])).astype(np.int64)
    # block boundaries across ALL groups at once (a group boundary is
    # always a block boundary), then one vectorized encode pass — the
    # round-3 per-group encode_run loop spent most of the stage in tiny
    # per-block codec calls
    li = np.arange(n_rows, dtype=np.int64) - np.repeat(starts, ends - starts)
    bstarts = np.flatnonzero(li % block_size == 0)
    bends = np.append(bstarts[1:], n_rows)
    cols = _encode_stream(doc_ids, tfs, doclens, bstarts, bends, avgdl)
    grp = np.searchsorted(starts, bstarts, side="right") - 1
    term_per_group = [terms[int(s)].as_py() for s in starts]  # ONE per group
    view = memoryview(pos_buf)
    data = {
        "term": [term_per_group[g] for g in grp],
        "rb": rbs[bstarts].astype(np.int32),
        "block_id": (li[bstarts] // block_size).astype(np.int32),
        "min_doc_id": cols["min_doc_id"],
        "max_doc_id": cols["max_doc_id"],
        "n_postings": cols["n_postings"].astype(np.int32),
        "block_cf": cols["block_cf"],
        "block_max_tfnorm": cols["block_max_tfnorm"],
        "doc_ids_vb": cols["doc_ids_vb"],
        "tfs_vb": cols["tfs_vb"],
        "doclens_vb": cols["doclens_vb"],
        "pos_vb": [
            bytes(view[pos_off[s] : pos_off[e]])
            for s, e in zip(bstarts, bends)
        ],
        "sub_min_doc_ids": cols["sub_min_doc_ids"],
        "sub_max_tfnorms": cols["sub_max_tfnorms"],
    }
    return pa.RecordBatch.from_pydict(
        {c: data[c] for c in _BLOCK_COLS},
        schema=pa.schema(
            [
                ("term", pa.string()),
                ("rb", pa.int32()),
                ("block_id", pa.int32()),
                ("min_doc_id", pa.int64()),
                ("max_doc_id", pa.int64()),
                ("n_postings", pa.int32()),
                ("block_cf", pa.int64()),
                ("block_max_tfnorm", pa.float64()),
                ("doc_ids_vb", pa.binary()),
                ("tfs_vb", pa.binary()),
                ("doclens_vb", pa.binary()),
                ("pos_vb", pa.binary()),
                ("sub_min_doc_ids", pa.list_(pa.int64())),
                ("sub_max_tfnorms", pa.list_(pa.float64())),
            ]
        ),
    )


def _tokenize_tf_batches(batches):
    """mapInArrow kernel: (doc_id, lang, content) -> (doc_id, term, tf,
    doclen, pos_vb) — tokenization, per-doc tf/doclen, AND per-(doc, term)
    position streams in ONE pass with no shuffle (all per-document-local).

    Batch-vectorized end to end: tokens factorize to int codes once, one
    stable lexsort groups (doc, term) runs (positions stay ascending within
    a run for free), the position delta-gaps for the WHOLE batch
    varbyte-encode in a single codec call, and the output is built as Arrow
    arrays directly — the term column via dictionary codes (one Python
    string per DISTINCT term, not per row) and pos_vb ZERO-COPY from the
    (offsets, stream) buffer pair, never a per-row bytes object.  The
    round-2 pandas version spent 3x the tokenizer's own cost boxing 1.3M
    strings/bytes into a DataFrame."""
    import pyarrow as pa

    from horus_ner_spark.functions.tokenizer import tokenize_arrow_batch
    from horus_ner_spark.index.codec import vb_encode

    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("term", pa.string()),
            ("tf", pa.int64()),
            ("doclen", pa.int64()),
            ("pos_vb", pa.binary()),
        ]
    )
    for rb in batches:
        doc_ids = rb.column(rb.schema.get_field_index("doc_id")).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        # Arrow-vectorized tokenize: RE2 boundary passes + C++ split/lower/
        # filter; Python never touches a token (round-4 profile: the
        # per-row tokenize() loop was 77% of this kernel's CPU).  Exact
        # ``tokenize`` parity is the vectorizer's tested contract.
        tokens, tok_doc, tok_pos, doc_lens = tokenize_arrow_batch(
            rb.column(rb.schema.get_field_index("content")),
            rb.column(rb.schema.get_field_index("lang")),
        )
        if len(tokens) == 0:
            yield pa.RecordBatch.from_pydict(
                {f.name: [] for f in schema}, schema=schema
            )
            continue
        denc = tokens.dictionary_encode()  # C-level codes, one string/term
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = denc.dictionary
        # stable sort by (doc, code): tok_pos is ascending within a doc's
        # token stream, so positions stay ascending within each run
        order = np.lexsort((codes, tok_doc))
        sdoc, scode, spos = tok_doc[order], codes[order], tok_pos[order]
        # (doc, term) run boundaries
        change = np.flatnonzero((sdoc[1:] != sdoc[:-1]) | (scode[1:] != scode[:-1])) + 1
        starts = np.concatenate(([0], change))
        run_lens = np.diff(np.concatenate((starts, [len(scode)])))
        # gap-encode positions: run-first absolute, others (gap - 1)
        gaps = np.empty(len(spos), dtype=np.uint64)
        gaps[starts] = spos[starts]
        mask = np.ones(len(spos), dtype=bool)
        mask[starts] = False
        gaps[mask] = (spos[1:] - spos[:-1] - 1)[mask[1:]]
        stream = vb_encode(gaps)  # ONE call for the whole batch
        # per-value byte ends -> per-run byte offsets
        sarr = np.frombuffer(stream, dtype=np.uint8)
        vends = np.flatnonzero(sarr < 0x80) + 1
        run_bounds = np.cumsum(run_lens)
        run_off = np.concatenate(([0], vends[run_bounds - 1]))
        term_col = pa.DictionaryArray.from_arrays(
            pa.array(scode[starts], type=pa.int32()), uniq
        ).cast(pa.string())
        # pa.binary() carries int32 offsets; a batch's pos stream is bounded
        # by ~2 bytes/token * maxRecordsPerBatch docs * tokens/doc << 2 GiB.
        # A hard raise, not an assert: under ``python -O`` an assert would
        # vanish and an oversized batch would silently wrap the offsets and
        # corrupt the index (round-2 advice).
        if len(stream) >= (1 << 31):
            raise ValueError(
                f"position stream of one Arrow batch is {len(stream)} bytes, "
                "exceeding int32 binary offsets — lower "
                "spark.sql.execution.arrow.maxRecordsPerBatch"
            )
        pos_col = pa.Array.from_buffers(
            pa.binary(),
            len(starts),
            [None, pa.py_buffer(run_off.astype(np.int32)), pa.py_buffer(stream)],
        )
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(doc_ids[sdoc[starts]], type=pa.int64()),
                term_col,
                pa.array(run_lens, type=pa.int64()),
                pa.array(doc_lens[sdoc[starts]], type=pa.int64()),
                pos_col,
            ],
            schema=schema,
        )


_METRICS_SCHEMA = "relpath string, num_rows long, col_sum long, vb_bytes long"

# footer column chunks whose compressed sizes count as "bytes_compressed"
_VB_COLS = ("doc_ids_vb", "tfs_vb", "pos_vb")


# At or below this many data files, per-file metrics read footers on the
# driver (through the same pyarrow.fs routing) instead of launching a Spark
# job: a streaming micro-batch segment writes a handful of files per stage,
# and four metrics jobs per build were most of its fixed overhead (round-3
# verdict #6).  Above it — every at-scale table — the distributed path runs.
_DRIVER_METRICS_MAX_FILES = 64


def _one_file_metrics(pf, rp: str, sum_col: str | None) -> dict:
    """Metrics of one open ParquetFile: footer metadata + optionally one
    narrow column sum.  Shared by the driver and executor paths."""
    import pyarrow.compute as pc

    md = pf.metadata
    vb_bytes = 0
    for rg in range(md.num_row_groups):
        for ci in range(md.num_columns):
            col = md.row_group(rg).column(ci)
            if col.path_in_schema in _VB_COLS:
                vb_bytes += col.total_compressed_size
    col_sum = 0
    if sum_col is not None:
        col_sum = int(pc.sum(pf.read(columns=[sum_col])[sum_col]).as_py() or 0)
    return {
        "relpath": rp,
        "num_rows": md.num_rows,
        "col_sum": col_sum,
        "vb_bytes": vb_bytes,
    }


def _file_metrics(
    spark: SparkSession, path: str, sum_col: str | None = None
) -> list[dict]:
    """Per-data-file metrics, FS-agnostic.

    The file listing goes through the catalog abstraction (the one
    format/storage-specific primitive).  Small tables (streaming segments)
    read their footers on the driver — O(#files) metadata GETs bounded by
    ``_DRIVER_METRICS_MAX_FILES``, through the same pyarrow.fs routing, so
    object stores work identically.  Larger tables run one small Spark job
    whose tasks read only parquet FOOTER metadata (num_rows, column-chunk
    compressed sizes) plus, when ``sum_col`` is given, a single narrow int
    column — never the data through the driver.  At 10^12-file scale the
    job is O(#files) metadata reads, parallel across the cluster."""
    from horus_ner_spark import catalog

    files = [rp for rp, _sz in catalog.list_data_files(path, suffix=".parquet")]
    if not files:
        return []
    base = path

    if len(files) <= _DRIVER_METRICS_MAX_FILES:
        import pyarrow.parquet as pq

        fs, fs_base = catalog.filesystem(base)
        rows = []
        for rp in files:
            with fs.open_input_file(os.path.join(fs_base, rp)) as f:
                rows.append(_one_file_metrics(pq.ParquetFile(f), rp, sum_col))
        return sorted(rows, key=lambda r: r["relpath"])

    def kern(batches):
        import pyarrow.parquet as pq

        for pdf in batches:
            yield pd.DataFrame(
                [
                    _one_file_metrics(
                        pq.ParquetFile(os.path.join(base, rp)), rp, sum_col
                    )
                    for rp in pdf["relpath"]
                ]
            )

    fdf = spark.createDataFrame([(f,) for f in files], "relpath string")
    n_tasks = min(len(files), 64)
    out = fdf.repartition(n_tasks).mapInPandas(kern, _METRICS_SCHEMA).collect()
    return sorted((r.asDict() for r in out), key=lambda r: r["relpath"])


def _per_file_rows(metrics: list[dict], count_key: str) -> list[dict]:
    return [
        {"partition_id": i, "file": m["relpath"], count_key: m["num_rows"]}
        for i, m in enumerate(metrics)
    ]


def _bucket_rows(metrics: list[dict]) -> list[dict]:
    """Roll per-file metrics up to pbucket partitions (hive-style dirs)."""
    agg: dict[int, dict] = {}
    for m in metrics:
        head = m["relpath"].split(os.sep, 1)[0]
        bucket = int(head.split("=", 1)[1]) if "=" in head else -1
        rec = agg.setdefault(
            bucket,
            {"partition_id": bucket, "postings_emitted": 0, "bytes_compressed": 0},
        )
        rec["postings_emitted"] += m["col_sum"]
        rec["bytes_compressed"] += m["vb_bytes"]
    return [agg[b] for b in sorted(agg)]


def build_index(
    spark: SparkSession,
    corpus_path: str,
    index_dir: str,
    block_size: int = BLOCK_SIZE,
    range_bits: int = RANGE_BITS,
    n_pbuckets: int = N_PBUCKETS,
    split_threshold: int = SPLIT_THRESHOLD,
    fail_after_stage: str | None = None,
    small_max_bytes: int = 0,
) -> IndexPaths:
    """Build (or resume) the full index at ``index_dir``.

    ``fail_after_stage`` injects a crash between stages for the resume test
    (SURVEY.md §5 item 4).

    ``small_max_bytes`` > 0 opts into the small-segment fast path
    (index/smallseg.py): corpora whose data files total at most that many
    bytes build in one task's worth of local work — byte-identical blocks,
    same manifest — instead of the 5-stage distributed pipeline.  Streaming
    ingest passes this (a micro-batch is single-task-sized by definition);
    the default 0 keeps every explicit build on the distributed path.
    """
    from horus_ner_spark.session import ensure_package_on_executors

    if small_max_bytes > 0:
        from horus_ner_spark.index.smallseg import build_index_small, table_bytes

        if table_bytes(corpus_path) <= small_max_bytes:
            return build_index_small(
                spark, corpus_path, index_dir, block_size=block_size,
                range_bits=range_bits, n_pbuckets=n_pbuckets,
                split_threshold=split_threshold,
                fail_after_stage=fail_after_stage,
            )

    catalog.require_path_refs("build_index")  # manifest + metrics need path refs
    ensure_package_on_executors(spark)  # pandas-UDF closures unpickle on workers
    paths = IndexPaths(index_dir)
    os.makedirs(index_dir, exist_ok=True)
    conf = {
        "block_size": block_size,
        "range_bits": range_bits,
        "n_pbuckets": n_pbuckets,
        "split_threshold": split_threshold,
        "tokenizer": "code-aware-v1",
        # v4: positional postings (pos_vb) + rb column with per-(term, rb)
        # canonical block_ids (v3 chained ids across rb groups, which hash
        # partitioning cannot guarantee)
        # v5: per-block impact sub-range metadata (sub_min/max_doc_ids,
        # sub_max_tfnorms) for finer block-max WAND shallow bounds
        # v6: impact-ISOLATING variable-count sub-ranges; sub_max_doc_ids
        # dropped from storage (derived in the kernel from sub_min + the
        # block max, since ranges tile the block span)
        # v7: per-block cf sum (block_cf) stored so compaction derives the
        # merged term_stats cf as a column-pruned metadata sum, never
        # decoding tfs_vb
        "layout": "v7-block-cf",
        "bm25": {"k1": bm25.K1, "b": bm25.B},
    }
    fp = corpus_fingerprint(corpus_path, conf)
    man = Manifest(index_dir)
    corpus = catalog.read_table(spark, corpus_path)

    def _maybe_fail(stage: str) -> None:
        if fail_after_stage == stage:
            raise RuntimeError(f"injected failure after stage {stage}")

    import time

    # ── Stage A: docs (doc_id, metadata, per-row sha256 invariant) ──────────
    if not man.stage_complete("docs", fp, paths.docs):
        t0 = time.monotonic()
        docs = with_doc_id(corpus).select(
            "doc_id",
            "repo",
            "path",
            "commit",
            "lang",
            F.sha2("content", 256).alias("content_sha256"),
        )
        # doc_id-sorted within files (same rationale as doclens below)
        catalog.write_table(docs.sortWithinPartitions("doc_id"), paths.docs)
        per_file = _per_file_rows(_file_metrics(spark, paths.docs), "docs_tokenized")
        man.commit_stage(
            "docs", fp, per_file,
            {"n_docs": sum(r["docs_tokenized"] for r in per_file),
             "wall_s": round(time.monotonic() - t0, 3)},
        )
    _maybe_fail("docs")
    if (man.read_stage("docs") or {}).get("totals", {}).get("n_docs") == 0:
        # hive-partitioned empty tables (term_stats/postings) write no data
        # files and cannot be read back — fail here with the real reason
        # instead of a schema-inference error five stages later.  Streaming
        # ingestion skips empty (fully deduped) batches before build.
        raise ValueError(
            f"cannot build an index over an empty corpus: {corpus_path}"
        )

    # ── Stage B: tf (the single tokenization pass; shuffle-free) ────────────
    if not man.stage_complete("tf", fp, paths.tf):
        t0 = time.monotonic()
        tf = (
            with_doc_id(corpus)
            .select("doc_id", "lang", "content")
            .mapInArrow(_tokenize_tf_batches, schema=TF_SCHEMA)
        )
        catalog.write_table(tf, paths.tf)
        per_part = _per_file_rows(_file_metrics(spark, paths.tf), "postings_emitted")
        man.commit_stage(
            "tf", fp, per_part,
            {"postings_raw": sum(r["postings_emitted"] for r in per_part),
             "wall_s": round(time.monotonic() - t0, 3)},
        )
    _maybe_fail("tf")

    # ── Stage C: doclens + corpus stats ─────────────────────────────────────
    if not (
        man.stage_complete("stats", fp, paths.doclens)
        and os.path.exists(os.path.join(paths.corpus_stats, "_SUCCESS"))
    ):
        t0 = time.monotonic()
        tf = catalog.read_table(spark, paths.tf)
        doclens = tf.groupBy("doc_id").agg(F.max("doclen").alias("doclen"))
        # doc_id-sorted within files -> tight parquet row-group stats, so
        # point/range doc_id reads (bloom suspect probes, stale-dup
        # reconciliation) prune row groups instead of scanning the table
        catalog.write_table(doclens.sortWithinPartitions("doc_id"), paths.doclens)
        # n_docs (incl. zero-token docs, which have no doclens row) comes
        # from the docs-stage manifest; sum(doclen) rides the per-file
        # metrics pass (a narrow column sum — driver-side for small
        # segments, one distributed footer job for big tables), so stage C
        # launches no extra aggregation job.
        n_docs = man.read_stage("docs")["totals"]["n_docs"]
        dl_metrics = _file_metrics(spark, paths.doclens, sum_col="doclen")
        total_len = sum(m["col_sum"] for m in dl_metrics)
        avgdl = float(total_len) / n_docs if n_docs else 0.0
        catalog.write_table(
            corpus_stats_df(spark, n_docs, int(total_len), avgdl),
            paths.corpus_stats,
        )
        man.commit_stage(
            "stats", fp, [{"partition_id": 0, "docs_tokenized": n_docs}],
            {"n_docs": n_docs, "avgdl": avgdl,
             "wall_s": round(time.monotonic() - t0, 3)},
        )
    _maybe_fail("stats")

    # ── Stage D: term dictionary (df, cf) — map-side combine handles skew ───
    # Written bucketed by pbucket and term-sorted within files so both the
    # serving path and the distributed query path resolve query-term idf with
    # directory + row-group pruning (same layout as the postings table).
    if not man.stage_complete("term_stats", fp, paths.term_stats):
        t0 = time.monotonic()
        tf = catalog.read_table(spark, paths.tf)
        ts = (
            tf.groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf"))
            .withColumn("pbucket", term_bucket_col("term", n_pbuckets))
            .repartition(n_pbuckets, "pbucket")
            .sortWithinPartitions("term")
        )
        catalog.write_table(ts, paths.term_stats, partition_by=("pbucket",))
        tmetrics = _file_metrics(spark, paths.term_stats)
        man.commit_stage(
            "term_stats", fp, [{"partition_id": 0}],
            {"n_terms": sum(m["num_rows"] for m in tmetrics),
             "wall_s": round(time.monotonic() - t0, 3)},
        )
    _maybe_fail("term_stats")

    # ── Stage E: compressed posting blocks (single shuffle, broadcast hot) ──
    if not man.stage_complete("postings", fp, paths.postings):
        t0 = time.monotonic()
        avgdl = float(read_corpus_stats(paths)["avgdl"])
        # Zipf head only: terms above the split threshold get rb salting
        hot = (
            catalog.read_table(spark, paths.term_stats)
            .filter(F.col("df") > split_threshold)
            .select("term", F.lit(True).alias("is_hot"))
        )
        tf = (
            catalog.read_table(spark, paths.tf)
            .join(F.broadcast(hot), "term", "left")
            .withColumn(
                "rb",
                F.when(
                    F.col("is_hot"), F.shiftright("doc_id", 64 - range_bits)
                ).otherwise(F.lit(0)),
            )
            .select("term", "rb", "doc_id", "tf", "doclen", "pos_vb")
        )
        encode = _encode_arrow_factory(avgdl, block_size)
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        blocks = (
            tf.repartition(n_parts, "term", "rb")
            .sortWithinPartitions("term", "rb", "doc_id")
            .mapInArrow(encode, POSTINGS_SCHEMA)
        )
        # postings rows are 5 narrow columns: feed the kernel 128k-row Arrow
        # batches (~5 MB) instead of the 10k default sized for wide
        # content-carrying frames — fewer batch round-trips per 10^8 rows
        batch_key = "spark.sql.execution.arrow.maxRecordsPerBatch"
        old_batch = spark.conf.get(batch_key)
        spark.conf.set(batch_key, "131072")
        try:
            catalog.write_table(
                blocks.withColumn("pbucket", term_bucket_col("term", n_pbuckets))
                .repartition(n_pbuckets, "pbucket")
                .sortWithinPartitions("term", "min_doc_id"),
                paths.postings,
                partition_by=("pbucket",),
            )
        finally:
            spark.conf.set(batch_key, old_batch)
        per_bucket = _bucket_rows(
            _file_metrics(spark, paths.postings, sum_col="n_postings")
        )
        man.commit_stage(
            "postings",
            fp,
            per_bucket,
            {
                "postings_emitted": sum(r["postings_emitted"] for r in per_bucket),
                "bytes_compressed": sum(r["bytes_compressed"] for r in per_bucket),
                "wall_s": round(time.monotonic() - t0, 3),
            },
        )
    _maybe_fail("postings")

    return paths


def verify_sha_invariant(spark: SparkSession, corpus_path: str, paths: IndexPaths) -> int:
    """Per-row invariant vs the source table (BASELINE.json input_hint):
    returns the number of docs whose stored content_sha256 mismatches a fresh
    sha2(content, 256) of the source row.  Must be 0."""
    fresh = with_doc_id(catalog.read_table(spark, corpus_path)).select(
        "doc_id", F.sha2("content", 256).alias("sha_fresh")
    )
    stored = catalog.read_table(spark, paths.docs).select("doc_id", "content_sha256")
    return (
        stored.join(fresh, "doc_id", "full_outer")
        .filter(
            F.col("content_sha256").isNull()
            | F.col("sha_fresh").isNull()
            | (F.col("content_sha256") != F.col("sha_fresh"))
        )
        .count()
    )
