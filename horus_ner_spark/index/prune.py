"""Static index pruning — impact-ordered posting retention (opt-in).

At web scale the serving fleet often wants a smaller, faster index for
the first-pass ranker: keep only each term's highest-impact postings
(Carmel et al.'s static pruning, the batch analog of impact-ordered
lists).  This module builds a pruned COPY of a built index:

- per (term, range-bucket) group, keep the top ``ceil(keep_fraction*n)``
  postings by BM25 tf-norm impact (ties broken by lower doc_id for
  determinism), but never fewer than ``min_keep`` — rare terms survive
  intact, only Zipf-head lists shrink;
- pruning is allocated per (term, rb), NOT per term, so a hot term's
  pruning work parallelizes across its range buckets exactly like the
  build/merge (doc_ids are hash-distributed, so per-bucket tf-norm
  distributions are iid samples of the term's — the per-bucket top
  fraction is a tight approximation of the global one);
- ``term_stats`` / ``corpus_stats`` / ``docs`` / ``doclens`` are carried
  over UNCHANGED: a surviving posting contributes bit-identically to the
  full index (same df -> same idf, same doclen -> same tf-norm).  A
  doc's total score is therefore a LOWER BOUND of its full-index score
  (a multi-term doc may lose one term's posting), exact for single-term
  queries; recall@k is the quality axis (measured in
  tests/test_prune.py).

The output is a regular index directory: IndexServer / bm25_wand /
bm25_distributed serve it with zero changes.  Approximate by design —
never part of the rank-identical oracle contract; the full index remains
the source of truth (reference analog: the reference caps its own
retrieval fan-out per term via `search_engine_tot_resources`,
config reference: src/core/util/systemlog.py-adjacent config usage in
features.py:288 — bounded-evidence ranking is the same idea).
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

from horus_ner_spark import catalog
from horus_ner_spark.index import bm25
from horus_ner_spark.functions.bucketing import term_bucket_col
from horus_ner_spark.index.build import (
    _BLOCK_COLS,
    BLOCK_SIZE,
    N_PBUCKETS,
    POSTINGS_SCHEMA,
    IndexPaths,
    encode_run,
    read_corpus_stats,
)
from horus_ner_spark.index.codec import decode_block, vb_decode


def _prune_factory(avgdl: float, keep_fraction: float, min_keep: int,
                   block_size: int):
    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        from horus_ner_spark.index.codec import pos_slice_offsets

        # early-out: a group that prunes to itself (n_keep == n) passes its
        # blocks through VERBATIM.  Valid because the input is a built
        # index (blocks already canonical for this (term, rb) run) and
        # prune carries corpus_stats over unchanged, so the stored
        # avgdl-dependent metadata (block_max_tfnorm, sub_max_tfnorms)
        # stays exact.  On a Zipf vocabulary this skips the decode +
        # re-encode round-trip for the entire rare-term tail (df <=
        # min_keep), which is most groups.
        n = int(pdf["n_postings"].sum())
        if n <= min_keep or math.ceil(keep_fraction * n) >= n:
            return pdf[_BLOCK_COLS]

        term = pdf["term"].iloc[0]
        rb = int(pdf["rb"].iloc[0])
        docs_l, tfs_l, dls_l, pos_l = [], [], [], []
        for dvb, tvb, lvb, pvb in zip(
            pdf["doc_ids_vb"], pdf["tfs_vb"], pdf["doclens_vb"], pdf["pos_vb"]
        ):
            d, t = decode_block(bytes(dvb), bytes(tvb))
            docs_l.append(d)
            tfs_l.append(t)
            dls_l.append(vb_decode(bytes(lvb)).view(np.int64))
            pvb = bytes(pvb)
            off = pos_slice_offsets(pvb, t)
            pos_l.extend(pvb[off[i]: off[i + 1]] for i in range(len(t)))
        docs = np.concatenate(docs_l)
        tfs = np.concatenate(tfs_l)
        dls = np.concatenate(dls_l)
        # applyInPandas gives no within-group row order guarantee (multiple
        # input splits shuffle-fetch in arbitrary order), and encode_run
        # requires a strictly increasing doc_id run — ALWAYS re-sort, like
        # the merge re-blocker does (merge.py _reblock_factory)
        sort0 = np.argsort(docs, kind="stable")
        docs, tfs, dls = docs[sort0], tfs[sort0], dls[sort0]
        pos_l = [pos_l[i] for i in sort0]
        n = len(docs)
        n_keep = min(n, max(min_keep, math.ceil(keep_fraction * n)))
        if n_keep < n:
            tfnorm = tfs * (bm25.K1 + 1.0) / (
                tfs + bm25.K1
                * (1.0 - bm25.B + bm25.B * dls.astype(np.float64) / avgdl)
            )
            # highest impact first, ties -> lower doc_id (determinism)
            order = np.lexsort((docs, -tfnorm))[:n_keep]
            keep = np.sort(order)  # back to doc_id order (run is sorted)
            docs, tfs, dls = docs[keep], tfs[keep], dls[keep]
            pos_l = [pos_l[i] for i in keep]
        pos_buf = b"".join(pos_l)
        pos_off = np.zeros(len(docs) + 1, dtype=np.int64)
        np.cumsum([len(b) for b in pos_l], out=pos_off[1:])
        rows = encode_run(term, rb, docs, tfs, dls, pos_buf, pos_off,
                          avgdl, block_size)
        return pd.DataFrame(rows, columns=_BLOCK_COLS)

    return prune


def prune_index(
    spark: SparkSession,
    paths: IndexPaths,
    out_dir: str,
    keep_fraction: float = 0.25,
    min_keep: int = 128,
    n_pbuckets: int = N_PBUCKETS,
    block_size: int = BLOCK_SIZE,
) -> IndexPaths:
    """Build the pruned copy (see module docstring).  One shuffle, keyed
    (term, rb) — identical parallel shape to the merge re-blocker."""
    from horus_ner_spark.session import ensure_package_on_executors

    catalog.require_path_refs("prune_index")
    ensure_package_on_executors(spark)
    out = IndexPaths(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    avgdl = float(read_corpus_stats(paths)["avgdl"])

    pruned = (
        catalog.read_table(spark, paths.postings)
        .drop("pbucket")
        .groupBy("term", "rb")
        .applyInPandas(
            _prune_factory(avgdl, keep_fraction, min_keep, block_size),
            POSTINGS_SCHEMA,
        )
    )
    catalog.write_table(
        pruned.withColumn("pbucket", term_bucket_col("term", n_pbuckets))
        .repartition(n_pbuckets, "pbucket")
        .sortWithinPartitions("term", "min_doc_id"),
        out.postings,
        partition_by=("pbucket",),
    )
    # stats tables carried over unchanged: surviving postings score
    # bit-identically to the full index (module docstring).  corpus_stats
    # is one row; docs/doclens are O(n_docs) and keep their natural write
    # parallelism
    catalog.write_table(
        catalog.read_table(spark, paths.corpus_stats).coalesce(1),
        out.corpus_stats,
    )
    catalog.write_table(
        catalog.read_table(spark, paths.term_stats),
        out.term_stats,
        partition_by=("pbucket",),
    )
    for src, dst in ((paths.docs, out.docs), (paths.doclens, out.doclens)):
        catalog.write_table(catalog.read_table(spark, src), dst)
    return out
