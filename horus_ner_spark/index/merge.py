"""Sort-merge posting-merge stage — combine index segments into one index.

North-rule requirement: "a sort-merge posting-merge stage" with
"posting-merge idempotence" tested.  The use case is incremental indexing:
each new corpus segment (e.g. a batch of new commits) is SPIMI-built
independently (build.py), then merged.  Reference analog: the memoized
term cache growing monotonically across runs via INSERT-if-absent
(reference: src/core/util/sqlite_helper.py:42-48).

Why merging is cheap here: blocks are self-contained (codec.py) and carry
doc_ids, tfs, AND doclens, so merging segment postings for a term is
decode -> k-way sorted concat -> re-block -> re-encode, entirely inside one
``(term, range_bucket)`` group — no global pass.  The only non-local input
is the merged ``avgdl`` (a scalar broadcast into the kernel closure):
``block_max_tfnorm`` is idf-free by design, so no per-term df join is
needed even though df changes on merge — idf is applied at query time from
the recomputed term_stats table.

Canonical-form guarantee (what makes merge idempotent & associative): the
output blocks for a (term, rb) group are a pure function of the SET of
postings in the group — sort by doc_id, dedupe (first wins), chunk at
block_size.  Hence merge(merge(a,b),c) == merge(a,b,c) == merge(a,merge(b,c)),
asserted in tests/test_merge.py.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from horus_ner_spark.functions.bucketing import term_bucket_col
from horus_ner_spark import catalog
from horus_ner_spark.index import bm25
from horus_ner_spark.index.build import (
    _BLOCK_COLS,
    BLOCK_SIZE,
    N_PBUCKETS,
    POSTINGS_SCHEMA,
    RANGE_BITS,
    SPLIT_THRESHOLD,
    IndexPaths,
    encode_run,
)
from horus_ner_spark.index.codec import decode_block, vb_decode


def _reblock_factory(avgdl: float, block_size: int, range_bits: int,
                     split_threshold: int):
    """Per-term re-blocker replicating the build's canonical chunking: the
    merged posting run is split by rb (doc_id high bits) iff the MERGED df
    exceeds the split threshold — exactly the build's hot-term rule, with
    df == posting count by definition, so no term_stats join is needed."""

    def reblock(pdf: pd.DataFrame) -> pd.DataFrame:
        from horus_ner_spark.index.codec import pos_slice_offsets

        term = pdf["term"].iloc[0]
        docs_l, tfs_l, dls_l, pos_l = [], [], [], []
        for dvb, tvb, lvb, pvb in zip(
            pdf["doc_ids_vb"], pdf["tfs_vb"], pdf["doclens_vb"], pdf["pos_vb"]
        ):
            d, t = decode_block(bytes(dvb), bytes(tvb))
            docs_l.append(d)
            tfs_l.append(t)
            dls_l.append(vb_decode(bytes(lvb)).view(np.int64))
            # positions move as verbatim per-posting byte slices — the
            # sub-streams are self-contained (codec.py), so merge never
            # re-encodes a position
            pvb = bytes(pvb)
            off = pos_slice_offsets(pvb, t)
            pos_l.extend(pvb[off[i] : off[i + 1]] for i in range(len(t)))
        docs = np.concatenate(docs_l)
        tfs = np.concatenate(tfs_l)
        dls = np.concatenate(dls_l)
        pos = np.empty(len(docs), dtype=object)
        pos[:] = pos_l
        order = np.argsort(docs, kind="mergesort")
        docs, tfs, dls, pos = docs[order], tfs[order], dls[order], pos[order]
        if len(docs) > 1:  # dedupe identical doc_ids (overlapping segments)
            keep = np.empty(len(docs), dtype=bool)
            keep[0] = True
            keep[1:] = docs[1:] != docs[:-1]
            docs, tfs, dls, pos = docs[keep], tfs[keep], dls[keep], pos[keep]
        pos_buf = b"".join(pos)
        pos_off = np.zeros(len(docs) + 1, dtype=np.int64)
        np.cumsum([len(b) for b in pos], out=pos_off[1:])
        rows: list[dict] = []
        if len(docs) > split_threshold:  # hot: chunk within each rb range
            rbs = docs >> np.int64(64 - range_bits)
            change = np.flatnonzero(rbs[1:] != rbs[:-1]) + 1
            starts = np.concatenate(([0], change))
            ends = np.concatenate((change, [len(docs)]))
            for s, e in zip(starts, ends):
                rows.extend(
                    encode_run(term, int(rbs[s]), docs[s:e], tfs[s:e], dls[s:e],
                               pos_buf, pos_off[s : e + 1], avgdl, block_size)
                )
        else:
            rows = encode_run(term, 0, docs, tfs, dls, pos_buf, pos_off,
                              avgdl, block_size)
        return pd.DataFrame(rows, columns=_BLOCK_COLS)

    return reblock


def merge_indexes(
    spark: SparkSession,
    segments: list[IndexPaths],
    out_dir: str,
    block_size: int = BLOCK_SIZE,
    range_bits: int = RANGE_BITS,
    n_pbuckets: int = N_PBUCKETS,
    split_threshold: int = SPLIT_THRESHOLD,
) -> IndexPaths:
    """Merge N built index segments into a canonical combined index."""
    from horus_ner_spark.session import ensure_package_on_executors

    catalog.require_path_refs("merge_indexes")  # segment refs are paths
    ensure_package_on_executors(spark)  # reblock kernel unpickles on workers
    out = IndexPaths(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    # docs / doclens: plain unions (dedupe by doc_id, first wins)
    docs = None
    doclens = None
    for seg in segments:
        d = catalog.read_table(spark, seg.docs)
        dl = catalog.read_table(spark, seg.doclens)
        docs = d if docs is None else docs.unionByName(d)
        doclens = dl if doclens is None else doclens.unionByName(dl)
    docs = docs.dropDuplicates(["doc_id"])
    doclens = doclens.dropDuplicates(["doc_id"])
    catalog.write_table(docs, out.docs)
    catalog.write_table(doclens, out.doclens)

    # merged corpus stats
    n_docs = catalog.read_table(spark, out.docs).count()
    total_len = catalog.read_table(spark, out.doclens).agg(
        F.sum("doclen").alias("t")
    ).collect()[0]["t"] or 0
    avgdl = float(total_len) / n_docs if n_docs else 0.0
    catalog.write_table(
        spark.createDataFrame(
            [(n_docs, int(total_len), avgdl)],
            "n_docs long, total_len long, avgdl double",
        ).coalesce(1),
        out.corpus_stats,
    )

    # merged tf (kept for the brute-force oracle path) + term stats
    tf = None
    for seg in segments:
        t = catalog.read_table(spark, seg.tf)
        tf = t if tf is None else tf.unionByName(t)
    tf = tf.dropDuplicates(["doc_id", "term"])
    catalog.write_table(tf, out.tf)
    tf = catalog.read_table(spark, out.tf)
    catalog.write_table(
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf"))
        .withColumn("pbucket", term_bucket_col("term", n_pbuckets))
        .repartition(n_pbuckets, "pbucket")
        .sortWithinPartitions("term"),
        out.term_stats,
        partition_by=("pbucket",),
    )

    # sort-merge the posting blocks per term — join-free: the merged avgdl
    # scalar is the only corpus-level input to re-blocking, and the hot/cold
    # chunking decision is local (df == merged posting count).  Merge-side
    # skew is bounded by the hottest term's postings in one task; at true
    # 10^12 scale, raise range_bits/lower block granularity or merge per rb
    # once all segments are hot-built (blocks then never span rb bounds).
    blocks = None
    for seg in segments:
        b = catalog.read_table(spark, seg.postings).drop("pbucket")
        blocks = b if blocks is None else blocks.unionByName(b)
    reblock = _reblock_factory(avgdl, block_size, range_bits, split_threshold)
    merged = blocks.groupBy("term").applyInPandas(reblock, POSTINGS_SCHEMA)
    catalog.write_table(
        merged.withColumn("pbucket", term_bucket_col("term", n_pbuckets))
        .repartition(n_pbuckets, "pbucket")
        .sortWithinPartitions("term", "min_doc_id"),
        out.postings,
        partition_by=("pbucket",),
    )
    return out
