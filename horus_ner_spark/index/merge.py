"""Sort-merge posting-merge stage — combine index segments into one index.

North-rule requirement: "a sort-merge posting-merge stage" with
"posting-merge idempotence" tested.  The use case is incremental indexing:
each new corpus segment (e.g. a batch of new commits) is SPIMI-built
independently (build.py), then merged.  Reference analog: the memoized
term cache growing monotonically across runs via INSERT-if-absent
(reference: src/core/util/sqlite_helper.py:42-48).

Scale shape (round-3 rework of the round-2 single-group-per-term merge):

- **Re-blocking is keyed (term, range_bucket), not (term).**  The build
  salts hot terms across 2^RANGE_BITS doc_id-range groups precisely so no
  single task ever owns a Zipf-head term's full posting list
  (build.py:27-36); the merge preserves that property.  Hot-built input
  blocks already carry their true rb; cold-built blocks of a term whose
  MERGED df crosses the split threshold are split into per-rb fragments by
  a narrow (shuffle-free) normalization pass first, so the one shuffle of
  the merge groups by (term, rb) and the hottest term's merge cost is
  bounded by its largest rb range (~df / 2^RANGE_BITS), in parallel tasks.
- **No tf shuffle.**  The merged term_stats (df, cf) are derived from the
  merged posting blocks themselves — df is a metadata sum of n_postings,
  cf a cheap varbyte sum of each block's tfs — instead of unioning +
  de-duplicating every segment's full tf table per compaction (the
  round-2 contract dragged O(total postings) through a shuffle per merge).
  The uncompressed tf table exists for the brute-force oracle path only;
  pass ``merge_tf=True`` to carry it (oracle/test builds), never in the
  compaction loop.

Canonical-form guarantee (what makes merge idempotent & associative): the
output blocks for a term are a pure function of the SET of postings —
dedupe doc_ids (first segment in ``segments`` order wins, matching the
serving-side rule in query.bm25_wand_segments / IndexServer), sort by
doc_id, split by rb iff the DEDUPED merged df exceeds the split threshold
(exactly the build's hot-term rule), chunk at block_size within each run.
Hence merge(merge(a,b),c) == merge(a,b,c) == merge(a,merge(b,c)) == the
single-shot build of the union corpus, asserted in tests/test_merge.py.
The hot/cold decision uses the deduped df: when segments share no doc_ids
(the common case — ingest dedupes, see streaming/incremental.py) the
metadata sum of n_postings IS the deduped df; when they overlap, an exact
distinct-doc count runs for the handful of threshold-straddling terms.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from horus_ner_spark.functions.bucketing import term_bucket_col
from horus_ner_spark import catalog
from horus_ner_spark.index.build import (
    _BLOCK_COLS,
    BLOCK_SIZE,
    N_PBUCKETS,
    POSTINGS_SCHEMA,
    RANGE_BITS,
    SPLIT_THRESHOLD,
    IndexPaths,
    corpus_stats_df,
    encode_run,
    read_corpus_stats,
)
from horus_ner_spark.index.codec import decode_block, vb_decode

# intermediate schema: input blocks / split fragments tagged with their
# source segment index (first-wins dedupe key)
_TAGGED_SCHEMA = POSTINGS_SCHEMA + ", seg int"
_TAGGED_COLS = _BLOCK_COLS + ["seg"]


def _split_factory(avgdl: float, block_size: int, range_bits: int):
    """Narrow (per-partition, shuffle-free) normalization pass: every block
    of a maybe-hot term leaves keyed by its TRUE doc_id range bucket.

    - hot-built blocks (rb > 0, or rb == 0 with all doc_ids in range 0)
      pass through untouched — min/max metadata proves single-range, so
      the common case never decodes;
    - cold-built blocks of a maybe-hot term that span ranges are decoded
      and split into per-rb fragment blocks (positions move as verbatim
      byte slices; only doc-id deltas re-encode);
    - blocks of cold terms pass through with rb = 0.
    """
    shift = 64 - range_bits

    def split(batches):
        from horus_ner_spark.index.codec import pos_slice_offsets

        for pdf in batches:
            mh = pdf["maybe_hot"].to_numpy()
            rb_lo = (pdf["min_doc_id"].to_numpy(np.int64) >> shift).astype(np.int64)
            rb_hi = (pdf["max_doc_id"].to_numpy(np.int64) >> shift).astype(np.int64)
            span = mh & (rb_lo != rb_hi)
            keep = pdf.loc[~span, _TAGGED_COLS].copy()
            if len(keep):
                keep["rb"] = np.where(
                    mh[~span], rb_lo[~span], np.int64(0)
                ).astype(np.int32)
            frames = [keep] if len(keep) else []
            if span.any():
                frag_rows: list[dict] = []
                for row in pdf.loc[span].itertuples(index=False):
                    d, t = decode_block(bytes(row.doc_ids_vb), bytes(row.tfs_vb))
                    dl = vb_decode(bytes(row.doclens_vb)).view(np.int64)
                    pvb = bytes(row.pos_vb)
                    off = pos_slice_offsets(pvb, t)
                    rbs = d >> np.int64(shift)
                    change = np.flatnonzero(rbs[1:] != rbs[:-1]) + 1
                    starts = np.concatenate(([0], change))
                    ends = np.concatenate((change, [len(d)]))
                    for s, e in zip(starts, ends):
                        for r in encode_run(
                            row.term, int(rbs[s]), d[s:e], t[s:e], dl[s:e],
                            pvb, off[s : e + 1], avgdl, block_size,
                        ):
                            r["seg"] = row.seg
                            frag_rows.append(r)
                frames.append(pd.DataFrame(frag_rows, columns=_TAGGED_COLS))
            yield (
                pd.concat(frames, ignore_index=True)
                if frames
                else pdf.iloc[0:0][_TAGGED_COLS]
            )

    return split


def _drop_sorted(sorted_dead: np.ndarray, docs: np.ndarray) -> np.ndarray:
    """Keep-mask over ``docs`` for ids NOT in the sorted ``sorted_dead``."""
    if not len(sorted_dead) or not len(docs):
        return np.ones(len(docs), dtype=bool)
    pos = np.searchsorted(sorted_dead, docs)
    pos = np.minimum(pos, len(sorted_dead) - 1)
    return sorted_dead[pos] != docs


def _distinct_df_factory(tomb_bc):
    """Per-(term, rb) DEDUPED posting count — decodes doc_ids only (the
    cheap stream); runs only for threshold-straddling terms (overlapping
    segments, or any purge merge — the hot/cold decision must use the
    POST-purge df for the output to stay canonical)."""

    def _distinct_df(pdf: pd.DataFrame) -> pd.DataFrame:
        docs = np.unique(
            np.concatenate(
                [decode_block(bytes(d), bytes(t))[0]
                 for d, t in zip(pdf["doc_ids_vb"], pdf["tfs_vb"])]
            )
        )
        if tomb_bc is not None:
            docs = docs[_drop_sorted(tomb_bc.value, docs)]
        return pd.DataFrame(
            {"term": [pdf["term"].iloc[0]], "df": [np.int64(len(docs))]}
        )

    return _distinct_df


def _reblock_factory(avgdl: float, block_size: int, tomb_bc=None):
    """Canonical re-blocker for ONE (term, rb) group: k-way sorted concat,
    first-wins dedupe by (doc_id, seg), chunk at block_size.  Identical
    output to the build's encoder for the same posting set — block_ids are
    (term, rb)-local in both (layout v4).

    ``tomb_bc`` (a broadcast sorted int64 array of tombstoned doc_ids)
    makes this the PURGE point: deleted docs' postings — and their
    verbatim position slices — drop here, inside the decode/re-encode the
    merge already pays, so a purge merge costs no extra shuffle and its
    output is byte-identical to a fresh build of the surviving corpus."""

    def reblock(pdf: pd.DataFrame) -> pd.DataFrame:
        from horus_ner_spark.index.codec import pos_slice_offsets

        term = pdf["term"].iloc[0]
        rb = int(pdf["rb"].iloc[0])
        docs_l, tfs_l, dls_l, pos_l, seg_l = [], [], [], [], []
        for dvb, tvb, lvb, pvb, seg in zip(
            pdf["doc_ids_vb"], pdf["tfs_vb"], pdf["doclens_vb"],
            pdf["pos_vb"], pdf["seg"],
        ):
            d, t = decode_block(bytes(dvb), bytes(tvb))
            docs_l.append(d)
            tfs_l.append(t)
            dls_l.append(vb_decode(bytes(lvb)).view(np.int64))
            seg_l.append(np.full(len(d), seg, dtype=np.int32))
            # positions move as verbatim per-posting byte slices — the
            # sub-streams are self-contained (codec.py), so merge never
            # re-encodes a position
            pvb = bytes(pvb)
            off = pos_slice_offsets(pvb, t)
            pos_l.extend(pvb[off[i] : off[i + 1]] for i in range(len(t)))
        docs = np.concatenate(docs_l)
        tfs = np.concatenate(tfs_l)
        dls = np.concatenate(dls_l)
        segs = np.concatenate(seg_l)
        pos = np.empty(len(docs), dtype=object)
        pos[:] = pos_l
        # sort by (doc_id, seg): the first-wins winner of each dup run is
        # the copy from the OLDEST segment — deterministic, and the same
        # rule multi-segment serving applies (query.py/serve.py)
        order = np.lexsort((segs, docs))
        docs, tfs, dls, pos = docs[order], tfs[order], dls[order], pos[order]
        if len(docs) > 1:
            keep = np.empty(len(docs), dtype=bool)
            keep[0] = True
            keep[1:] = docs[1:] != docs[:-1]
            docs, tfs, dls, pos = docs[keep], tfs[keep], dls[keep], pos[keep]
        if tomb_bc is not None:
            alive = _drop_sorted(tomb_bc.value, docs)
            if not alive.all():
                docs, tfs, dls, pos = (
                    docs[alive], tfs[alive], dls[alive], pos[alive]
                )
            if not len(docs):  # every posting of this group was purged
                return pd.DataFrame(columns=_BLOCK_COLS)
        pos_buf = b"".join(pos)
        pos_off = np.zeros(len(docs) + 1, dtype=np.int64)
        np.cumsum([len(b) for b in pos], out=pos_off[1:])
        rows = encode_run(term, rb, docs, tfs, dls, pos_buf, pos_off,
                          avgdl, block_size)
        return pd.DataFrame(rows, columns=_BLOCK_COLS)

    return reblock


def _first_wins_union(
    spark: SparkSession, refs: list[str], key_cols: list[str]
) -> DataFrame:
    """Union ``refs`` keeping, per key, the row from the EARLIEST ref."""
    df = None
    for i, ref in enumerate(refs):
        part = catalog.read_table(spark, ref).withColumn("_seg", F.lit(i))
        df = part if df is None else df.unionByName(part)
    w = Window.partitionBy(*key_cols).orderBy("_seg")
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_seg")
    )


def merge_indexes(
    spark: SparkSession,
    segments: list[IndexPaths],
    out_dir: str,
    block_size: int = BLOCK_SIZE,
    range_bits: int = RANGE_BITS,
    n_pbuckets: int = N_PBUCKETS,
    split_threshold: int = SPLIT_THRESHOLD,
    merge_tf: bool = False,
    small_max_bytes: int = 0,
    tombstones: np.ndarray | None = None,
) -> IndexPaths:
    """Merge N built index segments into a canonical combined index.

    ``merge_tf`` carries the uncompressed tf table into the output (needed
    only by the brute-force oracle path, query.bm25_bruteforce); the
    compaction loop leaves it False so no merge ever shuffles raw postings
    beyond the one (term, rb) block re-grouping.

    ``small_max_bytes`` > 0 routes merges whose inputs' postings total at
    most that many bytes through the local small-segment merge
    (smallseg.merge_indexes_small — canonical-form identical); streaming
    compaction passes it so L1/L2 micro-batch compactions skip the Spark
    job storm, while upper-level compactions stay distributed.

    ``tombstones`` (sorted-unique int64 doc_ids, index/tombstones.py)
    makes this a PURGE merge: the named docs drop from docs / doclens /
    every posting block, corpus and term stats recompute over the
    survivors, and the output is byte-identical to a fresh build of the
    surviving corpus (tests/test_tombstones.py) — the physical half of
    the delete lifecycle (serve-side exclusion is the logical half).
    The purge rides the merge's existing decode/re-encode; the only
    added cost is the exact post-purge df pass for threshold-straddling
    hot terms (the same pass overlapping merges already run).
    """
    from horus_ner_spark.session import ensure_package_on_executors

    purging = tombstones is not None and len(tombstones) > 0
    if small_max_bytes > 0 and not merge_tf:
        from horus_ner_spark.index.smallseg import (
            merge_indexes_small,
            table_bytes,
        )

        if sum(table_bytes(s.postings) for s in segments) <= small_max_bytes:
            return merge_indexes_small(
                spark, segments, out_dir, block_size=block_size,
                range_bits=range_bits, n_pbuckets=n_pbuckets,
                split_threshold=split_threshold,
                tombstones=tombstones if purging else None,
            )

    catalog.require_path_refs("merge_indexes")  # segment refs are paths
    ensure_package_on_executors(spark)  # reblock kernel unpickles on workers
    out = IndexPaths(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    # detect doc-id overlap FIRST (one narrow countDistinct job over the
    # unioned docs' doc_id column — column-pruned scan): when segments are
    # doc-disjoint — the common case, ingest dedupes
    # (streaming/incremental.py) — docs/doclens merge as plain shuffle-free
    # unions and the merged corpus stats are driver arithmetic over the
    # segments' stored one-row stats; only genuinely overlapping merges pay
    # the per-key first-wins window shuffles.
    seg_stats = [read_corpus_stats(seg) for seg in segments]
    seg_doc_sum = sum(int(s["n_docs"]) for s in seg_stats)

    tomb_bc = None
    tomb_df = None
    if purging:
        tombstones = np.unique(np.asarray(tombstones, dtype=np.int64))
        tomb_bc = spark.sparkContext.broadcast(tombstones)
        tomb_df = spark.createDataFrame(
            pd.DataFrame({"doc_id": tombstones})
        )

    def _purge(df: DataFrame) -> DataFrame:
        """Anti-join the (bounded, broadcast) tombstone set on doc_id."""
        if tomb_df is None:
            return df
        return df.join(F.broadcast(tomb_df), "doc_id", "left_anti")

    def _union(tables: list[str]) -> DataFrame:
        df = None
        for ref in tables:
            part = catalog.read_table(spark, ref)
            df = part if df is None else df.unionByName(part)
        return df

    n_docs = (
        _union([s.docs for s in segments])
        .select("doc_id").distinct().count()
    )
    overlap = seg_doc_sum != n_docs

    if not overlap:
        catalog.write_table(
            _purge(_union([s.docs for s in segments])), out.docs
        )
        catalog.write_table(
            _purge(_union([s.doclens for s in segments])), out.doclens
        )
        total_len = sum(int(s["total_len"]) for s in seg_stats)
    else:
        # first-wins union (oldest segment wins — deterministic, aligned
        # with the posting dedupe below and the serving-side rule)
        catalog.write_table(
            _purge(_first_wins_union(
                spark, [s.docs for s in segments], ["doc_id"]
            )),
            out.docs,
        )
        catalog.write_table(
            _purge(_first_wins_union(
                spark, [s.doclens for s in segments], ["doc_id"]
            )),
            out.doclens,
        )
        total_len = catalog.read_table(spark, out.doclens).agg(
            F.sum("doclen").alias("t")
        ).collect()[0]["t"] or 0
    if purging:
        # survivor stats: one footer-metadata count + one narrow agg over
        # the just-written doclens (the driver arithmetic above counts
        # purged docs)
        n_docs = catalog.read_table(spark, out.docs).count()
        total_len = catalog.read_table(spark, out.doclens).agg(
            F.sum("doclen").alias("t")
        ).collect()[0]["t"] or 0
    avgdl = float(total_len) / n_docs if n_docs else 0.0
    catalog.write_table(
        corpus_stats_df(spark, n_docs, int(total_len), avgdl),
        out.corpus_stats,
    )

    # tagged union of every segment's posting blocks.  Mixed layouts
    # normalize to the v7 column set: pre-v5 segments lack the sub_*
    # impact-metadata columns (add null arrays — the read path treats
    # null sub metadata as block-granular), v5 segments carry a stored
    # sub_max_doc_ids (drop it — v6 derives range maxima from sub_min +
    # the block max), pre-v7 segments lack block_cf (add null — every
    # block re-encodes through encode_run below, which recomputes it, so
    # the OUTPUT is always full v7).  Without the normalization, an
    # upgraded deployment's first compaction over old segments crashed
    # (KeyError in the split kernel / AnalysisException in unionByName).
    _SUB_NORM_COLS = (
        ("block_cf", "long"),
        ("sub_min_doc_ids", "array<long>"),
        ("sub_max_tfnorms", "array<double>"),
    )
    blocks = None
    for i, seg in enumerate(segments):
        b = catalog.read_table(spark, seg.postings).drop("pbucket")
        b = b.drop("sub_max_doc_ids")  # no-op on non-v5 segments
        for name, typ in _SUB_NORM_COLS:
            if name not in b.columns:
                b = b.withColumn(name, F.lit(None).cast(typ))
        b = b.withColumn("seg", F.lit(i))
        blocks = b if blocks is None else blocks.unionByName(b)

    # hot/cold decision, phase 1 — metadata only (column-pruned scan):
    # summed n_postings is an upper bound on the merged df, exact when
    # segments are doc-disjoint
    maybe_hot = (
        blocks.groupBy("term")
        .agg(F.sum("n_postings").alias("ub"))
        .filter(F.col("ub") > split_threshold)
        .select("term", F.lit(True).alias("maybe_hot"))
    )
    tagged = (
        blocks.join(F.broadcast(maybe_hot), "term", "left")
        .withColumn("maybe_hot", F.coalesce("maybe_hot", F.lit(False)))
    )
    split = _split_factory(avgdl, block_size, range_bits)
    normalized = tagged.mapInPandas(split, _TAGGED_SCHEMA)

    demoted: list[str] = []
    persisted = None
    if overlap or purging:
        # phase 2 (overlapping segments, or any purge merge): exact
        # deduped post-purge df for the maybe-hot terms; any that fall
        # back under the threshold after dedupe/purge are re-keyed to a
        # single cold run (canonical form)
        persisted = normalized = normalized.persist()
        exact = (
            normalized.join(F.broadcast(maybe_hot.select("term")), "term")
            .groupBy("term", "rb")
            .applyInPandas(_distinct_df_factory(tomb_bc),
                           "term string, df long")
            .groupBy("term")
            .agg(F.sum("df").alias("df"))
            .filter(F.col("df") <= split_threshold)
            .collect()
        )
        demoted = [r["term"] for r in exact]
    if demoted:
        normalized = normalized.withColumn(
            "rb",
            F.when(F.col("term").isin(demoted), F.lit(0)).otherwise(F.col("rb")),
        )

    # the ONE shuffle of the merge: canonical re-block per (term, rb) —
    # a Zipf-head term merges in up to 2^range_bits parallel tasks
    reblock = _reblock_factory(avgdl, block_size, tomb_bc=tomb_bc)
    merged = normalized.groupBy("term", "rb").applyInPandas(
        reblock, POSTINGS_SCHEMA
    )
    catalog.write_table(
        merged.withColumn("pbucket", term_bucket_col("term", n_pbuckets))
        .repartition(n_pbuckets, "pbucket")
        .sortWithinPartitions("term", "min_doc_id"),
        out.postings,
        partition_by=("pbucket",),
    )
    if persisted is not None:
        # unpersist the dataframe that was actually cached: ``normalized``
        # may have been rebound to the rb-demotion projection above
        persisted.unpersist()

    # term stats FROM the merged blocks: df is pure footer metadata
    # (n_postings sums) and since layout v7 so is cf (block_cf sums) —
    # the merged postings always carry block_cf because every block above
    # re-encoded through encode_run, so this is a column-pruned JVM
    # aggregation over four narrow columns: no Python round-trip, no
    # varbyte decode (pre-v7 the cf sum decoded every block's tfs_vb —
    # ~1/3 of merge wall time at sf0.1)
    catalog.write_table(
        catalog.read_table(spark, out.postings)
        .select("term", "n_postings", "block_cf")
        .groupBy("term")
        .agg(
            F.sum("n_postings").cast("long").alias("df"),
            F.sum("block_cf").alias("cf"),
        )
        .withColumn("pbucket", term_bucket_col("term", n_pbuckets))
        .repartition(n_pbuckets, "pbucket")
        .sortWithinPartitions("term"),
        out.term_stats,
        partition_by=("pbucket",),
    )

    if merge_tf:  # oracle/test builds only — never the compaction loop
        catalog.write_table(
            _purge(_first_wins_union(
                spark, [s.tf for s in segments], ["doc_id", "term"]
            )),
            out.tf,
        )
    if tomb_bc is not None:
        tomb_bc.unpersist()
    return out
