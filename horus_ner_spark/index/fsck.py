"""Distributed index-integrity audit (``fsck``).

At the 100-TB target an index is petabytes of compressed blocks spread
over object storage; bit rot, a partial overwrite, a buggy writer, or a
mixed-version merge must be detectable WITHOUT re-building (re-building
is the thing that takes a day).  The reference has no analog — its
SQLite cache trusts the file (reference: src/core/util/sqlite_helper.py)
— but its absence is exactly why a from-scratch engine needs one.

Two tiers, both returning the same violations relation
``(check, term, rb, block_id, detail)``:

- **metadata tier** (default): column-pruned scans of block METADATA only
  (never the varbyte payload columns), so the job reads <1% of index
  bytes.  Checks: per-block sanity, per-(term, rb) block-chain
  contiguity + doc-id disjointness (one window shuffle, the same key the
  build shuffled on), pbucket placement vs the term hash (a misplaced
  file would silently vanish from partition-pruned queries — the worst
  failure mode because it is invisible), term_stats ↔ block-metadata
  df/cf consistency (full outer join: catches both orphan postings and
  ghost dictionary entries), docs/doclens uniqueness + doc-id set
  equality, and corpus_stats n_docs/avgdl recomputation.
- **deep tier** (``deep=True``): adds one ``mapInArrow`` pass over the
  postings payload — decode every block and re-derive what the metadata
  claims (counts, min/max doc_ids, block_cf, block_max_tfnorm, v6
  sub-range impact bounds, position-stream framing, per-posting
  tf ≤ doclen and max position < doclen) — plus a tf-table ↔ term_stats
  df/cf re-aggregation.  Cost is one full read of the postings table:
  the same order as one cold exhaustive query over every term, fully
  parallel, no shuffle (every check is block-local).

Violations are returned as a count per check plus a bounded sample —
never an unbounded collect.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from horus_ner_spark.catalog import read_table
from horus_ner_spark.functions.bucketing import term_bucket_col
from horus_ner_spark.index import bm25
from horus_ner_spark.index.build import (
    N_PBUCKETS,
    IndexPaths,
    read_corpus_stats,
)

VIOLATION_SCHEMA = (
    "check string, term string, rb int, block_id int, detail string"
)

_REL_TOL = 1e-9  # float64 recomputation tolerance (tfnorm, avgdl)


def _v(df: DataFrame, check: str, detail_col, term="term", rb="rb",
       block_id="block_id") -> DataFrame:
    """Project a violating subset onto the violations schema."""
    return df.select(
        F.lit(check).alias("check"),
        (F.col(term) if term else F.lit(None)).cast("string").alias("term"),
        (F.col(rb) if rb else F.lit(None)).cast("int").alias("rb"),
        (F.col(block_id) if block_id else F.lit(None))
        .cast("int").alias("block_id"),
        detail_col.cast("string").alias("detail"),
    )


# ───────────────────────── metadata tier ─────────────────────────


def _block_metadata_checks(meta: DataFrame, n_pbuckets: int) -> list[DataFrame]:
    out = []
    out.append(_v(
        meta.filter(F.col("min_doc_id") > F.col("max_doc_id")),
        "block_minmax_inverted",
        F.format_string("min=%s > max=%s", "min_doc_id", "max_doc_id"),
    ))
    out.append(_v(
        meta.filter(F.col("n_postings") < 1),
        "block_empty",
        F.format_string("n_postings=%s", "n_postings"),
    ))
    # chain: within (term, rb), block_ids are 0,1,2,... and doc-id ranges
    # are disjoint ascending.  One shuffle on (term, rb) — the build's own
    # partitioning key, so cardinality/skew behave exactly like the build.
    w = Window.partitionBy("term", "rb").orderBy("block_id")
    chained = meta.select(
        "term", "rb", "block_id", "min_doc_id", "max_doc_id",
        F.lag("block_id").over(w).alias("prev_id"),
        F.lag("max_doc_id").over(w).alias("prev_max"),
    )
    out.append(_v(
        chained.filter(
            (F.col("prev_id").isNull() & (F.col("block_id") != 0))
            | (F.col("prev_id").isNotNull()
               & (F.col("block_id") != F.col("prev_id") + 1))
        ),
        "block_chain_gap",
        F.format_string("block_id=%s after prev_id=%s", "block_id", "prev_id"),
    ))
    out.append(_v(
        chained.filter(
            F.col("prev_max").isNotNull()
            & (F.col("min_doc_id") <= F.col("prev_max"))
        ),
        "block_overlap",
        F.format_string("min=%s <= prev_max=%s", "min_doc_id", "prev_max"),
    ))
    out.append(_v(
        meta.filter(
            F.col("pbucket") != term_bucket_col("term", n_pbuckets)
        ),
        "pbucket_misplaced",
        F.format_string(
            "stored pbucket=%s != crc32(term) %% %s",
            "pbucket", F.lit(n_pbuckets),
        ),
    ))
    return out


def _term_stats_checks(meta: DataFrame, term_stats: DataFrame,
                       n_pbuckets: int) -> list[DataFrame]:
    # doc-id ranges are disjoint across a term's blocks and rb groups
    # (checked separately), so df == Σ n_postings and cf == Σ block_cf.
    agg = meta.groupBy("term").agg(
        F.sum("n_postings").alias("df_meta"),
        F.sum("block_cf").alias("cf_meta"),
        F.sum(F.col("block_cf").isNull().cast("long")).alias("cf_nulls"),
    )
    ts = term_stats.select("term", "df", "cf", "pbucket")
    j = agg.join(ts, "term", "full_outer")
    out = []
    out.append(_v(
        j.filter(F.col("df").isNull()), "term_missing_from_stats",
        F.format_string("postings df=%s has no term_stats row", "df_meta"),
        rb=None, block_id=None,
    ))
    out.append(_v(
        j.filter(F.col("df_meta").isNull()), "term_missing_postings",
        F.format_string("term_stats df=%s has no postings", "df"),
        rb=None, block_id=None,
    ))
    both = j.filter(F.col("df").isNotNull() & F.col("df_meta").isNotNull())
    out.append(_v(
        both.filter(F.col("df") != F.col("df_meta")),
        "term_df_mismatch",
        F.format_string("stats df=%s, blocks sum=%s", "df", "df_meta"),
        rb=None, block_id=None,
    ))
    # cf is only metadata-checkable where every block carries block_cf
    # (layout >= v7); mixed/older segments fall through to the deep tier.
    out.append(_v(
        both.filter(
            (F.col("cf_nulls") == 0) & (F.col("cf") != F.col("cf_meta"))
        ),
        "term_cf_mismatch",
        F.format_string("stats cf=%s, block_cf sum=%s", "cf", "cf_meta"),
        rb=None, block_id=None,
    ))
    out.append(_v(
        ts.filter(F.col("pbucket") != term_bucket_col("term", n_pbuckets)),
        "term_stats_pbucket_misplaced",
        F.format_string(
            "stored pbucket=%s != crc32(term) %% %s",
            "pbucket", F.lit(n_pbuckets),
        ),
        rb=None, block_id=None,
    ))
    return out


def _doc_table_checks(spark: SparkSession, paths: IndexPaths) -> list[DataFrame]:
    stats = read_corpus_stats(paths)
    n_docs, avgdl = int(stats["n_docs"]), float(stats["avgdl"])
    docs = read_table(spark, paths.docs).select("doc_id")
    doclens = read_table(spark, paths.doclens).select("doc_id", "doclen")

    out = []
    dup_docs = docs.groupBy("doc_id").count().filter(F.col("count") > 1)
    out.append(_v(
        dup_docs, "docs_duplicate_doc_id",
        F.format_string("doc_id=%s appears %s times", "doc_id", "count"),
        term=None, rb=None, block_id=None,
    ))
    dup_dl = doclens.groupBy("doc_id").count().filter(F.col("count") > 1)
    out.append(_v(
        dup_dl, "doclens_duplicate_doc_id",
        F.format_string("doc_id=%s appears %s times", "doc_id", "count"),
        term=None, rb=None, block_id=None,
    ))
    # doc-id set equality, both directions, one full outer join
    setj = docs.withColumn("in_docs", F.lit(1)).join(
        doclens.select("doc_id").withColumn("in_dl", F.lit(1)),
        "doc_id", "full_outer",
    )
    out.append(_v(
        setj.filter(F.col("in_docs").isNull() | F.col("in_dl").isNull()),
        "docid_set_mismatch",
        F.format_string(
            "doc_id=%s in_docs=%s in_doclens=%s", "doc_id", "in_docs", "in_dl"
        ),
        term=None, rb=None, block_id=None,
    ))
    # scalar recomputation (one tiny agg collect — bounded by definition)
    row = doclens.agg(
        F.count("*").alias("cnt"), F.avg("doclen").alias("avg"),
        F.sum((F.col("doclen") < 1).cast("long")).alias("nonpos"),
    ).collect()[0]
    docs_cnt = docs.count()
    scalar = []
    if docs_cnt != n_docs:
        scalar.append(("corpus_stats_ndocs_mismatch",
                       f"corpus_stats n_docs={n_docs}, docs rows={docs_cnt}"))
    if row["cnt"] != n_docs:
        scalar.append(("doclens_count_mismatch",
                       f"corpus_stats n_docs={n_docs}, doclens rows={row['cnt']}"))
    if row["nonpos"]:
        scalar.append(("doclen_nonpositive",
                       f"{row['nonpos']} doclens < 1"))
    if row["cnt"] and abs(row["avg"] - avgdl) > _REL_TOL * max(avgdl, 1.0):
        scalar.append(("avgdl_mismatch",
                       f"corpus_stats avgdl={avgdl}, recomputed={row['avg']}"))
    if scalar:
        out.append(spark.createDataFrame(
            [(c, None, None, None, d) for c, d in scalar], VIOLATION_SCHEMA,
        ))
    return out


# ─────────────────────────── deep tier ───────────────────────────


def _decode_violations_factory(avgdl: float):
    """mapInArrow kernel: decode every block, re-derive its metadata, emit
    one violations row per failed assertion.  Block-local — no shuffle."""
    import pyarrow as pa

    from horus_ner_spark.index.codec import (
        decode_block,
        decode_positions,
        pos_slice_offsets,
        vb_decode,
    )

    def _tfnorm(tfs: np.ndarray, doclens: np.ndarray) -> np.ndarray:
        return tfs * (bm25.K1 + 1.0) / (
            tfs + bm25.K1
            * (1.0 - bm25.B + bm25.B * doclens.astype(np.float64) / avgdl)
        )

    out_schema = pa.schema([
        ("check", pa.string()), ("term", pa.string()), ("rb", pa.int32()),
        ("block_id", pa.int32()), ("detail", pa.string()),
    ])

    def kernel(batches):
        for batch in batches:
            t = batch.to_pydict()
            rows: list[tuple] = []

            def flag(i: int, check: str, detail: str) -> None:
                rows.append((check, t["term"][i], t["rb"][i],
                             t["block_id"][i], detail))

            for i in range(batch.num_rows):
                n_meta = t["n_postings"][i]
                try:
                    doc_ids, tfs = decode_block(
                        t["doc_ids_vb"][i], t["tfs_vb"][i])
                    doclens = vb_decode(t["doclens_vb"][i]).view(np.int64)
                except Exception as e:  # corrupt varbyte framing
                    flag(i, "block_decode_error", repr(e))
                    continue
                if len(doc_ids) != n_meta or len(tfs) != n_meta:
                    flag(i, "block_count_mismatch",
                         f"meta n={n_meta}, decoded docs={len(doc_ids)} "
                         f"tfs={len(tfs)}")
                    continue
                if len(doclens) != n_meta:
                    flag(i, "doclen_stream_count",
                         f"meta n={n_meta}, decoded doclens={len(doclens)}")
                    continue
                if n_meta == 0:
                    continue
                # compare, don't subtract: doc_ids span the full int64
                # range (xxhash64), so np.diff overflows on wide gaps
                if len(doc_ids) > 1 and not (doc_ids[1:] > doc_ids[:-1]).all():
                    flag(i, "docids_not_increasing", "decoded doc_ids "
                         "are not strictly increasing")
                if int(doc_ids[0]) != t["min_doc_id"][i]:
                    flag(i, "min_doc_id_mismatch",
                         f"meta={t['min_doc_id'][i]}, decoded={doc_ids[0]}")
                if int(doc_ids[-1]) != t["max_doc_id"][i]:
                    flag(i, "max_doc_id_mismatch",
                         f"meta={t['max_doc_id'][i]}, decoded={doc_ids[-1]}")
                if (tfs < 1).any():
                    flag(i, "tf_nonpositive", f"{int((tfs < 1).sum())} "
                         "postings with tf < 1")
                if (doclens < 1).any():
                    flag(i, "doclen_stream_nonpositive",
                         f"{int((doclens < 1).sum())} postings with doclen < 1")
                elif (tfs > doclens).any():
                    flag(i, "tf_gt_doclen", f"{int((tfs > doclens).sum())} "
                         "postings with tf > doclen")
                bcf = t["block_cf"][i]
                if bcf is not None and int(tfs.sum()) != bcf:
                    flag(i, "block_cf_mismatch",
                         f"meta={bcf}, sum(tf)={int(tfs.sum())}")
                tfn = _tfnorm(tfs, doclens)
                bmax = float(tfn.max())
                if abs(bmax - t["block_max_tfnorm"][i]) > _REL_TOL * max(bmax, 1.0):
                    flag(i, "block_max_tfnorm_mismatch",
                         f"meta={t['block_max_tfnorm'][i]}, recomputed={bmax}")
                # v6 sub-range impact metadata
                smins = np.asarray(t["sub_min_doc_ids"][i], dtype=np.int64)
                smaxs = np.asarray(t["sub_max_tfnorms"][i], dtype=np.float64)
                if len(smins) != len(smaxs) or len(smins) < 1:
                    flag(i, "subrange_shape",
                         f"{len(smins)} mins vs {len(smaxs)} maxs")
                elif (int(smins[0]) != int(doc_ids[0])
                      or (len(smins) > 1
                          and not (smins[1:] > smins[:-1]).all())
                      or int(smins[-1]) > int(doc_ids[-1])):
                    flag(i, "subrange_bounds", "sub_min_doc_ids not an "
                         "increasing tiling starting at the block min")
                else:
                    starts = np.searchsorted(doc_ids, smins)
                    if (doc_ids[starts] != smins).any():
                        flag(i, "subrange_min_not_posting",
                             "a sub_min_doc_id is not a posting doc_id")
                    else:
                        rmax = np.maximum.reduceat(tfn, starts)
                        if not np.allclose(rmax, smaxs, rtol=_REL_TOL, atol=0):
                            flag(i, "subrange_max_mismatch",
                                 "recomputed per-range tfnorm maxima differ")
                pos = t["pos_vb"][i]
                if pos is not None:
                    try:
                        vals, _starts = decode_positions(pos, tfs)
                    except Exception as e:
                        flag(i, "pos_decode_error", repr(e))
                        continue
                    if len(vals) != int(tfs.sum()):
                        flag(i, "pos_count_mismatch",
                             f"sum(tf)={int(tfs.sum())}, positions={len(vals)}")
                        continue
                    offs = pos_slice_offsets(pos, tfs)
                    if int(offs[-1]) != len(pos):
                        flag(i, "pos_stream_trailing_bytes",
                             f"{len(pos) - int(offs[-1])} bytes past the "
                             "last posting's slice")
                    # max position per posting must fit inside the doc
                    ends = np.cumsum(tfs) - 1
                    if (vals[ends] >= doclens).any():
                        flag(i, "pos_overflow",
                             f"{int((vals[ends] >= doclens).sum())} postings "
                             "with max position >= doclen")
            yield pa.RecordBatch.from_arrays(
                [pa.array([r[j] for r in rows],
                          type=out_schema.field(j).type)
                 for j in range(5)],
                schema=out_schema,
            )

    return kernel


def _tf_table_checks(spark: SparkSession, paths: IndexPaths) -> list[DataFrame]:
    tf = read_table(spark, paths.tf).select("doc_id", "term", "tf")
    agg = tf.groupBy("term").agg(
        F.count("*").alias("rows"),
        F.countDistinct("doc_id").alias("df_tf"),
        F.sum("tf").alias("cf_tf"),
    )
    ts = read_table(spark, paths.term_stats).select("term", "df", "cf")
    j = agg.join(ts, "term", "full_outer")
    out = []
    out.append(_v(
        j.filter(F.col("rows").isNotNull()
                 & (F.col("rows") != F.col("df_tf"))),
        "tf_duplicate_doc_term",
        F.format_string("%s rows vs %s distinct docs", "rows", "df_tf"),
        rb=None, block_id=None,
    ))
    out.append(_v(
        j.filter(F.col("df").isNull() | F.col("df_tf").isNull()
                 | (F.col("df") != F.col("df_tf"))),
        "tf_df_mismatch",
        F.format_string("tf df=%s, stats df=%s", "df_tf", "df"),
        rb=None, block_id=None,
    ))
    out.append(_v(
        j.filter(F.col("cf").isNotNull() & F.col("cf_tf").isNotNull()
                 & (F.col("cf") != F.col("cf_tf"))),
        "tf_cf_mismatch",
        F.format_string("tf cf=%s, stats cf=%s", "cf_tf", "cf"),
        rb=None, block_id=None,
    ))
    return out


# ─────────────────────────── entry point ───────────────────────────


def fsck(
    spark: SparkSession,
    paths: IndexPaths | str,
    *,
    n_pbuckets: int = N_PBUCKETS,
    deep: bool = False,
    sample: int = 20,
) -> dict:
    """Audit one index.  Returns ``{"ok": bool, "violations_total": int,
    "by_check": {check: count}, "sample": [violation dicts]}``.

    ``deep=False`` reads block metadata + the doc tables only;
    ``deep=True`` adds the full postings decode pass and the tf-table
    re-aggregation.  The result is always bounded: counts come from one
    distributed aggregation, the sample from one ``limit(sample)``."""
    if isinstance(paths, str):
        paths = IndexPaths(paths)
    meta_cols = ["term", "rb", "block_id", "min_doc_id", "max_doc_id",
                 "n_postings", "block_cf", "pbucket"]
    meta = read_table(spark, paths.postings).select(*meta_cols)
    term_stats = read_table(spark, paths.term_stats)

    parts = []
    parts += _block_metadata_checks(meta, n_pbuckets)
    parts += _term_stats_checks(meta, term_stats, n_pbuckets)
    parts += _doc_table_checks(spark, paths)
    # derived artifacts: a fuzzy sidecar built against an older dictionary
    # silently mis-expands ~ queries — flag it like any other violation
    # (no sidecar at all is fine: fuzzy is opt-in)
    from horus_ner_spark.index.fuzzy import fuzzy_is_stale

    if fuzzy_is_stale(paths):
        parts.append(spark.createDataFrame(
            [("fuzzy_sidecar_stale", None, None, None,
              "fuzzy.parquet predates the current term_stats — re-run "
              "build_fuzzy_sidecar")],
            VIOLATION_SCHEMA,
        ))
    if deep:
        stats = read_corpus_stats(paths)
        from horus_ner_spark.session import ensure_package_on_executors

        ensure_package_on_executors(spark)
        kernel = _decode_violations_factory(float(stats["avgdl"]))
        parts.append(
            read_table(spark, paths.postings).mapInArrow(
                kernel, VIOLATION_SCHEMA)
        )
        # the uncompressed tf table is an optional oracle artifact
        # (build.py writes it; merge carries it only under merge_tf) —
        # a compacted/purged index legitimately has none to audit
        from horus_ner_spark import catalog as _catalog

        if _catalog.fs_exists(paths.tf):
            parts += _tf_table_checks(spark, paths)

    v = parts[0]
    for p in parts[1:]:
        v = v.unionByName(p)
    v = v.persist()
    try:
        by_check = {
            r["check"]: r["count"]
            for r in v.groupBy("check").count().collect()
        }
        sample_rows = [r.asDict() for r in v.limit(sample).collect()]
    finally:
        v.unpersist()
    total = int(sum(by_check.values()))
    return {
        "ok": total == 0,
        "deep": deep,
        "violations_total": total,
        "by_check": by_check,
        "sample": sample_rows,
    }


def _main(argv: list[str]) -> int:
    """``python -m horus_ner_spark.index.fsck <index_dir> [--deep]`` —
    print the audit report as one JSON line; exit 0 iff clean (the
    operator/cron contract)."""
    import json

    from horus_ner_spark.session import get_spark

    deep = "--deep" in argv
    rest = [a for a in argv if a != "--deep"]
    if len(rest) != 1:
        raise SystemExit(
            "usage: python -m horus_ner_spark.index.fsck <index_dir> "
            "[--deep]"
        )
    spark = get_spark("fsck")
    rep = fsck(spark, rest[0], deep=deep)
    print(json.dumps(rep, default=str))
    return 0 if rep["ok"] else 1


if __name__ == "__main__":
    import sys

    sys.exit(_main(sys.argv[1:]))
