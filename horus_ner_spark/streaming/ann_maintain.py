"""Incremental IVF-ANN maintenance for a streaming embedding feed.

The batch IVF entries (ops/catalog_text.py: ann_ivf_topk,
ann_ivf_kmeans_topk) learn centroids and assign every vector in one shot.
A streaming pipeline can't re-cluster the world per micro-batch — the
100-TB-shaped design, mirroring the tiered text-index
(streaming/incremental.py), is:

1. **Train once, freeze.**  ``build_ivf`` learns k-means centroids over
   the initial collection (seeded Lloyd — the same deterministic
   ``_kmeans_centroids`` kernel as the batch entry) and writes a
   cell-partitioned parquet dataset plus the frozen centroid table and a
   train-quality stamp (mean max-cosine of vectors to their home cell).
2. **Append cheap.**  ``append_ivf`` assigns each new batch to the FROZEN
   centroids (broadcast join over a tiny centroid side — no shuffle of
   the existing collection) and appends the rows into their cell
   partitions.  Cost per batch is O(batch x n_cells), independent of
   collection size.
3. **Rebuild gate on drift.**  Each appended batch's assignment quality
   (mean max-cosine) is compared against the frozen train stamp; when it
   falls below ``drift_ratio`` x train quality, the distribution has
   moved and frozen centroids would silently degrade recall — the append
   is REJECTED and the caller gets ``action="rebuild"``; ``rebuild_ivf``
   re-learns centroids over everything (old cells + pending batch) and
   re-partitions.  A drifting stream therefore pays the full re-cluster
   only when the data demands it, never per batch.
4. **Serve pruned.**  ``ivf_search`` probes each query's ``nprobe``
   nearest frozen cells; the cell is the parquet partition key, so a
   probe is a partition-pruned scan of the dataset, not a broadcast
   cross join (same discipline as ann_ivf_topk's docstring).

tests/test_ann_stream.py streams batches and asserts recall vs a full
rebuild >= 0.95, plus that the drift gate trips on a shifted batch.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from horus_ner_spark import catalog
from horus_ner_spark.ops.catalog_text import _kmeans_centroids, _nearest_cell

_META = "meta.json"
_CENTROIDS = "centroids.parquet"
_CELLS = "cells.parquet"


def _with_norm(e: DataFrame) -> DataFrame:
    return e.withColumn(
        "norm",
        F.expr(
            "sqrt(aggregate(embedding, 0D, "
            "(a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
        ),
    )


def _seed_cents(e: DataFrame, n_cells: int) -> DataFrame:
    """Deterministic seed: the n_cells smallest vec_ids, renumbered to
    cells 0..n_cells-1 (rank-based, so train sets need not contain ids
    0..n-1 the way the batch entry's ``vec_id < n`` stub assumes)."""
    w = Window.orderBy(F.asc("vec_id"))
    return (
        e.withColumn("cell", F.row_number().over(w) - 1)
        .filter(F.col("cell") < n_cells)
        .select(
            "cell",
            F.col("embedding").alias("c_emb"),
            F.col("norm").alias("c_norm"),
        )
    )


def _assign(e: DataFrame, cents: DataFrame) -> DataFrame:
    """Home-cell assignment + per-vector quality (max cosine to any
    centroid)."""
    scored = e.crossJoin(F.broadcast(cents)).withColumn(
        "c_cos",
        F.expr(
            "aggregate(zip_with(embedding, c_emb, "
            "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
            "0D, (acc, v) -> acc + v)"
        )
        / (F.col("norm") * F.col("c_norm")),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("c_cos"), F.asc("cell"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "norm", "cell",
                F.col("c_cos").alias("home_cos"))
    )


def _quality(assigned: DataFrame) -> float:
    row = assigned.agg(F.avg("home_cos").alias("q")).collect()[0]
    return float(row["q"]) if row["q"] is not None else 0.0


def _write(spark: SparkSession, out_dir: str, assigned: DataFrame,
           cents: DataFrame, meta: dict, mode: str) -> None:
    cents.write.mode("overwrite").parquet(os.path.join(out_dir, _CENTROIDS))
    (
        assigned.select("vec_id", "embedding", "norm", "cell")
        .repartition("cell")
        .write.mode(mode)
        .partitionBy("cell")
        .parquet(os.path.join(out_dir, _CELLS))
    )
    catalog.fs_write_json_atomic(os.path.join(out_dir, _META), meta)


def read_meta(out_dir: str) -> dict:
    return catalog.fs_read_json(os.path.join(out_dir, _META))


_HOLDOUT_MOD = 5  # vec_id % 5 == 0 -> held-out quality fold


def build_ivf(spark: SparkSession, e: DataFrame, out_dir: str,
              n_cells: int = 8, iters: int = 2) -> dict:
    """Learn centroids over ``e`` (vec_id, embedding), write the frozen
    IVF layout, return the meta dict (incl. the quality stamp).

    The stamp that the drift gate compares future batches against is
    computed on a deterministic HELD-OUT fold (``vec_id % 5 == 0``,
    excluded from centroid training): k-means quality measured on its own
    training vectors is optimistically biased, and on weakly-clustered
    data the generalization gap alone would trip the gate on every
    same-distribution batch.  Holding out a fold makes the stamp an
    unbiased estimate of exactly the quantity ``append_ivf`` measures.
    All vectors (both folds) are still assigned and written."""
    e = _with_norm(e.select("vec_id", "embedding")).cache()
    train = e.filter(F.col("vec_id") % _HOLDOUT_MOD != 0)
    cents = _kmeans_centroids(
        train, cents=_seed_cents(train, n_cells), iters=iters
    )
    assigned = _assign(e, cents).cache()
    holdout_q = _quality(
        assigned.filter(F.col("vec_id") % _HOLDOUT_MOD == 0)
    )
    n = assigned.count()
    meta = {
        "n_cells": n_cells,
        "iters": iters,
        "train_quality": round(holdout_q, 6),
        "n_train": n,
        "n_total": n,
        "appends": 0,
        "rebuilds": 0,
    }
    _write(spark, out_dir, assigned, cents, meta, mode="overwrite")
    assigned.unpersist()
    e.unpersist()
    return meta


def append_ivf(spark: SparkSession, batch: DataFrame, out_dir: str,
               drift_ratio: float = 0.9) -> dict:
    """Assign one new batch to the FROZEN centroids and append it into its
    cell partitions — unless the batch's mean assignment quality falls
    below ``drift_ratio`` x the frozen train stamp, in which case nothing
    is written and ``{"action": "rebuild", ...}`` is returned for the
    caller to route through :func:`rebuild_ivf`."""
    meta = read_meta(out_dir)
    cents = spark.read.parquet(os.path.join(out_dir, _CENTROIDS))
    b = _with_norm(batch.select("vec_id", "embedding"))
    assigned = _assign(b, cents).cache()
    q = _quality(assigned)
    n = assigned.count()
    gate = drift_ratio * meta["train_quality"]
    if q < gate:
        assigned.unpersist()
        return {
            "action": "rebuild",
            "batch_quality": round(q, 6),
            "gate": round(gate, 6),
            "n_batch": n,
        }
    (
        assigned.select("vec_id", "embedding", "norm", "cell")
        .repartition("cell")
        .write.mode("append")
        .partitionBy("cell")
        .parquet(os.path.join(out_dir, _CELLS))
    )
    meta["n_total"] += n
    meta["appends"] += 1
    catalog.fs_write_json_atomic(os.path.join(out_dir, _META), meta)
    assigned.unpersist()
    return {
        "action": "append",
        "batch_quality": round(q, 6),
        "gate": round(gate, 6),
        "n_batch": n,
    }


def rebuild_ivf(spark: SparkSession, out_dir: str,
                pending: DataFrame | None = None,
                n_cells: int | None = None, iters: int | None = None) -> dict:
    """Full re-cluster over everything stored (plus an optional pending
    batch that failed the drift gate): re-learn centroids, re-assign,
    rewrite.  The expensive path — only the drift gate should route here."""
    meta = read_meta(out_dir)
    e = spark.read.parquet(os.path.join(out_dir, _CELLS)).select(
        "vec_id", "embedding"
    )
    if pending is not None:
        e = e.unionByName(pending.select("vec_id", "embedding"))
    e = _with_norm(e).cache()
    nc = n_cells or meta["n_cells"]
    it = iters or meta["iters"]
    train = e.filter(F.col("vec_id") % _HOLDOUT_MOD != 0)
    cents = _kmeans_centroids(train, cents=_seed_cents(train, nc), iters=it)
    assigned = _assign(e, cents).cache()
    n = assigned.count()
    new_meta = {
        "n_cells": nc,
        "iters": it,
        # held-out stamp, same rationale as build_ivf
        "train_quality": round(
            _quality(assigned.filter(F.col("vec_id") % _HOLDOUT_MOD == 0)), 6
        ),
        "n_train": n,
        "n_total": n,
        "appends": 0,
        "rebuilds": meta["rebuilds"] + 1,
    }
    # write cells to a fresh directory then swap: a failed rebuild must
    # never leave the dataset half old / half new
    tmp = os.path.join(out_dir, _CELLS + ".rebuild")
    (
        assigned.select("vec_id", "embedding", "norm", "cell")
        .repartition("cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(tmp)
    )
    cents.write.mode("overwrite").parquet(os.path.join(out_dir, _CENTROIDS))
    import shutil

    final = os.path.join(out_dir, _CELLS)
    shutil.rmtree(final, ignore_errors=True)
    os.rename(tmp, final)
    catalog.fs_write_json_atomic(os.path.join(out_dir, _META), new_meta)
    e.unpersist()
    assigned.unpersist()
    return new_meta


def ivf_search(spark: SparkSession, out_dir: str, queries: DataFrame,
               k: int = 10, nprobe: int = 2) -> DataFrame:
    """Top-k cosine neighbors for each query (query_id, embedding) over
    the maintained index.  Queries probe their ``nprobe`` nearest frozen
    cells; the scan of ``cells.parquet`` filters on the probed cell set,
    which prunes parquet partitions (cell is the partition column)."""
    cents = spark.read.parquet(os.path.join(out_dir, _CENTROIDS))
    q = _with_norm(queries.select(
        F.col("query_id").alias("vec_id"), "embedding"
    ))
    scored = q.crossJoin(F.broadcast(cents)).withColumn(
        "c_cos",
        F.expr(
            "aggregate(zip_with(embedding, c_emb, "
            "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
            "0D, (acc, v) -> acc + v)"
        )
        / (F.col("norm") * F.col("c_norm")),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("c_cos"), F.asc("cell"))
    probes = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= nprobe)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("norm").alias("q_norm"),
            F.col("cell").alias("probe_cell"),
        )
    )
    probe_cells = [
        r["probe_cell"]
        for r in probes.select("probe_cell").distinct().collect()
    ]  # bounded: <= n_queries x nprobe, and n_cells total
    data = spark.read.parquet(os.path.join(out_dir, _CELLS)).filter(
        F.col("cell").isin(probe_cells)
    )
    hits = (
        data.join(F.broadcast(probes), F.col("cell") == F.col("probe_cell"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                F.expr(
                    "aggregate(zip_with(embedding, q_emb, "
                    "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
                    "0D, (acc, v) -> acc + v)"
                )
                / (F.col("norm") * F.col("q_norm")),
                4,
            ),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        hits.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )
