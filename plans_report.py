#!/usr/bin/env python
"""Dump the physical plans of the engine's hot paths to PLANS.md with the
properties that matter at scale called out (partition pruning, filter
pushdown, broadcast joins, whole-stage codegen spans).

Run after a build exists (uses the sf0.001 verify index or builds one).
"""

from __future__ import annotations

import contextlib
import io
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    from pyspark.sql import functions as F

    from horus_ner_spark.corpus import query_set, write_corpus
    from horus_ner_spark.functions.bucketing import term_bucket
    from horus_ner_spark.index.build import N_PBUCKETS, build_index
    from horus_ner_spark.index.query import bm25_bruteforce, bm25_wand
    from horus_ner_spark.session import get_spark

    spark = get_spark("plans", cores=8, shuffle_partitions=8)
    work = "/tmp/horus_plans_ws"
    if not os.path.exists(f"{work}/corpus.parquet/_SUCCESS"):
        shutil.rmtree(work, ignore_errors=True)
        cp = write_corpus(spark, work, sf=0.001)
    else:
        cp = f"{work}/corpus.parquet"
    # always go through build_index: its manifest fingerprint resumes a
    # current-layout index in <1 s and REBUILDS after a layout change —
    # a raw _SUCCESS check once left v5-era plans in PLANS.md
    paths = build_index(spark, cp, f"{work}/ix")

    sections = []

    qs = query_set()[:3]
    sections.append(
        (
            "Postings fetch (WAND input): directory pruning on pbucket + "
            "row-group pruning on term",
            explain_str(
                spark.read.parquet(paths.postings)
                .filter(F.col("pbucket").isin([term_bucket("stream", N_PBUCKETS)]))
                .filter(F.col("term").isin(["stream"]))
            ),
            [
                "PartitionFilters: pbucket IN (...) -> only matching bucket "
                "directories are listed/read",
                "PushedFilters: In(term, ...) -> parquet row-group stats skip "
                "(files are term-sorted within each bucket)",
            ],
        )
    )
    sections.append(
        (
            "Prefix wildcard expansion (term-dictionary range scan)",
            explain_str(
                spark.read.parquet(paths.term_stats)
                .filter(F.col("term").startswith("st"))
                .groupBy("term").agg(F.sum("df").alias("df"))
                .orderBy(F.desc("df"), F.asc("term"))
                .limit(33)
            ),
            [
                "PushedFilters: StringStartsWith(term, st) reaches the "
                "parquet scan; term_stats files are term-sorted within each "
                "pbucket partition (build stage D), so row-group statistics "
                "prune the read to the matching dictionary slice",
                "the scan reads the DICTIONARY (one row per term), never "
                "postings; the collect is bounded by the expansion cap "
                "(TakeOrderedAndProject of max_expansions+1 rows)",
            ],
        )
    )
    from horus_ner_spark.index.query import facet_counts

    sections.append(
        (
            "Facet counts over the full match set (bulk twin)",
            explain_str(facet_counts(
                spark, paths,
                [{"query_id": 1, "query_text": "cache node", "mode": "OR"}],
            )),
            [
                "tf scan pruned to query terms by a BroadcastHashJoin "
                "before any aggregation",
                "per-(query, doc) matched-term count is map-side "
                "combinable (partial_count in the first HashAggregate)",
                "docs join shuffles on doc_id (both sides big — no "
                "broadcast); the stack melt + facet count aggregate one "
                "row per matched doc, never per posting",
            ],
        )
    )
    sections.append(
        (
            "Brute-force BM25 (DataFrame path)",
            explain_str(bm25_bruteforce(spark, paths, qs)),
            [
                "query terms broadcast (BroadcastHashJoin) - corpus-side tf is "
                "pruned by the join before any aggregation",
                "single shuffle for groupBy(query_id, doc_id); window top-k after",
                "BM25 arithmetic inside WholeStageCodegen (no Python in hot path)",
            ],
        )
    )
    sections.append(
        (
            "WAND result plan (distributed kernel path)",
            explain_str(bm25_wand(spark, paths, qs)),
            [
                "scan is partition-pruned before the ArrowEvalPython/"
                "FlatMapGroupsInPandas kernel — Python sees only query-term blocks",
                "ReadSchema EXCLUDES pos_vb for non-phrase queries: the "
                "position stream (largest per-posting payload) never leaves "
                "the parquet footprint unless the batch has a PHRASE query",
            ],
        )
    )

    from horus_ner_spark.index.query import bm25_distributed

    sections.append(
        (
            "Partition-parallel single-query scoring (bm25_distributed)",
            explain_str(bm25_distributed(spark, paths, qs[:1], n_tasks=8)),
            [
                "RoundRobinPartitioning(8) BEFORE MapInPandas: one query's "
                "blocks fan out across 8 kernel tasks (round-1 ran 1 task/query)",
                "kernel emits per-partition PARTIAL per-doc sums; the "
                "HashAggregate above it shuffles one row per distinct doc per "
                "task, never per posting",
                "final quantize + window top-k JVM-side",
            ],
        )
    )

    from horus_ner_spark.ops.catalog_text import banded_lsh_pairs_df, _shingles_df

    sections.append(
        (
            "Banded MinHash-LSH candidate pairs (128 perms, 32 bands)",
            explain_str(
                banded_lsh_pairs_df(_shingles_df(spark, "/root/testdata/sf0.001"))
            ),
            [
                "ONE shuffle builds all 128 signature mins: partial_min in the "
                "map-side HashAggregate (hot shingles contribute one partial "
                "per task)",
                "candidate join keys on (band_id, band_sig) — a bucket join, "
                "never an all-pairs product; at scale band_sig is the "
                "partition key",
            ],
        )
    )

    sections.append(
        (
            "Distributed PHRASE (range-bucket conjunctive fan-out, round 3)",
            explain_str(
                bm25_distributed(
                    spark, paths,
                    [{"query_id": 900, "query_text": "parse config",
                      "lang": "python", "k": 10, "mode": "PHRASE"}],
                )
            ),
            [
                "blocks explode to the doc-id range bucket(s) their "
                "[min_doc_id, max_doc_id] span (Generate/sequence) — hot-built "
                "blocks land in exactly one",
                "FlatMapGroupsInPandas keyed (query_id, grb): the phrase "
                "kernel runs once per range bucket, so a single mega-phrase "
                "query parallelizes to 2^RANGE_BITS tasks",
                "ranges partition the doc-id space -> per-range top-k merge "
                "is one tiny window, no rescoring",
            ],
        )
    )

    from horus_ner_spark.index.build import IndexPaths as _IP
    from horus_ner_spark.index.merge import merge_indexes

    # merge plan: capture the re-block stage's plan shape by building the
    # merged frame against the existing index twice (cheap at sf0.001)
    merged = merge_indexes(
        spark, [_IP(paths.root), _IP(paths.root)], f"{work}/merged_plan_ix"
    )
    sections.append(
        (
            "Compaction merge output (per-(term, rb) re-block, round 3)",
            explain_str(spark.read.parquet(merged.postings)),
            [
                "written via ONE shuffle keyed (term, rb): a Zipf-head term "
                "re-blocks in up to 2^RANGE_BITS parallel tasks, never one "
                "task per term (round-2 weak item 1)",
                "no tf union/dropDuplicates anywhere in the merge plan — "
                "merged term_stats derive from block footer sums (weak item 2)",
                "output keeps pbucket directory partitioning + term-sorted "
                "row groups: serving plans above stay pruned post-compaction",
            ],
        )
    )

    # layout v7: the merged term_stats derivation — must show a scan pruned
    # to (term, n_postings, block_cf) and a two-phase hash aggregate with
    # NO Python evaluator node (pre-v7 this stage mapInPandas-decoded every
    # block's tfs_vb)
    ts_plan = (
        spark.read.parquet(merged.postings)
        .select("term", "n_postings", "block_cf")
        .groupBy("term")
        .agg(
            F.sum("n_postings").cast("long").alias("df"),
            F.sum("block_cf").alias("cf"),
        )
    )
    sections.append(
        (
            "Merged term_stats derivation (layout v7 metadata sum)",
            explain_str(ts_plan),
            [
                "ReadSchema prunes the scan to term + two int metadata "
                "columns — the posting payload bytes (doc_ids_vb/tfs_vb/"
                "doclens_vb/pos_vb) never leave parquet",
                "partial_sum before the exchange (map-side combine) then a "
                "final HashAggregate — all inside WholeStageCodegen, no "
                "ArrowEvalPython/FlatMapGroupsInPandas node anywhere",
                "pre-v7 this stage varbyte-decoded every merged block's tfs "
                "in Python to derive cf; block_cf makes cf pure footer "
                "metadata, O(blocks) ints instead of O(postings) bytes",
            ],
        )
    )

    from horus_ner_spark.index.query import bm25_bool

    bool_plan = bm25_bool(
        spark, paths, "(cache OR buffer) AND stream AND NOT mutex",
        "python", k=10, filters={"path": "src/"},
    )
    sections.append(
        (
            "Boolean bulk query (bm25_bool: set algebra + filter semi-join)",
            explain_str(bool_plan),
            [
                "leaf doc-sets are term-pruned tf scans (In(term, ...) in "
                "PushedFilters); AND chains LeftSemi joins, NOT is a "
                "LeftAnti — the anti side is a term's doc set, bounded by "
                "the positivity rule, never a corpus complement",
                "the repo/path metadata filter is a docs-table predicate "
                "(StartsWith pushed to the scan) semi-joined into the "
                "match set — membership only, scores untouched",
                "scoring joins tf to the BROADCAST positive-term list "
                "(BroadcastHashJoin), one map-side-combinable "
                "HashAggregate, then TakeOrderedAndProject — per-partition "
                "k-heaps, no single-partition sort of the match set",
            ],
        )
    )

    with open("PLANS.md", "w") as f:
        f.write(
            "# PLANS — physical-plan evidence for the hot paths\n\n"
            "Generated by `python plans_report.py` (sf0.001 index, local[8]).\n"
        )
        for title, plan, notes in sections:
            f.write(f"\n## {title}\n\n")
            for n in notes:
                f.write(f"- {n}\n")
            f.write("\n```\n" + plan.strip()[:6000] + "\n```\n")
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
