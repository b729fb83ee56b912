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
- **Hot-term skew** (Zipfian ``config``/``get``/...): the per-term posting
  assembly groups by ``(term, range_bucket)`` where
  ``range_bucket = doc_id >> (64 - RANGE_BITS)`` — a deterministic,
  order-preserving split of each hot term across 2^RANGE_BITS groups.  This
  is the salting step of the north rule, but keyed on doc_id ranges instead
  of random salt so each group encodes sorted, self-contained blocks with no
  second merge pass.  (Blocks store their first doc_id absolute — see
  codec.py — which is what makes group-local encoding exact.)
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

from horus_ner_spark.functions.bucketing import term_bucket_col
from horus_ner_spark.index import bm25
from horus_ner_spark.index.manifest import Manifest, corpus_fingerprint

BLOCK_SIZE = 128     # postings per compressed block
RANGE_BITS = 6       # hot-term split: 2^6 = 64 doc_id-range groups per term
N_PBUCKETS = 32      # term-hash partitions of the postings table

# Blocks are self-contained for scoring: doc_ids (delta-gap), tfs, and
# doclens all ride in the block, so the WAND kernel needs no per-doc side
# table — at 10^12 docs a broadcast doclen array would not fit an executor.
POSTINGS_SCHEMA = (
    "term string, block_id int, min_doc_id long, max_doc_id long, "
    "n_postings int, block_max_tfnorm double, doc_ids_vb binary, tfs_vb binary, "
    "doclens_vb binary"
)

TF_SCHEMA = "doc_id long, term string, tf long, doclen long"


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


def with_doc_id(corpus: DataFrame) -> DataFrame:
    """doc_id = xxhash64(repo, path, commit) — per FIXTURES.md §1.

    A corpus that already carries a ``doc_id`` column (e.g. an external
    document table mapped onto the corpus schema) keeps its ids."""
    if "doc_id" in corpus.columns:
        return corpus
    return corpus.withColumn("doc_id", F.xxhash64("repo", "path", "commit"))


def _encode_groups_factory(avgdl: float, block_size: int):
    """Build the per-(term, range_bucket) posting-block encoder kernel.

    Runs as applyInPandas: input pdf has (term, rb, doc_id, tf, doclen);
    output is one row per compressed block.  All math vectorized numpy.
    Blocks carry ``block_max_tfnorm`` — the idf-free BM25 upper-bound
    factor — so no per-term df join is needed here; the query side
    multiplies by idf (constant per term) when forming WAND bounds.
    """
    from horus_ner_spark.index.codec import encode_block, vb_encode

    def encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", kind="mergesort")
        doc_ids = pdf["doc_id"].to_numpy(np.int64)
        tfs = pdf["tf"].to_numpy(np.int64)
        doclens = pdf["doclen"].to_numpy(np.int64)
        term = pdf["term"].iloc[0]
        tfnorms = tfs * (bm25.K1 + 1.0) / (
            tfs + bm25.K1 * (1.0 - bm25.B + bm25.B * doclens.astype(np.float64) / avgdl)
        )
        rows = []
        for start in range(0, len(doc_ids), block_size):
            d = doc_ids[start : start + block_size]
            t = tfs[start : start + block_size]
            dl = doclens[start : start + block_size]
            dvb, tvb = encode_block(d, t)
            rows.append(
                {
                    "term": term,
                    "block_id": start // block_size,
                    "min_doc_id": int(d[0]),
                    "max_doc_id": int(d[-1]),
                    "n_postings": len(d),
                    "block_max_tfnorm": float(tfnorms[start : start + block_size].max()),
                    "doc_ids_vb": dvb,
                    "tfs_vb": tvb,
                    "doclens_vb": vb_encode(dl.astype(np.uint64)),
                }
            )
        return pd.DataFrame(rows)

    return encode_group


def _tokenize_tf_batches(batches):
    """mapInPandas kernel: (doc_id, lang, content) -> (doc_id, term, tf,
    doclen) — tokenization, per-doc tf, and doclen in ONE pass with no
    shuffle (tf is a per-document-local aggregate)."""
    from collections import Counter

    from horus_ner_spark.functions.tokenizer import tokenize

    for pdf in batches:
        doc_ids, terms, tfs, doclens = [], [], [], []
        for doc_id, lang, content in zip(pdf["doc_id"], pdf["lang"], pdf["content"]):
            toks = tokenize(content, lang)
            dl = len(toks)
            for term, tf in Counter(toks).items():
                doc_ids.append(doc_id)
                terms.append(term)
                tfs.append(tf)
                doclens.append(dl)
        yield pd.DataFrame(
            {"doc_id": doc_ids, "term": terms, "tf": tfs, "doclen": doclens}
        )


def build_index(
    spark: SparkSession,
    corpus_path: str,
    index_dir: str,
    block_size: int = BLOCK_SIZE,
    range_bits: int = RANGE_BITS,
    n_pbuckets: int = N_PBUCKETS,
    fail_after_stage: str | None = None,
) -> IndexPaths:
    """Build (or resume) the full index at ``index_dir``.

    ``fail_after_stage`` injects a crash between stages for the resume test
    (SURVEY.md §5 item 4).
    """
    from horus_ner_spark.session import ensure_package_on_executors

    ensure_package_on_executors(spark)  # pandas-UDF closures unpickle on workers
    paths = IndexPaths(index_dir)
    os.makedirs(index_dir, exist_ok=True)
    conf = {
        "block_size": block_size,
        "range_bits": range_bits,
        "n_pbuckets": n_pbuckets,
        "tokenizer": "code-aware-v1",
        "layout": "v2",  # tf carries doclen; blocks store idf-free tfnorm max
        "bm25": {"k1": bm25.K1, "b": bm25.B},
    }
    fp = corpus_fingerprint(corpus_path, conf)
    man = Manifest(index_dir)
    corpus = spark.read.parquet(corpus_path)

    def _maybe_fail(stage: str) -> None:
        if fail_after_stage == stage:
            raise RuntimeError(f"injected failure after stage {stage}")

    # ── Stage A: docs (doc_id, metadata, per-row sha256 invariant) ──────────
    if not man.stage_complete("docs", fp, paths.docs):
        docs = with_doc_id(corpus).select(
            "doc_id",
            "repo",
            "path",
            "commit",
            "lang",
            F.sha2("content", 256).alias("content_sha256"),
        )
        docs.write.mode("overwrite").parquet(paths.docs)
        n = spark.read.parquet(paths.docs).count()
        man.commit_stage("docs", fp, [{"partition_id": 0, "docs_tokenized": n}],
                         {"n_docs": n})
    _maybe_fail("docs")

    # ── Stage B: tf (the single tokenization pass; shuffle-free) ────────────
    if not man.stage_complete("tf", fp, paths.tf):
        tf = (
            with_doc_id(corpus)
            .select("doc_id", "lang", "content")
            .mapInPandas(_tokenize_tf_batches, schema=TF_SCHEMA)
        )
        tf.write.mode("overwrite").parquet(paths.tf)
        tf_out = spark.read.parquet(paths.tf)
        per_part = (
            tf_out.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(
                F.countDistinct("doc_id").alias("docs_tokenized"),
                F.count(F.lit(1)).alias("postings_emitted"),
            )
            .collect()
        )
        man.commit_stage(
            "tf", fp, [r.asDict() for r in per_part],
            {"postings_raw": sum(r["postings_emitted"] for r in per_part)},
        )
    _maybe_fail("tf")

    # ── Stage C: doclens + corpus stats ─────────────────────────────────────
    if not (
        man.stage_complete("stats", fp, paths.doclens)
        and os.path.exists(os.path.join(paths.corpus_stats, "_SUCCESS"))
    ):
        tf = spark.read.parquet(paths.tf)
        doclens = tf.groupBy("doc_id").agg(F.max("doclen").alias("doclen"))
        doclens.write.mode("overwrite").parquet(paths.doclens)
        n_docs = spark.read.parquet(paths.docs).count()  # includes empty docs
        total_len = spark.read.parquet(paths.doclens).agg(
            F.sum("doclen").alias("t")
        ).collect()[0]["t"] or 0
        avgdl = float(total_len) / n_docs if n_docs else 0.0
        spark.createDataFrame(
            [(n_docs, avgdl)], "n_docs long, avgdl double"
        ).coalesce(1).write.mode("overwrite").parquet(paths.corpus_stats)
        man.commit_stage("stats", fp, [{"partition_id": 0, "docs_tokenized": n_docs}],
                         {"n_docs": n_docs, "avgdl": avgdl})
    _maybe_fail("stats")

    # ── Stage D: term dictionary (df, cf) — map-side combine handles skew ───
    # Written bucketed by pbucket and term-sorted within files so both the
    # serving path and the distributed query path resolve query-term idf with
    # directory + row-group pruning (same layout as the postings table).
    if not man.stage_complete("term_stats", fp, paths.term_stats):
        tf = spark.read.parquet(paths.tf)
        (
            tf.groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf"))
            .withColumn("pbucket", term_bucket_col("term", n_pbuckets))
            .repartition(n_pbuckets, "pbucket")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .partitionBy("pbucket")
            .parquet(paths.term_stats)
        )
        n_terms = spark.read.parquet(paths.term_stats).count()
        man.commit_stage("term_stats", fp, [{"partition_id": 0}], {"n_terms": n_terms})
    _maybe_fail("term_stats")

    # ── Stage E: compressed posting blocks (single shuffle, no joins) ───────
    if not man.stage_complete("postings", fp, paths.postings):
        stats = spark.read.parquet(paths.corpus_stats).collect()[0]
        avgdl = float(stats["avgdl"])
        tf = spark.read.parquet(paths.tf).withColumn(
            "rb", F.shiftright("doc_id", 64 - range_bits)
        )
        encode = _encode_groups_factory(avgdl, block_size)
        blocks = tf.groupBy("term", "rb").applyInPandas(encode, POSTINGS_SCHEMA)
        (
            blocks.withColumn("pbucket", term_bucket_col("term", n_pbuckets))
            .repartition(n_pbuckets, "pbucket")
            .sortWithinPartitions("term", "min_doc_id")
            .write.mode("overwrite")
            .partitionBy("pbucket")
            .parquet(paths.postings)
        )
        out = spark.read.parquet(paths.postings)
        per_bucket = (
            out.groupBy(F.col("pbucket").alias("partition_id"))
            .agg(
                F.sum("n_postings").alias("postings_emitted"),
                F.sum(
                    F.length("doc_ids_vb") + F.length("tfs_vb")
                ).alias("bytes_compressed"),
            )
            .orderBy("partition_id")
            .collect()
        )
        man.commit_stage(
            "postings",
            fp,
            [r.asDict() for r in per_bucket],
            {
                "postings_emitted": sum(r["postings_emitted"] for r in per_bucket),
                "bytes_compressed": sum(r["bytes_compressed"] for r in per_bucket),
            },
        )
    _maybe_fail("postings")

    return paths


def verify_sha_invariant(spark: SparkSession, corpus_path: str, paths: IndexPaths) -> int:
    """Per-row invariant vs the source table (BASELINE.json input_hint):
    returns the number of docs whose stored content_sha256 mismatches a fresh
    sha2(content, 256) of the source row.  Must be 0."""
    fresh = with_doc_id(spark.read.parquet(corpus_path)).select(
        "doc_id", F.sha2("content", 256).alias("sha_fresh")
    )
    stored = spark.read.parquet(paths.docs).select("doc_id", "content_sha256")
    return (
        stored.join(fresh, "doc_id", "full_outer")
        .filter(
            F.col("content_sha256").isNull()
            | F.col("sha_fresh").isNull()
            | (F.col("content_sha256") != F.col("sha_fresh"))
        )
        .count()
    )
