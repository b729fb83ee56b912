"""Query-time BM25 top-k — two execution paths, one answer.

1. ``bm25_bruteforce``: pure DataFrame composition over the uncompressed
   tf/doclens/term_stats tables (SURVEY.md §7 M0).  Zero custom kernels;
   every step is Catalyst-optimizable; serves as the permanent in-engine
   correctness oracle for the fast path.
2. ``bm25_wand``: block-max WAND (Ding & Suel–style) over the compressed
   posting blocks with a bounded k-min-heap — the scale path.  Postings are
   fetched with partition pruning on ``pbucket`` (the Spark-native analog of
   the reference's B-tree term index, horus0.1.5.db.sql:128-139) and the
   kernel decodes blocks lazily: metadata-only skipping costs no decode.

Reference analog of the whole path: term -> cached top-k search results,
``SELECT ... WHERE upper(term)=upper(?) ... LIMIT 2`` + FK fetch of ranked
docs (reference: src/core/util/definitions_sql.py:5-26,
src/core/feature_extraction/util.py:935-1023); ranked ``result_seq`` is our
``rank`` column (reference: util.py:977-982).

Determinism contract shared with oracle.py / bm25.py: float64 everywhere,
query terms deduped + scored in sorted-term order, scores quantized (bround,
half-even, 6 dp) BEFORE ranking, ties broken by doc_id ascending.
"""

from __future__ import annotations

import heapq
import math
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from horus_ner_spark.functions.bucketing import term_bucket
from horus_ner_spark.functions.tokenizer import tokenize
from horus_ner_spark.index import bm25
from horus_ner_spark.index.build import IndexPaths, N_PBUCKETS, read_corpus_stats
from horus_ner_spark.index.codec import decode_block, decode_positions, vb_decode

RESULT_SCHEMA = "query_id int, rank int, doc_id long, score double"

# block columns the scoring kernels read (pos_vb added only for PHRASE).
# The sub_* impact-range columns (layout v5/v6) feed WAND's shallow bounds;
# reads drop them transparently for pre-v5 indexes (_cols_present).  Range
# maxima are NOT read even from v5 indexes: _TermIter derives them from
# sub_min + the block max (layout v6 stops storing them altogether).
_KERNEL_BLOCK_COLS = (
    "term", "min_doc_id", "max_doc_id", "n_postings", "block_max_tfnorm",
    "doc_ids_vb", "tfs_vb", "doclens_vb",
    "sub_min_doc_ids", "sub_max_tfnorms",
)

_SUB_COLS = ("sub_min_doc_ids", "sub_max_tfnorms")


def _cols_present(wanted, available) -> list[str]:
    """Column list restricted to what the table actually has — only the
    optional sub_* metadata may be absent (pre-v5 indexes)."""
    avail = set(available)
    return [c for c in wanted if c in avail or c not in _SUB_COLS]


# Decode accounting (diagnostics): postings actually decoded by _TermIter —
# the numerator of WAND's skip-efficiency ratio (BENCH.md wand_decode_ratio).
# Plain counters; benchmark reads run the kernel single-threaded.
DECODE_STATS = {"blocks": 0, "postings": 0}


def queries_to_df(spark: SparkSession, queries: list[dict]) -> DataFrame:
    return spark.createDataFrame(
        [(q["query_id"], q["query_text"], q.get("lang", "python"), q.get("k", 10))
         for q in queries],
        "query_id int, query_text string, lang string, k int",
    )


def _query_terms(queries: list[dict]) -> list[dict]:
    """Tokenize + dedupe query terms driver-side (queries are tiny by
    definition; the corpus never is).  A query may carry a pre-normalized
    ``terms`` list instead (the prefix-wildcard rewrite emits dictionary
    terms, which must NOT be re-tokenized — identifier splitting is not
    idempotent over arbitrary dictionary terms)."""
    rows = []
    for q in queries:
        if "terms" in q:
            terms = sorted(set(q["terms"]))
        else:
            terms = sorted(set(tokenize(q["query_text"], q.get("lang", "python"))))
        for term in terms:
            rows.append({"query_id": q["query_id"], "term": term})
    return rows


def expand_prefix_spark(
    spark: SparkSession,
    paths: IndexPaths,
    stem: str,
    lang: str = "python",
    max_expansions: int = 32,
) -> tuple[list[str], bool]:
    """Expand a trailing-``*`` prefix stem against the term dictionary via
    a Spark scan -> (terms, truncated) — the bulk-path twin of
    IndexServer.expand_prefix (same normalization, same highest-df /
    term-asc selection, same cap).

    The filter is ``startswith`` on the term column: Catalyst pushes it to
    the parquet scan as a StringStartsWith pushed filter, and the build
    writes term_stats term-sorted inside each pbucket partition
    (build.py stage D), so row-group statistics prune the read to the
    matching dictionary slice.  The collect is bounded by
    ``max_expansions`` rows."""
    toks = tokenize(stem, lang)
    if len(toks) != 1:
        raise ValueError(
            f"prefix stem {stem!r} normalizes to {len(toks)} index "
            f"sub-tokens {toks}; query a sub-token prefix instead"
        )
    s = toks[0]
    if len(s) < 2:
        raise ValueError(
            f"prefix stem {s!r} shorter than 2 chars would scan an "
            "O(vocabulary) dictionary slice"
        )
    rows = (
        spark.read.parquet(paths.term_stats)
        .filter(F.col("term").startswith(s))
        .groupBy("term").agg(F.sum("df").alias("df"))  # per-segment rows sum
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(max_expansions + 1)  # +1: detect truncation without a count
        .collect()
    )
    return [r["term"] for r in rows[:max_expansions]], len(rows) > max_expansions


def rewrite_prefix_queries(
    spark: SparkSession,
    paths: IndexPaths,
    queries: list[dict],
    max_expansions: int = 32,
) -> list[dict]:
    """Rewrite prefix-wildcard queries for the bulk OR surfaces
    (bm25_bruteforce / bm25_wand / bm25_distributed): each query whose
    text contains trailing-``*`` tokens gets a pre-normalized ``terms``
    list — its plain tokens plus every expansion (Lucene multi-term OR
    semantics).  A wildcard in ``q["exclude"]`` expands to a
    pre-normalized ``exclude_terms`` list (NOT is a veto, so a capped
    expansion would silently under-veto — truncation there is a loud
    error).  Non-wildcard queries pass through untouched.  Grouped
    AND-with-prefix is a serving-plane feature (IndexServer.search);
    the bulk rewrite is OR-only and raises on other modes."""

    def _split(text: str) -> tuple[list[str], list[str]]:
        plain: list[str] = []
        stems: list[str] = []
        for tok in text.split():
            if tok.endswith("*") and len(tok) > 1 and "*" not in tok[:-1]:
                stems.append(tok[:-1])
            elif "*" in tok:
                raise ValueError(
                    f"wildcard {tok!r}: '*' is supported only as a "
                    "single trailing character (prefix query)"
                )
            else:
                plain.append(tok)
        return plain, stems

    out = []
    for q in queries:
        text = q["query_text"]
        excl = q.get("exclude", "") or ""
        if "*" not in text and "*" not in excl:
            out.append(q)
            continue
        lang = q.get("lang", "python")
        q2 = dict(q)
        if "*" in text:
            if q.get("mode", "OR").upper() != "OR":
                raise ValueError(
                    "bulk prefix rewrite supports OR queries only; grouped "
                    "AND-with-prefix runs on the serving path "
                    "(IndexServer.search)"
                )
            plain, stems = _split(text)
            terms = set(tokenize(" ".join(plain), lang))
            for st in stems:
                exp, _trunc = expand_prefix_spark(
                    spark, paths, st, lang, max_expansions
                )
                terms.update(exp)
            q2["terms"] = sorted(terms)
        if "*" in excl:
            eplain, estems = _split(excl)
            ex_terms = set(tokenize(" ".join(eplain), lang))
            for st in estems:
                exp, trunc = expand_prefix_spark(
                    spark, paths, st, lang, max_expansions
                )
                if trunc:
                    raise ValueError(
                        f"exclusion prefix {st + '*'!r} matches more than "
                        f"{max_expansions} dictionary terms; NOT must veto "
                        "exactly — use a longer prefix"
                    )
                ex_terms.update(exp)
            q2["exclude_terms"] = sorted(ex_terms)
        out.append(q2)
    return out


def _exclude_terms(queries: list[dict]) -> list[dict]:
    """Tokenized NOT-operator terms per query (``q["exclude"]``, optional):
    a document containing ANY of them is vetoed before scoring.  A query
    may carry a pre-normalized ``exclude_terms`` list instead (the
    prefix-wildcard rewrite emits dictionary terms, never re-tokenized)."""
    rows = []
    for q in queries:
        if "exclude_terms" in q:
            terms = sorted(set(q["exclude_terms"]))
        else:
            terms = sorted(
                set(tokenize(q.get("exclude", "") or "",
                             q.get("lang", "python")))
            )
        for term in terms:
            rows.append({"query_id": q["query_id"], "term": term})
    return rows


def facet_counts(
    spark: SparkSession,
    paths: IndexPaths,
    queries: list[dict],
    by: tuple = ("lang", "repo"),
) -> DataFrame:
    """Facet counts over the FULL match set of each OR/AND query ->
    (query_id, facet, value, n_docs) — the bulk/offline twin of
    IndexServer.facets (which counts from in-memory doc-values; this
    path is pure DataFrame ops for analytics over arbitrary corpus
    sizes).

    Plan shape at scale: the tf table is pruned to query terms by a
    broadcast join, the per-(query, doc) matched-term count is one
    map-side-combinable aggregation, the docs-table join shuffles on
    doc_id (both sides big — correct, no broadcast), and the facet
    melt (``stack``) + count is a second small aggregation.  AND
    queries keep docs whose matched-term count equals the query's term
    count; prefix wildcards arrive pre-rewritten (rewrite_prefix_queries,
    OR-only); PHRASE/NEAR are rejected loudly (position verification is
    bm25_wand's job)."""
    _reject_filters(queries, "facet_counts")
    meta = []
    for q in queries:
        m = q.get("mode", "OR").upper()
        if m not in ("OR", "AND"):
            raise ValueError(
                f"facet_counts supports OR/AND only (query_id "
                f"{q.get('query_id')} has mode {q.get('mode')!r})"
            )
        meta.append((q["query_id"], m))
    qt_rows = _query_terms(queries)
    if not qt_rows:
        return spark.createDataFrame(
            [], "query_id int, facet string, value string, n_docs long"
        )
    n_terms = {}
    for r in qt_rows:
        n_terms[r["query_id"]] = n_terms.get(r["query_id"], 0) + 1
    qt = spark.createDataFrame(qt_rows, "query_id int, term string")
    qmeta = spark.createDataFrame(
        [(qid, m, n_terms.get(qid, 0)) for qid, m in meta],
        "query_id int, mode string, n_terms int",
    )
    tf = spark.read.parquet(paths.tf).select("term", "doc_id")
    matched = (
        tf.join(F.broadcast(qt), "term")  # tf holds one row per (doc, term)
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("nt"))
        .join(F.broadcast(qmeta), "query_id")
        .filter((F.col("mode") == "OR") | (F.col("nt") == F.col("n_terms")))
        .select("query_id", "doc_id")
    )
    ex_rows = _exclude_terms(queries)
    if ex_rows:
        exq = spark.createDataFrame(ex_rows, "query_id int, term string")
        veto = (
            tf.join(F.broadcast(exq), "term")
            .select("query_id", "doc_id")
            .distinct()
        )
        matched = matched.join(
            F.broadcast(veto), ["query_id", "doc_id"], "left_anti"
        )
    docs = spark.read.parquet(paths.docs).select("doc_id", *by)
    stack_expr = (
        f"stack({len(by)}, "
        + ", ".join(f"'{c}', {c}" for c in by)
        + ") as (facet, value)"
    )
    return (
        matched.join(docs, "doc_id")
        .selectExpr("query_id", stack_expr)
        .groupBy("query_id", "facet", "value")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("query_id", "facet", F.desc("n_docs"), "value")
    )


def _bm25_expr(n_docs: int, avgdl: float):
    """BM25 as a JVM-side Catalyst expression (whole-stage codegen; no
    Python in the brute-force hot path)."""
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_norm = (
        F.col("tf") * F.lit(bm25.K1 + 1.0)
        / (
            F.col("tf")
            + F.lit(bm25.K1)
            * (F.lit(1.0 - bm25.B) + F.lit(bm25.B) * F.col("doclen") / F.lit(avgdl))
        )
    )
    return idf * tf_norm


def bm25_bruteforce(
    spark: SparkSession, paths: IndexPaths, queries: list[dict]
) -> DataFrame:
    """results(query_id, rank, doc_id, score) via pure DataFrame ops."""
    _reject_filters(queries, "bm25_bruteforce")
    stats = read_corpus_stats(paths)  # driver-side pyarrow: no Spark job
    n_docs, avgdl = int(stats["n_docs"]), float(stats["avgdl"])
    qt = spark.createDataFrame(
        _query_terms(queries) or [{"query_id": -1, "term": ""}],
        "query_id int, term string",
    )
    ks = spark.createDataFrame(
        [(q["query_id"], q.get("k", 10)) for q in queries], "query_id int, k int"
    )
    tf = spark.read.parquet(paths.tf)  # carries doclen per (doc, term) row
    term_stats = spark.read.parquet(paths.term_stats).select("term", "df")

    scored = (
        tf.join(F.broadcast(qt), "term")  # prunes the corpus to query terms
        .join(F.broadcast(term_stats.join(F.broadcast(qt.select("term").distinct()), "term")), "term")
        .withColumn("contrib", _bm25_expr(n_docs, avgdl))
    )
    agg = (
        scored.groupBy("query_id", "doc_id")
        .agg(F.bround(F.sum("contrib"), bm25.QUANT).alias("score"))
    )
    ex_rows = _exclude_terms(queries)
    if ex_rows:
        # NOT operator: veto (query_id, doc_id) pairs whose doc contains any
        # excluded term.  The veto set is per-query-tiny (a term's postings),
        # so it broadcasts; the anti-join runs before ranking.
        exq = spark.createDataFrame(ex_rows, "query_id int, term string")
        veto = (
            tf.join(F.broadcast(exq), "term")
            .select("query_id", "doc_id")
            .distinct()
        )
        agg = agg.join(F.broadcast(veto), ["query_id", "doc_id"], "left_anti")
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .join(F.broadcast(ks), "query_id")
        .filter(F.col("rank") <= F.col("k"))
        .select("query_id", "rank", "doc_id", "score")
        .orderBy("query_id", "rank")
    )


def bm25_bool(
    spark: SparkSession,
    paths: IndexPaths,
    expr_text: str,
    lang: str = "python",
    k: int = 10,
    filters: dict | None = None,
) -> DataFrame:
    """Bulk (Spark) twin of the serve surface's parenthesized boolean
    planner -> results(rank, doc_id, score), rank/score-identical to
    ``IndexServer.search(mode="BOOL")`` on a compacted index.

    The AST (index/boolexpr.py — same parser/validator as serve)
    compiles to relational set algebra on the tf table: a leaf is a
    term-pruned distinct-doc projection ('all' leaves — split
    identifiers — need every sub-token, a HAVING count(distinct term)
    gate); OR is union, AND chains left-semi joins, NOT is a left-anti
    join (validated: only inside a conjunction with a positive clause,
    so the anti side is always term-bounded, never a corpus
    complement).  Scoring then reuses the brute-force shape — tf joined
    to the broadcast POSITIVE-leaf terms only (filter clauses gate
    membership, contribute no score), one groupBy(doc_id) sum,
    semi-joined to the match set before the top-k window."""
    from horus_ner_spark.index.boolexpr import parse_bool, positive_leaves

    ast = parse_bool(expr_text)  # rejects quoted phrases loudly
    stats = read_corpus_stats(paths)
    n_docs, avgdl = int(stats["n_docs"]), float(stats["avgdl"])
    include, leafmap = _bool_match_frame(spark, paths, ast, lang, filters)
    empty = spark.createDataFrame([], "rank int, doc_id long, score double")
    if include is None:
        return empty
    sterms: set[str] = set()
    for tok in positive_leaves(ast):
        sterms.update(leafmap[tok][0])
    if not sterms:
        return empty
    tf = spark.read.parquet(paths.tf)
    qt = spark.createDataFrame(
        [(t,) for t in sorted(sterms)], "term string"
    )
    term_stats = (
        spark.read.parquet(paths.term_stats)
        .join(F.broadcast(qt), "term")
        .select("term", "df")
    )
    top = (
        tf.join(F.broadcast(qt), "term")
        .join(F.broadcast(term_stats), "term")
        .withColumn("contrib", _bm25_expr(n_docs, avgdl))
        .groupBy("doc_id")
        .agg(F.bround(F.sum("contrib"), bm25.QUANT).alias("score"))
        .join(include, "doc_id", "left_semi")
        # orderBy+limit -> TakeOrderedAndProject: per-partition k-heaps,
        # never a single-partition sort of the full match set
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))  # <= k rows
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("rank", "doc_id", "score")
        .orderBy("rank")
    )


def _bool_match_frame(spark, paths, ast, lang, filters):
    """Shared include-set computation for the boolean bulk surfaces ->
    (distinct doc_id DataFrame or None, leaf token -> (terms, kind) map).
    One dictionary expansion per DISTINCT leaf; metadata filters arrive
    as a docs-table predicate semi-join (pushdown-friendly)."""
    from horus_ner_spark.index.boolexpr import (
        AndNode,
        Leaf,
        NotNode,
        OrNode,
        all_leaves,
    )
    from horus_ner_spark.index.fuzzy import expand_fuzzy_spark

    tf = spark.read.parquet(paths.tf)

    def _expand_leaf(token: str) -> tuple[list[str], str]:
        if "*" in token[:-1] or "~" in token[:-1]:
            # same contract as IndexServer._leaf_terms: loud, never a
            # silent empty expansion
            raise ValueError(
                f"wildcard {token!r}: '*'/'~' are supported only as a "
                "single trailing character"
            )
        if len(token) > 1 and token.endswith("*"):
            return expand_prefix_spark(spark, paths, token[:-1], lang)[0], "any"
        if len(token) > 1 and token.endswith("~"):
            return expand_fuzzy_spark(spark, paths, token[:-1], lang)[0], "any"
        if "*" in token or "~" in token:
            raise ValueError(
                f"wildcard {token!r}: '*'/'~' are supported only as a "
                "single trailing character"
            )
        return sorted(set(tokenize(token, lang))), "all"

    # one dictionary expansion per DISTINCT leaf, shared by the include
    # evaluation and the scoring-term collection
    leafmap = {tok: _expand_leaf(tok)
               for tok in dict.fromkeys(all_leaves(ast))}

    def leaf_terms(token: str) -> tuple[list[str], str]:
        return leafmap[token]

    def docs_of(node) -> DataFrame | None:
        """Distinct doc_id frame of the node's match set (None = empty)."""
        if isinstance(node, Leaf):
            terms, req = leaf_terms(node.token)
            if not terms:
                return None
            hit = tf.filter(F.col("term").isin(terms))
            if req == "any" or len(terms) == 1:
                return hit.select("doc_id").distinct()
            return (
                hit.groupBy("doc_id")
                .agg(F.countDistinct("term").alias("nt"))
                .filter(F.col("nt") == len(terms))
                .select("doc_id")
            )
        if isinstance(node, OrNode):
            sets = [docs_of(c) for c in node.children]
            sets = [s for s in sets if s is not None]
            if not sets:
                return None
            out = sets[0]
            for s in sets[1:]:
                out = out.unionByName(s)
            return out.distinct()
        if isinstance(node, AndNode):
            pos = [c for c in node.children if not isinstance(c, NotNode)]
            neg = [c.child for c in node.children if isinstance(c, NotNode)]
            out = None
            for c in pos:  # parse_bool validated >=1 positive clause
                s = docs_of(c)
                if s is None:
                    return None
                out = s if out is None else out.join(s, "doc_id", "left_semi")
            for c in neg:
                s = docs_of(c)
                if s is not None:
                    out = out.join(s, "doc_id", "left_anti")
            return out
        raise AssertionError(f"unknown boolexpr node {type(node).__name__}")

    include = docs_of(ast)
    if include is None:
        return None, leafmap
    if filters:
        # metadata filters (repo exact / path prefix): a pushdown-friendly
        # docs-table predicate semi-joined into the match set — the bulk
        # twin of IndexServer._filter_exclude, same filter-context
        # contract (membership only, scores untouched)
        dsel = spark.read.parquet(paths.docs)
        for col, want in dict(filters).items():
            if col == "repo":
                dsel = dsel.filter(F.col("repo") == want)
            elif col == "path":
                dsel = dsel.filter(F.col("path").startswith(want))
            else:
                raise ValueError(
                    f"unknown filter column {col!r}; expected repo/path"
                )
        include = include.join(
            dsel.select("doc_id"), "doc_id", "left_semi"
        )
    return include, leafmap


def facet_counts_bool(
    spark: SparkSession,
    paths: IndexPaths,
    expr_text: str,
    lang: str = "python",
    by: tuple = ("lang", "repo"),
    filters: dict | None = None,
) -> DataFrame:
    """Facet counts over the FULL match set of ONE boolean query ->
    (facet, value, n_docs) — the bulk/offline twin of
    ``IndexServer.facets(mode="BOOL")``, sharing the include-set
    computation with :func:`bm25_bool` (same set algebra, same filter
    semi-join), then one docs-table join + ``stack`` melt + count like
    :func:`facet_counts`."""
    from horus_ner_spark.index.boolexpr import parse_bool

    ast = parse_bool(expr_text)
    include, _leafmap = _bool_match_frame(spark, paths, ast, lang, filters)
    if include is None:
        return spark.createDataFrame(
            [], "facet string, value string, n_docs long"
        )
    docs = spark.read.parquet(paths.docs).select("doc_id", *by)
    stack_expr = (
        f"stack({len(by)}, "
        + ", ".join(f"'{c}', {c}" for c in by)
        + ") as (facet, value)"
    )
    return (
        include.join(docs, "doc_id")
        .selectExpr(stack_expr)
        .groupBy("facet", "value")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("facet", F.desc("n_docs"), "value")
    )


# ───────────────────────────── block-max WAND ─────────────────────────────

# Exhausted-iterator sentinel: must exceed every legal doc_id.  doc_ids are
# xxhash64 values spanning the FULL signed-64 range up to 2^63-1, so the
# sentinel is 2^63 (python ints are unbounded; never store this in int64).
_INF = 1 << 63


class _TermIter:
    """Cursor over one term's posting blocks, sorted by min_doc_id.

    Decode is lazy: skipping via (min_doc_id, max_doc_id, max_tfnorm)
    metadata never touches the compressed bytes.  With layout v5/v6 the
    metadata arrays are at IMPACT SUB-RANGE granularity (up to
    SUB_BLOCKS_MAX entries per block, boundaries isolating the hottest
    postings): shallow bounds get much tighter and skip jumps land on
    sub-range boundaries, while decode stays per block (``blk_of`` maps
    each metadata entry to its parent block; a decoded block is cached so
    crossing its sub-ranges never re-decodes).

    ``pending``: the cursor may be a LOWER BOUND rather than a real doc_id.
    When a skip target lands inside an undecoded (sub-)range, decoding the
    parent block just to learn the exact landing doc is wasted work if the
    next bound check skips past it anyway — with sub-range granularity the
    skip loop takes ~4x more steps, and each step's target lands mid-range
    of the OTHER prefix iterators often enough that eager decode made the
    finer metadata decode MORE than block-granular metadata (measured
    +29/722 blocks per hot term at sf0.1).  Instead ``next_geq`` parks
    ``cur = target`` with ``pending=True``; ``materialize()`` resolves it
    to the true next doc only when the WAND loop is about to evaluate.
    """

    __slots__ = (
        "term", "idf", "ub", "mins", "maxs", "bmaxs", "blk_of", "dvb",
        "tvb", "lvb", "bi", "pos", "docs", "tfs", "dls", "cur", "dec_blk",
        "pending",
    )

    def __init__(self, term: str, idf: float, blocks: pd.DataFrame) -> None:
        blocks = blocks.sort_values("min_doc_id", kind="mergesort")
        self.term = term
        self.idf = idf
        self.dvb = blocks["doc_ids_vb"].tolist()
        self.tvb = blocks["tfs_vb"].tolist()
        self.lvb = blocks["doclens_vb"].tolist()
        sub = (
            "sub_min_doc_ids" in blocks.columns
            and blocks["sub_min_doc_ids"].notna().all()
        )
        if sub:
            sub_mins = blocks["sub_min_doc_ids"].tolist()
            counts = np.array([len(s) for s in sub_mins], dtype=np.int64)
            self.mins = np.concatenate(
                [np.asarray(s, dtype=np.int64) for s in sub_mins]
            )
            # range maxima are DERIVED, not stored (layout v6): ranges
            # tile each block's doc-id span, so maxs[j] = mins[j+1] - 1
            # within a block and a block's LAST range ends at its exact
            # max_doc_id.  Safe because the only exact-max property the
            # kernel relies on is "a range's max never exceeds its block's
            # last real posting" (guarantees in-block searches succeed),
            # which the per-block last assignment preserves; a target in a
            # former inter-range gap now parks pending on the range to its
            # left instead of virtually advancing (measured ~free: sf0.1
            # decode ratio +0.015).
            self.maxs = np.empty_like(self.mins)
            if len(self.mins) > 1:
                self.maxs[:-1] = self.mins[1:] - 1
            self.maxs[np.cumsum(counts) - 1] = (
                blocks["max_doc_id"].to_numpy(np.int64)
            )
            # metadata stores the idf-free tfnorm bound; idf is per-term
            self.bmaxs = idf * np.concatenate(
                [np.asarray(s, dtype=np.float64)
                 for s in blocks["sub_max_tfnorms"]]
            )
            self.blk_of = np.repeat(np.arange(len(counts)), counts)
        else:  # pre-v5 index: block-granular metadata
            self.mins = blocks["min_doc_id"].to_numpy(np.int64)
            self.maxs = blocks["max_doc_id"].to_numpy(np.int64)
            self.bmaxs = idf * blocks["block_max_tfnorm"].to_numpy(np.float64)
            self.blk_of = np.arange(len(self.mins))
        self.ub = float(self.bmaxs.max())  # global term upper bound
        self.bi = 0
        self.pos = 0
        self.docs = None
        self.dec_blk = -1
        self.cur = int(self.mins[0])
        self.pending = False

    def _decode(self, blk: int) -> None:
        self.docs, self.tfs = decode_block(
            bytes(self.dvb[blk]), bytes(self.tvb[blk])
        )
        self.dls = vb_decode(bytes(self.lvb[blk])).view(np.int64)
        self.dec_blk = blk
        DECODE_STATS["blocks"] += 1
        DECODE_STATS["postings"] += len(self.docs)

    def next_geq(self, target: int) -> int:
        """Advance to the first posting with doc_id >= target.

        May return a PENDING lower bound (``self.pending``) when the
        target lands inside an undecoded (sub-)range — callers that need
        the exact doc must call :meth:`materialize` first."""
        if self.cur >= target:
            # a pending cur >= target is still a valid lower bound for the
            # new target (the true next doc is >= cur >= target)
            return self.cur
        self.pending = False
        while self.bi < len(self.mins):
            if self.maxs[self.bi] < target:  # metadata skip, no decode
                self.bi += 1
                continue
            if target <= self.mins[self.bi]:
                # the whole (sub-)range is at/after target, so its FIRST doc
                # — stored exactly in the metadata — is the answer: the
                # cursor advances VIRTUALLY, and the block decodes only if
                # this doc is actually evaluated (score_current) or searched
                # past.  This is what makes a failed-bound skip cost zero
                # decode even on the landing block.
                self.cur = int(self.mins[self.bi])
                self.pos = -1
                return self.cur
            blk = int(self.blk_of[self.bi])
            if self.dec_blk != blk:
                # target is strictly inside an undecoded range: park the
                # cursor at target as a lower bound instead of decoding —
                # if the next bound check fails, the block never decodes.
                self.cur = target
                self.pos = -1
                self.pending = True
                return self.cur
            pos = int(np.searchsorted(self.docs, target, side="left"))
            self.pos = pos
            self.cur = int(self.docs[pos])
            # keep bi on the sub-range containing cur (shallow pointers)
            while self.maxs[self.bi] < self.cur:
                self.bi += 1
            return self.cur
        self.cur = _INF
        return self.cur

    def materialize(self) -> int:
        """Resolve a pending lower-bound cursor to the true next doc_id
        (decodes the parent block).  No-op when the cursor is exact."""
        if not self.pending:
            return self.cur
        self.pending = False
        target = self.cur
        # in-bounds invariant (v6 derived maxima are NOT postings): the
        # pending range's max >= target, and a range's max never exceeds
        # its block's LAST real posting — an inner range's max is
        # mins[j+1]-1 where mins[j+1] is a real posting in the SAME
        # block, and the block-last range's max is the exact block max.
        # Hence this block holds a real doc >= target and searchsorted
        # cannot run past the decoded array
        self._decode(int(self.blk_of[self.bi]))
        pos = int(np.searchsorted(self.docs, target, side="left"))
        self.pos = pos
        self.cur = int(self.docs[pos])
        while self.maxs[self.bi] < self.cur:
            self.bi += 1
        return self.cur

    def block_max_at(self, target: int) -> float:
        """Upper bound of the (sub-)block that would contain ``target``
        (shallow advance — metadata only)."""
        bj = self.bi
        while bj < len(self.mins) and self.maxs[bj] < target:
            bj += 1
        return float(self.bmaxs[bj]) if bj < len(self.mins) else 0.0

    def block_boundary_at(self, target: int) -> int:
        """max_doc_id of the (shallow) (sub-)block containing target."""
        bj = self.bi
        while bj < len(self.mins) and self.maxs[bj] < target:
            bj += 1
        return int(self.maxs[bj]) if bj < len(self.mins) else _INF

    def score_current(self, n_docs: int, avgdl: float) -> float:
        if self.pending:  # callers materialize first; belt-and-braces
            self.materialize()
        blk = int(self.blk_of[self.bi])
        if self.docs is None or self.dec_blk != blk:
            self._decode(blk)
            self.pos = -1
        if self.pos < 0:  # cursor was advanced virtually (metadata only)
            self.pos = int(np.searchsorted(self.docs, self.cur, side="left"))
        tf = float(self.tfs[self.pos])
        dl = float(self.dls[self.pos])
        return self.idf * tf * (bm25.K1 + 1.0) / (
            tf + bm25.K1 * (1.0 - bm25.B + bm25.B * dl / avgdl)
        )


# Safety margin below the heap threshold: scores are quantized to 1e-6
# before ranking, so a candidate whose true score is within 1e-6 of the
# current k-th best can still tie after quantization and win the doc_id
# tie-break.  Skipping strictly below (theta - EPS) keeps WAND rank-identical
# to exhaustive scoring.
_EPS = 1e-6

# Hybrid execution threshold: below this many candidate postings, decoding
# everything and scoring vectorized (numpy, C speed over all postings) beats
# WAND's pointer arithmetic (Python speed over the *surviving* postings).
# WAND's asymptotic skipping only pays once lists are long enough that
# block-max pruning eliminates far more work than the interpreter overhead
# costs — the crossover measured here is in the millions of postings.
_EXHAUSTIVE_MAX_POSTINGS = 4_000_000


def _decode_term_blocks(b: pd.DataFrame):
    """Vectorized decode of ALL of one term's posting blocks: one codec
    call per COLUMN over the concatenated streams (blocks are self-
    contained: each block's first doc_id is absolute, so boundaries from
    n_postings reconstruct every block's ids).  Returns (docs, tfs,
    doclens, block_starts) in the frame's block order.

    The per-block decode loop this replaces issued thousands of ~20 us
    numpy calls per hot query — fine alone, but under a concurrent serving
    daemon every tiny call is a GIL release/reacquire and the threads
    convoy (measured 8x WORSE than serialized at 4 threads)."""
    from horus_ner_spark.index.codec import _SIGN_FLIP

    nposts = b["n_postings"].to_numpy(np.int64)
    n = int(nposts.sum())
    starts = np.zeros(len(nposts), dtype=np.int64)
    np.cumsum(nposts[:-1], out=starts[1:])
    gaps = vb_decode(b"".join(bytes(x) for x in b["doc_ids_vb"]))
    first = np.zeros(n, dtype=bool)
    first[starts] = True
    gaps[~first] += np.uint64(1)
    csum = np.cumsum(gaps, dtype=np.uint64)
    carry = np.repeat(csum[starts] - gaps[starts], nposts)
    docs = ((csum - carry) ^ _SIGN_FLIP).view(np.int64)
    tfs = vb_decode(b"".join(bytes(x) for x in b["tfs_vb"])).view(np.int64)
    dls = vb_decode(b"".join(bytes(x) for x in b["doclens_vb"])).view(np.int64)
    return docs, tfs, dls, starts


def _in_sorted(sorted_arr: np.ndarray, values) -> np.ndarray | bool:
    """Membership of ``values`` (array or scalar) in a SORTED int64 array —
    searchsorted, no per-call sort (the hot-loop trick from the phrase
    kernel)."""
    if len(sorted_arr) == 0:
        return (
            False if np.isscalar(values) else np.zeros(len(values), dtype=bool)
        )
    idx = np.minimum(np.searchsorted(sorted_arr, values), len(sorted_arr) - 1)
    return sorted_arr[idx] == values


def _exhaustive_one_query(
    term_blocks: dict[str, pd.DataFrame],
    term_df: dict[str, int],
    k: int,
    n_docs: int,
    avgdl: float,
    require_all: int = 0,
    exclude: np.ndarray | None = None,
    include: np.ndarray | None = None,
    doc_range: tuple[int, int] | None = None,
    decoded: dict | None = None,
) -> list[tuple[int, int, float]]:
    """Decode-all vectorized BM25 — same quantize-then-rank contract as WAND
    (terms processed in sorted order; per-doc contributions accumulate in
    that order via a stable sort), so results are rank-identical.

    ``decoded`` (optional) is a per-term memo of the decode product,
    term -> (docs int64, scores float64): entries present are used as-is
    (they ARE a previous invocation's arrays — bit-identical by
    construction, and never mutated downstream: every consumer copies via
    concatenate), entries absent are computed and written back.  The
    CALLER owns the dict and must only share it across calls whose
    term frames are the FULL per-term block sets (IndexServer gates on
    single-segment + no exclude; filters like exclude/doc_range apply
    AFTER the memoized product, so they stay correct per call).

    ``require_all=n`` enables conjunctive (AND) semantics: only documents
    matched by exactly n query terms rank (each term contributes at most
    one posting per doc, so contribution count == matched-term count).

    ``include`` (sorted unique int64) keeps ONLY those documents — the
    prefix-group conjunctive filter (serve.py: a ``p*`` term in an AND
    query requires membership in the union of the group's expansions;
    the allowed-doc set is computed once and applied here, before the
    per-doc accumulation and top-k selection, so scores of surviving
    docs are exactly their unfiltered sums).

    ``exclude`` (sorted int64) drops documents before scoring — the
    multi-segment serving path's stale-duplicate filter (a doc re-ingested
    into a newer segment serves only from its home segment, so it can never
    occupy a top-k slot it wouldn't hold in the compacted index).
    ``doc_range=(lo, hi)`` keeps only docs in the inclusive id range — the
    distributed conjunctive path's range-bucket partition filter."""
    docs_l: list[np.ndarray] = []
    scores_l: list[np.ndarray] = []
    for t in sorted(term_blocks):
        b = term_blocks[t]
        if not len(b):
            continue
        memo = decoded.get(t) if decoded is not None else None
        if memo is None:
            t_idf = bm25.idf(n_docs, term_df[t])
            d, tf, dl, _bs = _decode_term_blocks(b)
            tfn = tf * (bm25.K1 + 1.0) / (
                tf + bm25.K1 * (1.0 - bm25.B + bm25.B * dl.astype(np.float64) / avgdl)
            )
            memo = (d, t_idf * tfn)
            if decoded is not None:
                decoded[t] = memo
        docs_l.append(memo[0])
        scores_l.append(memo[1])
    if not docs_l:
        return []
    docs = np.concatenate(docs_l)
    scores = np.concatenate(scores_l)
    if doc_range is not None:
        m = (docs >= doc_range[0]) & (docs <= doc_range[1])
        docs, scores = docs[m], scores[m]
    if exclude is not None and len(exclude):
        m = ~_in_sorted(exclude, docs)
        docs, scores = docs[m], scores[m]
    if include is not None:
        if not len(include):
            return []
        m = _in_sorted(include, docs)
        docs, scores = docs[m], scores[m]
    if not len(docs):
        return []
    order = np.argsort(docs, kind="stable")  # stable keeps term-sorted order
    docs, scores = docs[order], scores[order]
    starts = np.concatenate(
        ([0], np.flatnonzero(docs[1:] != docs[:-1]) + 1)
    )
    uniq = docs[starts]
    q = np.round(np.add.reduceat(scores, starts), bm25.QUANT)
    if require_all:
        counts = np.diff(np.concatenate((starts, [len(docs)])))
        keep = counts == require_all
        uniq, q = uniq[keep], q[keep]
    top = np.lexsort((uniq, -q))[:k]  # score desc, doc_id asc
    return [(r + 1, int(uniq[i]), float(q[i])) for r, i in enumerate(top)]


def _near_window_match(pos_lists: list[np.ndarray], slop: int) -> bool:
    """True iff some token window of span <= ``slop`` contains at least one
    position from EVERY list (classic minimal-covering-window two-pointer
    sweep over the merged sorted positions)."""
    n_terms = len(pos_lists)
    if n_terms == 1:
        return len(pos_lists[0]) > 0
    lab = np.concatenate(
        [np.full(len(p), i, dtype=np.int64) for i, p in enumerate(pos_lists)]
    )
    allp = np.concatenate(pos_lists)
    order = np.argsort(allp, kind="stable")
    allp, lab = allp[order], lab[order]
    count = np.zeros(n_terms, dtype=np.int64)
    have = 0
    left = 0
    for right in range(len(allp)):
        c = lab[right]
        count[c] += 1
        if count[c] == 1:
            have += 1
        while have == n_terms:
            if allp[right] - allp[left] <= slop:
                return True
            cl = lab[left]
            count[cl] -= 1
            if count[cl] == 0:
                have -= 1
            left += 1
    return False


def _verify_candidates(
    cset: np.ndarray,
    tf_c: dict[str, np.ndarray],
    term_flat: dict[str, tuple],
    distinct: list[str],
    phrase: list[str],
    slop: int,
) -> np.ndarray:
    """Position-verify ONE candidate chunk: decode position streams for the
    chunk's docs only, then run the vectorized window (NEAR) or adjacency
    (PHRASE) check.  ``cset`` is doc_id-sorted; ``tf_c[t]`` is term t's tf
    aligned with it.  ``term_flat[t]`` is pass 1's flat per-term product
    (d, tf, dl, pstart, pend, posbytes), doc-sorted with per-posting byte
    offsets into one concatenated position stream.  Returns a bool match
    mask aligned with ``cset``.

    Verification is ONE numpy pass over the chunk (round-3 verdict: the
    per-candidate Python loop was the hot-phrase scale ceiling).
    Positions are offset-encoded into disjoint per-candidate ranges:
    candidate i's positions map to [i*L, i*L + maxpos]; L exceeds
    maxpos + slop + len(phrase), so no window or adjacency check can ever
    cross a candidate boundary, and one global check covers every doc.

    The hit postings' position bytes are gathered raggedly in one numpy
    pass per term and decoded in ONE codec call — the per-BLOCK loop this
    replaces (62k searchsorted calls per hot-phrase query over ~3k blocks
    per hot term) was 66% of warm phrase time, and a per-HIT decode loop
    before it measured 85 us/posting."""
    n_c = len(cset)
    if slop > 0 and len(distinct) == 1:
        # every candidate has >= 1 occurrence: all match, no decode needed
        return np.ones(n_c, dtype=bool)
    pos_cat: dict[str, np.ndarray] = {}
    for t in distinct:
        d, tf, _dl, pstart, pend, posbytes = term_flat[t]
        p = np.minimum(np.searchsorted(d, cset), len(d) - 1)
        hits = np.flatnonzero(d[p] == cset)  # ascending candidate indices
        pidx = p[hits]
        starts_h = pstart[pidx]
        lens = pend[pidx] - starts_h
        ends = np.cumsum(lens)
        tot = int(ends[-1]) if len(ends) else 0
        intra = (
            np.arange(tot, dtype=np.int64) - np.repeat(ends - lens, lens)
        )
        buf = np.frombuffer(posbytes, dtype=np.uint8)
        chunk = buf[np.repeat(starts_h, lens) + intra]
        vals, _starts = decode_positions(chunk.tobytes(), tf[pidx])
        # hits ascend and d is doc-sorted, so vals is already grouped in
        # candidate order, tf_c[t][hits[j]] positions per hit j
        pos_cat[t] = vals
    maxpos = max(int(p.max()) for p in pos_cat.values())
    L = np.int64(maxpos + max(slop, len(phrase)) + 2)
    epos = {
        t: pos_cat[t]
        + np.repeat(np.arange(n_c, dtype=np.int64), tf_c[t]) * L
        for t in distinct
    }
    if slop > 0:  # NEAR: unordered window coverage (span <= slop)
        # minimal-covering-window sweep, vectorized: a window ending at
        # merged position j spans (pos[j] - min_t lastpos_t[j]); some
        # valid window exists iff for some j EVERY term's most recent
        # occurrence is within slop.  lastpos_t is a running max over
        # the merged stream (offset encoding voids cross-doc carry).
        allp = np.concatenate([epos[t] for t in distinct])
        lab = np.concatenate(
            [np.full(len(epos[t]), i, dtype=np.int64)
             for i, t in enumerate(distinct)]
        )
        order = np.argsort(allp, kind="stable")
        allp, lab = allp[order], lab[order]
        neg = np.int64(-(1 << 62))
        ok = np.ones(len(allp), dtype=bool)
        for i in range(len(distinct)):
            last = np.maximum.accumulate(np.where(lab == i, allp, neg))
            ok &= last >= allp - slop
        mci = np.unique(allp[ok] // L)
    else:
        # phrase check across the whole chunk at once: a start position p
        # such that term_i sits at p+i, via sorted membership (the encoded
        # streams are globally ascending: positions ascend within a
        # candidate and candidate ranges are disjoint ascending)
        anchors = epos[phrase[0]]
        for i, t in enumerate(phrase[1:], start=1):
            if not len(anchors):
                break
            anchors = anchors[_in_sorted(epos[t], anchors + i)]
        mci = (
            np.unique(anchors // L)
            if len(anchors)
            else np.empty(0, dtype=np.int64)
        )
    mask = np.zeros(n_c, dtype=bool)
    mask[mci] = True
    return mask


def _phrase_one_query(
    term_blocks: dict[str, pd.DataFrame],
    term_df: dict[str, int],
    k: int,
    n_docs: int,
    avgdl: float,
    phrase: list[str],
    exclude: np.ndarray | None = None,
    doc_range: tuple[int, int] | None = None,
    slop: int = 0,
    pos_memo: dict | None = None,
) -> list[tuple[int, int, float]]:
    """Exact-phrase / proximity top-k over the positional postings.

    ``slop == 0`` (PHRASE): documents containing the query's token
    sequence CONTIGUOUSLY (position adjacency).  ``slop > 0`` (NEAR):
    documents where every distinct query term occurs within some token
    window of span <= slop, in any order.  Both score BM25 over the
    query's distinct terms and rank under the shared quantize-then-rank
    contract, so a NEAR result set is a superset of the PHRASE result set
    for the same text whenever slop >= len(phrase) - 1.

    Reference motivation: multi-word compounds are the reference's unit of
    retrieval (src/core/feature_extraction/util.py:154-181 NP chunks are
    searched as a unit; util.py:623-712 emits compound rows first) — an
    index without positions cannot answer them.

    ``pos_memo`` (optional) memoizes pass 1's per-term product,
    term -> (d, tf, dl, pstart, pend, posbytes): postings doc-sorted, with
    per-posting byte offsets into ONE concatenated position stream — the
    flat shape lets verification run one searchsorted + one ragged gather
    per term instead of a per-block loop.  Same caller contract as
    _exhaustive_one_query's ``decoded``: only share it across calls whose
    term frames are the FULL per-term block sets; exclude/doc_range apply
    AFTER the memoized product.  Entries are never mutated."""
    from horus_ner_spark.index.codec import pos_slice_offsets

    distinct = sorted(set(phrase))
    if not distinct:  # fully stoplisted/empty phrase matches nothing
        return []
    if any(t not in term_blocks or not len(term_blocks[t]) for t in distinct):
        return []
    # pass 1: decode doc ids only (cheap, one codec pass per term —
    # _decode_term_blocks) and intersect — position VALUES stay encoded
    # (pos_slice_offsets finds per-posting byte boundaries without
    # decoding); a phrase of hot terms must not pay a full position
    # decode for postings that can never match
    term_flat: dict[str, tuple] = {}
    for t in distinct:
        memo = pos_memo.get(t) if pos_memo is not None else None
        if memo is None:
            b = term_blocks[t]
            d_all, tf_all, dl_all, _bstarts = _decode_term_blocks(b)
            posbytes = b"".join(b["pos_vb"])
            offs = pos_slice_offsets(posbytes, tf_all)
            pstart, pend = offs[:-1], offs[1:]
            if len(d_all) > 1 and np.any(np.diff(d_all) < 0):
                # frames out of doc order (no caller today violates the
                # sorted-disjoint invariant, but it's the kernel's, not
                # ours): permute postings; byte runs stay in place
                o = np.argsort(d_all, kind="stable")
                d_all, tf_all, dl_all = d_all[o], tf_all[o], dl_all[o]
                pstart, pend = pstart[o], pend[o]
            memo = (d_all, tf_all, dl_all, pstart, pend, posbytes)
            if pos_memo is not None:
                pos_memo[t] = memo
        term_flat[t] = memo
    inter: np.ndarray | None = None
    for t in sorted(distinct, key=lambda t: len(term_flat[t][0])):
        docs_t = term_flat[t][0]
        inter = (
            docs_t
            if inter is None
            else np.intersect1d(inter, docs_t, assume_unique=True)
        )
        if not len(inter):
            return []
    # candidate filters (see _exhaustive_one_query): stale-duplicate docs
    # and out-of-range docs leave BEFORE any position decode
    if doc_range is not None:
        inter = inter[(inter >= doc_range[0]) & (inter <= doc_range[1])]
    if exclude is not None and len(exclude):
        inter = inter[~_in_sorted(exclude, inter)]
    if not len(inter):
        return []

    # pass 1.5: candidate-aligned tf/doclen gather (positions stay
    # encoded) — enough to score EVERY candidate before any position work.
    # One searchsorted per term: every candidate is in every term's
    # doc-sorted postings by construction (inter is the intersection).
    n_cand = len(inter)
    tf_a: dict[str, np.ndarray] = {}
    dl_a: dict[str, np.ndarray] = {}
    for t in distinct:
        d, tf, dl = term_flat[t][:3]
        p = np.searchsorted(d, inter)
        tf_a[t], dl_a[t] = tf[p], dl[p]

    # Score-ordered LAZY verification (round 4): position decode + the
    # window/adjacency check are the expensive part, and most candidates
    # of a hot phrase can never rank.  Scores depend only on tf/doclen
    # (already decoded above), so candidates are ORDERED by a vectorized
    # score s_approx first and verified in descending-score chunks; the
    # scan stops once no unverified candidate can beat (or tie) the k-th
    # verified match.  Every match's ranking score is recomputed with the
    # exact contract arithmetic (math.fsum in sorted-term order, then
    # quantize), so results are bit-identical to exhaustive verification;
    # s_approx is only an ordering key plus a PROVEN upper envelope:
    # contributions are non-negative, chained-np-sum error is bounded by
    # (m-1)*eps*sum(contribs) and fsum is exactly rounded, so
    # s_approx * (1 + 4*m*eps) >= every exact score.
    idfs = {t: bm25.idf(n_docs, term_df[t]) for t in distinct}

    def _contribs(idx: np.ndarray) -> list[np.ndarray]:
        # per-term BM25 contributions with the exact expression shape of
        # bm25.tf_norm (element-wise IEEE ops in the same association
        # order -> bit-identical to the scalar path), sorted-term order
        cols = []
        for t in distinct:
            tfm = tf_a[t][idx]
            tfn = tfm * (bm25.K1 + 1.0) / (
                tfm
                + bm25.K1
                * (1.0 - bm25.B
                   + bm25.B * dl_a[t][idx].astype(np.float64) / avgdl)
            )
            cols.append(idfs[t] * tfn)
        return cols

    all_cols = _contribs(np.arange(n_cand, dtype=np.int64))
    s_approx = all_cols[0].copy()
    for c in all_cols[1:]:
        s_approx += c
    del all_cols
    fuzz = 4.0 * len(distinct) * np.finfo(np.float64).eps
    order = np.lexsort((inter, -s_approx))

    verified: list[tuple[float, int]] = []  # (quantized score, doc_id)
    lo = 0
    step = max(4 * k, 1024)
    while lo < n_cand:
        take = order[lo:lo + step]
        lo += step
        step *= 4  # geometric growth: O(log) chunks worst-case
        cset = np.sort(inter[take])
        gidx = np.searchsorted(inter, cset)  # chunk slot -> global slot
        match = _verify_candidates(
            cset, {t: tf_a[t][gidx] for t in distinct},
            term_flat, distinct, phrase, slop,
        )
        if match.any():
            mg = gidx[match]
            verified.extend(
                (bm25.quantize(math.fsum(vals)), int(d))
                for d, *vals in zip(inter[mg], *_contribs(mg))
            )
        if len(verified) >= k and lo < n_cand:
            verified.sort(key=lambda e: (-e[0], e[1]))
            del verified[k:]  # dropped entries rank below the k-th forever
            theta = verified[k - 1][0]
            # remaining exact scores are bounded by s_approx*(1+fuzz)
            # (descending in `order`); theta is on the 1e-6 quantize grid,
            # so anything strictly below theta - 0.5e-6 cannot even TIE
            # after quantization — and a tie from a later chunk would lose
            # the doc_id tie-break only unreliably, so ties must be ruled
            # out, not adjudicated.
            if s_approx[order[lo]] * (1.0 + fuzz) < theta - 5e-7:
                break
    verified.sort(key=lambda e: (-e[0], e[1]))
    return [(r + 1, d, q) for r, (q, d) in enumerate(verified[:k])]


def _score_one_query(
    term_blocks: dict[str, pd.DataFrame],
    term_df: dict[str, int],
    k: int,
    n_docs: int,
    avgdl: float,
    exclude: np.ndarray | None = None,
    doc_range: tuple[int, int] | None = None,
    theta0: float = -math.inf,
    decoded: dict | None = None,
) -> list[tuple[int, int, float]]:
    """Hybrid dispatch: vectorized exhaustive below the postings threshold,
    block-max WAND above it.  Both obey the same determinism contract.

    ``doc_range`` restricts candidates to an inclusive doc_id interval —
    the rb fan-out's partition filter (OR scores are complete per doc
    inside its home range because hot blocks are rb-pure and cold lists
    are range-filtered by this parameter).  ``theta0`` seeds the WAND
    threshold with an externally-known lower bound on the global k-th
    best score (real evaluated docs only — the serial fan carries the
    merged k-th best forward between buckets); exhaustive scoring ignores
    it (everything decodes anyway)."""
    total = sum(int(b["n_postings"].sum()) for b in term_blocks.values() if len(b))
    if total <= _EXHAUSTIVE_MAX_POSTINGS:
        return _exhaustive_one_query(
            term_blocks, term_df, k, n_docs, avgdl, exclude=exclude,
            doc_range=doc_range, decoded=decoded,
        )
    return _wand_one_query(
        term_blocks, term_df, k, n_docs, avgdl, exclude=exclude,
        doc_range=doc_range, theta0=theta0,
    )


def _wand_one_query(
    term_blocks: dict[str, pd.DataFrame],
    term_df: dict[str, int],
    k: int,
    n_docs: int,
    avgdl: float,
    exclude: np.ndarray | None = None,
    doc_range: tuple[int, int] | None = None,
    theta0: float = -math.inf,
) -> list[tuple[int, int, float]]:
    iters = [
        _TermIter(t, bm25.idf(n_docs, term_df[t]), b)
        for t, b in sorted(term_blocks.items())
        if len(b)
    ]
    hi_doc = _INF
    if doc_range is not None:
        lo_doc, hi_doc = doc_range
        for it in iters:
            it.next_geq(lo_doc)
    heap: list[tuple[float, int]] = []  # (quantized score, -doc_id); heap[0] = worst

    while iters:
        iters = [it for it in iters if it.cur < _INF and it.cur <= hi_doc]
        iters.sort(key=lambda it: it.cur)
        if not iters:
            break
        # theta0 is a lower bound on the GLOBAL k-th best (real scores from
        # other range buckets); pruning below it cannot drop a global
        # top-k doc even while the local heap is not yet full
        theta = max(heap[0][0], theta0) if len(heap) >= k else theta0
        theta_eff = (theta - _EPS) if theta > -math.inf else -math.inf
        # WAND pivot: smallest prefix of cur-doc-sorted iters whose summed
        # global UBs can reach the threshold.
        acc = 0.0
        pivot_idx = -1
        for i, it in enumerate(iters):
            acc += it.ub
            if acc >= theta_eff:
                pivot_idx = i
                break
        if pivot_idx < 0:
            break  # no doc can enter the heap anymore
        pivot = iters[pivot_idx].cur

        # Block-max refinement BEFORE any decode-advance (Ding & Suel BMW):
        # the (sub-)block bounds at pivot cap every doc in [pivot, d] for
        # the whole candidate prefix — checking here means a failed bound
        # skips WITHOUT the alignment decode the round-3 code paid first.
        bm_sum = sum(
            it.block_max_at(pivot) for it in iters if it.cur <= pivot
        )
        if bm_sum < theta_eff:
            # Skip (NextShallow): jump the candidate (prefix) iterators
            # past the smallest current-(sub-)block boundary among them —
            # every doc in (pivot, d] sits in those same ranges, so the
            # failed bound covers the whole jump.  Clamp at the first
            # cursor STRICTLY past the pivot: beyond it the UB prefix
            # changes and the pivot check must be redone.  Cursors tied at
            # the pivot are already inside the candidate set (bm_sum and d
            # above include every cur <= pivot), so clamping at a tie would
            # degenerate to d = pivot - 1 and force one-doc_id steps — with
            # lazy cursors re-parking at each fake bound, that was an
            # effectively infinite loop over ~2^63-spread hash doc_ids.
            d = min(
                it.block_boundary_at(pivot) for it in iters if it.cur <= pivot
            )
            nxt = next((it.cur for it in iters if it.cur > pivot), None)
            if nxt is not None:
                d = min(d, nxt - 1)
            target = max(d + 1, pivot + 1)
            for it in iters:
                if it.cur <= pivot:  # only prefix iterators move
                    it.next_geq(target)
            continue

        # Bound check passed: the prefix is about to be evaluated at pivot,
        # so pending lower-bound cursors must resolve to real doc_ids (the
        # fake cur could equal pivot without the doc existing).  If any
        # cursor moves, the sort/pivot is stale — redo the loop.
        moved = False
        for it in iters:
            if it.pending and it.cur <= pivot:
                before = it.cur
                if it.materialize() != before:
                    moved = True
        if moved:
            continue

        if iters[0].cur == pivot:
            if (
                exclude is not None
                and len(exclude)
                and _in_sorted(exclude, pivot)
            ):
                # stale-duplicate doc: never score, advance past it
                for it in iters:
                    if it.cur == pivot:
                        it.next_geq(pivot + 1)
                continue
            # full evaluation, term-sorted order for determinism
            contribs = []
            for it in sorted(iters, key=lambda x: x.term):
                it.next_geq(pivot)
                if it.cur == pivot:
                    contribs.append(it.score_current(n_docs, avgdl))
            q = bm25.quantize(math.fsum(contribs))
            entry = (q, -pivot)
            if len(heap) < k:
                heapq.heappush(heap, entry)
            elif entry > heap[0]:
                heapq.heapreplace(heap, entry)
            for it in iters:
                if it.cur == pivot:
                    it.next_geq(pivot + 1)
        else:
            iters[0].next_geq(pivot)

    ranked = sorted(heap, key=lambda e: (-e[0], -e[1]))
    return [(r + 1, -nd, q) for r, (q, nd) in enumerate(ranked)]


_BULK_MODES = ("OR", "AND", "PHRASE", "NEAR")


def _validate_modes(modes: dict[int, str], fn: str) -> None:
    """Loud, not silent: an unknown mode (e.g. "BOOL", which is the
    serve surface's / bm25_bool's job, or a typo) must never fall
    through to flat OR scoring."""
    for qid, m in modes.items():
        if m not in _BULK_MODES:
            raise ValueError(
                f"{fn} supports modes {_BULK_MODES}; got {m!r} "
                f"(query_id {qid})"
                + ("; parenthesized boolean queries run via bm25_bool "
                   "or IndexServer.search(mode='BOOL')"
                   if m == "BOOL" else "")
            )


def _reject_filters(queries: list[dict], fn: str) -> None:
    """Loud, not silent: the flat bulk kernels have no metadata-filter
    path — a ``filters`` key must never be dropped on the floor
    (bm25_bool and IndexServer.search implement filters)."""
    for q in queries:
        if q.get("filters"):
            raise ValueError(
                f"{fn} does not support metadata filters (query_id "
                f"{q.get('query_id')}); route the query through bm25_bool "
                "or IndexServer.search(filters=...)"
            )


def _validate_slops(slops: dict[int, int]) -> None:
    """Driver-side NEAR slop validation — same contract as the kernel's
    (_dispatch_query), applied before any Spark job launches."""
    for qid, s in slops.items():
        if s < 1:
            raise ValueError(
                f"NEAR requires slop >= 1 (token window span); got {s} "
                f"(query_id {qid})"
            )


def _dispatch_query(
    term_blocks: dict[str, pd.DataFrame],
    term_df: dict[str, int],
    k: int,
    n_docs: int,
    avgdl: float,
    mode: str,
    phrase: list[str] | None,
    require_all: int,
    or_kernel=None,
    exclude: np.ndarray | None = None,
    doc_range: tuple[int, int] | None = None,
    slop: int = 0,
    theta0: float = -math.inf,
    decoded: dict | None = None,
    pos_memo: dict | None = None,
) -> list[tuple[int, int, float]]:
    """One mode dispatcher shared by bm25_wand, bm25_wand_segments and
    bm25_distributed (and mirrored by IndexServer), so a mode's semantics
    live in one place.  ``decoded`` feeds the exhaustive kernel's per-term
    decode memo (OR/AND only); ``pos_memo`` feeds the phrase kernel's
    pass-1 memo (PHRASE/NEAR only) — see each kernel's contract."""
    if mode == "PHRASE":
        return _phrase_one_query(
            term_blocks, term_df, k, n_docs, avgdl, phrase or [],
            exclude=exclude, doc_range=doc_range, pos_memo=pos_memo,
        )
    if mode == "NEAR":
        if slop < 1:
            # loud failure, matching the unknown-mode policy: slop=0 has no
            # defined NEAR meaning (the contract is "window of span <=
            # slop"), so rejecting beats silently rewriting it to 1
            raise ValueError(
                f"NEAR requires slop >= 1 (token window span); got {slop}"
            )
        return _phrase_one_query(
            term_blocks, term_df, k, n_docs, avgdl, phrase or [],
            exclude=exclude, doc_range=doc_range, slop=slop,
            pos_memo=pos_memo,
        )
    if mode == "AND":
        return _exhaustive_one_query(
            term_blocks, term_df, k, n_docs, avgdl, require_all=require_all,
            exclude=exclude, doc_range=doc_range, decoded=decoded,
        )
    if or_kernel is not None:
        return or_kernel(
            term_blocks, term_df, k, n_docs, avgdl, exclude=exclude,
            doc_range=doc_range, theta0=theta0,
        )
    return _score_one_query(
        term_blocks, term_df, k, n_docs, avgdl, exclude=exclude,
        doc_range=doc_range, theta0=theta0, decoded=decoded,
    )


def bm25_wand(
    spark: SparkSession,
    paths: IndexPaths,
    queries: list[dict],
    n_pbuckets: int = N_PBUCKETS,
    force_wand: bool = False,
) -> DataFrame:
    """results(query_id, rank, doc_id, score) over the compressed index via
    hybrid execution (vectorized exhaustive / block-max WAND per query —
    see _score_one_query).  Rank-identical to ``bm25_bruteforce`` (tested).
    ``force_wand=True`` pins the WAND kernel (kernel-equality tests).

    Per-query ``mode``: "OR" (default, disjunctive), "AND" (every term must
    match), "PHRASE" (contiguous token sequence via the positional index),
    "NEAR" (every distinct term within a token window of span <=
    ``slop``, default 8, any order — positional proximity).

    Per-query ``exclude`` (the NOT operator, optional): documents containing
    ANY of its terms are vetoed before scoring, in every mode.  Excluded
    terms' postings ride the same pruned block fetch as scoring terms
    (flagged ``excl=1``); the kernel task decodes them into a sorted doc-id
    veto array — O(sum df of excluded terms) per query, the same order the
    scorer pays to decode one query term."""
    from horus_ner_spark.session import ensure_package_on_executors

    ensure_package_on_executors(spark)  # WAND kernel unpickles on workers
    stats = read_corpus_stats(paths)  # driver-side pyarrow: no Spark job
    n_docs, avgdl = int(stats["n_docs"]), float(stats["avgdl"])

    qt_rows = _query_terms(queries)
    ex_rows = _exclude_terms(queries)
    ks = {q["query_id"]: q.get("k", 10) for q in queries}
    modes = {q["query_id"]: q.get("mode", "OR").upper() for q in queries}
    _validate_modes(modes, "bm25_wand")
    _reject_filters(queries, "bm25_wand")
    phrases = {
        q["query_id"]: tokenize(q["query_text"], q.get("lang", "python"))
        for q in queries
        if q.get("mode", "OR").upper() in ("PHRASE", "NEAR")
    }
    slops = {
        q["query_id"]: int(q.get("slop", 8))
        for q in queries
        if q.get("mode", "OR").upper() == "NEAR"
    }
    _validate_slops(slops)  # fail before any Spark job launches
    if not qt_rows:
        return spark.createDataFrame([], RESULT_SCHEMA)
    terms = sorted({r["term"] for r in qt_rows} | {r["term"] for r in ex_rows})

    # partition pruning: compute the pbuckets the query terms live in with
    # the same hash the build wrote them with (crc32; driver-side, no job).
    buckets = sorted({term_bucket(t, n_pbuckets) for t in terms})

    # term -> df for idf (query vocabulary only: tiny, collected); the
    # term_stats table shares the postings bucket layout, so the same
    # directory + row-group pruning applies.
    term_df = {
        r["term"]: int(r["df"])
        for r in spark.read.parquet(paths.term_stats)
        .filter(F.col("pbucket").isin(buckets))
        .filter(F.col("term").isin(terms))
        .select("term", "df")
        .collect()
    }
    qt = spark.createDataFrame(
        [{**r, "excl": 0} for r in qt_rows]
        + [{**r, "excl": 1} for r in ex_rows],
        "query_id int, term string, excl int",
    )
    # positions are the largest per-posting payload — read/ship them only
    # when the batch actually contains a PHRASE query (column pruning
    # reaches the parquet scan)
    cols = list(_KERNEL_BLOCK_COLS) + (["pos_vb"] if phrases else [])
    pread = spark.read.parquet(paths.postings)
    cols = _cols_present(cols, pread.columns)
    blocks = (
        pread
        .filter(F.col("pbucket").isin(buckets))     # directory-level pruning
        .filter(F.col("term").isin(terms))          # row-group pruning
        .join(F.broadcast(qt), "term")
        .select("query_id", "excl", *cols)
    )

    n_query_terms = {
        qid: len({r["term"] for r in qt_rows if r["query_id"] == qid})
        for qid in ks
    }

    def run_query(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        ex = pdf[pdf["excl"] == 1]
        user_exclude = None
        if len(ex):
            user_exclude = np.unique(np.concatenate([
                decode_block(bytes(d), bytes(tv))[0]
                for d, tv in zip(ex["doc_ids_vb"], ex["tfs_vb"])
            ]))
            pdf = pdf[pdf["excl"] == 0]
        term_blocks = {t: g for t, g in pdf.groupby("term")}
        rows = _dispatch_query(
            term_blocks, term_df, ks.get(qid, 10), n_docs, avgdl,
            modes.get(qid, "OR"), phrases.get(qid), n_query_terms.get(qid, 0),
            or_kernel=_wand_one_query if force_wand else _score_one_query,
            slop=slops.get(qid, 0), exclude=user_exclude,
        ) if term_blocks else []
        return pd.DataFrame(
            [{"query_id": qid, "rank": r, "doc_id": d, "score": s} for r, d, s in rows],
            columns=["query_id", "rank", "doc_id", "score"],
        ).astype({"query_id": "int32", "rank": "int32", "doc_id": "int64", "score": "float64"})

    return (
        blocks.groupBy("query_id")
        .applyInPandas(run_query, RESULT_SCHEMA)
        .orderBy("query_id", "rank")
    )


def bm25_distributed(
    spark: SparkSession,
    paths: IndexPaths,
    queries: list[dict],
    n_pbuckets: int = N_PBUCKETS,
    n_tasks: int | None = None,
    range_bits: int = None,
    split_threshold: int = None,
    or_plan: str = "auto",
) -> DataFrame:
    """Partition-parallel BM25 over the compressed blocks — the mega-query
    scale path (round-1 review: WAND runs ONE Python task per query; a
    query whose terms span 10^10 postings needs the cluster, not a core).

    OR plans (``or_plan``: "auto" | "agg" | "fanout"):

    * **fanout** (auto's choice when some query term is hot): the same
      doc_id range-bucket fan-out as AND/PHRASE — hot blocks are rb-pure,
      cold lists broadcast + range-filter, so every doc's score is
      COMPLETE inside its home bucket and each of the 2^range_bits tasks
      returns a local top-k.  The shuffle after the kernel carries at most
      ``2^range_bits * k`` rows per query — O(k), not O(matching docs).
      Unlike conjunctions, an OR match can live in a bucket no hot block
      covers (a cold-only doc), so fanned OR queries add a skeleton row
      per bucket to force every range group to exist.
    * **agg** (auto's choice for all-cold queries, whose candidate sets
      are bounded by ``len(terms) * split_threshold``): pruned block fetch
      -> repartition to ``n_tasks`` -> one Arrow kernel per partition
      decodes its blocks and PARTIALLY AGGREGATES per-(query, doc)
      contributions (map-side combine in the kernel, so the shuffle
      carries one row per distinct doc per partition, never one per
      posting) -> JVM hash-agg sums partials -> bround quantize -> window
      top-k.  This plan's shuffle is O(matching docs) — fine below the
      hot threshold, the reason auto switches above it.

    Both are rank-identical to bm25_bruteforce (same quantize-then-rank
    contract; tested differentially in test_or_fanout.py).

    AND / PHRASE plan (round-3; the round-2 guard is gone): conjunctive
    semantics need every candidate doc's postings for ALL query terms in
    one place, so the unit of parallelism is the doc_id RANGE BUCKET the
    build already salts hot terms by: every block joins to the rb range(s)
    its [min_doc_id, max_doc_id] span (hot-built blocks to exactly one; a
    cold term's few blocks replicate to the ranges they cross), and the
    phrase/AND kernel runs once per (query, rb) over docs in that range
    only — a one-phrase mega-query runs as up to 2^RANGE_BITS kernel
    tasks, then a tiny JVM window merges disjoint per-range top-k's.
    Queries whose terms are ALL cold skip the fan-out (single group): the
    whole candidate set is at most a few thousand postings.  Scores are
    complete per doc inside its range, so results are rank-identical to
    bm25_wand (tested, test_phrase.py)."""
    from horus_ner_spark.session import ensure_package_on_executors

    ensure_package_on_executors(spark)
    if range_bits is None:
        from horus_ner_spark.index.build import RANGE_BITS as range_bits
    if split_threshold is None:
        from horus_ner_spark.index.build import SPLIT_THRESHOLD as split_threshold
    stats = read_corpus_stats(paths)  # driver-side pyarrow: no Spark job
    n_docs, avgdl = int(stats["n_docs"]), float(stats["avgdl"])
    qt_rows = _query_terms(queries)
    if not qt_rows:
        return spark.createDataFrame([], RESULT_SCHEMA)
    ks = {q["query_id"]: q.get("k", 10) for q in queries}
    terms = sorted({r["term"] for r in qt_rows})
    buckets = sorted({term_bucket(t, n_pbuckets) for t in terms})
    term_df = {
        r["term"]: int(r["df"])
        for r in spark.read.parquet(paths.term_stats)
        .filter(F.col("pbucket").isin(buckets))
        .filter(F.col("term").isin(terms))
        .select("term", "df")
        .collect()
    }
    idfs = {t: bm25.idf(n_docs, term_df[t]) for t in term_df}

    for q in queries:  # unknown modes must not fall through to OR scoring
        m = q.get("mode", "OR").upper()
        if m not in ("OR", "AND", "PHRASE", "NEAR"):
            raise ValueError(
                f"unknown query mode {q.get('mode')!r} (query_id "
                f"{q.get('query_id')}); expected OR, AND, PHRASE or NEAR"
            )
        if q.get("exclude") or q.get("exclude_terms"):
            # loud, not silent: a dropped NOT veto would change results
            raise ValueError(
                "bm25_distributed does not support the NOT operator "
                f"(exclude, query_id {q.get('query_id')}); route the query "
                "through bm25_wand or the serve surface"
            )
    if or_plan not in ("auto", "agg", "fanout"):
        raise ValueError(
            f"unknown or_plan {or_plan!r}; expected auto, agg or fanout"
        )
    conj = [q for q in queries if q.get("mode", "OR").upper() != "OR"]
    all_or = [q for q in queries if q.get("mode", "OR").upper() == "OR"]

    def _has_hot(q) -> bool:
        qid = q["query_id"]
        return any(
            term_df.get(r["term"], 0) > split_threshold
            for r in qt_rows
            if r["query_id"] == qid
        )

    if or_plan == "agg":
        fan_or: list[dict] = []
    elif or_plan == "fanout":
        fan_or = all_or
    else:  # auto: hot queries take the O(k)-shuffle fan-out
        fan_or = [q for q in all_or if _has_hot(q)]
    fan_or_ids = {q["query_id"] for q in fan_or}
    or_queries = [q for q in all_or if q["query_id"] not in fan_or_ids]
    parts = []
    if conj or fan_or:
        parts.append(
            _rb_fanout_distributed(
                spark, paths, conj + fan_or, qt_rows, term_df, n_docs,
                avgdl, buckets, range_bits, split_threshold,
            )
        )
    if not or_queries:
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.orderBy("query_id", "rank")

    or_qids = {q["query_id"] for q in or_queries}
    or_rows = [r for r in qt_rows if r["query_id"] in or_qids]
    qt = spark.createDataFrame(or_rows, "query_id int, term string")
    # scan exactly the OR queries' terms: in a mixed batch, a conjunctive
    # query's hot term must not have its whole block set read here only to
    # be dropped by the join below
    or_terms = sorted({r["term"] for r in or_rows})
    or_buckets = sorted({term_bucket(t, n_pbuckets) for t in or_terms})
    blocks = (
        spark.read.parquet(paths.postings)
        .filter(F.col("pbucket").isin(or_buckets))
        .filter(F.col("term").isin(or_terms))
        .join(F.broadcast(qt), "term")
        .select(
            "query_id", "term", "n_postings",
            "doc_ids_vb", "tfs_vb", "doclens_vb",
        )
    )
    n_tasks = n_tasks or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    def partial_scores(batches):
        # per-partition partial aggregation: ONE vectorized decode across
        # the whole Arrow batch (_decode_term_blocks), idf/query labels
        # repeated per posting, one lexsort + reduceat for the map-side
        # combine — no per-block Python
        for pdf in batches:
            if not len(pdf):
                continue
            d, tf, dl, _bs = _decode_term_blocks(pdf)
            nposts = pdf["n_postings"].to_numpy(np.int64)
            idf_rep = np.repeat(
                np.array([idfs[t] for t in pdf["term"]], dtype=np.float64),
                nposts,
            )
            qid_rep = np.repeat(
                pdf["query_id"].to_numpy(np.int32), nposts
            )
            tfn = tf * (bm25.K1 + 1.0) / (
                tf + bm25.K1
                * (1.0 - bm25.B + bm25.B * dl.astype(np.float64) / avgdl)
            )
            contrib = idf_rep * tfn
            order = np.lexsort((d, qid_rep))
            qs_, ds_, cs_ = qid_rep[order], d[order], contrib[order]
            starts = np.concatenate(
                ([0],
                 np.flatnonzero(
                     (qs_[1:] != qs_[:-1]) | (ds_[1:] != ds_[:-1])
                 ) + 1)
            )
            yield pd.DataFrame(
                {
                    "query_id": qs_[starts],
                    "doc_id": ds_[starts],
                    "partial": np.add.reduceat(cs_, starts),
                }
            )

    partials = blocks.repartition(n_tasks).mapInPandas(
        partial_scores, "query_id int, doc_id long, partial double"
    )
    agg = partials.groupBy("query_id", "doc_id").agg(
        F.bround(F.sum("partial"), bm25.QUANT).alias("score")
    )
    ksdf = spark.createDataFrame(
        [(qid, k) for qid, k in ks.items()], "query_id int, k int"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    out = (
        agg.withColumn("rank", F.row_number().over(w))
        .join(F.broadcast(ksdf), "query_id")
        .filter(F.col("rank") <= F.col("k"))
        .select("query_id", "rank", "doc_id", "score")
    )
    for p in parts:
        out = out.unionByName(p)
    return out.orderBy("query_id", "rank")


def _rb_fanout_distributed(
    spark: SparkSession,
    paths: IndexPaths,
    queries: list[dict],
    qt_rows: list[dict],
    term_df: dict[str, int],
    n_docs: int,
    avgdl: float,
    buckets: list[int],
    range_bits: int,
    split_threshold: int,
) -> DataFrame:
    """Distributed AND / PHRASE / NEAR / hot-OR: fan the kernel out over
    doc_id range buckets (see bm25_distributed docstring; positions are
    doc-local, so proximity verification partitions by doc range exactly
    like phrase; OR scores are complete per doc inside its home bucket).
    Returns an un-ordered results frame matching RESULT_SCHEMA."""
    shift = 64 - range_bits
    qids = {q["query_id"] for q in queries}
    ks = {q["query_id"]: q.get("k", 10) for q in queries}
    modes = {q["query_id"]: q.get("mode", "OR").upper() for q in queries}
    _validate_modes(modes, "_rb_fanout_distributed")
    _reject_filters(queries, "_rb_fanout_distributed")
    phrases = {
        q["query_id"]: tokenize(q["query_text"], q.get("lang", "python"))
        for q in queries
        if q.get("mode", "OR").upper() in ("PHRASE", "NEAR")
    }
    slops = {
        q["query_id"]: int(q.get("slop", 8))
        for q in queries
        if q.get("mode", "OR").upper() == "NEAR"
    }
    _validate_slops(slops)
    rows = [r for r in qt_rows if r["query_id"] in qids]
    n_query_terms = {
        qid: len({r["term"] for r in rows if r["query_id"] == qid})
        for qid in qids
    }
    terms = sorted({r["term"] for r in rows})
    # a query fans out only if some term is hot (rb-salted by the build):
    # all-cold conjunctions have at most a few thousand candidate postings
    # and run as ONE group (no doc_range filter)
    fan_out = {
        qid: any(
            term_df.get(r["term"], 0) > split_threshold
            for r in rows
            if r["query_id"] == qid
        )
        for qid in qids
    }
    qt = spark.createDataFrame(rows, "query_id int, term string")
    cols = list(_KERNEL_BLOCK_COLS) + (["pos_vb"] if phrases else [])
    pread = spark.read.parquet(paths.postings)
    cols = _cols_present(cols, pread.columns)
    blocks = (
        pread
        .filter(F.col("pbucket").isin(buckets))
        .filter(F.col("term").isin(terms))
        .join(F.broadcast(qt), "term")
        .select("query_id", *cols)
    )
    fan_qids = sorted(q for q, f in fan_out.items() if f)
    hot_terms = sorted(
        t for t in terms if term_df.get(t, 0) > split_threshold
    )
    # a fan-out query's COLD terms do not ride the shuffle at all: their
    # doc spans cross nearly every range bucket (doc_ids are hash values),
    # so exploding them replicated every cold block ~2^range_bits times
    # (round-3 advice).  Each cold term's postings are bounded by
    # split_threshold, so the whole set collects once and ships to every
    # range task as a Spark broadcast instead.
    qid_cold = {
        qid: sorted(
            {
                r["term"]
                for r in rows
                if r["query_id"] == qid and term_df.get(r["term"], 0) <= split_threshold
            }
        )
        for qid in fan_qids
    }
    cold_fan_terms = sorted({t for ts in qid_cold.values() for t in ts})
    cold_bc = None
    if cold_fan_terms:
        cold_pdf = (
            spark.read.parquet(paths.postings)
            .filter(F.col("pbucket").isin(buckets))
            .filter(F.col("term").isin(cold_fan_terms))
            .select(*cols)
            .toPandas()
        )
        cold_bc = spark.sparkContext.broadcast(
            {t: g for t, g in cold_pdf.groupby("term")}
        )
    if fan_qids:
        # hot-term blocks join to each range bucket their doc span crosses
        # — exactly one for rb-salted hot-built blocks (the build/merge
        # invariant); a rare crossing block replicates only to its own
        # crossed ranges
        spanned = blocks.filter(
            F.col("query_id").isin(fan_qids) & F.col("term").isin(hot_terms)
        ).withColumn(
            "grb",
            F.explode(
                F.sequence(
                    F.shiftright("min_doc_id", shift),
                    F.shiftright("max_doc_id", shift),
                )
            ),
        )
        single = blocks.filter(
            ~F.col("query_id").isin(fan_qids)
        ).withColumn("grb", F.lit(None).cast("long"))
        tagged = spanned.unionByName(single)
        fan_or_qids = sorted(
            q for q in fan_qids if modes.get(q, "AND") == "OR"
        )
        if fan_or_qids:
            # an OR match can live in a bucket no hot block covers (a doc
            # matching only cold terms there); conjunctions cannot (every
            # term is required, so uncovered buckets are provably empty).
            # Force every (query, rb) group to exist with one NULL-term
            # skeleton row per bucket — run_range drops the marker before
            # grouping by term; the broadcast cold lists supply the
            # candidates.  2^range_bits * |queries| rows: negligible.
            # doc_ids are SIGNED xxhash64 values, so the arithmetic-shift
            # bucket ids run [-2^(range_bits-1), 2^(range_bits-1)).
            skel = (
                spark.range(
                    -(1 << (range_bits - 1)), 1 << (range_bits - 1)
                )
                .select(F.col("id").cast("long").alias("grb"))
                .crossJoin(
                    spark.createDataFrame(
                        [(int(q),) for q in fan_or_qids], "query_id int"
                    )
                )
            )
            for f in tagged.schema.fields:
                if f.name not in ("query_id", "grb"):
                    skel = skel.withColumn(f.name, F.lit(None).cast(f.dataType))
            tagged = tagged.unionByName(skel.select(*tagged.columns))
    else:
        tagged = blocks.withColumn("grb", F.lit(None).cast("long"))

    def run_range(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        grb = pdf["grb"].iloc[0]
        doc_range = None
        # NULL-term rows are the fanned-OR skeleton markers (they only
        # force the group to exist); drop them before grouping
        term_blocks = {
            t: g for t, g in pdf[pdf["term"].notna()].groupby("term")
        }
        if grb is not None and not pd.isna(grb):
            lo = int(grb) << shift
            doc_range = (lo, lo + (1 << shift) - 1)
            if cold_bc is not None:
                # the query's cold terms arrive via broadcast, once per
                # executor; the kernel's doc_range filter restricts their
                # candidates to this bucket
                for t in qid_cold.get(qid, ()):
                    g = cold_bc.value.get(t)
                    if g is not None and len(g):
                        term_blocks[t] = g
        rows_ = _dispatch_query(
            term_blocks, term_df, ks.get(qid, 10), n_docs, avgdl,
            modes.get(qid, "AND"), phrases.get(qid),
            n_query_terms.get(qid, 0), doc_range=doc_range,
            slop=slops.get(qid, 0),
        )
        return pd.DataFrame(
            [{"query_id": qid, "rank": r, "doc_id": d, "score": s}
             for r, d, s in rows_],
            columns=["query_id", "rank", "doc_id", "score"],
        ).astype({"query_id": "int32", "rank": "int32", "doc_id": "int64",
                  "score": "float64"})

    partial = tagged.groupBy("query_id", "grb").applyInPandas(
        run_range, RESULT_SCHEMA
    )
    # ranges partition the doc-id space, so per-range results are disjoint
    # and fully scored: global top-k is a plain window merge
    ksdf = spark.createDataFrame(
        [(qid, ks[qid]) for qid in sorted(qids)], "query_id int, k int"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .join(F.broadcast(ksdf), "query_id")
        .filter(F.col("rank") <= F.col("k"))
        .select("query_id", "rank", "doc_id", "score")
    )


def _stale_doc_sets(
    spark: SparkSession, segments: list[IndexPaths]
) -> tuple[dict[int, np.ndarray], int, int]:
    """Per-segment STALE duplicates: docs whose home (oldest-containing)
    segment is earlier in ``segments`` order.  Returns ({seg -> sorted
    doc_ids}, total stale count, total stale doclen).

    One column-pruned job over the per-doc tables (docs for membership —
    it covers zero-token docs too — left-joined to each segment's doclens
    for the stale COPY's token length).  The result is empty in the common
    case: streaming ingest anti-joins re-ingested docs away
    (incremental.py), and compaction removes any that predate it — so the
    exactness machinery costs one small job and collects nothing.  Dup
    copies are assumed content-identical (doc_id is the content key
    hash(repo, path, commit)); under that assumption the corrected stats
    below make multi-segment results BIT-identical to the merged index."""
    if len(segments) < 2:
        return {}, 0, 0
    dl = None
    for i, seg in enumerate(segments):
        docs = spark.read.parquet(seg.docs).select("doc_id")
        lens = spark.read.parquet(seg.doclens).select("doc_id", "doclen")
        d = (
            docs.join(lens, "doc_id", "left")
            .withColumn("doclen", F.coalesce("doclen", F.lit(0)))
            .withColumn("seg", F.lit(i))
        )
        dl = d if dl is None else dl.unionByName(d)
    w = Window.partitionBy("doc_id").orderBy("seg")
    cap = int(os.environ.get("HORUS_MAX_STALE_COLLECT", 2_000_000))
    rows = (
        dl.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > 1)
        .select("seg", "doc_id", "doclen")
        .limit(cap + 1)
        .collect()
    )
    if len(rows) > cap:
        # the stale set is driver-collected because it is empty/tiny in
        # the designed lifecycle (ingest dedupes; compaction removes the
        # rest) — a pathological all-duplicate tier set must fail loudly
        # instead of dragging millions of rows to the driver
        raise RuntimeError(
            f"more than {cap} stale duplicate docs across segments; "
            "compact the tier set first (or raise HORUS_MAX_STALE_COLLECT)"
        )
    by_seg: dict[int, list[int]] = {}
    stale_len = 0
    for r in rows:
        by_seg.setdefault(int(r["seg"]), []).append(int(r["doc_id"]))
        stale_len += int(r["doclen"])
    return (
        {s: np.sort(np.asarray(v, dtype=np.int64)) for s, v in by_seg.items()},
        len(rows),
        stale_len,
    )


def _stale_df_correction(
    spark: SparkSession,
    segments: list[IndexPaths],
    terms: list[str],
    buckets: list[int],
    stale_by_seg: dict[int, np.ndarray],
) -> dict[str, int]:
    """Per-term count of postings belonging to STALE doc copies, summed
    across segments — the amount by which summed per-segment df overstates
    the merged index's df for the query's terms.  Reads only posting
    blocks whose [min_doc_id, max_doc_id] overlaps the (tiny) stale id
    range, pruned by pbucket + term like every query fetch; skipped
    entirely when no segment has stale docs."""
    corr: dict[str, int] = {}
    for si, sd in stale_by_seg.items():
        if not len(sd):
            continue
        lo, hi = int(sd[0]), int(sd[-1])
        rows = (
            spark.read.parquet(segments[si].postings)
            .filter(F.col("pbucket").isin(buckets))
            .filter(F.col("term").isin(terms))
            .filter((F.col("max_doc_id") >= lo) & (F.col("min_doc_id") <= hi))
            .select("term", "doc_ids_vb", "tfs_vb")
            .collect()
        )
        for r in rows:
            d, _tf = decode_block(bytes(r["doc_ids_vb"]), bytes(r["tfs_vb"]))
            c = int(np.count_nonzero(_in_sorted(sd, d)))
            if c:
                corr[r["term"]] = corr.get(r["term"], 0) + c
    return corr


def _segment_global_stats(
    spark: SparkSession, segments: list[IndexPaths], terms: list[str],
    buckets: list[int],
) -> tuple[int, float, dict[str, int], dict[int, np.ndarray]]:
    """Corpus-level (n_docs, avgdl, per-term df) across segments, RECONCILED
    to first-wins duplicate semantics, plus the per-segment stale-doc sets
    for kernel-side exclusion.  With the corrections applied, every stat a
    score depends on equals the fully-merged index's value exactly (round-2
    review item: idf no longer drifts on uncompacted duplicate docs)."""
    n_docs = 0
    total_len = 0
    for seg in segments:
        row = read_corpus_stats(seg)
        n_docs += int(row["n_docs"])
        # exact integer token total, so the summed-global avgdl is
        # bit-identical to the fully-merged index's avgdl
        total_len += int(row["total_len"])
    ts = None
    for seg in segments:
        t = (
            spark.read.parquet(seg.term_stats)
            .filter(F.col("pbucket").isin(buckets))
            .filter(F.col("term").isin(terms))
            .select("term", "df")
        )
        ts = t if ts is None else ts.unionByName(t)
    term_df = {
        r["term"]: int(r["df"])
        for r in ts.groupBy("term").agg(F.sum("df").alias("df")).collect()
    }
    stale_by_seg, n_stale, stale_len = _stale_doc_sets(spark, segments)
    if n_stale:
        n_docs -= n_stale
        total_len -= stale_len
        corr = _stale_df_correction(spark, segments, terms, buckets, stale_by_seg)
        term_df = {t: df - corr.get(t, 0) for t, df in term_df.items()}
    avgdl = float(total_len) / n_docs if n_docs else 0.0
    return n_docs, avgdl, term_df, stale_by_seg


def bm25_wand_segments(
    spark: SparkSession,
    segments: list[IndexPaths],
    queries: list[dict],
    n_pbuckets: int = N_PBUCKETS,
) -> DataFrame:
    """Top-k over a MULTI-SEGMENT index (the log-structured serving layout
    of streaming/incremental.py) — rank-identical to querying the fully
    merged index.

    Execution is per-(query, segment): each segment's postings are scored
    independently with GLOBAL corpus stats (summed n_docs/avgdl/df), so a
    doc's full score is computed inside its home segment; the per-segment
    top-k lists then merge with a JVM-side window (global top-k is a subset
    of the union of per-segment top-k's).  This is also the engine's
    single-query parallelism path: one query over S segments runs as S
    independent kernel tasks plus a tiny merge, instead of one task.

    Per-query ``mode`` (OR/AND/PHRASE/NEAR) works segment-locally too: a
    doc's postings — and hence its positions and its matched-term count —
    live entirely in its home segment."""
    from horus_ner_spark.session import ensure_package_on_executors

    ensure_package_on_executors(spark)
    if not segments:
        return spark.createDataFrame([], RESULT_SCHEMA)
    qt_rows = _query_terms(queries)
    ks = {q["query_id"]: q.get("k", 10) for q in queries}
    modes = {q["query_id"]: q.get("mode", "OR").upper() for q in queries}
    _validate_modes(modes, "bm25_wand_segments")
    _reject_filters(queries, "bm25_wand_segments")
    phrases = {
        q["query_id"]: tokenize(q["query_text"], q.get("lang", "python"))
        for q in queries
        if q.get("mode", "OR").upper() in ("PHRASE", "NEAR")
    }
    slops = {
        q["query_id"]: int(q.get("slop", 8))
        for q in queries
        if q.get("mode", "OR").upper() == "NEAR"
    }
    _validate_slops(slops)
    n_query_terms = {
        qid: len({r["term"] for r in qt_rows if r["query_id"] == qid})
        for qid in ks
    }
    if not qt_rows:
        return spark.createDataFrame([], RESULT_SCHEMA)
    terms = sorted({r["term"] for r in qt_rows})
    buckets = sorted({term_bucket(t, n_pbuckets) for t in terms})
    n_docs, avgdl, term_df, stale_by_seg = _segment_global_stats(
        spark, segments, terms, buckets
    )

    qt = spark.createDataFrame(qt_rows, "query_id int, term string")
    cols = list(_KERNEL_BLOCK_COLS) + (["pos_vb"] if phrases else [])
    for seg in segments:  # drop sub_* metadata unless every segment has it
        cols = _cols_present(cols, spark.read.parquet(seg.postings).columns)
    blocks = None
    for i, seg in enumerate(segments):
        b = (
            spark.read.parquet(seg.postings)
            .filter(F.col("pbucket").isin(buckets))
            .filter(F.col("term").isin(terms))
            .join(F.broadcast(qt), "term")
            .select("query_id", *cols)
            .withColumn("seg", F.lit(i))
        )
        blocks = b if blocks is None else blocks.unionByName(b)

    def run_partial(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        seg = int(pdf["seg"].iloc[0])
        term_blocks = {t: g for t, g in pdf.groupby("term")}
        rows = _dispatch_query(
            term_blocks, term_df, ks.get(qid, 10), n_docs, avgdl,
            modes.get(qid, "OR"), phrases.get(qid), n_query_terms.get(qid, 0),
            exclude=stale_by_seg.get(seg), slop=slops.get(qid, 0),
        )
        return pd.DataFrame(
            [{"query_id": qid, "rank": r, "doc_id": d, "score": s, "seg": seg}
             for r, d, s in rows],
            columns=["query_id", "rank", "doc_id", "score", "seg"],
        ).astype({"query_id": "int32", "rank": "int32", "doc_id": "int64",
                  "score": "float64", "seg": "int32"})

    partial = blocks.groupBy("query_id", "seg").applyInPandas(
        run_partial, RESULT_SCHEMA + ", seg int"
    )
    # A doc re-ingested into a newer segment before compaction is excluded
    # INSIDE the kernel for every non-home segment (``exclude`` above), and
    # n_docs/avgdl/df are reconciled to first-wins in
    # _segment_global_stats — so scores, membership AND borderline top-k
    # cutoffs are exactly those of the compacted index (round-2 review
    # items 1-2).  The window below is defense-in-depth only; with the
    # exclusion it dedupes nothing.
    w_dedup = Window.partitionBy("query_id", "doc_id").orderBy(F.asc("seg"))
    ksdf = spark.createDataFrame(
        [(qid, k) for qid, k in ks.items()], "query_id int, k int"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        partial.withColumn("first_seg", F.row_number().over(w_dedup))
        .filter(F.col("first_seg") == 1)
        .withColumn("rank", F.row_number().over(w))
        .join(F.broadcast(ksdf), "query_id")
        .filter(F.col("rank") <= F.col("k"))
        .select("query_id", "rank", "doc_id", "score")
        .orderBy("query_id", "rank")
    )
