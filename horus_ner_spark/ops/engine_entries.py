"""Driver entries that exercise the REAL engine (SPIMI build + compressed
postings + block-max WAND) over the driver's ``documents`` table, with a
full-BM25 DuckDB oracle.

The documents table is mapped onto the corpus schema
(repo,path,commit,lang,content) with its existing doc_id kept.  The lang is
forced to 'en' (not a programming language) so the code tokenizer applies no
stoplist; on this clean lowercase text the code tokenizer reduces exactly to
"lowercase [a-z0-9]+ runs, len in [2,64]", which the SQL oracle mirrors —
the equivalence is separately asserted in tests/test_ops_catalog.py.

The built index is cached per (sf_dir) under /tmp so the driver's repeated
queries() calls don't rebuild.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from horus_ner_spark.index.build import IndexPaths, build_index
from horus_ner_spark.index.query import bm25_bruteforce, bm25_wand

# Fixed query set over the documents vocabulary (FIXTURES.md §2 shape).
DOC_ENGINE_QUERIES = [
    {"query_id": 1, "query_text": "table scan", "lang": "en", "k": 10},
    {"query_id": 2, "query_text": "merge join batch", "lang": "en", "k": 10},
    {"query_id": 3, "query_text": "vector", "lang": "en", "k": 10},
    {"query_id": 4, "query_text": "sparkColumnWindow", "lang": "en", "k": 10},  # camel split
    {"query_id": 5, "query_text": "nosuchtermanywhere", "lang": "en", "k": 10},  # empty
]


def _docs_as_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.col("source").alias("repo"),
        F.col("doc_id").cast("string").alias("path"),
        F.md5("text").alias("commit"),
        F.lit("en").alias("lang"),
        F.col("text").alias("content"),
    )


def _doc_index(spark: SparkSession, sf_dir: str) -> IndexPaths:
    key = hashlib.sha256(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    root = f"/tmp/horus_doc_index_{key}"
    os.makedirs(root, exist_ok=True)
    corpus_path = f"{root}/corpus.parquet"
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        _docs_as_corpus(spark, sf_dir).write.mode("overwrite").parquet(corpus_path)
    # build_index is manifest-gated: a warm call is a no-op
    return build_index(spark, corpus_path, f"{root}/ix")


def engine_bm25_wand_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-max WAND over the compressed index built from documents."""
    paths = _doc_index(spark, sf_dir)
    return bm25_wand(spark, paths, DOC_ENGINE_QUERIES)


def engine_bm25_brute_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame brute-force BM25 over the same index tables."""
    paths = _doc_index(spark, sf_dir)
    return bm25_bruteforce(spark, paths, DOC_ENGINE_QUERIES)


def bm25_or_fanout_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-mode BM25 through the doc-id range-bucket fan-out plan
    (``or_plan='fanout'``): every bucket computes complete per-doc scores
    and returns a local top-k, so the merge shuffle carries O(2^range_bits
    * k) rows instead of one row per matching doc.  Forced here (the auto
    plan only fans hot terms, and sf0.01 has none) so the driver's oracle
    gate covers the fan-out kernel itself — skeleton rows, cold-list
    broadcast, per-bucket WAND — not just the agg plan."""
    from horus_ner_spark.index.query import bm25_distributed

    paths = _doc_index(spark, sf_dir)
    return bm25_distributed(spark, paths, DOC_ENGINE_QUERIES, or_plan="fanout")


# Phrase retrieval over the positional index.  Phrase adjacency is defined
# on the KEPT token sequence (tokens surviving the length/stoplist gate) —
# exactly what the oracle's normalized-token-string LIKE reproduces.
PHRASE_QUERIES = [
    {"query_id": 1, "query_text": "merge join", "lang": "en", "k": 10,
     "mode": "PHRASE"},
    {"query_id": 2, "query_text": "table scan", "lang": "en", "k": 10,
     "mode": "PHRASE"},
    {"query_id": 3, "query_text": "merge nosuchterm", "lang": "en", "k": 10,
     "mode": "PHRASE"},  # OOV term -> empty
]


def bm25_phrase_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase top-k via the positional postings (pos_vb streams)."""
    paths = _doc_index(spark, sf_dir)
    return bm25_wand(spark, paths, PHRASE_QUERIES)


def _tokenize_sql_literal(text: str) -> list[str]:
    """Mirror of the code tokenizer for the fixed (ASCII, known) queries —
    used only to inline query terms into the oracle SQL."""
    from horus_ner_spark.functions.tokenizer import tokenize

    return sorted(set(tokenize(text, "en")))


def _engine_oracle_sql() -> str:
    """Full BM25 over documents in DuckDB, rank-identical contract:
    scores rounded to 6 dp then ranked (score desc, doc_id asc)."""
    qvals = []
    for q in DOC_ENGINE_QUERIES:
        for t in _tokenize_sql_literal(q["query_text"]):
            qvals.append(f"({q['query_id']}, '{t}')")
    values = ", ".join(qvals)
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                            x -> length(x) >= 2 AND length(x) <= 64)) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS doclen FROM toks GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT CAST(coalesce(sum(doclen), 0) AS DOUBLE)
                 / (SELECT count(*) FROM documents) FROM dl) AS avgdl
),
dfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
qt(query_id, term) AS (VALUES {values}),
scored AS (
  SELECT qt.query_id, tf.doc_id,
         ln(1.0 + (stats.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
         * (tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doclen / stats.avgdl)))
         AS contrib
  FROM tf JOIN qt USING (term) JOIN dfs USING (term) JOIN dl USING (doc_id), stats
),
agg AS (
  SELECT query_id, doc_id, round(sum(contrib), 6) AS score
  FROM scored GROUP BY query_id, doc_id
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank
  FROM agg
)
SELECT CAST(query_id AS INT) AS query_id, CAST(rank AS INT) AS rank, doc_id, score
FROM ranked WHERE rank <= 10
"""


ENGINE_ORACLE_SQL = _engine_oracle_sql()


def _phrase_oracle_sql() -> str:
    """Phrase top-k in DuckDB: candidate docs via contiguous-token LIKE on
    the normalized (kept-token) string — tokens cannot contain spaces, so
    ``' '||join(toks,' ')||' ' LIKE '% merge join %'`` is an exact phrase
    test — then full BM25 over the phrase's distinct terms, quantized and
    ranked under the shared contract."""
    parts = []
    for q in PHRASE_QUERIES:
        toks = _tokenize_sql_literal(q["query_text"])  # sorted distinct
        ordered = [
            t.lower() for t in q["query_text"].split()
        ]  # ASCII fixture queries: split == tokenize order
        phrase = " ".join(ordered)
        terms = ", ".join(f"'{t}'" for t in toks)
        parts.append(f"""
SELECT {q['query_id']} AS query_id, rank, doc_id, score FROM (
  SELECT doc_id, round(sum(contrib), 6) AS score,
         row_number() OVER (ORDER BY round(sum(contrib), 6) DESC, doc_id ASC) AS rank
  FROM (
    SELECT tf.doc_id,
           ln(1.0 + (stats.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
           * (tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doclen / stats.avgdl)))
           AS contrib
    FROM tf JOIN dfs USING (term) JOIN dl USING (doc_id), stats
    WHERE tf.term IN ({terms})
      AND tf.doc_id IN (SELECT doc_id FROM phrase_docs
                        WHERE tokstr LIKE '% {phrase} %')
  ) GROUP BY doc_id
) WHERE rank <= {q['k']}""")
    union = "\nUNION ALL\n".join(parts)
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                            x -> length(x) >= 2 AND length(x) <= 64)) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS doclen FROM toks GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT CAST(coalesce(sum(doclen), 0) AS DOUBLE)
                 / (SELECT count(*) FROM documents) FROM dl) AS avgdl
),
dfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
phrase_docs AS (
  SELECT doc_id,
         ' ' || array_to_string(
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> length(x) >= 2 AND length(x) <= 64), ' ') || ' '
         AS tokstr
  FROM documents
)
SELECT CAST(query_id AS INT) AS query_id, CAST(rank AS INT) AS rank, doc_id, score
FROM ({union})
"""


PHRASE_ORACLE_SQL = _phrase_oracle_sql()


# Proximity retrieval (NEAR): every distinct query term within a token
# window of span <= slop over the KEPT token positions, any order.
NEAR_QUERIES = [
    {"query_id": 1, "query_text": "merge join", "lang": "en", "k": 10,
     "mode": "NEAR", "slop": 3},
    {"query_id": 2, "query_text": "table scan batch", "lang": "en", "k": 10,
     "mode": "NEAR", "slop": 8},
    {"query_id": 3, "query_text": "merge nosuchterm", "lang": "en", "k": 10,
     "mode": "NEAR", "slop": 4},  # OOV term -> empty
]


def bm25_near_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proximity top-k via the positional postings (NEAR mode)."""
    paths = _doc_index(spark, sf_dir)
    return bm25_wand(spark, paths, NEAR_QUERIES)


def _near_oracle_sql() -> str:
    """NEAR top-k in DuckDB: per-doc kept-token positions via zipped
    unnest, candidate docs via an m-way self-join requiring one position
    per distinct term with greatest-least <= slop (exactly the kernel's
    "some window of span <= slop covers every term"), then full BM25 over
    the distinct terms under the shared quantize-then-rank contract."""
    parts = []
    for q in NEAR_QUERIES:
        toks = _tokenize_sql_literal(q["query_text"])  # sorted distinct
        terms = ", ".join(f"'{t}'" for t in toks)
        joins = "pos p0" + "".join(
            f" JOIN pos p{i} USING (doc_id)" for i in range(1, len(toks))
        )
        conds = " AND ".join(
            f"p{i}.term = '{t}'" for i, t in enumerate(toks)
        )
        ords = ", ".join(f"p{i}.ord" for i in range(len(toks)))
        span = (
            f"greatest({ords}) - least({ords})" if len(toks) > 1 else "0"
        )
        parts.append(f"""
SELECT {q['query_id']} AS query_id, rank, doc_id, score FROM (
  SELECT doc_id, round(sum(contrib), 6) AS score,
         row_number() OVER (ORDER BY round(sum(contrib), 6) DESC, doc_id ASC) AS rank
  FROM (
    SELECT tf.doc_id,
           ln(1.0 + (stats.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
           * (tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doclen / stats.avgdl)))
           AS contrib
    FROM tf JOIN dfs USING (term) JOIN dl USING (doc_id), stats
    WHERE tf.term IN ({terms})
      AND tf.doc_id IN (SELECT DISTINCT p0.doc_id FROM {joins}
                        WHERE {conds} AND {span} <= {q['slop']})
  ) GROUP BY doc_id
) WHERE rank <= {q['k']}""")
    union = "\nUNION ALL\n".join(parts)
    return f"""
WITH kept AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> length(x) >= 2 AND length(x) <= 64) AS toks
  FROM documents
),
toks AS (SELECT doc_id, unnest(toks) AS term FROM kept),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS doclen FROM toks GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT CAST(coalesce(sum(doclen), 0) AS DOUBLE)
                 / (SELECT count(*) FROM documents) FROM dl) AS avgdl
),
dfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
pos AS (
  SELECT doc_id, unnest(toks) AS term,
         unnest(range(len(toks))) AS ord
  FROM kept
)
SELECT CAST(query_id AS INT) AS query_id, CAST(rank AS INT) AS rank, doc_id, score
FROM ({union})
"""


NEAR_ORACLE_SQL = _near_oracle_sql()

ENTRIES: dict[str, tuple] = {
    "engine_bm25_wand_docs": (engine_bm25_wand_docs, ENGINE_ORACLE_SQL),
    "bm25_or_fanout_docs": (bm25_or_fanout_docs, ENGINE_ORACLE_SQL),
    "engine_bm25_brute_docs": (engine_bm25_brute_docs, ENGINE_ORACLE_SQL),
    "bm25_phrase_topk_docs": (bm25_phrase_topk_docs, PHRASE_ORACLE_SQL),
    "bm25_near_topk_docs": (bm25_near_topk_docs, NEAR_ORACLE_SQL),
}
