"""BM25 scoring math — one definition shared by every execution path.

Constants per BASELINE.json north_star: k1=1.2, b=0.75.  The reference's
score analog is the per-term class-vote margin over its top-k web documents
(reference: src/core/feature_extraction/features.py:452-471); BM25 replaces
that externally-sourced relevance with a real ranking function.

Determinism contract (BASELINE hard-part (a)):
- all math in float64;
- query terms deduplicated and scored in sorted-term order;
- final scores quantized to 6 decimals (QUANT) BEFORE ranking, then ties
  broken by doc_id ascending — identical rule in the DataFrame brute-force
  path, the block-max WAND kernel, and the pure-Python oracle, so "rank
  identical" is well-defined across float summation orders.

Summation-discipline caveat (documented trade-off): the three kernels sum
per-doc contributions differently — WAND/oracle use ``math.fsum`` +
``round``, the vectorized exhaustive kernel uses ``np.add.reduceat`` +
``np.round``, the JVM paths use Spark/DuckDB partial-agg order + bround.
All operate on the same float64 contributions in sorted-term order, so any
divergence requires a sum landing within 1 ulp of a 6-dp half boundary —
never observed across the rank-equality suite (4-way kernel identity at
every tested scale), and accepted rather than forcing every path through
one scalar summation (which would forbid vectorized and JVM execution).
"""

from __future__ import annotations

import math

K1 = 1.2
B = 0.75
QUANT = 6  # decimal places scores are quantized to before ranking


def idf(n_docs: int, df: int) -> float:
    """Robertson-Sparck-Jones idf with the +1 floor (Lucene-style, always
    positive): ln(1 + (N - df + 0.5) / (df + 0.5))."""
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def tf_norm(tf: float, doclen: float, avgdl: float) -> float:
    return tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * doclen / avgdl))


def score_term(tf: float, df: int, doclen: float, n_docs: int, avgdl: float) -> float:
    return idf(n_docs, df) * tf_norm(tf, doclen, avgdl)


def quantize(score: float) -> float:
    return round(score, QUANT)
