"""Banded MinHash-LSH quality gate: on a corpus with planted near-dups the
candidate set must recover >= 0.9 of all pairs with exact Jaccard >= 0.8
(128 perms, 32 bands x 4 rows: P(candidate | j=0.8) ~ 0.9997)."""

import itertools
import random

from pyspark.sql import functions as F

from horus_ner_spark.ops.catalog_text import banded_lsh_pairs_df

_WORDS = [f"w{i}" for i in range(2000)]


def _mk_corpus():
    """40 base docs of 120 words; each base gets a near-dup with 2% token
    edits (expected shingle Jaccard ~ 0.85) and a far copy with 40% edits
    (~ 0.2) — seeded, deterministic."""
    rng = random.Random(42)
    docs = {}
    for b in range(40):
        base = [rng.choice(_WORDS) for _ in range(120)]
        docs[b * 10] = base
        near = list(base)
        for _ in range(2):
            near[rng.randrange(len(near))] = rng.choice(_WORDS)
        docs[b * 10 + 1] = near
        far = list(base)
        for _ in range(48):
            far[rng.randrange(len(far))] = rng.choice(_WORDS)
        docs[b * 10 + 2] = far
    return docs


def _shingles(tokens):
    return {
        " ".join(tokens[i : i + 3]) for i in range(len(tokens) - 2)
    }


def test_banded_lsh_recall(spark):
    docs = _mk_corpus()
    sh = {d: _shingles(t) for d, t in docs.items()}
    truth = set()
    jaccards = {}
    for a, b in itertools.combinations(sorted(docs), 2):
        inter = len(sh[a] & sh[b])
        if not inter:
            continue
        j = inter / len(sh[a] | sh[b])
        jaccards[(a, b)] = j
        if j >= 0.8:
            truth.add((a, b))
    assert len(truth) >= 30  # the planted near-dups really are >= 0.8

    rows = [(d, s) for d, ss in sh.items() for s in ss]
    sdf = spark.createDataFrame(rows, "doc_id long, shingle string")
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in banded_lsh_pairs_df(sdf).collect()
    }
    recall = len(cand & truth) / len(truth)
    assert recall >= 0.9, f"recall {recall:.3f} over {len(truth)} true pairs"

    # selectivity: the far copies (~0.2 jaccard) mostly do NOT become
    # candidates — the point of banding vs the size-1-band toy
    low = {p for p, j in jaccards.items() if j <= 0.3}
    if low:
        fp = len(cand & low) / len(low)
        assert fp <= 0.2, f"low-sim candidate rate {fp:.3f}"
