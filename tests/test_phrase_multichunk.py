"""Score-ordered LAZY phrase/NEAR verification (round 4, query.py
_phrase_one_query): the multi-chunk early-stop path needs > 1024
candidates to even fire, which no mini-corpus test reaches.  Adversarial
shape: the HIGHEST-scored candidates all FAIL verification (high-tf docs
without the adjacency), so chunk 1 cannot fill top-k and the scan must
continue into later chunks — then matched docs with near-flat scores keep
the early-stop bound tight.  Results must equal the naive oracle exactly
(scores bit-identical under the shared quantize contract)."""

import math
import random

import pandas as pd

from horus_ner_spark.functions.tokenizer import tokenize
from horus_ner_spark.index import bm25
from horus_ner_spark.index.build import with_doc_id
from horus_ner_spark.index.serve import IndexServer
from horus_ner_spark.index.smallseg import build_index_small


def _mk_corpus(seed: int) -> pd.DataFrame:
    rng = random.Random(seed)
    rows = []
    # 1,800 true matches: "alpha beta" adjacency, varied doclen/tf
    for i in range(1800):
        filler = " ".join(f"w{rng.randint(0, 400)}" for _ in range(rng.randint(2, 30)))
        body = "alpha beta " + filler
        if rng.random() < 0.3:
            body += " alpha beta"  # tf variety
        rows.append(("r", f"m{i}", "c", "en", body))
    # 900 high-scoring near-misses: both terms, high tf, short doclen,
    # NO adjacency -> they dominate the first score-ordered chunk and all
    # fail PHRASE verification
    for i in range(900):
        rows.append(
            ("r", f"x{i}", "c", "en",
             "alpha alpha alpha qq beta " + " ".join(["beta"] * rng.randint(1, 3)))
        )
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


def _naive(corpus: pd.DataFrame, phrase: str, k: int, slop: int = 0):
    toks = {
        int(r["doc_id"]): tokenize(r["content"], "en")
        for _, r in corpus.iterrows()
    }
    n_docs = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n_docs
    q = tokenize(phrase, "en")
    distinct = sorted(set(q))
    dfs = {t: sum(1 for ts in toks.values() if t in set(ts)) for t in distinct}
    scored = []
    for doc_id, ts in toks.items():
        if slop == 0:
            hit = any(
                ts[i:i + len(q)] == q for i in range(len(ts) - len(q) + 1)
            )
        else:  # NEAR: every distinct term within some window of span<=slop
            idx = {t: [i for i, x in enumerate(ts) if x == t] for t in distinct}
            hit = all(idx[t] for t in distinct) and any(
                all(any(s <= i <= s + slop for i in idx[t]) for t in distinct)
                for s in range(len(ts))
            )
        if not hit:
            continue
        contribs = [
            bm25.idf(n_docs, dfs[t]) * bm25.tf_norm(ts.count(t), len(ts), avgdl)
            for t in distinct
        ]
        scored.append((bm25.quantize(math.fsum(contribs)), doc_id))
    scored.sort(key=lambda e: (-e[0], e[1]))
    return [(d, s) for s, d in scored[:k]]


def test_phrase_multichunk_early_stop_matches_naive(spark, tmp_path):
    for seed in (5, 6):
        pdf = _mk_corpus(seed)
        cp = str(tmp_path / f"c{seed}.parquet")
        pdf.to_parquet(cp, index=False)
        paths = build_index_small(spark, cp, str(tmp_path / f"ix{seed}"))
        corpus = with_doc_id(spark.read.parquet(cp)).toPandas()
        srv = IndexServer(paths.root)
        for k in (10, 100):
            # NOTE: iterrows() would coerce int64 doc_ids to float64 and
            # destroy their low bits — read columns directly
            df = srv.search("alpha beta", "en", k=k, mode="PHRASE")
            got = list(zip(df["doc_id"].tolist(), df["score"].tolist()))
            assert got == _naive(corpus, "alpha beta", k), (seed, k)
        # NEAR slop=4: the near-miss docs match too (window spans the qq)
        df = srv.search("alpha beta", "en", k=25, mode="NEAR", slop=4)
        got = list(zip(df["doc_id"].tolist(), df["score"].tolist()))
        assert got == _naive(corpus, "alpha beta", 25, slop=4), seed
