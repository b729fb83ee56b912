"""Single-node pure-Python BM25 oracle — the rank-equality reference engine.

Plays the role the reference's golden experiment outputs play (reference:
data/output/EXP_001/, data/output/experiment_description.txt:1-28): a trusted
independent implementation the distributed engine must match exactly.  It
shares ONLY the tokenizer and the scalar BM25 formula with the Spark engine;
indexing, storage, and top-k are naive dict/heap code with no Spark, no
numpy vectorization, and no compression, so agreement is meaningful.
"""

from __future__ import annotations

import heapq
import math
from collections import Counter, defaultdict

from horus_ner_spark.functions.tokenizer import tokenize
from horus_ner_spark.index import bm25


class OracleIndex:
    """In-memory inverted index over (doc_id, lang, content) rows."""

    def __init__(self) -> None:
        self.postings: dict[str, dict[int, int]] = defaultdict(dict)  # term -> {doc_id: tf}
        self.doclen: dict[int, int] = {}
        self.n_docs = 0
        self.avgdl = 0.0

    @classmethod
    def build(cls, rows) -> "OracleIndex":
        """rows: iterable of (doc_id:int, lang:str, content:str)."""
        ix = cls()
        total_len = 0
        for doc_id, lang, content in rows:
            toks = tokenize(content, lang)
            ix.doclen[doc_id] = len(toks)
            total_len += len(toks)
            for term, tf in Counter(toks).items():
                ix.postings[term][doc_id] = tf
            ix.n_docs += 1
        ix.avgdl = (total_len / ix.n_docs) if ix.n_docs else 0.0
        return ix

    def search(self, query_text: str, lang: str, k: int) -> list[tuple[int, float]]:
        """Top-k (doc_id, score), rank order (score desc, doc_id asc),
        scores quantized per the shared determinism contract."""
        terms = sorted(set(tokenize(query_text, lang)))
        contribs: dict[int, list[float]] = defaultdict(list)
        for term in terms:  # sorted-term order: shared determinism contract
            plist = self.postings.get(term)
            if not plist:
                continue
            df = len(plist)
            t_idf = bm25.idf(self.n_docs, df)
            for doc_id, tf in plist.items():
                contribs[doc_id].append(
                    t_idf * bm25.tf_norm(tf, self.doclen[doc_id], self.avgdl)
                )
        ranked = heapq.nsmallest(
            k,
            ((-bm25.quantize(math.fsum(c)), d) for d, c in contribs.items()),
        )
        return [(d, -negs) for negs, d in ranked]
