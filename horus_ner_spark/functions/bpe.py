"""Real byte-pair-encoding token counting (round-4 VERDICT item 7).

The regex column in ``token_count_bpe`` is a *pre-tokenizer proxy* — good
for rough budgeting, but it has no merges table, so its counts drift from
what an actual BPE tokenizer would bill.  This module supplies the real
thing with the standard production split:

* **learn_bpe** — the classic word-frequency BPE learner (Sennrich et al.
  2016, "Neural Machine Translation of Rare Words with Subword Units"):
  repeatedly count adjacent symbol pairs over the *vocabulary* (word ->
  freq map, NOT the corpus) and merge the most frequent pair everywhere.
  Deterministic: ties break lexicographically.  Run once, offline; the
  merges list is a static model artifact (exactly like GPT-2's
  ``merges.txt``), committed at ``horus_ner_spark/fixtures/bpe_merges.csv``.
* **apply_bpe_count** — the application loop used by HF-style tokenizers:
  while any adjacent pair is in the merges table, merge the LOWEST-RANK
  pair at its LEFTMOST occurrence, one merge per step.  One-at-a-time
  with a (rank, position) priority is the published algorithm and — key
  for the correctness gate — is exactly expressible as a DuckDB recursive
  CTE, so the driver value-hashes real BPE counts against an independent
  SQL implementation.

Scale shape (100 TB): the Python merge loop runs over the DISTINCT-WORD
vocabulary only (|vocab| << corpus; Heaps' law), inside one Arrow-batched
pandas UDF with a word-level memo; the corpus-side work is all JVM —
regex pre-tokenize, explode, hash-agg word counts, broadcast join of the
(word -> n_tokens) map, sum.  No per-document Python.
"""

from __future__ import annotations

import csv
import os
from functools import lru_cache

_FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "bpe_merges.csv",
)


def learn_bpe(word_freqs: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    """Sennrich-style BPE training over a word-frequency table.

    Each step counts adjacent symbol pairs weighted by word frequency,
    merges the most frequent pair (lexicographic tie-break) in every
    word simultaneously, and records it.  Stops early when no pair
    repeats (max count < 2) — merges of hapax pairs carry no signal.
    """
    vocab = {tuple(w): f for w, f in word_freqs.items() if len(w) > 1}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for sym, f in vocab.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (l, r), _n = best
        merges.append((l, r))
        merged = l + r
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, f in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == l and sym[i + 1] == r:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            if len(t) > 1:
                new_vocab[t] = new_vocab.get(t, 0) + f
        vocab = new_vocab
        if not vocab:
            break
    return merges


def write_merges(merges: list[tuple[str, str]], path: str = _FIXTURE) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["rank", "left_tok", "right_tok"])
        for rank, (l, r) in enumerate(merges):
            w.writerow([rank, l, r])


@lru_cache(maxsize=1)
def load_ranks(path: str = _FIXTURE) -> dict[tuple[str, str], int]:
    with open(path, newline="") as f:
        rd = csv.DictReader(f)
        return {
            (row["left_tok"], row["right_tok"]): int(row["rank"])
            for row in rd
        }


def apply_bpe_count(word: str, ranks: dict[tuple[str, str], int]) -> int:
    """Token count after applying merges lowest-rank-first, leftmost
    occurrence, ONE merge per step (HF tokenizers' priority order; the
    contract the DuckDB oracle CTE replicates step for step)."""
    t = list(word)
    while len(t) > 1:
        best_rank, best_i = None, None
        for i in range(len(t) - 1):
            r = ranks.get((t[i], t[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        t[best_i : best_i + 2] = [t[best_i] + t[best_i + 1]]
    return len(t)


def merges_fixture_path() -> str:
    return _FIXTURE
