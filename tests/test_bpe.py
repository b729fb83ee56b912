"""Real BPE token counting (functions/bpe.py + token_count_bpe entry):
learner determinism, apply-loop semantics, and Python-vs-DuckDB parity of
the recursive-CTE oracle on the committed merges fixture."""

import duckdb

from horus_ner_spark.functions.bpe import (
    apply_bpe_count,
    learn_bpe,
    load_ranks,
    merges_fixture_path,
)

_BPE_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def test_learn_bpe_classic_example():
    # Sennrich's canonical example: low/lower/newest/widest
    wf = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = learn_bpe(wf, 4)
    # most frequent first pair is (e, s): 6 + 3 = 9
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")  # 9 again after the first merge
    # deterministic: same input -> same merges
    assert merges == learn_bpe(wf, 4)


def test_apply_lowest_rank_leftmost():
    ranks = {("a", "b"): 0, ("ab", "c"): 1, ("c", "d"): 2}
    # abcd: merge ab (rank 0) -> ab c d; merge ab+c (rank 1) -> abc d;
    # cd never forms because c was consumed -> 2 tokens
    assert apply_bpe_count("abcd", ranks) == 2
    # ababab: leftmost-first: ab ab ab -> 3 tokens
    assert apply_bpe_count("ababab", ranks) == 3
    assert apply_bpe_count("x", ranks) == 1
    assert apply_bpe_count("zzz", ranks) == 3  # nothing mergeable


def test_fixture_loads_and_counts_positive():
    ranks = load_ranks()
    assert len(ranks) > 0
    assert all(isinstance(r, int) for r in ranks.values())
    assert apply_bpe_count("customer", ranks) >= 1


def test_oracle_cte_matches_python_on_fixture_vocab():
    """The exact recursive CTE embedded in TOKEN_COUNT_BPE_SQL, run over
    every distinct word at sf0.001, must agree with apply_bpe_count —
    this is the contract the driver's value-hash gate rests on."""
    mp = merges_fixture_path()
    sql = f"""
    WITH RECURSIVE
    merges AS (
      SELECT rank, left_tok || chr(1) || right_tok AS pair
      FROM read_csv('{mp}', header=true,
                    columns={{'rank':'INT','left_tok':'VARCHAR','right_tok':'VARCHAR'}})
    ),
    words AS (
      SELECT DISTINCT word FROM (
        SELECT unnest(regexp_extract_all(text, '{_BPE_RE}')) AS word
        FROM '/root/testdata/sf0.001/documents.parquet'
      )
    ),
    bpe AS (
      SELECT word, regexp_extract_all(word, '.') AS t FROM words
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
    )
    SELECT word, min(len(t)) AS n_tok FROM bpe GROUP BY word
    """
    got = dict(duckdb.sql(sql).fetchall())
    ranks = load_ranks()
    assert len(got) > 0
    for w, n in got.items():
        assert n == apply_bpe_count(w, ranks), w


def test_entry_real_column_parity(spark):
    """token_count_bpe's real_bpe_tokens equals a driver-side recompute
    (word counts x apply_bpe_count) for every doc at sf0.001."""
    from collections import Counter
    import re

    from horus_ner_spark.ops.catalog_text import token_count_bpe

    rows = token_count_bpe(spark, "/root/testdata/sf0.001").collect()
    texts = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).collect()
    }
    ranks = load_ranks()
    pat = re.compile(_BPE_RE)
    memo = {}
    for r in rows:
        wc = Counter(pat.findall(texts[r["doc_id"]]))
        want = sum(
            c * memo.setdefault(w, apply_bpe_count(w, ranks))
            for w, c in wc.items()
        )
        assert r["real_bpe_tokens"] == want, r["doc_id"]
        assert r["real_bpe_tokens"] >= r["ws_tokens"]  # merges never cross words
