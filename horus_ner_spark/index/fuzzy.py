"""Fuzzy (edit-distance ≤ 1) term expansion via a delete-1 key sidecar.

The reference's annotate surface takes freeform user text and tolerates
nothing — one typo in an entity and the Bing fallback is the only net
(reference: webservice/rest.py:47-61, src/core/util/search_engines.py).
A from-scratch engine wants typo tolerance as an INDEX feature, and the
obvious implementations don't scale:

- scanning the dictionary with a per-term edit-distance predicate is
  O(vocabulary) per query token — at 10^12 files the term dictionary is
  itself a large distributed table, and a fuzzy query must not read it
  end to end;
- Lucene's answer (Levenshtein automaton ∩ term FST) needs an FST the
  parquet dictionary deliberately doesn't have.

This module uses the symmetric-delete scheme (public SymSpell idea):
two strings u, v with edit distance ≤ 1 ALWAYS share a member of
``{u} ∪ del1(u)`` and ``{v} ∪ del1(v)`` (substitution: delete the
differing position from both; insertion/deletion: the shorter string is
itself a delete of the longer; equality: the strings themselves).  So a
**(del_key, term, df)** sidecar keyed by every term's delete-1 variants
turns fuzzy lookup into an exact-key fetch:

- build: ONE Spark job over term_stats — the delete variants are
  generated JVM-side (``transform(sequence(...))`` + ``substring``, no
  Python in the loop), exploded, and written hive-partitioned by
  ``fb = pmod(crc32(del_key), N)`` and del_key-sorted within partitions,
  the exact layout the postings/term_stats tables use, so a lookup
  prunes to matching partitions + row groups.  Size is
  O(Σ (len(term)+1)) rows — a constant small multiple of the
  dictionary, independent of corpus size.
- query: a token of length L yields ≤ L+2 keys; the candidate set is
  every term sharing one (a few dozen in practice), and the shared-key
  test admits false positives (e.g. "ab"/"ba" share "a" at distance 2),
  so each candidate is VERIFIED with an exact edit-distance-≤ 1 check
  before it may expand.  The serving path reads only the pruned sidecar
  slice; the Spark batch path broadcasts the key set into a join.

The sidecar is a derived artifact of term_stats: its manifest stores a
fingerprint of term_stats' data-file listing (the same primitive the
build manifest uses — catalog.list_data_files), and every reader
refuses a stale sidecar loudly rather than silently expanding against
an old dictionary.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from horus_ner_spark import catalog
from horus_ner_spark.functions.bucketing import term_bucket, term_bucket_col
from horus_ner_spark.functions.tokenizer import tokenize
from horus_ner_spark.index.build import N_PBUCKETS, IndexPaths

FUZZY_MAX_EXPANSIONS = 32  # same Lucene-style cap as prefix expansion
FUZZY_MIN_LEN = 3  # shorter tokens match half the alphabet — refuse loudly

_META_NAME = "fuzzy_meta.json"


def fuzzy_dir(paths: IndexPaths) -> str:
    return os.path.join(paths.root, "fuzzy.parquet")


def _meta_path(paths: IndexPaths) -> str:
    return os.path.join(paths.root, _META_NAME)


def term_stats_fingerprint(paths: IndexPaths) -> str:
    """Fingerprint of the dictionary the sidecar was derived from: sha256
    of the term_stats data-file listing (names + sizes, metadata-only —
    no data read)."""
    files = catalog.list_data_files(paths.term_stats, suffix=".parquet")
    return hashlib.sha256(
        json.dumps(files, sort_keys=True).encode()
    ).hexdigest()


def delete1_keys(token: str) -> list[str]:
    """``{token} ∪ del1(token)`` in deterministic order, deduped (deleting
    either char of a double letter yields the same variant once)."""
    seen = {token}
    out = [token]
    for i in range(len(token)):
        v = token[:i] + token[i + 1:]
        if v not in seen:
            seen.add(v)
            out.append(v)
    return out


def ed_le_1(a: str, b: str) -> bool:
    """Exact edit-distance ≤ 1 (O(len) two-pointer walk, no DP table)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) <= 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0  # a is the shorter: allow one skip in b
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def build_fuzzy_sidecar(
    spark: SparkSession, paths: IndexPaths, n_pbuckets: int = N_PBUCKETS
) -> None:
    """(Re)build the delete-1 sidecar from the CURRENT term_stats.

    One narrow Spark job: dictionary scan → JVM-side variant explode →
    one shuffle on the key bucket → sorted hive-partitioned write.  The
    manifest (term_stats fingerprint) is written last, so a killed build
    leaves a sidecar every reader rejects as stale instead of a
    half-written one it trusts."""
    fp = term_stats_fingerprint(paths)
    ts = catalog.read_table(spark, paths.term_stats).select("term", "df")
    keys = ts.select(
        F.explode(
            F.array_union(
                F.array(F.col("term")),
                F.expr(
                    "transform(sequence(1, length(term)),"
                    " i -> concat(substring(term, 1, i - 1),"
                    "             substring(term, i + 1, length(term))))"
                ),
            )
        ).alias("del_key"),
        "term",
        "df",
    )
    out = (
        keys.withColumn("fb", term_bucket_col("del_key", n_pbuckets))
        .repartition(n_pbuckets, "fb")
        .sortWithinPartitions("del_key", "term")
    )
    catalog.write_table(out, fuzzy_dir(paths), partition_by=("fb",))
    fs, p = catalog.filesystem(_meta_path(paths))
    with fs.open_output_stream(p) as f:
        f.write(json.dumps(
            {"term_stats_fingerprint": fp, "n_pbuckets": n_pbuckets}
        ).encode())


def read_fuzzy_meta(paths: IndexPaths) -> dict:
    """Sidecar manifest, or a loud error telling the operator what to run."""
    fs, p = catalog.filesystem(_meta_path(paths))
    try:
        with fs.open_input_stream(p) as f:
            return json.loads(f.read().decode())
    except (FileNotFoundError, OSError) as e:
        raise FileNotFoundError(
            f"no fuzzy sidecar at {paths.root}: fuzzy (~) queries need "
            "build_fuzzy_sidecar(spark, paths) run once after each index "
            "build/merge"
        ) from e


def check_fuzzy_fresh(paths: IndexPaths) -> None:
    """Raise if the sidecar predates the current term_stats — expanding
    against a stale dictionary would silently miss or invent terms."""
    meta = read_fuzzy_meta(paths)
    cur = term_stats_fingerprint(paths)
    if meta.get("term_stats_fingerprint") != cur:
        raise RuntimeError(
            f"fuzzy sidecar at {paths.root} is STALE (term_stats changed "
            "since it was built) — re-run build_fuzzy_sidecar"
        )


def fuzzy_is_stale(paths: IndexPaths) -> bool | None:
    """None = no sidecar; True/False = present and stale/fresh.  The
    fsck metadata tier uses this (a stale derived artifact is an index
    integrity violation, not just a query-time inconvenience)."""
    try:
        meta = read_fuzzy_meta(paths)
    except FileNotFoundError:
        return None
    return meta.get("term_stats_fingerprint") != term_stats_fingerprint(paths)


def normalize_fuzzy_stem(stem: str, lang: str) -> str:
    """A fuzzy stem must normalize (same tokenizer as the index) to ONE
    sub-token of usable length — multi-token stems and stubs are loud
    errors, exactly like prefix stems."""
    toks = tokenize(stem, lang)
    if len(toks) != 1:
        raise ValueError(
            f"fuzzy stem {stem!r} normalizes to {len(toks)} index "
            f"sub-tokens {toks}; fuzzy queries match single dictionary "
            "terms — query one sub-token"
        )
    t = toks[0]
    if len(t) < FUZZY_MIN_LEN:
        raise ValueError(
            f"fuzzy stem {t!r} shorter than {FUZZY_MIN_LEN} chars would "
            "match a large fraction of the short-term dictionary"
        )
    return t


def rank_expansions(
    token: str, cand_df: dict[str, int], max_expansions: int
) -> tuple[list[str], bool]:
    """Verify + rank candidates -> (terms, truncated).  Order: exact
    match first, then by df desc, term asc — deterministic, Lucene-ish
    (closer/commoner terms keep the budget)."""
    verified = {t: d for t, d in cand_df.items() if ed_le_1(token, t)}
    ranked = sorted(
        verified.items(),
        key=lambda kv: (kv[0] != token, -kv[1], kv[0]),
    )
    return [t for t, _ in ranked[:max_expansions]], len(ranked) > max_expansions


def expand_fuzzy_spark(
    spark: SparkSession,
    paths: IndexPaths,
    stem: str,
    lang: str = "python",
    max_expansions: int = FUZZY_MAX_EXPANSIONS,
) -> tuple[list[str], bool]:
    """Distributed expansion: key-set filter on the sidecar (partition +
    row-group pruned), exact ``levenshtein ≤ 1`` verification JVM-side,
    Lucene-style cap.  Matches IndexServer.expand_fuzzy term for term
    (asserted in tests/test_fuzzy.py)."""
    check_fuzzy_fresh(paths)
    tok = normalize_fuzzy_stem(stem, lang)
    n_pb = int(read_fuzzy_meta(paths)["n_pbuckets"])
    keys = delete1_keys(tok)
    buckets = sorted({term_bucket(k, n_pb) for k in keys})
    rows = (
        catalog.read_table(spark, fuzzy_dir(paths))
        .where(F.col("fb").isin(buckets) & F.col("del_key").isin(keys))
        .where(F.levenshtein(F.col("term"), F.lit(tok)) <= 1)
        .groupBy("term")
        .agg(F.max("df").alias("df"))  # same term via several keys
        .collect()
    )
    return rank_expansions(tok, {r["term"]: int(r["df"]) for r in rows},
                           max_expansions)


def split_fuzzy_tokens(text: str) -> tuple[list[str], list[str]]:
    """Split whitespace tokens into (plain, fuzzy stems).  ``~`` is only
    meaningful as a single trailing character (Lucene's fuzzy marker);
    anywhere else is a loud error, never a silent literal."""
    plain: list[str] = []
    stems: list[str] = []
    for tok in (text or "").split():
        if tok.endswith("~") and len(tok) > 1 and "~" not in tok[:-1]:
            stems.append(tok[:-1])
        elif "~" in tok:
            raise ValueError(
                f"fuzzy {tok!r}: '~' is supported only as a single "
                "trailing character (edit-distance-1 query)"
            )
        else:
            plain.append(tok)
    return plain, stems


def rewrite_fuzzy_queries(
    spark: SparkSession,
    paths: IndexPaths,
    queries: list[dict],
    max_expansions: int = FUZZY_MAX_EXPANSIONS,
) -> list[dict]:
    """Rewrite trailing-``~`` queries for the bulk OR surfaces
    (bm25_bruteforce / bm25_wand / bm25_distributed) — the exact contract
    of query.rewrite_prefix_queries: a fuzzy query gains a pre-normalized
    ``terms`` list (plain tokens + every verified expansion, Lucene
    multi-term OR semantics), a fuzzy exclusion gains ``exclude_terms``
    and must not truncate (NOT vetoes exactly).  Non-fuzzy queries pass
    through untouched; non-OR fuzzy is a serving-plane feature
    (IndexServer.search) and raises here."""
    out = []
    for q in queries:
        text = q["query_text"]
        excl = q.get("exclude", "") or ""
        if "~" not in text and "~" not in excl:
            out.append(q)
            continue
        lang = q.get("lang", "python")
        q2 = dict(q)
        if "~" in text:
            if q.get("mode", "OR").upper() != "OR":
                raise ValueError(
                    "bulk fuzzy rewrite supports OR queries only; grouped "
                    "AND-with-fuzzy runs on the serving path "
                    "(IndexServer.search)"
                )
            plain, stems = split_fuzzy_tokens(text)
            terms = set(tokenize(" ".join(plain), lang))
            for st in stems:
                exp, _trunc = expand_fuzzy_spark(
                    spark, paths, st, lang, max_expansions)
                terms.update(exp)
            q2["terms"] = sorted(set(q2.get("terms", [])) | terms)
        if "~" in excl:
            eplain, estems = split_fuzzy_tokens(excl)
            ex_terms = set(tokenize(" ".join(eplain), lang))
            for st in estems:
                exp, trunc = expand_fuzzy_spark(
                    spark, paths, st, lang, max_expansions)
                if trunc:
                    raise ValueError(
                        f"exclusion fuzzy {st + '~'!r} matches more than "
                        f"{max_expansions} dictionary terms; NOT must veto "
                        "exactly"
                    )
                ex_terms.update(exp)
            q2["exclude_terms"] = sorted(
                set(q2.get("exclude_terms", [])) | ex_terms)
        out.append(q2)
    return out


def _main(argv: list[str]) -> None:
    """``python -m horus_ner_spark.index.fuzzy <index_dir>`` — build or
    refresh the sidecar for one index directory."""
    from horus_ner_spark.session import get_spark

    if not argv:
        raise SystemExit("usage: python -m horus_ner_spark.index.fuzzy "
                         "<index_dir>")
    paths = IndexPaths(argv[0])
    spark = get_spark("fuzzy-sidecar")
    build_fuzzy_sidecar(spark, paths)
    print(f"fuzzy sidecar built at {fuzzy_dir(paths)}")


if __name__ == "__main__":
    import sys

    _main(sys.argv[1:])
