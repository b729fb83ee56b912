"""Deterministic synthetic source-code corpus generator (FIXTURES.md §1).

Schema per BASELINE.json input_hint:
    corpus(repo string, path string, commit string, lang string, content string)

Properties engineered in:
- Zipfian repo popularity and Zipfian identifier vocabulary (skew realism);
- per-lang keywords as hot terms (``def``/``return``/``import``) to exercise
  stoplists and skew salting;
- camelCase / snake_case / dotted identifiers the tokenizer must split;
- one magic rare term (df=1) planted in doc 0 and a guaranteed-absent term
  reserved for empty-result queries.

Determinism: every document is a pure function of (seed, doc index) — a
counter-based ``random.Random(seed * P + i)`` per doc — so the corpus is
byte-identical at any partitioning / parallelism, which the resume test and
the two-parallelism scaling run both rely on (SURVEY.md §7 hard-part (c)).

Reference analog of a "document": one ranked web result row in
HORUS_SEARCH_RESULT_TEXT (reference: horus0.1.5.db.sql:60-79).
"""

from __future__ import annotations

import hashlib
import random

import pandas as pd

SEED = 20260816
LANGS = ["python", "java", "scala", "go", "js", "c"]
_EXT = {"python": "py", "java": "java", "scala": "scala", "go": "go", "js": "js", "c": "c"}

# identifier roots — Zipf-sampled and composed into snake/camel identifiers
ROOTS = (
    "config parse value handler request response client server buffer stream "
    "token index query cache node tree graph list map set queue stack hash "
    "file path read write open close init start stop run exec eval load save "
    "get put post delete update insert remove find search sort merge split "
    "join filter reduce count sum min max avg batch chunk block page row col "
    "key val item elem entry record field schema table view plan task job "
    "worker pool thread lock mutex event signal timer clock date time zone "
    "user group role auth login session cookie header body param arg opt "
    "flag mode state status error warn info debug trace log metric gauge "
    "test mock stub spec case suite bench perf prof mem disk net sock conn "
    "url uri host port addr proto codec encode decode pack unpack zip tar "
    "json yaml xml csv text str num int float bool byte char bit mask shift"
).split()

KEYWORDS = {
    "python": "def return import from class if else for while try except with lambda yield print".split(),
    "java": "public static void class interface extends implements import return new final throws".split(),
    "scala": "def val var object class trait extends match case implicit override import".split(),
    "go": "func package import return if else for range var const type struct defer".split(),
    "js": "function var let const return if else for while class import export async await".split(),
    "c": "int char void static const struct typedef return if else for while switch include".split(),
}

RARE_TERM = "zzzsingletonxq"      # planted once, df == 1
ABSENT_TERM = "qqneverappearsxq"  # reserved, never generated

_N_REPOS_PER_SF = 200  # per unit sf=1.0 scaled below


def _zipf_index(rng: random.Random, n: int, s: float = 1.3) -> int:
    """Zipf-ish rank sampler via inverse CDF on a power law (cheap, seeded)."""
    u = rng.random()
    return min(int(n * (u ** s)), n - 1)


def _identifier(rng: random.Random) -> str:
    n = rng.choice((1, 2, 2, 3))
    parts = [ROOTS[_zipf_index(rng, len(ROOTS))] for _ in range(n)]
    style = rng.random()
    if style < 0.45:
        return "_".join(parts)                      # snake_case
    if style < 0.85:                                # camelCase
        return parts[0] + "".join(p.capitalize() for p in parts[1:])
    return "".join(p.capitalize() for p in parts)   # PascalCase


def gen_doc(i: int, seed: int = SEED, n_repos: int = 1000) -> dict:
    """Generate document ``i`` — pure function of (seed, i, n_repos)."""
    rng = random.Random(seed * 2_147_483_647 + i)
    lang = LANGS[_zipf_index(rng, len(LANGS), s=1.0)]
    repo = f"org{_zipf_index(rng, 40)}/proj{_zipf_index(rng, max(2, n_repos // 40))}"
    depth = rng.randint(1, 4)
    path = "/".join(
        [ROOTS[_zipf_index(rng, len(ROOTS))] for _ in range(depth)]
    ) + f"/{_identifier(rng)}.{_EXT[lang]}"
    commit = hashlib.sha1(f"{seed}:{repo}:{path}:{i}".encode()).hexdigest()

    kw = KEYWORDS[lang]
    n_lines = rng.randint(8, 60)
    lines = []
    for _ in range(n_lines):
        toks = [rng.choice(kw)]
        for _ in range(rng.randint(2, 8)):
            r = rng.random()
            if r < 0.70:
                toks.append(_identifier(rng))
            elif r < 0.85:
                toks.append(rng.choice(kw))
            elif r < 0.95:
                toks.append(str(rng.randint(0, 9999)))
            else:
                toks.append(f'"{ROOTS[_zipf_index(rng, len(ROOTS))]} literal"')
        sep = rng.choice(["(", " = ", ".", ", ", " "])
        lines.append(toks[0] + " " + sep.join(toks[1:]))
    content = "\n".join(lines)
    if i == 0:
        content += f"\n{RARE_TERM} = 1"
    return {"repo": repo, "path": path, "commit": commit, "lang": lang, "content": content}


def n_docs_for_sf(sf: float) -> int:
    return max(100, int(1_000_000 * sf))  # sf0.001->1k, sf0.01->10k, sf0.1->100k


def gen_corpus_pandas(sf: float, seed: int = SEED) -> pd.DataFrame:
    """Small-scale driver-side generation (tests, oracle)."""
    n = n_docs_for_sf(sf)
    return pd.DataFrame([gen_doc(i, seed, n_repos=max(10, n // 100)) for i in range(n)])


def write_corpus(spark, out_dir: str, sf: float, seed: int = SEED, n_partitions: int | None = None) -> str:
    """Distributed generation: spark.range(n) -> mapInPandas(gen) -> parquet.

    Each task generates only its own id range; determinism is per-doc, so the
    result is independent of n_partitions (asserted in tests).
    """
    from horus_ner_spark.session import ensure_package_on_executors

    # gen_batches pickles a reference to this module: ship the package so
    # the kernel unpickles on workers even when the driver script runs
    # outside the repo (e.g. spark-submit from another cwd)
    ensure_package_on_executors(spark)
    n = n_docs_for_sf(sf)
    n_repos = max(10, n // 100)
    parts = n_partitions or max(8, min(64, n // 2000))

    def gen_batches(batches):
        for pdf in batches:
            yield pd.DataFrame([gen_doc(int(i), seed, n_repos) for i in pdf["id"]])

    schema = "repo string, path string, commit string, lang string, content string"
    (
        spark.range(0, n, 1, parts)
        .mapInPandas(gen_batches, schema=schema)
        .write.mode("overwrite")
        .parquet(f"{out_dir}/corpus.parquet")
    )
    return f"{out_dir}/corpus.parquet"


def query_set() -> list[dict]:
    """The fixed reference query set (FIXTURES.md §2): single identifiers,
    split-requiring compounds, multi-term, keywords (stoplisted -> empty),
    rare (df=1), absent (empty), hot terms."""
    qs = [
        "parseConfig",             # camelCase compound -> [parse, config]
        "read_buffer",             # snake_case compound
        "HttpRequestHandler",      # PascalCase triple  (subwords may be absent)
        "token index",             # multi-term
        "cache node tree",         # multi-term, hot-ish
        "def return import",       # pure keywords -> stoplisted -> empty
        "query plan exec",
        "hash join merge sort",
        RARE_TERM,                 # df = 1 -> exactly one hit
        ABSENT_TERM,               # absent -> zero hits
        "stream",                  # single hot identifier
        "mutex lock thread pool",
        "encode decode codec",
        "user session cookie auth",
        "metric gauge trace",
        "zipWithIndex",            # camel, tail may be oov
    ]
    return [
        {"query_id": qid, "query_text": q, "lang": "python", "k": 10}
        for qid, q in enumerate(qs)
    ]
