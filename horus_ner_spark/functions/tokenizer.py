"""Code-aware tokenizer — the engine's single deterministic tokenizer.

The reference runs three nondeterministically-interacting tokenizers per
sentence and then needs ~400 LoC of fuzzy alignment to reconcile them
(reference: src/core/feature_extraction/util.py:566-611, 186-294, 367-547).
This engine has exactly one tokenizer, used identically at index-build time,
query time, and inside the pure-Python oracle, so alignment logic is
unnecessary by construction.

Normalization parity targets from the reference:
- accent/unicode strip (NFKD, drop combining marks):
  reference src/core/feature_extraction/util.py:1101-1102, 549-554
- lowercasing: reference src/core/util/definitions_sql.py:7 (upper() in SQL),
  src/classifiers/text_classification/textclassification_final.py:42
- quote normalization: reference src/core/feature_extraction/util.py:193-198
- stopword removal (per-language, here per programming language):
  reference textclassification_final.py:42 (stop_words='english')

Design rules (BASELINE.json input_hint):
- pure + deterministic: same (text, lang) -> same token list, always.
- vectorized: the Spark entry point is a pandas UDF over Arrow batches;
  no row-at-a-time Spark UDF anywhere.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd

# Sub-token extraction: one compiled regex splits identifiers in a single
# pass.  ``HTMLParserBase`` -> [HTML, Parser, Base]; ``snake_case`` splits on
# the non-word gap; digits kept as separate tokens.
_SUBTOKEN_RE = re.compile(
    r"[A-Z]+(?=[A-Z][a-z])"  # acronym run followed by a capitalized word
    r"|[A-Z]?[a-z]+"         # Capitalized or lowercase word
    r"|[A-Z]+"               # trailing acronym run
    r"|[0-9]+"               # digit run
)

# Per-language stoplists: language keywords so hot, they carry no signal for
# code search (the analog of the reference's english stoplist, and the
# designated skew hot-terms per FIXTURES.md: def/return/import).
STOPLISTS: dict[str, frozenset[str]] = {
    "python": frozenset(
        "def return import from class if else elif for while in is not and or "
        "none true false self pass with as try except raise lambda yield".split()
    ),
    "java": frozenset(
        "public private protected static final void class interface extends "
        "implements import package new return if else for while this null "
        "true false int long boolean string throws try catch".split()
    ),
    "scala": frozenset(
        "def val var object class trait extends with import package new "
        "return if else for while match case null true false implicit "
        "override".split()
    ),
    "go": frozenset(
        "func package import return if else for range var const type struct "
        "interface map chan go defer nil true false select switch case".split()
    ),
    "js": frozenset(
        "function var let const return if else for while new this null "
        "undefined true false class extends import export from async await "
        "typeof".split()
    ),
    "c": frozenset(
        "int char long short unsigned signed void static const struct union "
        "enum typedef return if else for while switch case break continue "
        "sizeof include define null".split()
    ),
}
_EMPTY: frozenset[str] = frozenset()

_MIN_TOKEN_LEN = 2
_MAX_TOKEN_LEN = 64


def _strip_accents(text: str) -> str:
    """NFKD-decompose and drop combining marks (Mn), keeping ASCII fast-path."""
    if text.isascii():
        return text
    return "".join(
        ch for ch in unicodedata.normalize("NFKD", text)
        if not unicodedata.combining(ch)
    )


def _maybe_unescape(text: str) -> str:
    """HTML entity decode (F7) — reference normalizes entities before
    tokenizing (util.py:30-36, 590-601): without this ``&amp;`` tokenizes
    as ``amp``.  Guarded to texts containing ``&`` so entity-free corpora
    tokenize byte-identically (and at zero cost)."""
    if "&" not in text:
        return text
    import html

    return html.unescape(text)


def tokenize(text: str | None, lang: str | None) -> list[str]:
    """Pure, deterministic tokenization of one document or query string.

    Pipeline: entity decode -> accent strip -> identifier/sub-token split
    -> lowercase -> per-lang stoplist -> length gate [2, 64].
    """
    if not text:
        return []
    stop = STOPLISTS.get(lang or "", _EMPTY)
    out: list[str] = []
    for tok in _SUBTOKEN_RE.findall(_strip_accents(_maybe_unescape(text))):
        t = tok.lower()
        if _MIN_TOKEN_LEN <= len(t) <= _MAX_TOKEN_LEN and t not in stop:
            out.append(t)
    return out


def tokenize_tf(text: str | None, lang: str | None) -> dict[str, int]:
    """Term-frequency fast path: identical result to
    ``Counter(tokenize(text, lang))`` (asserted in tests) but lowercases and
    stop/length-gates once per DISTINCT raw token instead of per occurrence
    — the index build's hot kernel, where token order is irrelevant."""
    if not text:
        return {}
    from collections import Counter

    stop = STOPLISTS.get(lang or "", _EMPTY)
    out: dict[str, int] = {}
    for raw, c in Counter(
        _SUBTOKEN_RE.findall(_strip_accents(_maybe_unescape(text)))
    ).items():
        t = raw.lower()
        if _MIN_TOKEN_LEN <= len(t) <= _MAX_TOKEN_LEN and t not in stop:
            out[t] = out.get(t, 0) + c
    return out


def tokenize_series(texts: pd.Series, langs: pd.Series) -> pd.Series:
    """Vectorized (Arrow-batch) form used inside the pandas UDF."""
    return pd.Series(
        [tokenize(t, l) for t, l in zip(texts, langs)],
        index=texts.index,
        dtype=object,
    )


def tokenize_udf_factory():
    """Build the Spark pandas UDF ``(content, lang) -> array<string>``.

    Factory (rather than module-level UDF) so importing this module never
    requires an active SparkSession — the oracle and pytest unit tests import
    ``tokenize`` with no JVM.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def tokenize_udf(content: pd.Series, lang: pd.Series) -> pd.Series:
        return tokenize_series(content, lang)

    return tokenize_udf
