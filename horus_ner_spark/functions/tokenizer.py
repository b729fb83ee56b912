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

import numpy as np
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

# Per-lang Arrow value_set arrays for the batch kernel — built once on its
# first call (pyarrow is imported lazily there) and reused, instead of a
# fresh sort + pa.array() per batch x lang in the build's hot kernel.
_STOPLIST_ARROW: dict[str, object] = {}

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


# ── Arrow-vectorized batch tokenizer (the index build's hot kernel) ────────
#
# ``tokenize`` above is the semantic contract: pure Python, used by the
# oracle, the query path, and every differential test.  The index build
# tokenizes ~10^5 docs per Arrow batch, where the per-token Python loop is
# 77% of the kernel's CPU (round-4 profile: 4.1 s of 5.3 s per 10k docs).
# ``tokenize_arrow_batch`` produces EXACTLY the same tokens via pyarrow's
# RE2/utf8 C++ kernels — Python never touches a token — and falls back to
# ``tokenize`` per row for inputs the vectorized path does not cover
# (non-ASCII content, which needs NFKD accent-stripping, and content with
# ``&``, which needs HTML entity decoding).  Equality with ``tokenize`` is
# asserted per-construct in tests/test_tokenizer.py goldens and by a
# hypothesis differential over adversarial identifier shapes.
#
# The findall pattern ``[A-Z]+(?=[A-Z][a-z]) | [A-Z]?[a-z]+ | [A-Z]+ |
# [0-9]+`` uses lookahead, which RE2 lacks; the equivalent without it is
# boundary INSERTION — put separators around every run findall would
# emit, then split on non-alphanumerics.  ONE pass suffices: padding
# every ``[A-Z]?[a-z]+`` word and every digit run with spaces leaves
# exactly the findall runs between separators —
#   "HTMLParser"  -> "HTML Parser "        (acronym kept as the residue)
#   "parseJSON"   -> " parse JSON"
#   "Fast2Furious"-> " Fast  2  Furious "
# — because what findall's remaining alternative (``[A-Z]+``) matches is
# precisely the text the padded pattern skips.  Equivalence to the scalar
# findall is fuzz-checked over 200k random case/digit strings and by the
# hypothesis differential below.  One pass = one RE2 scan + one rewrite
# of the content bytes instead of four (the tf stage is bandwidth-bound;
# round-4 scaling profile).

_BOUNDARY_PASSES = ((r"([A-Z]?[a-z]+|[0-9]+)", r" \1 "),)
_SPLIT_PATTERN = r"[^A-Za-z0-9]+"


def tokenize_arrow_batch(contents, langs):
    """Vectorized ``tokenize`` over one Arrow batch.

    Args: ``contents``/``langs`` — pa.Array (or ChunkedArray) of strings.
    Returns ``(tokens, tok_doc, tok_pos, doc_lens)``:
      tokens   pa.StringArray — filtered lowercase tokens, flat; each doc's
               tokens contiguous and in document order (docs themselves may
               be permuted across the flat stream — callers group by
               ``tok_doc``, never by input order);
      tok_doc  np.int64[n_tokens] — input row index of each token;
      tok_pos  np.int64[n_tokens] — token position within its doc's
               FILTERED stream (the position the phrase/NEAR kernels use);
      doc_lens np.int64[n_rows]   — filtered token count per input row.
    Per-row results equal ``tokenize(content, lang)`` exactly.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if not _STOPLIST_ARROW:
        _STOPLIST_ARROW.update(
            {k: pa.array(sorted(v)) for k, v in STOPLISTS.items()}
        )
    if isinstance(contents, pa.ChunkedArray):
        contents = contents.combine_chunks()
    if isinstance(langs, pa.ChunkedArray):
        langs = langs.combine_chunks()
    n = len(contents)
    doc_lens = np.zeros(n, dtype=np.int64)
    if n == 0:
        return pa.array([], type=pa.string()), doc_lens, doc_lens, doc_lens

    fast = pc.fill_null(
        pc.and_kleene(
            pc.string_is_ascii(contents),
            pc.invert(pc.match_substring(contents, "&")),
        ),
        False,  # null content -> slow path -> tokenize(None) == []
    )
    fast_np = fast.to_numpy(zero_copy_only=False).astype(bool)
    lang_np = np.asarray(langs.to_pylist(), dtype=object)

    tok_parts: list = []          # pa.StringArray per part
    doc_parts: list[np.ndarray] = []
    pos_parts: list[np.ndarray] = []

    # fast rows, one fully-vectorized pass per distinct lang
    fast_idx = np.flatnonzero(fast_np)
    if fast_idx.size:
        fast_langs = lang_np[fast_idx]
        for lv in sorted({l for l in fast_langs}, key=lambda x: (x is None, x)):
            idx = fast_idx[fast_langs == lv]
            sub = contents.take(pa.array(idx, type=pa.int64()))
            for pat, rep in _BOUNDARY_PASSES:
                sub = pc.replace_substring_regex(sub, pat, rep)
            lists = pc.split_pattern_regex(sub, _SPLIT_PATTERN)
            offsets = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            # ascii_lower / binary_length, not utf8_*: rows here are ASCII
            # by the fast-path gate, and the ascii kernels are ~10x faster
            flat = pc.ascii_lower(pc.list_flatten(lists))
            ln = pc.binary_length(flat)
            keep = pc.and_(
                pc.greater_equal(ln, _MIN_TOKEN_LEN),
                pc.less_equal(ln, _MAX_TOKEN_LEN),
            )
            stop_arr = _STOPLIST_ARROW.get(lv or "")
            if stop_arr is not None:
                keep = pc.and_(
                    keep,
                    pc.invert(pc.is_in(flat, value_set=stop_arr)),
                )
            keep_np = keep.to_numpy(zero_copy_only=False)
            counts_pre = np.diff(offsets)
            tok_doc_local = np.repeat(idx, counts_pre)[keep_np]
            kept = flat.filter(keep)
            doc_lens += np.bincount(tok_doc_local, minlength=n)
            # positions within each doc's filtered, contiguous run
            m = tok_doc_local.size
            if m:
                seq = np.arange(m, dtype=np.int64)
                run_start = np.concatenate(
                    ([0], np.flatnonzero(tok_doc_local[1:] != tok_doc_local[:-1]) + 1)
                )
                run_lens = np.diff(np.append(run_start, m))
                pos = seq - np.repeat(seq[run_start], run_lens)
            else:
                pos = np.empty(0, dtype=np.int64)
            tok_parts.append(kept)
            doc_parts.append(tok_doc_local)
            pos_parts.append(pos)

    # slow rows (non-ASCII / '&' / null): the reference Python path, per row
    for i in np.flatnonzero(~fast_np):
        toks = tokenize(contents[int(i)].as_py(), lang_np[i])
        if not toks:
            continue
        doc_lens[i] = len(toks)
        tok_parts.append(pa.array(toks, type=pa.string()))
        doc_parts.append(np.full(len(toks), i, dtype=np.int64))
        pos_parts.append(np.arange(len(toks), dtype=np.int64))

    if not tok_parts:
        e = np.empty(0, dtype=np.int64)
        return pa.array([], type=pa.string()), e, e, doc_lens
    tokens = pa.concat_arrays(
        [p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p for p in tok_parts]
    )
    return (
        tokens,
        np.concatenate(doc_parts),
        np.concatenate(pos_parts),
        doc_lens,
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
