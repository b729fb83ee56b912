"""HTML/entity normalization (SURVEY §2 F7).

The reference decodes HTML entities and strips markup before tokenizing
web-sourced text (reference: src/core/feature_extraction/util.py:30-36,
590-601; src/classifiers/text_classification/textclustering.py:44-45) —
web-scraped training corpora hit this in the first hour (``&amp;`` must not
tokenize as ``amp``).

Two surfaces, one semantic:
- ``html_unescape_expr``: a pure Catalyst Column expression (chained
  ``regexp_replace``; whole-stage codegen, no Python) covering the named +
  numeric entities that dominate real corpora.  Single-pass semantics like
  ``html.unescape`` (``&amp;lt;`` -> ``&lt;`` text, not ``<``): every
  specific entity replaces before ``&amp;``.
- the tokenizer pre-pass (tokenizer.py) uses stdlib ``html.unescape`` for
  full coverage, guarded to texts containing ``&`` so entity-free corpora
  tokenize byte-identically to round 1.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (entity regex, replacement) — literal-safe patterns; &amp; MUST be last so
# single-pass semantics match html.unescape (see module docstring).
ENTITY_MAP: list[tuple[str, str]] = [
    ("&lt;|&#0*60;|&#x0*3[cC];", "<"),
    ("&gt;|&#0*62;|&#x0*3[eE];", ">"),
    ("&quot;|&#0*34;|&#x0*22;", '"'),
    ("&apos;|&#0*39;|&#x0*27;", "'"),
    ("&nbsp;|&#0*160;|&#x0*[aA]0;", " "),  # NBSP, same as html.unescape
    ("&amp;|&#0*38;|&#x0*26;", "&"),
]


def html_unescape_expr(col: str | Column) -> Column:
    """Entity-decode a string column JVM-side (chained regexp_replace)."""
    out = F.col(col) if isinstance(col, str) else col
    for pat, repl in ENTITY_MAP:
        out = F.regexp_replace(out, pat, repl)
    return out


def duckdb_unescape_sql(expr: str) -> str:
    """The DuckDB mirror of ``html_unescape_expr`` (regexp_replace chain,
    same patterns, same order) — used by oracle entries."""
    out = expr
    for pat, repl in ENTITY_MAP:
        repl = repl.replace("'", "''")
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    return out


# Quote normalization (SURVEY §2 F8).  The reference folds nltk
# word_tokenize's quote renderings back to a plain double quote before
# aligning token streams (reference: src/core/feature_extraction/
# util.py:193-198,573-579 — `` and '' are nltk's open/close forms of ");
# web corpora add the typographic variants.  Double forms first, so the
# single-quote pass never sees half of a ``/'' pair.
QUOTE_MAP: list[tuple[str, str]] = [
    ("``|''|“|”|„", '"'),  # `` '' “ ” „
    ("‘|’|‚|`|´", "'"),  # ‘ ’ ‚ ` ´
]


def quote_normalize_expr(col: str | Column) -> Column:
    """Fold quote variants to straight ASCII quotes JVM-side."""
    out = F.col(col) if isinstance(col, str) else col
    for pat, repl in QUOTE_MAP:
        out = F.regexp_replace(out, pat, repl)
    return out


def duckdb_quote_sql(expr: str) -> str:
    """DuckDB mirror of ``quote_normalize_expr`` (same patterns, order)."""
    out = expr
    for pat, repl in QUOTE_MAP:
        pat = pat.replace("'", "''")
        repl = repl.replace("'", "''")
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    return out
