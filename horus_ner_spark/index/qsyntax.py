"""Minimal freeform query syntax for the serve surface.

The reference's interactive surface accepts freeform text (reference:
webservice/rest.py:47-61 — the annotate endpoint takes a raw sentence
string); this engine's :meth:`IndexServer.search` takes an explicit
``(query_text, mode, k, slop)`` enum API.  This module closes the gap
with a deterministic, dependency-free parser from one query string to
that enum dispatch — no new execution path, so parsed queries are
rank-identical to the explicit-mode API by construction.

Grammar (one operator family per query — mixing is a loud error, never a
silent reinterpretation):

- ``lang:python foo bar``   -> lang selector; may appear anywhere once.
- ``repo:linux path:fs/ x`` -> metadata filters (repo exact, path
                               prefix), any mode incl. BOOL/PHRASE/NEAR;
                               resolved against doc-values in the
                               serving layer, scores untouched (Lucene
                               filter-context semantics).
- ``"exact phrase"``        -> mode=PHRASE over the quoted text.
- ``foo AND bar AND baz``   -> mode=AND (operators are UPPERCASE only:
                               lowercase ``and`` is a plain term, so
                               natural-language queries stay OR).
- ``foo NEAR/3 bar``        -> mode=NEAR, slop=3 (``NEAR`` alone uses the
                               caller's default slop).
- ``foo -bar`` / ``foo NOT bar`` / ``foo AND NOT bar``
                            -> exclusion: documents containing ``bar`` are
                               dropped before scoring (any mode, including
                               a quoted phrase followed by ``-term``s).
                               ``NOT`` consumes the next token; an ``AND``
                               immediately before a ``NOT`` is absorbed so
                               the natural ``a AND NOT b`` parses.  A query
                               of only exclusions is a loud error.
- ``ser* cache`` / ``-tmp*``-> a trailing-``*`` token passes through as a
                               prefix wildcard (positive term or
                               exclusion); expansion happens in the
                               serving layer (IndexServer.expand_prefix
                               — dictionary range scan), not here, so
                               the parser stays storage-free.
- ``(a OR b) AND c``        -> any '('/')' routes the whole query to the
                               parenthesized boolean planner (mode=BOOL,
                               index/boolexpr.py — nested AND/OR/NOT,
                               Lucene BooleanQuery semantics).
- anything else             -> mode=OR over the whitespace terms.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from horus_ner_spark.index.boolexpr import is_bool_query, parse_bool

_LANG_RE = re.compile(r"(?:^|\s)lang:([A-Za-z0-9_+-]+)(?=\s|$)")
# metadata filter selectors: repo:name (exact), path:prefix — resolved
# against the index's doc-values (IndexServer._filter_exclude); values
# may contain any non-space characters (paths have '/', '.', '-')
_FILTER_RE = re.compile(r"(?:^|\s)(repo|path):(\S+)")
_NEAR_RE = re.compile(r"^NEAR(?:/(\d+))?$")
_QUOTED_RE = re.compile(r'^"(.*)"$', re.S)
_QUOTED_PREFIX_RE = re.compile(r'^"([^"]*)"(.*)$', re.S)


def _extract_exclusions(toks: list[str]) -> tuple[list[str], list[str]]:
    """Strip ``-term`` tokens and ``NOT term`` pairs from a token stream
    BEFORE operator parsing; returns (kept tokens, excluded terms).  An
    ``AND``/``NEAR`` immediately before a ``NOT`` is absorbed so the
    natural boolean ``a AND NOT b`` parses to (a, exclude b)."""
    kept: list[str] = []
    excluded: list[str] = []
    i = 0
    while i < len(toks):
        t = toks[i]
        if t == "NOT":
            if i == len(toks) - 1:
                raise ValueError("dangling operator 'NOT'")
            if kept and (kept[-1] == "AND" or _NEAR_RE.match(kept[-1])):
                kept.pop()
            nxt = toks[i + 1]
            excluded.append(nxt[1:] if nxt.startswith("-") and len(nxt) > 1
                            else nxt)
            i += 2
            continue
        if t.startswith("-") and len(t) > 1:
            excluded.append(t[1:])
            i += 1
            continue
        kept.append(t)
        i += 1
    return kept, excluded


@dataclass(frozen=True)
class ParsedQuery:
    query_text: str
    lang: str
    mode: str
    slop: int
    exclude: str = ""  # space-joined excluded terms ("" = none)
    # metadata filter selectors as sorted (column, value) pairs — a
    # tuple (not a dict) so the dataclass stays hashable for cache keys
    filters: tuple = ()


def parse_query(
    text: str, default_lang: str = "python", default_slop: int = 8
) -> ParsedQuery:
    """Parse one freeform query string into the explicit-mode dispatch.

    Raises ``ValueError`` on malformed input (empty query, mixed
    operators, dangling operator, multiple ``lang:`` selectors, quoted
    phrase mixed with bare terms) — the daemon maps that to HTTP 400.
    """
    if not isinstance(text, str):
        raise ValueError("query must be a string")
    lang = default_lang
    # selector extraction (lang:/repo:/path:) must never reach INSIDE a
    # quoted phrase — '"see path:src/ docs"' is a literal phrase, not a
    # filter ("mixing is a loud error, never a silent reinterpretation"
    # — and silently mutating a phrase is worse).  Split on '"' and
    # extract only from the even (outside-quotes) segments.
    segs = text.split('"')
    outside = segs[0::2]
    langs = [m for s in outside for m in _LANG_RE.findall(s)]
    if len(langs) > 1:
        raise ValueError("multiple lang: selectors")
    if langs:
        lang = langs[0]
        outside = [_LANG_RE.sub(" ", s, count=1) if _LANG_RE.search(s)
                   else s for s in outside]
    fdict: dict = {}
    for s in outside:
        for fcol, fval in _FILTER_RE.findall(s):
            if fcol in fdict and fdict[fcol] != fval:
                raise ValueError(f"multiple {fcol}: selectors")
            fdict[fcol] = fval
    if fdict:
        outside = [_FILTER_RE.sub(" ", s) for s in outside]
    filters = tuple(sorted(fdict.items()))
    segs[0::2] = outside
    text = '"'.join(segs).strip()
    if not text:
        raise ValueError("empty query")

    m = _QUOTED_PREFIX_RE.match(text)
    if m is None and is_bool_query(text):
        # parenthesized boolean expression: validated + executed by the
        # boolean planner (index/boolexpr.py + IndexServer._search_bool);
        # parse here too so malformed input fails at parse time (HTTP
        # 400), not at dispatch
        parse_bool(text)
        return ParsedQuery(text, lang, "BOOL", default_slop, "",
                           filters)

    if m:
        phrase, rest = m.group(1).strip(), m.group(2).strip()
        if not phrase:
            raise ValueError("empty phrase")
        excl: list[str] = []
        if rest:
            # a quoted phrase may only be followed by exclusions
            kept, excl = _extract_exclusions(rest.split())
            if kept:
                raise ValueError(
                    "quotes must wrap the whole query (phrase mode) — "
                    "mixing a phrase with bare terms is not supported"
                )
        return ParsedQuery(phrase, lang, "PHRASE", default_slop,
                           " ".join(excl), filters)
    if '"' in text:
        raise ValueError(
            "quotes must wrap the whole query (phrase mode) — "
            "mixing a phrase with bare terms is not supported"
        )

    toks, excluded = _extract_exclusions(text.split())
    if not toks:
        raise ValueError("query contains only exclusions — nothing to match")
    ops = []          # ("AND", None) / ("NEAR", slop) at odd positions
    terms = []
    for i, t in enumerate(toks):
        nm = _NEAR_RE.match(t)
        if t == "AND" or nm:
            if i % 2 != 1 or i == len(toks) - 1:
                raise ValueError(f"dangling operator {t!r}")
            ops.append(("NEAR", int(nm.group(1)) if nm and nm.group(1)
                        else None) if nm else ("AND", None))
        else:
            if i % 2 == 1 and ops:
                raise ValueError(
                    "operators must separate every term "
                    f"(got bare term {t!r} in operator position)"
                )
            terms.append(t)

    if not ops:
        return ParsedQuery(" ".join(terms), lang, "OR", default_slop,
                           " ".join(excluded), filters)
    if len(ops) != len(terms) - 1:
        raise ValueError("operators must separate every term")
    kinds = {o[0] for o in ops}
    if len(kinds) > 1:
        raise ValueError("mixing AND and NEAR in one query is not supported")
    mode = kinds.pop()
    slop = default_slop
    if mode == "NEAR":
        slops = {o[1] for o in ops if o[1] is not None}
        if len(slops) > 1:
            raise ValueError("conflicting NEAR/<n> slops")
        if slops:
            slop = slops.pop()
        if slop < 1:
            raise ValueError("NEAR slop must be >= 1")
    return ParsedQuery(" ".join(terms), lang, mode, slop,
                       " ".join(excluded), filters)
