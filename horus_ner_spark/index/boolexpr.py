"""Parenthesized boolean queries for the serve surface.

The flat query syntax (``index/qsyntax.py``) deliberately allows ONE
operator family per query; this module adds the general case —
``(cache OR buffer) AND serve AND NOT tmp``-style nesting — as a
separate, explicitly-routed planner so the flat paths keep their
rank-identical-to-enum-API guarantee untouched.

Reference comparison: the reference's freeform surface passes raw text
to the external engine (``/root/reference/webservice/rest.py:47-61``);
boolean structure here follows Lucene's classic BooleanQuery contract
instead, because that is the published semantics users of a code-search
surface expect:

- ``a b``          inside any group -> OR (should-clauses), like the
                   engine's flat OR mode;
- ``AND``          conjunction; may nest arbitrary groups;
- ``NOT x`` / ``-x``  only meaningful inside a conjunction with at
                   least one positive clause (Lucene's rule — a
                   pure-negative query has no bounded candidate set at
                   10^12 docs, so it is a LOUD error, never a scan);
- scoring          BM25 sum over every POSITIVE leaf term the document
                   contains (filter-only clauses still gate membership
                   but NOT-ed terms never contribute score), ranked
                   (-score, doc_id) — exactly the exhaustive kernel's
                   order on the include set.

Leaves: a plain token runs through the index tokenizer; if it splits
(``fooBar`` -> ``foo``, ``bar``) the leaf requires ALL its sub-tokens
(the user typed one identifier), while scoring credits each sub-token.
Trailing ``*`` / ``~`` leaves expand via the dictionary (prefix range /
delete-1 sidecar) and require ANY expansion, as in flat AND mode.

Grammar (recursive descent, loud errors):

    expr    := or
    or      := and (OR and)*
    and     := unary ((AND | bare-adjacency-OR) unary)*   # see note
    unary   := NOT unary | '-'token | atom
    atom    := '(' expr ')' | token

Note: bare adjacency (``a b``) is OR at every level, matching the flat
surface; precedence is NOT > AND > OR, and adjacency binds like OR, so
``a b AND c`` parses as ``(a OR b) AND c``?  No — that silent grouping
is exactly the ambiguity this engine refuses: mixing bare adjacency
with explicit operators INSIDE one group is a ValueError; wrap the OR
in parens (``(a b) AND c`` is fine, and equals ``(a OR b) AND c``).
"""
from __future__ import annotations

from dataclasses import dataclass

__all__ = ["parse_bool", "BoolNode", "Leaf", "NotNode", "AndNode", "OrNode",
           "is_bool_query", "all_leaves", "positive_leaves"]


@dataclass(frozen=True)
class BoolNode:
    pass


@dataclass(frozen=True)
class Leaf(BoolNode):
    token: str  # raw token; may end in '*' (prefix) or '~' (fuzzy)


@dataclass(frozen=True)
class NotNode(BoolNode):
    child: BoolNode


@dataclass(frozen=True)
class AndNode(BoolNode):
    children: tuple


@dataclass(frozen=True)
class OrNode(BoolNode):
    children: tuple


def is_bool_query(text: str) -> bool:
    """The routing predicate ``qsyntax.parse_query`` uses: parens send a
    query to the boolean planner; everything else stays on the flat
    (rank-identical-to-enum) paths."""
    return "(" in text or ")" in text


def _lex(text: str) -> list[str]:
    out: list[str] = []
    cur: list[str] = []
    for ch in text:
        if ch in "()":
            if cur:
                out.append("".join(cur))
                cur = []
            out.append(ch)
        elif ch.isspace():
            if cur:
                out.append("".join(cur))
                cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


class _Parser:
    def __init__(self, toks: list[str]):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def parse(self) -> BoolNode:
        node = self.expr()
        if self.peek() is not None:
            raise ValueError(f"unexpected {self.peek()!r} after expression")
        return node

    def expr(self) -> BoolNode:
        return self.or_()

    def or_(self) -> BoolNode:
        parts = [self.and_()]
        while self.peek() == "OR":
            self.next()
            parts.append(self.and_())
        return parts[0] if len(parts) == 1 else OrNode(tuple(parts))

    def and_(self) -> BoolNode:
        parts = [self.unary()]
        saw_and = False
        saw_adj = False
        while True:
            t = self.peek()
            if t == "AND":
                self.next()
                saw_and = True
                parts.append(self.unary())
            elif t is not None and t not in (")", "OR"):
                # bare adjacency: OR, flat-surface convention
                saw_adj = True
                parts.append(self.unary())
            else:
                break
        if len(parts) == 1:
            return parts[0]
        if saw_and and saw_adj:
            raise ValueError(
                "bare adjacency (implicit OR) mixed with AND in one "
                "group — parenthesize the OR part: (a b) AND c"
            )
        return (AndNode(tuple(parts)) if saw_and else OrNode(tuple(parts)))

    def unary(self) -> BoolNode:
        t = self.peek()
        if t is None or t == ")":
            raise ValueError("expected a term or '(' "
                             f"(at {'end' if t is None else t!r})")
        if t == "NOT":
            self.next()
            return NotNode(self.unary())
        if t.startswith("-") and len(t) > 1 and t != "-":
            self.next()
            return NotNode(Leaf(t[1:]))
        return self.atom()

    def atom(self) -> BoolNode:
        t = self.next()
        if t == "(":
            node = self.expr()
            if self.next() != ")":
                raise ValueError("unbalanced '(' — missing ')'")
            return node
        if t in (")", "OR", "AND", "NOT"):
            raise ValueError(f"unexpected {t!r} — expected a term or '('")
        return Leaf(t)


def _validate(node: BoolNode, under_not: bool = False) -> None:
    """Lucene's positivity rule, enforced at every level: a NOT is legal
    only inside a conjunction that has at least one positive sibling
    (otherwise the candidate set is the corpus complement — unbounded at
    scale).  Double negation is rejected for the same reason."""
    if isinstance(node, Leaf):
        return
    if isinstance(node, NotNode):
        if under_not:
            raise ValueError("double negation is not supported")
        if not isinstance(node.child, (Leaf, AndNode, OrNode)):
            raise ValueError("malformed NOT")
        _validate(node.child, under_not=True)
        return
    kids = node.children
    if isinstance(node, OrNode):
        for c in kids:
            if isinstance(c, NotNode):
                raise ValueError(
                    "NOT directly under OR has no bounded candidate set "
                    "— rewrite as ... AND NOT ..."
                )
            _validate(c, under_not)
        return
    # AndNode
    if all(isinstance(c, NotNode) for c in kids):
        raise ValueError(
            "conjunction of only NOT clauses — nothing positive to match"
        )
    for c in kids:
        _validate(c, under_not)


def parse_bool(text: str) -> BoolNode:
    """One parenthesized boolean query string -> validated AST.

    Raises ``ValueError`` on malformed input (unbalanced parens,
    dangling operators, pure-negative (sub)queries, adjacency/AND
    mixing, double negation, quoted phrases — the boolean grammar has
    no phrase leaves, and every execution surface shares this parser,
    so the rejection is uniform); the daemon maps that to HTTP 400."""
    if '"' in text:
        raise ValueError(
            "phrases inside boolean groups are not supported — "
            'use a flat "..." query (PHRASE mode)'
        )
    toks = _lex(text)
    if not toks:
        raise ValueError("empty query")
    node = _Parser(toks).parse()
    if isinstance(node, NotNode):
        raise ValueError("pure-negative query — nothing positive to match")
    _validate(node)
    return node


def all_leaves(node: BoolNode) -> list[str]:
    """Every leaf token (negated included), left-to-right — the
    expansion pre-pass: planners expand each distinct leaf ONCE into a
    token->terms map shared by the include evaluation and the scoring
    pass."""
    out: list[str] = []

    def walk(n: BoolNode) -> None:
        if isinstance(n, Leaf):
            out.append(n.token)
        elif isinstance(n, NotNode):
            walk(n.child)
        else:
            for c in n.children:
                walk(c)

    walk(node)
    return out


def positive_leaves(node: BoolNode) -> list[str]:
    """Leaf tokens NOT under a NOT, in stable left-to-right order —
    these are the scoring terms (filter-only clauses contribute no
    score, the Lucene contract)."""
    out: list[str] = []

    def walk(n: BoolNode, neg: bool) -> None:
        if isinstance(n, Leaf):
            if not neg:
                out.append(n.token)
        elif isinstance(n, NotNode):
            walk(n.child, True)
        else:
            for c in n.children:
                walk(c, neg)

    walk(node, False)
    return out
