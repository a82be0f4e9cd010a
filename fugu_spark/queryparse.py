"""Query parsing — string → QueryPlan (SURVEY.md §2.6).

The reference parses with Tantivy's ``QueryParser`` over fields
``[text, name]`` (/root/reference/src/db/search.rs:108-112); the
documented surface (/root/reference/API.md:123-135) is: bare terms,
``"exact phrase"``, ``AND`` / ``OR`` / ``NOT``, and ``term^2`` boosts.
Behaviours reproduced here:

- empty query → AllQuery (/root/reference/src/db/search.rs:115-117)
- parse failure → strip the Tantivy special chars and retry
  (/root/reference/src/db/search.rs:118-126, escape set :603-610)
- each query word is run through the SAME tokenizer as indexing (T5);
  a word that analyzes to multiple tokens becomes a phrase (Tantivy
  parser behaviour), one token → TermQuery, zero → clause dropped
- bare terms default to Should (OR) — fugu never calls
  ``set_conjunction_by_default``; ``a AND b`` marks both as Must,
  ``NOT x`` marks Must-Not (contributes no score, Q4)

Parsing is driver-side Python (queries are tiny); the plan is executed
as a DataFrame graph in :mod:`fugu_spark.search`.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .tokenizer import DEFAULT_MODE, tokenize_py

# Tantivy specials stripped on parse failure (src/db/search.rs:603-610).
ESCAPE_CHARS = set('()[]{}":+-!~*?\\^')

_TOKEN_RE = re.compile(
    r"""
      "(?P<phrase>[^"]*)"(?:\^(?P<pboost>\d+(?:\.\d+)?))?
    | (?P<lparen>\()
    | (?P<rparen>\))
    | (?P<word>[^\s()]+)
    """,
    re.VERBOSE,
)


@dataclass(frozen=True)
class Leaf:
    """One scoring leaf: a term or a phrase (terms in order), with boost."""

    terms: tuple[str, ...]
    boost: float = 1.0
    occur: str = "should"  # 'must' | 'should' | 'must_not'

    @property
    def is_phrase(self) -> bool:
        return len(self.terms) > 1


@dataclass
class QueryPlan:
    leaves: list[Leaf] = field(default_factory=list)
    is_all: bool = False  # AllQuery: empty/filters-only (Q8)

    @property
    def musts(self) -> list[int]:
        return [i for i, l in enumerate(self.leaves) if l.occur == "must"]

    @property
    def shoulds(self) -> list[int]:
        return [i for i, l in enumerate(self.leaves) if l.occur == "should"]

    @property
    def must_nots(self) -> list[int]:
        return [i for i, l in enumerate(self.leaves) if l.occur == "must_not"]

    def all_terms(self) -> list[str]:
        seen: dict[str, None] = {}
        for leaf in self.leaves:
            for t in leaf.terms:
                seen.setdefault(t)
        return list(seen)


class QueryParseError(ValueError):
    pass


def _split_boost(word: str) -> tuple[str, float]:
    m = re.match(r"^(.*?)\^(\d+(?:\.\d+)?)$", word)
    if m and m.group(1):
        return m.group(1), float(m.group(2))
    return word, 1.0


def _parse_once(query: str, mode: str) -> QueryPlan:
    plan = QueryPlan()
    if query.count('"') % 2 == 1:
        raise QueryParseError("unbalanced quotes")
    depth = 0
    # pending occur for the NEXT clause ('must' set by a preceding AND,
    # 'must_not' by NOT); AND also upgrades the PREVIOUS clause.
    pending: str | None = None
    for m in _TOKEN_RE.finditer(query):
        if m.group("lparen"):
            depth += 1  # flat interpretation: parens only validated
            continue
        if m.group("rparen"):
            depth -= 1
            if depth < 0:
                raise QueryParseError("unbalanced parens")
            continue
        if m.group("phrase") is not None:
            raw = m.group("phrase")
            boost = float(m.group("pboost") or 1.0)
            terms = tuple(t for t, _ in tokenize_py(raw, mode))
            if terms:
                plan.leaves.append(Leaf(terms=terms, boost=boost, occur=pending or "should"))
            pending = None
            continue
        word = m.group("word")
        upper = word.upper()
        if upper == "AND":
            if plan.leaves and plan.leaves[-1].occur == "should":
                last = plan.leaves[-1]
                plan.leaves[-1] = Leaf(last.terms, last.boost, "must")
            pending = "must"
            continue
        if upper == "OR":
            pending = None
            continue
        if upper in ("NOT", "-") or word.startswith("-") and len(word) > 1:
            if upper in ("NOT", "-"):
                pending = "must_not"
                continue
            word = word[1:]
            pending = "must_not"
        elif word.startswith("+") and len(word) > 1:
            word = word[1:]
            pending = "must"
        text, boost = _split_boost(word)
        terms = tuple(t for t, _ in tokenize_py(text, mode))
        if terms:
            plan.leaves.append(Leaf(terms=terms, boost=boost, occur=pending or "should"))
        pending = None
    if depth != 0:
        raise QueryParseError("unbalanced parens")
    if not plan.leaves:
        plan.is_all = True
    return plan


def parse_query(query: str | None, mode: str = DEFAULT_MODE) -> QueryPlan:
    """Parse with the reference's escape-and-retry fallback."""
    if query is None or not query.strip():
        return QueryPlan(is_all=True)
    try:
        return _parse_once(query, mode)
    except QueryParseError:
        cleaned = "".join(c for c in query if c not in ESCAPE_CHARS)
        if not cleaned.strip():
            return QueryPlan(is_all=True)
        return _parse_once(cleaned, mode)
