"""Parser robustness fuzz (no Spark) — the escape-and-retry contract:
ANY query string must parse without raising (the reference strips
Tantivy specials and retries on parse errors, src/db/search.rs:118-126),
and the new pattern branches must be internally consistent."""

from __future__ import annotations

import fnmatch
import re

from hypothesis import given, settings
from hypothesis import strategies as st

from fugu_spark.queryparse import parse_query, regex_literal_prefix

PRINTABLE = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=60
)


@settings(max_examples=300, deadline=None)
@given(PRINTABLE)
def test_any_string_parses(q):
    plan = parse_query(q)
    # invariants: flattened leaves are either terms, phrases, patterns,
    # or ranges; no leaf is simultaneously several kinds
    for l in plan.leaves:
        kinds = sum([l.is_phrase, l.rng is not None, bool(l.regex), bool(l.synonym)])
        assert kinds <= 1


@settings(max_examples=300, deadline=None)
@given(PRINTABLE)
def test_parse_is_deterministic(q):
    a, b = parse_query(q), parse_query(q)
    assert [(l.occur, l.terms, l.regex, l.prefix_last) for l in a.leaves] == [
        (l.occur, l.terms, l.regex, l.prefix_last) for l in b.leaves
    ]


WORD = st.text(alphabet="abcdxyz", min_size=1, max_size=8)
# a wildcard LEAF needs a literal char plus a '?' anywhere or a '*' not
# only in trailing position (trailing-only '*' is the cheaper prefix leaf)
PATTERN = st.text(alphabet="abcd*?", min_size=1, max_size=8).filter(
    lambda p: p.strip("*?") and ("?" in p or "*" in p[:-1])
)


@settings(max_examples=300, deadline=None)
@given(PATTERN, WORD)
def test_wildcard_translation_matches_fnmatch(pattern, word):
    """The parse-time wildcard→regex translation must agree with
    fnmatch (same '*'/'?' semantics) on lowercase alphanumeric terms."""
    plan = parse_query(pattern)
    assert len(plan.leaves) == 1 and plan.leaves[0].regex
    rx = re.compile(plan.leaves[0].terms[0])
    assert bool(rx.fullmatch(word)) == fnmatch.fnmatchcase(word, pattern)


@settings(max_examples=300, deadline=None)
@given(PATTERN)
def test_literal_prefix_is_sound(pattern):
    """Every term the translated pattern can match starts with the
    extracted literal prefix — the property row-group pruning relies on."""
    plan = parse_query(pattern)
    pat = plan.leaves[0].terms[0]
    lit = regex_literal_prefix(pat)
    rx = re.compile(pat)
    # sample words from the same alphabet; any fullmatch must carry the prefix
    for word in ("a", "ab", "abc", "abcd", "abca", "dcba", "aabb", "abab"):
        if rx.fullmatch(word):
            assert word.startswith(lit), (pattern, pat, lit, word)
