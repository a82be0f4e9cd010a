"""Property tests: the byte-domain ASCII fast path of postings_batch is
behaviour-identical to the pure-Python tokenizer on every branch, and
the non-ASCII fallback produces the same grouped shape."""

from __future__ import annotations

from collections import Counter

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from fugu_spark.tokenizer import postings_batch, tokenize_py


def expected_groups(texts):
    out = []
    for i, t in enumerate(texts):
        toks = tokenize_py(t)
        tf = Counter(term for term, _ in toks)
        positions: dict[str, list[int]] = {}
        for term, p in toks:
            positions.setdefault(term, []).append(p)
        for term in tf:
            out.append((i, term, tf[term], tuple(positions[term]), len(toks)))
    return sorted(out)


def got_groups(texts):
    df = postings_batch(pd.Series(texts))
    return sorted(
        (int(r.idx), r.term, int(r.tf), tuple(int(p) for p in r.positions), int(r.doc_len))
        for r in df.itertuples()
    )


CASES = [
    ["merge join merge", "the quick brown fox"],
    ["foo.bar baz_qux 3.14 a@b.com", ""],
    ["x" * 45 + " kept " + "y" * 39, "UPPER lower MiXeD"],
    ["(punct) only!!! ###", "   "],
    ["a" * 39 + " " + "b" * 40 + " tail"],
    ["multi\nline\ttabs  spaces", "1 22 333 4444"],
    ["Ünïcode forces the fallback päth", "ascii here"],  # non-ASCII batch
    [None, "after none"],
    [""],
]


@pytest.mark.parametrize("texts", CASES, ids=range(len(CASES)))
def test_matches_python_oracle(texts):
    cleaned = ["" if t is None else t for t in texts]
    assert got_groups(texts) == expected_groups(cleaned)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.sampled_from(list("abcXYZ019_.!- \n\t") + ["é", "ß"]),
            max_size=60,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_hypothesis_equivalence(texts):
    assert got_groups(texts) == expected_groups(texts)
