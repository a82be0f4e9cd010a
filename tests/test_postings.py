"""Posting-order fixtures (FIXTURES.md §4): tiny corpus with hand-verified
postings, doc_len, df, N, avgdl."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from fugu_spark.postings import build_index, build_postings, corpus_stats, term_stats

DOCS = [
    (0, "the quick brown fox"),
    (1, "the quick quick fox jumps"),
    (2, "brown foxes jump over the lazy dog"),
    (3, "merge join merge join merge"),
    (4, "foo.bar baz_qux"),
    (5, ""),  # token-less doc: counts toward N and avgdl
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, content string")


@pytest.fixture(scope="module")
def index(spark, docs_df):
    return build_index(docs_df)


def test_postings_exact(index):
    rows = {
        (r.term, r.doc_id): (r.tf, list(r.positions), r.doc_len)
        for r in index.postings.collect()
    }
    assert rows[("quick", 1)] == (2, [1, 2], 5)
    assert rows[("the", 0)] == (1, [0], 4)
    assert rows[("merge", 3)] == (3, [0, 2, 4], 5)
    assert rows[("foo", 4)] == (1, [0], 4)
    assert rows[("bar", 4)] == (1, [1], 4)
    assert ("", 5) not in rows
    # postings are unique per (term, doc)
    assert len(rows) == index.postings.count()


def test_doc_sorted_per_term(index):
    per_term = (
        index.postings.groupBy("term")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("docs"))
        .collect()
    )
    the_docs = {r.term: r.docs for r in per_term}["the"]
    assert the_docs == [0, 1, 2]


def test_term_stats(index):
    stats = {r.term: (r.df, r.cf) for r in index.terms.collect()}
    assert stats["the"] == (3, 3)
    assert stats["quick"] == (2, 3)
    assert stats["merge"] == (1, 3)
    assert stats["brown"] == (2, 2)


def test_corpus_stats(index):
    # doc lens: 4,5,7,5,4,0 → total 25, N=6 (token-less doc included)
    assert index.stats.n_docs == 6
    assert index.stats.total_tokens == 25
    assert index.stats.avgdl == pytest.approx(25 / 6)


def test_partition_count_invariance(spark, docs_df):
    """Postings identical at 1 vs 4 partitions (SURVEY.md §5.2 property)."""
    p1 = sorted(
        (r.term, r.doc_id, r.tf, tuple(r.positions))
        for r in build_postings(docs_df.repartition(1)).collect()
    )
    p4 = sorted(
        (r.term, r.doc_id, r.tf, tuple(r.positions))
        for r in build_postings(docs_df.repartition(4)).collect()
    )
    assert p1 == p4


# ---------------------------------------------------------------- PFOR


def test_bitpack_roundtrip_every_width():
    import numpy as np

    from fugu_spark.codecs import bitpack_decode, bitpack_encode

    rng = np.random.default_rng(11)
    for w in range(0, 65):
        for n in (1, 7, 128, 301):
            if w == 0:
                v = np.zeros(n, dtype=np.uint64)
            elif w == 64:
                v = rng.integers(0, 2**63, n).astype(np.uint64) * 2 + 1
            else:
                v = rng.integers(0, 2**w, n, dtype=np.uint64)
            assert np.array_equal(bitpack_decode(bitpack_encode(v, w), n, w), v), (w, n)


def test_pfor_roundtrip_and_dispatch():
    import numpy as np

    from fugu_spark.codecs import (
        pfor_decode,
        pfor_encode,
        stream_decode,
        tagged_varint_encode,
    )

    rng = np.random.default_rng(13)
    cases = [
        np.array([], dtype=np.uint64),
        np.array([0], dtype=np.uint64),
        np.array([2**63 + 5], dtype=np.uint64),
        rng.integers(0, 100, 128).astype(np.uint64),
        np.concatenate([[2**40], rng.integers(0, 50, 127)]).astype(np.uint64),
        rng.integers(0, 2**63, 128).astype(np.uint64),
        np.zeros(128, dtype=np.uint64),
        np.array([0, 2**64 - 1] * 64, dtype=np.uint64),
    ]
    for c in cases:
        assert np.array_equal(pfor_decode(pfor_encode(c), len(c)), c)
        assert np.array_equal(stream_decode(pfor_encode(c), len(c)), c)
        assert np.array_equal(stream_decode(tagged_varint_encode(c), len(c)), c)


def test_pfor_beats_varint_on_dense_blocks():
    """The block-base outlier is patched, so dense posting blocks pack
    at the gap width instead of varint's 1-byte floor."""
    import numpy as np

    from fugu_spark.codecs import pfor_encode, varint_encode

    rng = np.random.default_rng(17)
    deltas = np.concatenate([[10_000_000], rng.integers(1, 16, 127)]).astype(np.uint64)
    assert len(pfor_encode(deltas)) < len(varint_encode(deltas)) + 1


@given(
    st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=0, max_size=400)
)
@settings(deadline=None, max_examples=60)
def test_pfor_roundtrip_hypothesis(vals):
    import numpy as np

    from fugu_spark.codecs import pfor_decode, pfor_encode

    v = np.array(vals, dtype=np.uint64)
    assert np.array_equal(pfor_decode(pfor_encode(v), len(v)), v)


def test_encode_doc_streams_matches_per_block_pfor():
    """The group-level vectorized encoder (round-4 stage-2 fix) must be
    byte-identical to the sequential per-block PFOR-vs-varint choice."""
    import numpy as np

    from fugu_spark.codecs import (
        encode_doc_streams,
        pfor_encode,
        stream_decode,
        varint_encode_lens,
    )

    rng = np.random.default_rng(42)
    for _ in range(10):
        n = int(rng.integers(1, 1500))
        gaps = rng.choice(
            [1, 2, 3, 100, 5000, 2**20, 2**40],
            size=n,
            p=[0.4, 0.2, 0.2, 0.1, 0.05, 0.04, 0.01],
        )
        doc = np.cumsum(gaps.astype(np.uint64))
        bs = np.arange(0, n, 128, dtype=np.int64)
        be = np.minimum(bs + 128, n)
        deltas = np.empty_like(doc)
        deltas[0] = doc[0]
        np.subtract(doc[1:], doc[:-1], out=deltas[1:])
        deltas[bs] = doc[bs]
        b, nb = varint_encode_lens(deltas)
        off = np.concatenate([[0], np.cumsum(nb)]).astype(np.int64)
        new = encode_doc_streams(deltas, bs, be, b, off)
        for k, (s, e) in enumerate(zip(bs, be)):
            pf = pfor_encode(np.ascontiguousarray(deltas[s:e]))
            tv = bytes([0]) + b[off[s] : off[e]]
            old = pf if len(pf) < len(tv) else tv
            assert new[k] == old
            assert np.array_equal(stream_decode(new[k], int(e - s)), deltas[s:e])
