"""batched_stream_decode / decode_posting_blocks_batched must be
value-identical to the per-stream / per-block decoders — the cold-path
batching (r5) changes call shape, never bytes."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from fugu_spark.codecs import (
    batched_stream_decode,
    decode_posting_block,
    decode_posting_blocks_batched,
    encode_posting_block,
    pfor_encode,
    stream_decode,
    tagged_varint_encode,
)


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=2**40), min_size=0, max_size=200),
        min_size=1,
        max_size=20,
    ),
    st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_batched_stream_decode_matches_per_stream(value_lists, use_pfor):
    bufs, counts = [], []
    for vals in value_lists:
        arr = np.asarray(vals, dtype=np.uint64)
        enc = pfor_encode(arr) if use_pfor else tagged_varint_encode(arr)
        bufs.append(enc)
        counts.append(len(arr))
    got = batched_stream_decode(bufs, np.asarray(counts))
    want = np.concatenate(
        [stream_decode(b, c) for b, c in zip(bufs, counts)]
        or [np.array([], dtype=np.uint64)]
    )
    assert np.array_equal(got, want)


def test_batched_mixed_codecs_and_widths():
    rng = np.random.default_rng(7)
    bufs, counts, want = [], [], []
    for i in range(40):
        n = int(rng.integers(1, 128))
        scale = int(rng.choice([3, 100, 2**13, 2**25, 2**45, 2**60]))
        vals = rng.integers(0, scale, size=n).astype(np.uint64)
        if i % 5 == 0:
            vals[0] = np.uint64(2**62)  # force a wide exception
        enc = pfor_encode(vals) if i % 2 else tagged_varint_encode(vals)
        bufs.append(enc)
        counts.append(n)
        want.append(stream_decode(enc, n))
    got = batched_stream_decode(bufs, np.asarray(counts))
    assert np.array_equal(got, np.concatenate(want))


@pytest.mark.parametrize("with_pos", [False, True])
def test_batched_block_decode_matches_per_block(with_pos):
    rng = np.random.default_rng(11)
    blocks = []
    base = 0
    for _ in range(25):
        n = int(rng.integers(1, 128))
        doc_ids = np.sort(
            rng.choice(np.arange(base, base + 10_000), size=n, replace=False)
        ).astype(np.uint64)
        base += 10_000
        tfs = rng.integers(1, 30, size=n).astype(np.uint64)
        dls = rng.integers(5, 500, size=n).astype(np.uint64)
        if with_pos:
            counts = tfs.copy()
            flat = np.concatenate(
                [np.sort(rng.integers(0, 1000, size=int(c))) for c in counts]
            ).astype(np.uint64)
            enc = encode_posting_block(doc_ids, tfs, dls, flat, counts)
        else:
            enc = encode_posting_block(doc_ids, tfs, dls)
        blocks.append(enc)

    got = decode_posting_blocks_batched(
        [b["n_docs"] for b in blocks],
        [b["doc_ids_enc"] for b in blocks],
        [b["tfs_enc"] for b in blocks],
        [b["doc_lens_enc"] for b in blocks],
        [b["pos_counts_enc"] for b in blocks] if with_pos else None,
        [b["positions_enc"] for b in blocks] if with_pos else None,
    )
    off = 0
    for b in blocks:
        dec = decode_posting_block(b)
        n = b["n_docs"]
        assert np.array_equal(got["doc_ids"][off : off + n], dec["doc_ids"])
        assert np.array_equal(got["tfs"][off : off + n], dec["tfs"])
        assert np.array_equal(got["doc_lens"][off : off + n], dec["doc_lens"])
        if with_pos:
            for j in range(n):
                assert np.array_equal(got["positions"][off + j], dec["positions"][j])
        off += n
    assert off == got["n_total"]
