"""Posting-list compression codecs (SURVEY.md §2.4 B3).

Mirrors the Tantivy segment format's shape (public): doc ids are
delta-encoded per posting list and packed in 128-doc blocks; tails and
small streams use varint (LEB128). We use varint for all streams (the
PFOR bitpacking slot is isolated behind the same encode/decode API, so a
bitpacked codec can swap in without touching the segment layer).

Both directions are numpy-vectorized: encode computes per-value byte
lengths and scatters payload bytes; decode processes one varint byte
position per round (≤10 rounds) over the whole array. No per-value
Python in either path.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128  # docs per block (Tantivy format)


def varint_encode_lens(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128-encode a uint64 array (vectorized); also return per-value
    byte lengths so callers can slice the stream at value boundaries."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.zeros(0, dtype=np.int64)
    # bytes needed per value: ceil(bitlen/7), min 1 — computed by
    # threshold comparisons up to the batch max (no per-bit loop)
    vmax = int(v.max())
    nbytes = np.ones(v.shape, dtype=np.int64)
    for k in range(1, 10):
        t = np.uint64(1) << np.uint64(7 * k)
        if vmax < int(t):
            break
        nbytes += v >= t
    offsets = np.concatenate([[0], np.cumsum(nbytes)])
    out = np.zeros(int(offsets[-1]), dtype=np.uint8)
    maxb = int(nbytes.max())
    for b in range(maxb):
        sel = nbytes > b
        chunk = ((v[sel] >> np.uint64(7 * b)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[sel] > b + 1).astype(np.uint8) << 7
        out[offsets[:-1][sel] + b] = chunk | cont
    return out.tobytes(), nbytes


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array (vectorized)."""
    return varint_encode_lens(values)[0]


def varint_decode(buf: bytes, n: int) -> np.ndarray:
    """Decode n LEB128 values from buf (vectorized rounds)."""
    if n == 0:
        return np.array([], dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    if len(raw) == n:
        # every value is a single byte (no continuation bits anywhere)
        return raw.astype(np.uint64)
    is_last = (raw & 0x80) == 0
    ends = np.flatnonzero(is_last)[:n]
    starts = np.concatenate([[0], ends[:-1] + 1])
    lengths = ends - starts + 1
    out = np.zeros(n, dtype=np.uint64)
    maxb = int(lengths.max())
    for b in range(maxb):
        sel = lengths > b
        out[sel] |= (raw[starts[sel] + b].astype(np.uint64) & np.uint64(0x7F)) << np.uint64(7 * b)
    return out


# ---------------------------------------------------------------- PFOR
#
# Patched frame-of-reference (the "PFOR slot" above): each block stores
# values bitpacked at a width w chosen by a cost model; values that do
# not fit ("exceptions" — e.g. the absolute base that leads every block's
# delta stream) are patched in from varint side streams. Streams are
# self-describing: byte 0 is a codec tag so varint and PFOR blocks can
# coexist in one segment file.

CODEC_VARINT = 0
CODEC_PFOR = 1


def _bitlen(values: np.ndarray) -> np.ndarray:
    """Per-value bit length (0 for 0), vectorized.

    frexp on the float64 conversion gives the bit length directly (the
    per-bit shift loop ran up to 64 passes for full-range doc-id bases);
    values ≥ 2^53 can round UP across a power-of-two boundary, which
    overstates by one — fixed by one exact shift check."""
    v = np.asarray(values, dtype=np.uint64)
    _, e = np.frexp(v.astype(np.float64))
    out = np.minimum(e.astype(np.int64), 64)  # top values round to 2^64
    big = v >= np.uint64(1 << 53)
    if big.any():
        sh = np.maximum(out - 1, 0).astype(np.uint64)
        over = big & (out > 0) & ((v >> sh) == 0)
        out[over] -= 1
    return out


def bitpack_encode(values: np.ndarray, width: int) -> bytes:
    """Pack the LOW ``width`` bits of each value, LSB-first within the
    stream (bit i of the stream lives at byte i//8, bit i%8)."""
    if width == 0 or values.size == 0:
        return b""
    v = np.asarray(values, dtype=np.uint64)
    bits = ((v[:, None] >> np.arange(width, dtype=np.uint64)) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.ravel(), bitorder="little").tobytes()


def bitpack_decode(buf: bytes, n: int, width: int) -> np.ndarray:
    """Vectorized decode, two strategies by width: narrow widths (the
    common case for doc-gap frames) use unpackbits + a ``width``-step
    bit fold (memcpy-fast); wide widths use an 8-byte window gather per
    value (O(n) independent of width)."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    if width <= 12:
        bits = np.unpackbits(raw, count=n * width, bitorder="little").reshape(n, width)
        out = np.zeros(n, dtype=np.uint64)
        for b in range(width):
            out |= bits[:, b].astype(np.uint64) << np.uint64(b)
        return out
    from numpy.lib.stride_tricks import sliding_window_view

    padded = np.concatenate([raw, np.zeros(8, dtype=np.uint8)])
    bit_off = np.arange(n, dtype=np.int64) * width
    byte_off = bit_off >> 3
    shift = (bit_off & 7).astype(np.uint64)
    words = np.ascontiguousarray(sliding_window_view(padded, 8)[byte_off]).view("<u8").ravel()
    out = words >> shift
    if width > 56:
        # a value can span 9 bytes; fold the 9th in (only when shift > 0,
        # else words already holds all 64 bits)
        extra = padded[byte_off + 8].astype(np.uint64)
        shifted_in = extra << (np.uint64(64) - np.where(shift == 0, np.uint64(1), shift))
        out = np.where(shift == 0, out, out | shifted_in)
    if width >= 64:
        return out
    return out & np.uint64((1 << width) - 1)


def pfor_encode(values: np.ndarray) -> bytes:
    """One ≤2^16-value block → tagged PFOR stream.

    Layout: [tag=1][width u8][n_exceptions u16 LE][packed low bits]
    [varint exception positions (delta-encoded)][varint exception high
    bits (value >> width)]. Width minimizes total bytes over candidate
    widths (every distinct bit length present), so a lone outlier (the
    absolute block base) costs two varints, not 64-bit frames for all.
    """
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return bytes([CODEC_PFOR, 0, 0, 0])
    if n >= 1 << 16:
        raise ValueError("pfor block too large")
    lens = _bitlen(v)
    cands = np.unique(lens)
    best_w, best_cost = int(cands[-1]), None
    for w in cands:
        n_exc = int((lens > w).sum())
        # exceptions: ~1.5 B position delta + high-bits varint
        high = v[lens > w] >> np.uint64(w)
        exc_bytes = n_exc + int(np.maximum((_bitlen(high) + 6) // 7, 1).sum()) if n_exc else 0
        cost = (n * int(w) + 7) // 8 + exc_bytes
        if best_cost is None or cost < best_cost:
            best_cost, best_w = cost, int(w)
    w = best_w
    exc_mask = lens > w
    n_exc = int(exc_mask.sum())
    if w >= 64:
        mask = np.uint64(0xFFFFFFFFFFFFFFFF)
    else:
        mask = np.uint64((1 << w) - 1)
    low = (v & mask) if w else np.zeros_like(v)
    head = bytes([CODEC_PFOR, w]) + int(n_exc).to_bytes(2, "little")
    body = bitpack_encode(low, w)
    if n_exc:
        pos = np.flatnonzero(exc_mask).astype(np.uint64)
        body += varint_encode(delta_encode(pos))
        body += varint_encode(v[exc_mask] >> np.uint64(w))
    return head + body


def pfor_decode(buf: bytes, n: int) -> np.ndarray:
    if not buf or buf[0] != CODEC_PFOR:
        raise ValueError("not a pfor stream")
    w = buf[1]
    n_exc = int.from_bytes(buf[2:4], "little")
    off = 4
    packed_len = (n * w + 7) // 8
    out = bitpack_decode(buf[off : off + packed_len], n, w)
    off += packed_len
    if n_exc:
        rest = np.frombuffer(buf[off:], dtype=np.uint8)
        is_last = (rest & 0x80) == 0
        ends = np.flatnonzero(is_last)
        pos_bytes = int(ends[n_exc - 1]) + 1
        pos = delta_decode(varint_decode(buf[off : off + pos_bytes], n_exc)).astype(np.int64)
        high = varint_decode(buf[off + pos_bytes :], n_exc)
        out[pos] |= high << np.uint64(w)
    return out


# Cost tables for the vectorized group-level width search (encode_doc_streams):
# _HB[w, l] = varint bytes for the high bits (bitlen l - w) of an exception with
# bit length l under packing width w (0 when l <= w, i.e. not an exception).
_WIDTHS = np.arange(65, dtype=np.int64)
_HB = np.zeros((65, 65), dtype=np.int64)
for _w in range(65):
    for _l in range(_w + 1, 65):
        _HB[_w, _l] = (_l - _w + 6) // 7
_TAGV = bytes([CODEC_VARINT])


def encode_doc_streams(
    deltas: np.ndarray,
    block_starts: np.ndarray,
    block_ends: np.ndarray,
    varint_stream: bytes,
    varint_off: np.ndarray,
) -> list[bytes]:
    """Tagged doc-id stream for EVERY block of a posting group at once:
    PFOR when it packs smaller than the (pre-sliced) tagged-varint
    stream, else varint.

    Byte-identical to calling ``pfor_encode`` per block and keeping the
    smaller stream (exact for blocks ≤ 128 docs, where exception-position
    varints are always 1 byte), but the width search runs ONCE per group
    — a per-block bit-length histogram, a reverse cumsum for exception
    counts, and one (blocks × 65) @ (65 × 65) matmul for exception high
    bytes — instead of a per-candidate-width numpy loop per 128-doc
    block. Bitpacking is batched by (width, block length), so numpy call
    count per group is O(distinct widths), not O(widths × blocks). This
    removes the round-3 stage-2 encode regression (per-block fixed
    overhead at ~174k blocks).

    ``varint_off`` is the per-value byte-offset array from
    ``varint_encode_lens`` (length n+1 after the caller's cumsum).
    """
    v = np.ascontiguousarray(deltas, dtype=np.uint64)
    block_starts = np.asarray(block_starts, dtype=np.int64)
    block_ends = np.asarray(block_ends, dtype=np.int64)
    n_blocks = len(block_starts)
    nk = block_ends - block_starts
    lens = _bitlen(v)
    block_idx = np.repeat(np.arange(n_blocks, dtype=np.int64), nk)
    hist = np.zeros((n_blocks, 65), dtype=np.int64)
    np.add.at(hist, (block_idx, lens), 1)
    revc = np.cumsum(hist[:, ::-1], axis=1)[:, ::-1]  # revc[:, w] = #values with bitlen >= w
    n_exc = np.zeros((n_blocks, 65), dtype=np.int64)
    n_exc[:, :-1] = revc[:, 1:]  # #values with bitlen > w
    highbytes = hist @ _HB.T  # [k, w] = total high-bit varint bytes at width w
    packed_b = (nk[:, None] * _WIDTHS + 7) >> 3
    cost = packed_b + np.where(n_exc > 0, n_exc + highbytes, 0)
    # candidate widths = bit lengths present in the block (matches pfor_encode);
    # ties resolve to the lowest width, as in the sequential loop
    cost = np.where(hist > 0, cost, np.iinfo(np.int64).max)
    best_w = np.argmin(cost, axis=1).astype(np.int64)
    ar = np.arange(n_blocks)
    pfor_size = 4 + cost[ar, best_w]
    varint_size = 1 + (varint_off[block_ends] - varint_off[block_starts])
    use_pfor = pfor_size < varint_size

    streams: list[bytes] = [b""] * n_blocks
    for k in np.flatnonzero(~use_pfor):
        s, e = block_starts[k], block_ends[k]
        streams[int(k)] = _TAGV + varint_stream[varint_off[s] : varint_off[e]]
    pblocks = np.flatnonzero(use_pfor)
    if not pblocks.size:
        return streams

    # exceptions across ALL pfor blocks in one pass: positions are
    # delta-encoded per block (reset at block firsts), high bits varint
    w_of_val = best_w[block_idx]
    exc_mask = (lens > w_of_val) & use_pfor[block_idx]
    exc_idx = np.flatnonzero(exc_mask)
    exc_block = block_idx[exc_idx]
    exc_counts = np.bincount(exc_block, minlength=n_blocks).astype(np.int64)
    exc_off = np.concatenate([[0], np.cumsum(exc_counts)]).astype(np.int64)
    if exc_idx.size:
        pos_in_block = (exc_idx - block_starts[exc_block]).astype(np.uint64)
        d = pos_in_block.copy()
        d[1:] = pos_in_block[1:] - pos_in_block[:-1]
        firsts = np.flatnonzero(np.concatenate([[True], exc_block[1:] != exc_block[:-1]]))
        d[firsts] = pos_in_block[firsts]
        pos_b, pos_nb = varint_encode_lens(d)
        high_b, high_nb = varint_encode_lens(v[exc_idx] >> w_of_val[exc_idx].astype(np.uint64))
        pos_cum = np.concatenate([[0], np.cumsum(pos_nb)]).astype(np.int64)
        high_cum = np.concatenate([[0], np.cumsum(high_nb)]).astype(np.int64)
    else:
        pos_b = high_b = b""
        pos_cum = high_cum = np.zeros(1, dtype=np.int64)

    # bitpack low bits: ONE bit-scatter pass per width over every block
    # of that width (variable block lengths batch together; each block's
    # frame starts byte-aligned, so the per-block byte slices are exact
    # and identical to per-block bitpack_encode). The previous
    # per-(width, block-length) grouping degenerated into hundreds of
    # tiny matrix ops when many tail lengths met in one batched call.
    packed_bytes: dict[int, bytes] = {}
    for w in np.unique(best_w[pblocks]):
        w = int(w)
        sel = pblocks[best_w[pblocks] == w]
        if w == 0:
            for k in sel:
                packed_bytes[int(k)] = b""
            continue
        mask = np.uint64(0xFFFFFFFFFFFFFFFF) if w >= 64 else np.uint64((1 << w) - 1)
        full = sel[nk[sel] == BLOCK_SIZE]
        if full.size:
            # full blocks: one dense (n × w) unpack + a single packbits
            # (BLOCK_SIZE·w bits per block is always byte-aligned)
            idx = (
                block_starts[full][:, None] + np.arange(BLOCK_SIZE, dtype=np.int64)
            ).ravel()
            vals = v[idx] & mask
            bits = (
                (vals[:, None] >> np.arange(w, dtype=np.uint64)) & np.uint64(1)
            ).astype(np.uint8)
            packed = np.packbits(bits.ravel(), bitorder="little").tobytes()
            per = (BLOCK_SIZE * w) >> 3
            for j, k in enumerate(full):
                packed_bytes[int(k)] = packed[j * per : (j + 1) * per]
        tails = sel[nk[sel] != BLOCK_SIZE]
        if tails.size:
            # tail blocks (any mix of lengths): one bit-scatter per bit
            # position; every block's frame starts byte-aligned so the
            # per-block byte slices equal per-block bitpack_encode
            cnts = nk[tails]
            blen = (cnts * w + 7) >> 3
            bstart = np.concatenate([[0], np.cumsum(blen)]).astype(np.int64)
            seg_j = np.arange(int(cnts.sum()), dtype=np.int64) - np.repeat(
                np.cumsum(cnts) - cnts, cnts
            )
            vals = v[np.repeat(block_starts[tails], cnts) + seg_j] & mask
            base = np.repeat(bstart[:-1] * 8, cnts) + seg_j * w
            bitbuf = np.zeros(int(bstart[-1]) * 8, dtype=np.uint8)
            for bit in range(w):
                bitbuf[base + bit] = (
                    (vals >> np.uint64(bit)) & np.uint64(1)
                ).astype(np.uint8)
            packed = np.packbits(bitbuf, bitorder="little").tobytes()
            for j, k in enumerate(tails):
                packed_bytes[int(k)] = packed[bstart[j] : bstart[j + 1]]

    for k in pblocks:
        k = int(k)
        w = int(best_w[k])
        ne = int(exc_counts[k])
        body = packed_bytes[k]
        if ne:
            a, b = exc_off[k], exc_off[k + 1]
            body += pos_b[pos_cum[a] : pos_cum[b]] + high_b[high_cum[a] : high_cum[b]]
        streams[k] = bytes([CODEC_PFOR, w]) + ne.to_bytes(2, "little") + body
    return streams


def tagged_varint_encode(values: np.ndarray) -> bytes:
    """Varint stream with the codec tag byte (coexists with PFOR)."""
    return bytes([CODEC_VARINT]) + varint_encode(values)


def stream_decode(buf: bytes, n: int) -> np.ndarray:
    """Decode a TAGGED stream (varint or pfor). Untagged legacy streams
    are not auto-detected — segment files carry tags from 0.4.0 on."""
    if n == 0:
        return np.array([], dtype=np.uint64)
    tag = buf[0]
    if tag == CODEC_PFOR:
        return pfor_decode(buf, n)
    if tag == CODEC_VARINT:
        return varint_decode(buf[1:], n)
    raise ValueError(f"unknown codec tag {tag}")


def batched_stream_decode(bufs: list, counts: np.ndarray) -> np.ndarray:
    """Decode MANY tagged streams (varint or PFOR) in a handful of
    vectorized passes → ONE concatenated uint64 array of Σcounts values
    (slice with the cumsum of ``counts``).

    Per-stream ``stream_decode`` in a loop pays fixed numpy call
    overhead for every tiny block stream — the dominant cost of a COLD
    serving query (r5 profile: ~370 stream decodes for a 2-term query).
    Batching collapses that: all varint payloads concatenate into one
    ``varint_decode`` (LEB128 is self-delimiting, so stream k's values
    begin exactly after the first Σ_{i<k} n_i terminators); PFOR
    low-bit frames batch per width with global bit offsets (each body
    starts byte-aligned in the concat); PFOR exception sections
    concatenate into one varint pass ([pos-deltas, highs] per stream,
    in order) and patch with a vectorized scatter. Byte-identical
    results to the per-stream path are pinned by tests."""
    counts = np.asarray(counts, dtype=np.int64)
    total = int(counts.sum())
    out = np.zeros(total, dtype=np.uint64)
    val_offs = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)

    # classify all streams in one pass over the 4-byte headers — the
    # per-buf dict/int.from_bytes loop was per-block Python overhead on
    # cold queries with thousands of blocks
    tags = np.fromiter(
        (b[0] if len(b) else 255 for b in bufs), dtype=np.uint8, count=len(bufs)
    )
    live = counts > 0
    known = (tags == CODEC_VARINT) | (tags == CODEC_PFOR)
    if bool((live & ~known).any()):
        bad = int(np.flatnonzero(live & ~known)[0])
        raise ValueError(f"unknown codec tag {bufs[bad][0]}")
    v_idx = np.flatnonzero(live & (tags == CODEC_VARINT))
    p_idx = np.flatnonzero(live & (tags == CODEC_PFOR))
    if p_idx.size:
        heads = b"".join(bufs[i][1:4] for i in p_idx)
        h = np.frombuffer(heads, np.uint8).reshape(-1, 3)
        p_widths = h[:, 0].astype(np.int64)
        p_nexc = h[:, 1].astype(np.int64) | (h[:, 2].astype(np.int64) << 8)
    else:
        p_widths = p_nexc = np.zeros(0, dtype=np.int64)
    e_sel = p_nexc > 0
    exc_idx = p_idx[e_sel]

    if v_idx.size:
        payload = b"".join(bufs[i][1:] for i in v_idx)
        ns = counts[v_idx]
        nv = int(ns.sum())
        vals = varint_decode(payload, nv)
        seg = np.arange(nv, dtype=np.int64) - np.repeat(np.cumsum(ns) - ns, ns)
        out[np.repeat(val_offs[v_idx], ns) + seg] = vals

    for w in np.unique(p_widths):
        w = int(w)
        idxs = p_idx[p_widths == w]
        ns = counts[idxs]
        if w == 0:
            continue  # low bits all zero; exceptions patch below
        plens = (ns * w + 7) // 8
        bodies = b"".join(
            bufs[i][4 : 4 + int(pl)] for i, pl in zip(idxs, plens)
        )
        byte0 = np.concatenate([[0], np.cumsum(plens)])[:-1]
        nvals = int(ns.sum())
        # within-stream value index (segmented arange)
        seg = np.arange(nvals, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(ns)])[:-1], ns
        )
        if w <= 12:
            allbits = np.unpackbits(
                np.frombuffer(bodies, dtype=np.uint8), bitorder="little"
            )
            bit0 = np.repeat(byte0 * 8, ns) + seg * w
            vals = np.zeros(nvals, dtype=np.uint64)
            for b in range(w):
                vals |= allbits[bit0 + b].astype(np.uint64) << np.uint64(b)
        else:
            from numpy.lib.stride_tricks import sliding_window_view

            padded = np.concatenate(
                [np.frombuffer(bodies, dtype=np.uint8), np.zeros(8, dtype=np.uint8)]
            )
            bit_off = seg * w
            gbyte = np.repeat(byte0, ns) + (bit_off >> 3)
            shift = (bit_off & 7).astype(np.uint64)
            words = (
                np.ascontiguousarray(sliding_window_view(padded, 8)[gbyte])
                .view("<u8")
                .ravel()
            )
            vals = words >> shift
            if w > 56:
                extra = padded[gbyte + 8].astype(np.uint64)
                shifted_in = extra << (
                    np.uint64(64) - np.where(shift == 0, np.uint64(1), shift)
                )
                vals = np.where(shift == 0, vals, vals | shifted_in)
            if w < 64:
                vals = vals & np.uint64((1 << w) - 1)
        dest = np.repeat(val_offs[idxs], ns) + seg
        out[dest] = vals

    if exc_idx.size:
        # one varint pass over every exception section: per stream the
        # section is [n_exc pos-deltas][n_exc high-bit values], in order
        ws = p_widths[e_sel]
        n_excs = p_nexc[e_sel]
        plens = (counts[exc_idx] * ws + 7) // 8
        sections = b"".join(
            bufs[i][4 + int(pl) :] for i, pl in zip(exc_idx, plens)
        )
        total_exc = int(n_excs.sum())
        vals = varint_decode(sections, 2 * total_exc)
        # vectorized patch across ALL exception sections: per stream k the
        # section holds [ne pos-deltas][ne highs] at offset 2·Σ_{j<k} ne_j
        starts = np.concatenate([[0], np.cumsum(n_excs)[:-1]]).astype(np.int64)
        j = np.arange(total_exc, dtype=np.int64) - np.repeat(starts, n_excs)
        base2 = 2 * np.repeat(starts, n_excs)
        pos_deltas = vals[base2 + j]
        highs = vals[base2 + np.repeat(n_excs, n_excs) + j]
        # per-stream delta→absolute: global cumsum, carry reset at starts
        g = np.cumsum(pos_deltas, dtype=np.uint64)
        corr = np.zeros(len(starts), dtype=np.uint64)
        if len(starts) > 1:
            corr[1:] = g[starts[1:] - 1]
        pos_abs = (g - np.repeat(corr, n_excs)).astype(np.int64) + np.repeat(
            val_offs[np.asarray(exc_idx, dtype=np.int64)], n_excs
        )
        out[pos_abs] |= highs << np.repeat(
            np.asarray(ws, dtype=np.uint64), n_excs
        )
    return out


def delta_encode(sorted_vals: np.ndarray) -> np.ndarray:
    """Ascending values → [first, gaps...] (uint64)."""
    v = np.asarray(sorted_vals, dtype=np.uint64)
    if v.size == 0:
        return v
    out = np.empty_like(v)
    out[0] = v[0]
    np.subtract(v[1:], v[:-1], out=out[1:])
    return out


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    d = np.asarray(deltas, dtype=np.uint64)
    return np.cumsum(d, dtype=np.uint64)


def encode_posting_block(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    doc_lens: np.ndarray,
    positions_flat: np.ndarray | None = None,
    positions_counts: np.ndarray | None = None,
) -> dict:
    """Encode one ≤128-doc block of a posting list (doc_ids ascending).

    Returns dict with encoded byte streams + skip metadata (B6):
    max_doc_id for block skipping, max_tf + min_doc_len for block-max
    score bounds (WAND).
    """
    doc_ids = np.asarray(doc_ids, dtype=np.uint64)
    tfs = np.asarray(tfs, dtype=np.uint64)
    doc_lens = np.asarray(doc_lens, dtype=np.uint64)
    deltas = delta_encode(doc_ids)
    pf = pfor_encode(deltas)
    tv = tagged_varint_encode(deltas)
    enc = {
        "n_docs": int(doc_ids.size),
        "doc_ids_enc": pf if len(pf) < len(tv) else tv,
        "tfs_enc": tagged_varint_encode(tfs),
        "doc_lens_enc": tagged_varint_encode(doc_lens),
        "max_doc_id": int(doc_ids[-1]) if doc_ids.size else 0,
        "min_doc_id": int(doc_ids[0]) if doc_ids.size else 0,
        "max_tf": int(tfs.max()) if tfs.size else 0,
        "min_doc_len": int(doc_lens.min()) if doc_lens.size else 0,
    }
    if positions_flat is not None:
        # per-doc position lists: counts stream + per-doc delta-encoded flat stream
        pf = np.asarray(positions_flat, dtype=np.uint64)
        pc = np.asarray(positions_counts, dtype=np.uint64)
        if pf.size:
            # delta within each doc's list: subtract previous, reset at doc starts
            deltas = pf.copy()
            deltas[1:] = pf[1:] - pf[:-1]
            starts = np.concatenate([[0], np.cumsum(pc)[:-1]]).astype(np.int64)
            deltas[starts] = pf[starts]
            enc["positions_enc"] = tagged_varint_encode(deltas)
        else:
            enc["positions_enc"] = bytes([CODEC_VARINT])
        enc["pos_counts_enc"] = tagged_varint_encode(pc)
    else:
        enc["positions_enc"] = b""
        enc["pos_counts_enc"] = b""
    return enc


def decode_posting_blocks_batched(
    n_docs,
    doc_ids_enc: list,
    tfs_enc: list,
    doc_lens_enc: list,
    pos_counts_enc: list | None = None,
    positions_enc: list | None = None,
    flat_positions: bool = False,
) -> dict:
    """Decode MANY posting blocks in a few vectorized passes (the batch
    form of :func:`decode_posting_block`; value-identical, pinned by
    tests). Returns CONCATENATED arrays across blocks, in block order:

      doc_ids / tfs / doc_lens — length Σ n_docs
      block_starts — int64 offsets of each block in the concat
      positions — list of per-doc int arrays (only when pos streams
      given); pos_counts — per-doc counts, length Σ n_docs

    ``flat_positions=True`` skips the per-doc ``np.split`` and returns
    ``positions_flat`` (one uint64 array of Σ pos_counts values) +
    ``pos_offsets`` (int64, length Σ n_docs + 1) instead of
    ``positions`` — the split into ~one tiny array per DOC was the
    dominant cold phrase-query cost (r6 profile: np.split ≈ 80% of the
    batched decode), and every consumer re-concatenated them anyway.

    Per-block delta→absolute for doc ids (and per-doc for positions)
    uses one global cumsum with a carry subtraction at block/doc starts
    — no per-block Python."""
    n = np.asarray(n_docs, dtype=np.int64)
    total = int(n.sum())
    starts = np.concatenate([[0], np.cumsum(n)[:-1]]).astype(np.int64)
    deltas = batched_stream_decode(doc_ids_enc, n)
    g = np.cumsum(deltas, dtype=np.uint64)
    corr = np.zeros(len(starts), dtype=np.uint64)
    if len(starts) > 1:
        corr[1:] = g[starts[1:] - 1]
    out = {
        "doc_ids": g - np.repeat(corr, n),
        "tfs": batched_stream_decode(tfs_enc, n),
        "doc_lens": batched_stream_decode(doc_lens_enc, n),
        "block_starts": starts,
        "n_total": total,
    }
    if pos_counts_enc is not None:
        pcounts = batched_stream_decode(pos_counts_enc, n)
        ptotals = (
            np.add.reduceat(pcounts.astype(np.int64), starts)
            if total
            else np.zeros(len(n), dtype=np.int64)
        )
        pdeltas = batched_stream_decode(positions_enc, ptotals)
        if pdeltas.size:
            g2 = np.cumsum(pdeltas, dtype=np.uint64)
            dstarts = np.concatenate([[0], np.cumsum(pcounts)[:-1]]).astype(np.int64)
            corr2 = np.zeros(len(dstarts), dtype=np.uint64)
            nz = dstarts > 0
            corr2[nz] = g2[dstarts[nz] - 1]
            flat = g2 - np.repeat(corr2, pcounts.astype(np.int64))
        else:
            flat = np.array([], dtype=np.uint64)
        if flat_positions:
            out["positions_flat"] = flat
            out["pos_offsets"] = np.concatenate([[0], np.cumsum(pcounts)]).astype(
                np.int64
            )
        elif flat.size:
            out["positions"] = np.split(
                flat, np.cumsum(pcounts)[:-1].astype(np.int64)
            )
        else:
            out["positions"] = [np.array([], dtype=np.uint64)] * total
        out["pos_counts"] = pcounts
    return out


def decode_posting_block(block: dict) -> dict:
    """Inverse of encode_posting_block → arrays (doc_ids, tfs, doc_lens,
    positions list-of-arrays if present)."""
    n = int(block["n_docs"])
    doc_ids = delta_decode(stream_decode(block["doc_ids_enc"], n))
    tfs = stream_decode(block["tfs_enc"], n)
    doc_lens = stream_decode(block["doc_lens_enc"], n)
    out = {"doc_ids": doc_ids, "tfs": tfs, "doc_lens": doc_lens}
    pc_buf = block.get("pos_counts_enc", b"") or b""
    if len(pc_buf):
        counts = stream_decode(pc_buf, n)
        total = int(counts.sum())
        deltas = stream_decode(block.get("positions_enc", b"") or b"", total)
        if total:
            # per-doc cumsum = global cumsum minus the carry at each doc start
            g = np.cumsum(deltas, dtype=np.uint64)
            starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
            corr = np.zeros(len(starts), dtype=np.uint64)
            corr[1:] = g[starts[1:] - 1]
            flat = g - np.repeat(corr, counts.astype(np.int64))
            out["positions"] = np.split(flat, np.cumsum(counts)[:-1].astype(np.int64))
            out["pos_counts"] = counts
        else:
            out["positions"] = [np.array([], dtype=np.uint64)] * n
            out["pos_counts"] = counts
    return out
