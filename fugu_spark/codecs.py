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
    # bytes needed per value: ceil(bitlen/7), min 1
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        nbits[nz] += 1
        tmp = tmp >> np.uint64(1)
    nbytes = np.maximum((nbits + 6) // 7, 1)
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
    enc = {
        "n_docs": int(doc_ids.size),
        "doc_ids_enc": varint_encode(delta_encode(doc_ids)),
        "tfs_enc": varint_encode(tfs),
        "doc_lens_enc": varint_encode(doc_lens),
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
            enc["positions_enc"] = varint_encode(deltas)
        else:
            enc["positions_enc"] = b""
        enc["pos_counts_enc"] = varint_encode(pc)
    else:
        enc["positions_enc"] = b""
        enc["pos_counts_enc"] = b""
    return enc


def decode_posting_block(block: dict) -> dict:
    """Inverse of encode_posting_block → arrays (doc_ids, tfs, doc_lens,
    positions list-of-arrays if present)."""
    n = int(block["n_docs"])
    doc_ids = delta_decode(varint_decode(block["doc_ids_enc"], n))
    tfs = varint_decode(block["tfs_enc"], n)
    doc_lens = varint_decode(block["doc_lens_enc"], n)
    out = {"doc_ids": doc_ids, "tfs": tfs, "doc_lens": doc_lens}
    pc_buf = block.get("pos_counts_enc", b"") or b""
    if len(pc_buf):
        counts = varint_decode(pc_buf, n)
        total = int(counts.sum())
        deltas = varint_decode(block.get("positions_enc", b"") or b"", total)
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
