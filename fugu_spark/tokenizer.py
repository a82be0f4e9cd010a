"""Tokenizers — the analysis chain of the engine.

Two modes (SURVEY.md §2.3, decision §7.3):

``tantivy_default`` (NORMATIVE)
    What the running reference actually computes: fugu declares its text
    fields ``TEXT`` (/root/reference/src/db/schemas.rs:9-17), so Tantivy
    0.24's default analyzer runs: split on non-alphanumeric (Unicode,
    underscore is NOT alphanumeric), drop tokens whose UTF-8 byte length
    is >= 40 (RemoveLongFilter::limit(40)), lowercase. Token positions are
    ordinals assigned BEFORE the long-token filter (filters drop tokens
    but do not renumber), which matters for phrase adjacency.

``standard_tokenizer`` (dead-code spec, selectable)
    fugu's hand-written StandardTokenizer
    (/root/reference/src/tokeinze.rs:120-235): per text, skip whitespace;
    a token is the first non-whitespace char plus the following run of
    ``[alnum_]``; classify via a priority regex cascade
    (/root/reference/src/tokeinze.rs:106-116); indexing drops
    Punctuation/PageHeader tokens and lowercases
    (/root/reference/src/tokeinze.rs:317-357). Positions are byte
    offsets of token start. Pinned quirks: ``foo.bar`` indexes only
    ``foo`` (``.bar`` classifies Punctuation); ``foo_bar`` is dropped
    entirely (underscore fails the Word/AlphaNum regexes).

The normative mode is implemented with pure pandas string ops (no per-row
Python) so it vectorizes inside Arrow batches; the dead-spec mode is a
secondary fixture target and uses compiled-regex row iteration.
"""

from __future__ import annotations

import re

import pandas as pd

from . import MAX_TOKEN_BYTES

# Unicode alphanumeric runs, underscore excluded (Rust char::is_alphanumeric).
TANTIVY_TOKEN_RE = re.compile(r"[^\W_]+", re.UNICODE)

# StandardTokenizer: any non-ws char then a run of word chars (alnum or _).
STANDARD_TOKEN_RE = re.compile(r"\S\w*", re.UNICODE)

# Classification cascade, priority order (/root/reference/src/tokeinze.rs:106-116).
_CLASS_PATTERNS = [
    ("email", re.compile(r"^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}$")),
    ("url", re.compile(r"^https?://[^\s/$.?#].[^\s]*$")),
    ("host", re.compile(r"^[a-zA-Z0-9-]+(\.[a-zA-Z0-9-]+)+$")),
    ("acronym", re.compile(r"^[A-Z](\.[A-Z])+$")),
    ("number", re.compile(r"^[0-9]+(\.[0-9]+)?$")),
    ("word", re.compile(r"^[a-zA-Z]+$")),
    ("alphanum", re.compile(r"^[a-zA-Z0-9]+$")),
    ("pagehead", re.compile(r"<!--\s*Page number:\s*\d+\s*-->$")),
]
_DROPPED_CLASSES = {"punctuation", "pagehead"}  # src/tokeinze.rs:332-341

MODES = ("tantivy_default", "standard_tokenizer", "code")
DEFAULT_MODE = "tantivy_default"

# ``code`` mode (EXTENSION — not in the reference, which declares all
# fields TEXT with the Tantivy default analyzer): identifier-aware
# analysis for source-code corpora. Implemented as a pure text
# PREPROCESS — insert a space at camelCase / acronym / letter↔digit
# boundaries — followed by the normative tantivy_default pipeline, so
# every downstream property (position ordinals, 40-byte long-token
# filter, lowercase, phrase adjacency) is inherited unchanged and the
# SQL oracle is the same regexp_replace chain. snake_case needs no
# rule: underscore is already a tantivy_default split point. Patterns
# are RE2-safe (no lookaround) so DuckDB/RE2 and Python/Java agree.
#   parseHTTPResponse → parse http response     utf8Parser → utf 8 parser
#   "http response" (phrase) matches inside parseHTTPResponse.
_CODE_BOUNDARY_RES = [
    (re.compile(r"([A-Z]+)([A-Z][a-z])"), r"\1 \2"),  # HTTPResponse → HTTP Response
    (re.compile(r"([a-z0-9])([A-Z])"), r"\1 \2"),  # parseHTTP → parse HTTP
    (re.compile(r"([a-zA-Z])([0-9])"), r"\1 \2"),  # utf8 → utf 8
    (re.compile(r"([0-9])([a-zA-Z])"), r"\1 \2"),  # 8bit → 8 bit
]


def _code_preprocess(text: str) -> str:
    for pat, rep in _CODE_BOUNDARY_RES:
        text = pat.sub(rep, text)
    return text

# ASCII fast path: lookup table of [0-9A-Za-z] (Tantivy's is_alphanumeric
# restricted to ASCII — exact on ASCII input, which is the overwhelming
# case for source code; non-ASCII batches take the general regex path).
import numpy as _np

_ALNUM = _np.zeros(256, dtype=bool)
for _c in b"0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz":
    _ALNUM[_c] = True

# ASCII lowercase lookup table (A-Z → a-z, all else identity)
_LOWER_LUT = _np.arange(256, dtype=_np.uint8)
_LOWER_LUT[65:91] += 32


def classify_token(text: str) -> str:
    """Token class per the reference cascade (src/tokeinze.rs:192-235)."""
    for name, pat in _CLASS_PATTERNS:
        if pat.match(text):
            return name
    return "punctuation"


def tokenize_py(text: str, mode: str = DEFAULT_MODE) -> list[tuple[str, int]]:
    """Pure-Python single-string tokenizer: ``[(term, position), ...]``.

    The oracle used by fixtures and by driver-side query tokenization
    (queries are tiny — T5, src/tokeinze.rs:360-378). Must stay
    behaviour-identical to the vectorized batch path below.
    """
    out: list[tuple[str, int]] = []
    if text is None:
        return out
    if mode == "code":
        text, mode = _code_preprocess(text), "tantivy_default"
    if mode == "tantivy_default":
        for pos, m in enumerate(TANTIVY_TOKEN_RE.finditer(text)):
            tok = m.group(0)
            if len(tok.encode("utf-8")) < MAX_TOKEN_BYTES:
                out.append((tok.lower(), pos))
    elif mode == "standard_tokenizer":
        for m in STANDARD_TOKEN_RE.finditer(text):
            tok = m.group(0)
            if classify_token(tok) in _DROPPED_CLASSES:
                continue
            start_byte = len(text[: m.start()].encode("utf-8"))
            out.append((tok.lower(), start_byte))
    else:
        raise ValueError(f"unknown tokenizer mode: {mode}")
    return out


def tokenize_batch(texts: pd.Series, mode: str = DEFAULT_MODE) -> pd.DataFrame:
    """Vectorized batch tokenization.

    Input: a Series of document texts (index = local doc ordinal).
    Output: DataFrame ``(idx, term, pos)`` — one row per indexed token
    occurrence, where ``idx`` is the input Series index label.
    """
    if mode == "code":
        mode = "tantivy_default"
        texts = texts.fillna("")
        for pat, rep in _CODE_BOUNDARY_RES:
            texts = texts.str.replace(pat, rep, regex=True)
    if mode == "tantivy_default":
        import numpy as np

        toks = texts.fillna("").str.findall(TANTIVY_TOKEN_RE)
        counts = toks.map(len).to_numpy(dtype=np.int64)
        nonempty = counts > 0
        if not nonempty.any():
            return pd.DataFrame({"idx": [], "term": [], "pos": []})
        ex = toks[nonempty].explode()
        counts_ne = counts[nonempty]
        total = int(counts_ne.sum())
        # ordinals BEFORE the long-filter, via arange — no groupby.cumcount
        starts = np.concatenate([[0], np.cumsum(counts_ne)[:-1]])
        pos = np.arange(total, dtype=np.int64) - np.repeat(starts, counts_ne)
        idx = ex.index.to_numpy()
        terms = ex.to_numpy()
        # byte-length filter: chars*4 bounds UTF-8 bytes, so only tokens with
        # >= MAX/4 chars need the (expensive) exact encode check
        charlen = ex.str.len().to_numpy(dtype=np.int64)
        keep = charlen < MAX_TOKEN_BYTES // 4
        suspect = ~keep
        if suspect.any():
            exact = (
                pd.Series(terms[suspect]).str.encode("utf-8").str.len().to_numpy()
                < MAX_TOKEN_BYTES
            )
            keep[np.flatnonzero(suspect)[exact]] = True
        return pd.DataFrame(
            {
                "idx": idx[keep],
                "term": pd.Series(terms[keep]).str.lower().to_numpy(),
                "pos": pos[keep],
            }
        )
    if mode == "standard_tokenizer":
        rows: list[tuple] = []
        for idx, text in texts.items():
            for term, pos in tokenize_py(text, mode):
                rows.append((idx, term, pos))
        return pd.DataFrame(rows, columns=["idx", "term", "pos"]) if rows else pd.DataFrame(
            {"idx": [], "term": [], "pos": []}
        )
    raise ValueError(f"unknown tokenizer mode: {mode}")


_EMPTY_POSTINGS = pd.DataFrame(
    {"idx": [], "term": [], "tf": [], "positions": [], "doc_len": []}
)


def _empty_postings(pos_col: str) -> pd.DataFrame:
    return pd.DataFrame({"idx": [], "term": [], "tf": [], pos_col: [], "doc_len": []})


def _group_tokens(idx, codes_or_terms, pos, n_terms: int | None = None, encode_positions: bool = False):
    """Composite-key grouping shared by both paths → (g_idx, g_key,
    tf, positions_per_group). Stable sort keeps positions ascending.

    With ``encode_positions`` the per-group payload is the varint(delta)
    byte blob instead of an int array: the position delta stream resets at
    every posting boundary, so per-posting blobs concatenate bit-identical
    to whole-list encoding — the segment build shuffles/checkpoints these
    compact blobs instead of array<int> columns."""
    import numpy as np

    span = n_terms if n_terms is not None else int(codes_or_terms.max()) + 1
    key = idx.astype(np.int64) * np.int64(span) + codes_or_terms
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    bounds = np.flatnonzero(np.diff(key_s)) + 1
    starts = np.concatenate([[0], bounds]).astype(np.int64)
    ends = np.concatenate([bounds, [len(key_s)]]).astype(np.int64)
    gkey = key_s[starts]
    pos_sorted = pos[order].astype("int32")
    if encode_positions:
        from .codecs import varint_encode_lens

        pu = pos_sorted.astype(np.uint64)
        pdel = pu.copy()
        pdel[1:] = pu[1:] - pu[:-1]
        pdel[starts] = pu[starts]  # absolute base at each posting start
        buf, nb = varint_encode_lens(pdel)
        boff = np.concatenate([[0], np.cumsum(nb)]).astype(np.int64)
        positions = [buf[boff[s] : boff[e]] for s, e in zip(starts.tolist(), ends.tolist())]
    else:
        positions = [
            pos_sorted[s:e] for s, e in zip(starts.tolist(), ends.tolist())
        ]  # direct views — np.split's per-group overhead is 5x this
    return (gkey // span, gkey % span, (ends - starts).astype("int32"), positions)


def postings_batch(
    texts: pd.Series,
    mode: str = DEFAULT_MODE,
    encode_positions: bool = False,
    vocab: frozenset | set | None = None,
) -> pd.DataFrame:
    """Batch → GROUPED postings ``(idx, term, tf, positions, doc_len)``.

    The index-build hot path. For ASCII batches this runs entirely in the
    byte domain: one lookup-table alnum mask, run detection via diff,
    vectorized lowercasing, and term identity via ``np.unique`` over
    per-length byte matrices — Python strings are materialized only for
    the (small) per-batch vocabulary, never per token. Non-ASCII batches
    fall back to the general regex path (identical semantics, asserted in
    tests).

    ``vocab``: keep only postings whose term is in this set — identical
    to filtering the full output on term membership (doc_len and
    position ordinals still count every indexed token), but the drop
    happens BEFORE grouping/position encoding, so a percolation-style
    caller whose standing vocabulary covers ~2% of the token stream
    skips ~all of the grouping cost."""
    import numpy as np

    pos_col = "pos_enc" if encode_positions else "positions"
    if mode == "code":
        # boundary preprocess (vectorized C regex), then the normative
        # pipeline — including its ASCII byte fast path — unchanged
        mode = "tantivy_default"
        texts = texts.fillna("")
        for pat, rep in _CODE_BOUNDARY_RES:
            texts = texts.str.replace(pat, rep, regex=True)
    if mode == "tantivy_default":
        is_ascii = texts.map(lambda t: t is None or t.isascii())
        if bool(is_ascii.all()):
            return _ascii_postings(texts, encode_positions, vocab)
        if bool(is_ascii.any()):
            # per-doc split: byte path for ASCII docs (the overwhelming
            # majority in source code), regex path for the rest
            fast = _ascii_postings(texts[is_ascii], encode_positions, vocab)
            slow = postings_batch(texts[~is_ascii], mode, encode_positions, vocab)
            return pd.concat([fast, slow], ignore_index=True)
    # general path: per-token frame then group
    tok = tokenize_batch(texts, mode)
    if tok.empty:
        return _empty_postings(pos_col)
    idx = tok["idx"].to_numpy(dtype=np.int64)
    pos = tok["pos"].to_numpy(dtype=np.int64)
    codes, uniques = pd.factorize(tok["term"].to_numpy(), sort=False)
    doc_len_map = pd.Series(idx).value_counts()
    if vocab is not None:
        vmask = np.fromiter((t in vocab for t in uniques), np.bool_, len(uniques))
        tkeep = vmask[codes]
        if not tkeep.any():
            return _empty_postings(pos_col)
        idx, pos, codes = idx[tkeep], pos[tkeep], codes[tkeep]
    g_idx, g_code, tf, positions = _group_tokens(
        idx, codes, pos, len(uniques), encode_positions
    )
    return pd.DataFrame(
        {
            "idx": g_idx,
            "term": uniques[g_code],
            "tf": tf,
            pos_col: positions,
            "doc_len": doc_len_map.reindex(g_idx).to_numpy().astype("int32"),
        }
    )


# low-bit masks for a partial trailing word: _WORD_MASKS[k] keeps the
# first k little-endian bytes of a uint64 (k = 0..8)
_WORD_MASKS = _np.array([(1 << (8 * k)) - 1 for k in range(9)], dtype=_np.uint64)


def _gather_words(low, starts, lens, word_idx: int):
    """Zero-padded 8-byte word #word_idx of each token as uint64.
    Tokens are alnum-only (no NUL byte), so zero padding encodes length
    within the word — distinct tokens ≤ 8·(word_idx+1) bytes get
    distinct word tuples.

    One strided 8-byte window gather + a per-length low-bit mask — the
    (n × 8) index-matrix + np.where formulation cost ~40% of the whole
    ASCII tokenize kernel."""
    import numpy as np
    from numpy.lib.stride_tricks import sliding_window_view

    padded = np.concatenate([low, np.zeros(8, dtype=np.uint8)])
    base = starts + 8 * word_idx
    words = (
        np.ascontiguousarray(sliding_window_view(padded, 8)[base])
        .view(np.uint64)
        .ravel()
    )
    rem = np.clip(lens - 8 * word_idx, 0, 8)
    return words & _WORD_MASKS[rem]


def _term_codes(low, k_starts, k_lens):
    """Per-token term codes + unique vocabulary WITHOUT materializing a
    Python string per token: tokens ≤ 8 bytes factorize on one packed
    uint64; ≤ 16 bytes on a packed uint64 pair; only the rare longer
    tokens (and the per-batch vocabulary) become Python strings."""
    import numpy as np

    n = len(k_starts)
    codes = np.empty(n, dtype=np.int64)
    vocab: list[str] = []
    lowblob = None

    def _mat(sel_idx):
        nonlocal lowblob
        if lowblob is None:
            lowblob = low.tobytes().decode("ascii")
        return lowblob

    short = k_lens <= 8
    mid = (k_lens > 8) & (k_lens <= 16)
    long_ = k_lens > 16
    offset = 0

    if short.any():
        s_idx = np.flatnonzero(short)
        w1 = _gather_words(low, k_starts[s_idx], k_lens[s_idx], 0)
        c, uq = pd.factorize(w1, sort=False)
        codes[s_idx] = c
        # unique strings from the first occurrence of each unique word
        first = np.zeros(len(uq), dtype=np.int64)
        first[c[::-1]] = s_idx[::-1]  # first occurrence wins
        blob = _mat(None)
        vocab.extend(
            blob[k_starts[i] : k_starts[i] + k_lens[i]] for i in first.tolist()
        )
        offset = len(uq)

    if mid.any():
        m_idx = np.flatnonzero(mid)
        w1 = _gather_words(low, k_starts[m_idx], k_lens[m_idx], 0)
        w2 = _gather_words(low, k_starts[m_idx], k_lens[m_idx], 1)
        pair = np.empty((len(m_idx), 2), dtype=np.uint64)
        pair[:, 0] = w1
        pair[:, 1] = w2
        v = np.ascontiguousarray(pair).view([("a", np.uint64), ("b", np.uint64)]).ravel()
        uq, inv = np.unique(v, return_inverse=True)
        codes[m_idx] = offset + inv
        first = np.zeros(len(uq), dtype=np.int64)
        first[inv[::-1]] = m_idx[::-1]
        blob = _mat(None)
        vocab.extend(
            blob[k_starts[i] : k_starts[i] + k_lens[i]] for i in first.tolist()
        )
        offset += len(uq)

    if long_.any():
        l_idx = np.flatnonzero(long_)
        blob = _mat(None)
        toks = np.fromiter(
            (
                blob[s : s + l]
                for s, l in zip(k_starts[l_idx].tolist(), k_lens[l_idx].tolist())
            ),
            dtype=object,
            count=len(l_idx),
        )
        c, uq = pd.factorize(toks, sort=False)
        codes[l_idx] = offset + c
        vocab.extend(uq.tolist())
        offset += len(uq)

    return codes, np.array(vocab, dtype=object)


def _ascii_postings(
    texts: pd.Series, encode_positions: bool = False, vocab=None
) -> pd.DataFrame | None:
    """tantivy_default over an all-ASCII batch, byte-domain vectorized."""
    import numpy as np

    pos_col = "pos_enc" if encode_positions else "positions"
    values = texts.fillna("").tolist()
    blob = "\n".join(values)
    if not blob.isascii():
        return None
    if not blob:
        return _empty_postings(pos_col)
    b = np.frombuffer(blob.encode("ascii"), dtype=np.uint8)
    mask = _ALNUM[b]
    # run detection in ONE transition pass: boundaries alternate
    # start/end, so the parity of the combined index array splits them
    trans = np.flatnonzero(mask[1:] != mask[:-1]) + 1
    if mask[0]:
        starts = np.concatenate([[0], trans[1::2]])
        ends = trans[0::2]
    else:
        starts = trans[0::2]
        ends = trans[1::2]
    if mask[-1]:
        ends = np.concatenate([ends, [len(b)]])
    if len(starts) == 0:
        return _empty_postings(pos_col)
    lens = ends - starts
    doc_starts = np.concatenate(
        [[0], np.cumsum(np.fromiter((len(t) + 1 for t in values), dtype=np.int64))[:-1]]
    )
    doc_of = (np.searchsorted(doc_starts, starts, side="right") - 1).astype(np.int64)
    # ordinal positions BEFORE the long-token filter (gaps preserved)
    per_doc = np.bincount(doc_of, minlength=len(values))
    first_tok = np.concatenate([[0], np.cumsum(per_doc)[:-1]])
    pos = np.arange(len(starts), dtype=np.int64) - first_tok[doc_of]
    keep = lens < MAX_TOKEN_BYTES
    if not keep.any():
        return _empty_postings(pos_col)
    # vectorized ASCII lowercase of the whole buffer: one LUT gather
    low = _LOWER_LUT[b]
    k_starts, k_lens = starts[keep], lens[keep]
    k_doc, k_pos = doc_of[keep], pos[keep]
    codes, vocab_arr = _term_codes(low, k_starts, k_lens)
    doc_len = np.bincount(k_doc, minlength=len(values)).astype("int32")
    if vocab is not None:
        # drop non-vocabulary postings BEFORE grouping — doc_len and
        # position ordinals above already counted every indexed token
        vmask = np.fromiter(
            (t in vocab for t in vocab_arr), np.bool_, len(vocab_arr)
        )
        tkeep = vmask[codes]
        if not tkeep.any():
            return _empty_postings(pos_col)
        k_doc, k_pos, codes = k_doc[tkeep], k_pos[tkeep], codes[tkeep]
    g_idx, g_code, tf, positions = _group_tokens(
        k_doc, codes.astype(np.int64), k_pos, len(vocab_arr), encode_positions
    )
    labels = texts.index.to_numpy()
    return pd.DataFrame(
        {
            "idx": labels[g_idx],
            "term": vocab_arr[g_code],
            "tf": tf,
            pos_col: positions,
            "doc_len": doc_len[g_idx],
        }
    )
