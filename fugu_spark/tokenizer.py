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

MODES = ("tantivy_default", "standard_tokenizer")
DEFAULT_MODE = "tantivy_default"


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
