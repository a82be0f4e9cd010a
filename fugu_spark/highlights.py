"""Search-result highlights (R6, /root/reference/API.md:78-90): substring
windows around the first matched term, matches wrapped in ``**``.

Runs AFTER top-k, over ≤k rows joined back to their text — a pandas UDF
on a driver-bounded frame, never on the corpus.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .queryparse import parse_query
from .tokenizer import DEFAULT_MODE, TANTIVY_TOKEN_RE


def _make_snippet(text: str, terms: set[str], window: int) -> str | None:
    if not text:
        return None
    first_span = None
    spans = []
    for m in TANTIVY_TOKEN_RE.finditer(text):
        if m.group(0).lower() in terms:
            spans.append((m.start(), m.end()))
            if first_span is None:
                first_span = (m.start(), m.end())
    if first_span is None:
        return None
    lo = max(0, first_span[0] - window)
    hi = min(len(text), first_span[1] + window)
    keep = [(s, e) for s, e in spans if s >= lo and e <= hi]
    out, cur = [], lo
    for s, e in keep:
        out.append(text[cur:s])
        out.append("**" + text[s:e] + "**")
        cur = e
    out.append(text[cur:hi])
    prefix = "…" if lo > 0 else ""
    suffix = "…" if hi < len(text) else ""
    return prefix + "".join(out) + suffix


def with_snippets(
    results: DataFrame,
    docs: DataFrame,
    query_text: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 60,
    mode: str = DEFAULT_MODE,
) -> DataFrame:
    """Join top-k results back to their text and add a ``snippet`` column."""
    plan = parse_query(query_text, mode=mode)
    terms = set(plan.all_terms())

    @F.pandas_udf(T.StringType())
    def snip(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: _make_snippet(t, terms, window))

    joined = results.join(
        docs.select(F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("_text")),
        "doc_id",
        "left",
    )
    return joined.withColumn("snippet", snip(F.col("_text"))).drop("_text").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
