"""ctags-lite symbol extraction + definition search for code corpora.

Code-search engines rank DEFINITION sites above mere references (Zoekt
scores symbol matches higher; ctags/etags built the original lookup
tables). The reference's corpus is source code (BASELINE north_star),
so "where is `parse_query` defined" is a first-class query shape next
to ranked search and grep.

Extraction is a regex-per-language pass — deliberately ctags-depth,
not a parser: one line-split + one higher-order filter/transform, all
JVM expressions inside whole-stage codegen. The per-language pattern
table is data, so adding a language is one row, and every pattern is
anchored to a single line (no cross-line state → embarrassingly
parallel at any corpus size).

Storage mirrors every other served sidecar: ``symbols/`` range-
clustered + sorted on ``name`` so an exact or prefix lookup prunes to
O(result) row groups on both the Spark path (pushdown) and the pyarrow
serving path (row-group min/max).

Scale: extraction is a narrow map (no shuffle); the sidecar write is
the one range shuffle; lookups read only matching row groups. The
definition-boost join broadcasts the query's symbol rows (bounded by
the name's definition count, not corpus size).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

SYMBOLS_DIR = "symbols"

# (lang, kind, pattern-with-one-capture-group) — Java regex syntax (the
# extraction runs in Catalyst's regexp_extract), kept inside the
# Python-compatible common subset so tests can cross-check with `re`.
SYMBOL_PATTERNS: list[tuple[str, str, str]] = [
    ("py", "def", r"^\s*(?:async\s+)?def\s+([A-Za-z_][A-Za-z0-9_]*)"),
    ("py", "class", r"^\s*class\s+([A-Za-z_][A-Za-z0-9_]*)"),
    ("rs", "fn", r"^\s*(?:pub(?:\([^)]*\))?\s+)?(?:async\s+)?(?:unsafe\s+)?fn\s+([A-Za-z_][A-Za-z0-9_]*)"),
    ("rs", "struct", r"^\s*(?:pub(?:\([^)]*\))?\s+)?struct\s+([A-Za-z_][A-Za-z0-9_]*)"),
    ("rs", "enum", r"^\s*(?:pub(?:\([^)]*\))?\s+)?enum\s+([A-Za-z_][A-Za-z0-9_]*)"),
    ("rs", "trait", r"^\s*(?:pub(?:\([^)]*\))?\s+)?trait\s+([A-Za-z_][A-Za-z0-9_]*)"),
    ("go", "func", r"^func\s+(?:\([^)]*\)\s*)?([A-Za-z_][A-Za-z0-9_]*)"),
    ("go", "type", r"^type\s+([A-Za-z_][A-Za-z0-9_]*)"),
    ("js", "function", r"\bfunction\s+([A-Za-z_$][A-Za-z0-9_$]*)"),
    ("js", "class", r"\bclass\s+([A-Za-z_$][A-Za-z0-9_$]*)"),
    ("java", "class", r"\b(?:class|interface|enum)\s+([A-Za-z_][A-Za-z0-9_]*)"),
    ("c", "func", r"^[A-Za-z_][A-Za-z0-9_ \*]*[ \*]([A-Za-z_][A-Za-z0-9_]*)\s*\([^;]*$"),
]


def extract_symbols(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str | None = None,
    default_lang: str = "py",
    langs: list[str] | None = None,
) -> DataFrame:
    """(doc_id, line_no, kind, name) — one row per definition site.

    One JVM pass: split → posexplode lines → an array literal of
    (kind, regexp_extract) structs per applicable pattern → filter
    non-empty → explode. With ``lang_col`` each doc only evaluates its
    own language's patterns (the others are short-circuited to '' by a
    `when` gate); without it ``default_lang``'s patterns apply."""
    pats = [p for p in SYMBOL_PATTERNS if langs is None or p[0] in langs]
    lang = F.col(lang_col) if lang_col else F.lit(default_lang)
    lines = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        lang.alias("_lang"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("idx", "line"),
    )
    structs = [
        F.struct(
            F.lit(kind).alias("kind"),
            F.when(
                F.col("_lang") == plang, F.regexp_extract(F.col("line"), pat, 1)
            ).otherwise(F.lit("")).alias("name"),
        )
        for plang, kind, pat in pats
    ]
    hits = F.filter(F.array(*structs), lambda s: s["name"] != "")
    return (
        lines.select(
            "doc_id",
            (F.col("idx") + 1).alias("line_no"),
            F.explode(hits).alias("sym"),
        )
        .select("doc_id", "line_no", F.col("sym.kind").alias("kind"), F.col("sym.name").alias("name"))
    )


def build_symbol_index(
    symbols: DataFrame, index_dir: str, mode: str = "overwrite"
) -> str:
    """Persist the extraction as a range-clustered sidecar keyed on
    ``name`` — exact/prefix lookups prune to O(result) row groups."""
    from .. import fsio
    from ..segments import SIDECAR_PART_BYTES, sized_range_partitions

    out = fsio.join(index_dir, SYMBOLS_DIR)
    (
        symbols.repartitionByRange(
            sized_range_partitions(symbols, SIDECAR_PART_BYTES), "name"
        )
        .sortWithinPartitions("name", "doc_id", "line_no")
        .write.mode(mode)
        .parquet(out)
    )
    return out


def symbol_search(
    spark: SparkSession,
    index_dir: str,
    name: str,
    kind: str | None = None,
    prefix: bool = False,
) -> DataFrame:
    """Definition lookup → (doc_id, line_no, kind, name), name-sorted.
    Exact match is a pushdown point predicate; prefix is a pushdown
    range predicate (startswith compiles to [name, name∥0x10FFFF))."""
    from .. import fsio

    df = spark.read.parquet(fsio.join(index_dir, SYMBOLS_DIR))
    cond = F.col("name").startswith(name) if prefix else F.col("name") == name
    if kind is not None:
        cond = cond & (F.col("kind") == kind)
    return df.filter(cond).orderBy("name", "doc_id", "line_no")


def definition_boost(
    results: DataFrame,
    symbols: DataFrame,
    query_terms: list[str],
    factor: float = 1.5,
) -> DataFrame:
    """Zoekt-style ranking signal: multiply a hit's score by ``factor``
    when the doc DEFINES one of the query's terms (vs merely mentioning
    it). The symbol side is filtered to the query terms first — a
    per-query-bounded broadcast, never a corpus-wide join."""
    defs = (
        symbols.filter(F.lower(F.col("name")).isin([t.lower() for t in query_terms]))
        .select("doc_id")
        .distinct()
        .withColumn("_def", F.lit(True))
    )
    return (
        results.join(F.broadcast(defs), "doc_id", "left")
        .withColumn(
            "score",
            F.when(F.col("_def"), F.col("score") * F.lit(factor)).otherwise(
                F.col("score")
            ),
        )
        .drop("_def")
    )


@dataclass
class SymbolSearcher:
    """Driver-side ms-latency definition lookup over the sidecar."""

    index_dir: str

    def __post_init__(self):
        import pyarrow.dataset as pads

        self._ds = pads.dataset(
            os.path.join(self.index_dir, SYMBOLS_DIR), format="parquet"
        )

    def lookup(
        self, name: str, kind: str | None = None, prefix: bool = False
    ) -> pd.DataFrame:
        import pyarrow.dataset as pads

        f = pads.field("name")
        if prefix:
            # range predicate keeps row-group pruning effective; the
            # upper bound bumps the last char (ASCII-safe for code ids)
            hi = name[:-1] + chr(ord(name[-1]) + 1) if name else None
            cond = (f >= name) & (f < hi) if hi else f >= ""
        else:
            cond = f == name
        if kind is not None:
            cond = cond & (pads.field("kind") == kind)
        out = self._ds.to_table(filter=cond).to_pandas()
        return out.sort_values(["name", "doc_id", "line_no"]).reset_index(drop=True)
