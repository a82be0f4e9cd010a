"""Dataset layer: validation gate, three-index fan-out, upsert/delete
(SURVEY.md §2.1-2.2 — the ingest-side dataflow of the reference).

fugu's Dataset bundles three indexes per namespace
(/root/reference/src/db/core.rs:39-79): ``docs`` (full documents),
``filter_index`` (one row per facet leaf,
/root/reference/src/db/document.rs:228-274) and ``query_index``
(autocomplete suggestions, :187-225). One upsert fans out to all three
(:425-432). We materialize the same three DataFrames from one source.

Validation (/root/reference/src/object.rs:31-78, gate
/root/reference/src/server/handlers/ingest.rs:27-38): non-empty id
≤ 256 chars; non-empty text ≤ max_text_len (10,000 default, server
config allows 1 MB /root/reference/src/db/config.rs:83); namespace has
no '/' or spaces, ≤ 128; ≤ 100 facets each non-empty ≤ 512. The
reference rejects the whole batch on the first invalid record (400);
``strict=True`` reproduces that; the default quarantines invalid rows
instead (the scale-sane choice — documented divergence).

Upsert (/root/reference/src/db/document.rs:23-67): delete-by-id then
add, one commit per batch → here an anti-join + union (the DataFrame
MERGE shape; on Iceberg this is MERGE INTO). Delete-by-id
(:81-99) touches the docs index only in the reference, leaving
filter/query indexes stale (warned at :444-455) — ``delete_ids``
reproduces exactly that unless ``rebuild_derived=True``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .facets import suggestions_udf

MAX_ID_LEN = 256
MAX_TEXT_LEN = 10_000
MAX_NAMESPACE_LEN = 128
MAX_FACETS = 100
MAX_FACET_LEN = 512


class ValidationError(ValueError):
    pass


def validation_errors(
    id_col: Column,
    text_col: Column,
    namespace_col: Column | None = None,
    facets_col: Column | None = None,
    max_text_len: int = MAX_TEXT_LEN,
) -> Column:
    """Array of violation strings per row (empty = valid)."""
    checks = [
        F.when(
            id_col.isNull() | (F.length(id_col.cast("string")) == 0), F.lit("empty_id")
        ),
        F.when(F.length(id_col.cast("string")) > MAX_ID_LEN, F.lit("id_too_long")),
        F.when(text_col.isNull() | (F.length(text_col) == 0), F.lit("empty_text")),
        F.when(F.length(text_col) > max_text_len, F.lit("text_too_long")),
    ]
    if namespace_col is not None:
        checks += [
            F.when(
                namespace_col.contains("/") | namespace_col.contains(" "),
                F.lit("namespace_bad_chars"),
            ),
            F.when(F.length(namespace_col) > MAX_NAMESPACE_LEN, F.lit("namespace_too_long")),
        ]
    if facets_col is not None:
        checks += [
            F.when(F.size(facets_col) > MAX_FACETS, F.lit("too_many_facets")),
            F.when(
                F.exists(facets_col, lambda x: (F.length(x) == 0) | (F.length(x) > MAX_FACET_LEN)),
                F.lit("facet_bad_length"),
            ),
        ]
    return F.filter(F.array(*checks), lambda x: x.isNotNull())


def validate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    namespace_col: str | None = None,
    facets_col: str | None = None,
    strict: bool = False,
    max_text_len: int = MAX_TEXT_LEN,
) -> tuple[DataFrame, DataFrame]:
    """→ (valid, quarantined-with-errors). strict=True raises on any
    invalid row (the reference's whole-batch 400)."""
    errs = validation_errors(
        F.col(id_col),
        F.col(text_col),
        F.col(namespace_col) if namespace_col else None,
        F.col(facets_col) if facets_col else None,
        max_text_len=max_text_len,
    )
    tagged = docs.withColumn("_errors", errs)
    bad = tagged.filter(F.size("_errors") > 0)
    if strict:
        first = bad.select(id_col, "_errors").first()
        if first is not None:
            raise ValidationError(f"invalid record {first[0]}: {first[1]}")
    return tagged.filter(F.size("_errors") == 0).drop("_errors"), bad


@dataclass
class Dataset:
    """The three materialized indexes of one namespace (D3 fan-out)."""

    docs: DataFrame
    filter_index: DataFrame  # (doc_id, facet, leaf, parent)
    query_index: DataFrame  # (doc_id, suggestion)


def build_filter_index(docs: DataFrame, id_col: str = "doc_id", facets_col: str = "facets") -> DataFrame:
    """One row per facet leaf: leaf text + full path + parent
    (D5, /root/reference/src/db/document.rs:228-274)."""
    parts = F.split("facet", "/")
    return docs.select(F.col(id_col), F.explode(facets_col).alias("facet")).select(
        id_col,
        "facet",
        F.element_at(parts, -1).alias("leaf"),
        F.array_join(F.slice(parts, 1, F.size(parts) - 1), "/").alias("parent"),
    )


def build_query_index(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Suggestion strings per doc (D6)."""
    return docs.select(
        F.col(id_col), F.explode(suggestions_udf(F.col(text_col))).alias("suggestion")
    )


def build_dataset(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    facets_col: str | None = "facets",
) -> Dataset:
    return Dataset(
        docs=docs,
        filter_index=build_filter_index(docs, id_col, facets_col)
        if facets_col and facets_col in docs.columns
        else docs.sparkSession.createDataFrame([], f"{id_col} long, facet string, leaf string, parent string"),
        query_index=build_query_index(docs, id_col, text_col),
    )


def upsert(existing: DataFrame, batch: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Delete-by-id then add (D1): rows in ``batch`` replace same-id rows.
    DataFrame form of ``MERGE INTO docs USING batch ON id WHEN MATCHED
    UPDATE * WHEN NOT MATCHED INSERT *``."""
    keep = existing.join(batch.select(id_col), id_col, "left_anti")
    return keep.unionByName(batch)


def delete_ids(
    ds: Dataset, ids: DataFrame, id_col: str = "doc_id", rebuild_derived: bool = False
) -> Dataset:
    """Delete from docs; derived indexes stay STALE unless rebuild_derived
    (reference behaviour: /root/reference/src/db/document.rs:81-99,
    staleness warning :444-455)."""
    docs = ds.docs.join(ids.select(id_col), id_col, "left_anti")
    if not rebuild_derived:
        return Dataset(docs=docs, filter_index=ds.filter_index, query_index=ds.query_index)
    return Dataset(
        docs=docs,
        filter_index=ds.filter_index.join(ids.select(id_col), id_col, "left_anti"),
        query_index=ds.query_index.join(ids.select(id_col), id_col, "left_anti"),
    )
