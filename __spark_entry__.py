"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship BM25 top-10 over sf0.001.
``queries()`` / ``oracle_sql()`` — one pair per implemented operator from
SURVEY.md §2; the driver runs both at sf0.01 and compares row-count +
schema + order-insensitive value-hash (CORRECTNESS_r{N}.json).

Engine code lives in fugu_spark/; this file adapts it to the driver's
``documents(doc_id, text, lang, source, n_chars)`` / ``embeddings``
tables. Computed columns are aliased identically on both sides; scores
are rounded to 6 decimals on both sides (f64 throughout).

The driver executes the FIRST 50 entries; the registry holds more, in a
documented rotation (never-verified/new entries first, regression core,
rotating tail — see the ordering comment in ``queries()``). Full
coverage of EVERY registered pair is evidenced per-round by
``CORRECTNESS_LOCAL_r{N}.json`` at the repo root — the same
rows/schema/value-hash comparison, run locally over all entries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fugu_spark import postings as P
from fugu_spark.analytics import dedup, similarity, textstats
from fugu_spark.facets import (
    derive_facets,
    facet_counts,
    facet_tree_counts,
    filter_values_at_path,
    search_facets,
    suggestions_udf,
)
from fugu_spark.search import search, search_fields

_CACHE: dict[str, tuple] = {}
_SEG_CACHE: dict[str, object] = {}
_CODE_CACHE: dict[str, tuple] = {}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _index(spark: SparkSession, sf_dir: str):
    key = sf_dir
    if key not in _CACHE:
        docs = _docs(spark, sf_dir).cache()
        _CACHE[key] = (docs, P.build_index(docs, id_col="doc_id", text_col="text"))
    return _CACHE[key]


def _code_index(spark: SparkSession, sf_dir: str):
    """Camelized corpus + code-analyzer index (the ``code`` tokenizer
    mode — an extension for source-code payloads; tokenizer.py
    _CODE_BOUNDARY_RES). The driver corpus has no real identifiers, so
    one is DERIVED deterministically: each doc's words of length ≥ 2
    (all-alpha corpus) are initcap'd and concatenated into one
    PascalCase identifier. The analyzer's boundary rules must then
    reconstruct exactly the original word stream — which is what the
    DuckDB oracle checks by tokenizing the ORIGINAL text instead."""
    key = sf_dir
    if key not in _CODE_CACHE:
        camel = (
            _docs(spark, sf_dir)
            .select(
                "doc_id",
                F.expr(
                    "array_join(transform(filter(split(lower(text), '[^a-z]+'),"
                    " w -> length(w) >= 2),"
                    " w -> concat(upper(substring(w, 1, 1)), substring(w, 2))), '')"
                ).alias("text"),
            )
            .cache()
        )
        _CODE_CACHE[key] = (camel, P.build_index(camel, id_col="doc_id", text_col="text", mode="code"))
    return _CODE_CACHE[key]


def _code_seg_index(spark: SparkSession, sf_dir: str):
    """Segment-file index over the camelized corpus built with the code
    analyzer (mode plumbs through build_segments → postings_batch), so
    the driver also verifies the SEGMENT + serving path under the code
    tokenizer, not just the in-memory index."""
    key = sf_dir + "#code"
    if key not in _SEG_CACHE:
        import os

        import fugu_spark
        from fugu_spark.segments import build_segments

        camel, _ = _code_index(spark, sf_dir)
        d = (
            f"/tmp/fugu_entry_codeseg_{os.path.basename(sf_dir.rstrip('/'))}"
            f"_v{fugu_spark.__version__}"
        )
        _SEG_CACHE[key] = build_segments(
            camel, d, id_col="doc_id", text_col="text", mode="code", resume=True
        )
    return _SEG_CACHE[key]


def _seg_index(spark: SparkSession, sf_dir: str):
    """Segment-file index over the driver table (cached per sf_dir)."""
    if sf_dir not in _SEG_CACHE:
        import os

        import fugu_spark
        from fugu_spark.segments import SegmentIndex, build_segments

        docs, _ = _index(spark, sf_dir)
        d = (
            f"/tmp/fugu_entry_seg_{os.path.basename(sf_dir.rstrip('/'))}"
            f"_v{fugu_spark.__version__}"
        )
        _SEG_CACHE[sf_dir] = build_segments(
            docs, d, id_col="doc_id", text_col="text", resume=True
        )
    return _SEG_CACHE[sf_dir]


def _seg_search_q(query: str, k: int = 10, force_wand: bool = False):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from fugu_spark.segment_search import search_segments

        docs, _ = _index(spark, sf_dir)
        si = _seg_index(spark, sf_dir)
        out = search_segments(
            si, query, k=k, docs=docs, wand_min_postings=0 if force_wand else 100_000
        )
        return out.select("doc_id", F.round("score", 6).alias("score"))

    return run


_BATCH_QUERIES = {0: "merge join", 1: "merge AND sort", 2: "table NOT window", 3: "merge^2 join"}

# Standing queries for the percolate entry: every grammar shape the
# percolator supports (AND / phrase / NOT / OR / sloppy phrase / nested)
_PERC_QUERIES = {
    1: "merge AND join",
    2: '"merge join"',
    3: "window NOT merge",
    4: "table OR sort",
    5: '"merge join"~2',
    6: "(table OR sort) AND window",
}

# v2 shapes (VERDICT r4 Next #1): phrase, sloppy phrase + term, nested
# group, phrase exclusion — all combined in the SAME single job
_BATCH_RICH_QUERIES = {
    0: '"merge join"',
    1: '"merge join"~2 table',
    2: "(merge OR join) AND sort",
    3: 'table NOT "merge join"',
}


def _batch_q(queries: dict[int, str], k: int = 5):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Batch retrieval: many queries in ONE Spark job (fugu_spark.batch),
        rank/score identical per query to the segment engine."""
        from fugu_spark.batch import batch_search_segments

        si = _seg_index(spark, sf_dir)
        out = batch_search_segments(si, queries, k=k)
        return out.select(
            "query_id",
            "doc_id",
            F.round("score", 6).alias("score"),
            F.col("rank").cast("long").alias("rank"),
        )

    return run


_batch_search_q = _batch_q(_BATCH_QUERIES)


def _bm25_streamed_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8/§2.11 through the driver gate: bootstrap an index over part of
    the corpus, stream the REST through start_stream_ingest's
    foreachBatch path (availableNow, maxFilesPerTrigger=1 → several
    micro-batch generations), then search — the streamed index must
    score identically to a fresh full-corpus build, which is exactly
    what the oracle recomputes (fugu_spark/streaming.py:25)."""
    import os
    import shutil

    import fugu_spark
    from fugu_spark.segment_search import search_segments
    from fugu_spark.segments import SegmentIndex, build_segments
    from fugu_spark.streaming import start_stream_ingest

    d = (
        f"/tmp/fugu_entry_stream_{os.path.basename(sf_dir.rstrip('/'))}"
        f"_v{fugu_spark.__version__}"
    )
    shutil.rmtree(d, ignore_errors=True)
    idx_dir, drop, cp = f"{d}/idx", f"{d}/drop", f"{d}/cp"
    os.makedirs(drop)
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    build_segments(
        docs.filter(F.col("doc_id") < 200), idx_dir, id_col="doc_id", text_col="text"
    )
    # two drop-folder files → two micro-batches under maxFilesPerTrigger=1
    docs.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 400)).coalesce(
        1
    ).write.mode("append").parquet(drop)
    docs.filter(F.col("doc_id") >= 400).coalesce(1).write.mode("append").parquet(drop)
    q = start_stream_ingest(
        spark,
        drop,
        "doc_id long, text string",
        idx_dir,
        cp,
        id_col="doc_id",
        text_col="text",
        max_files_per_trigger=1,
    )
    q.awaitTermination(600)
    si = SegmentIndex.load(spark, idx_dir)
    out = search_segments(si, "merge join", k=10)
    return out.select("doc_id", F.round("score", 6).alias("score"))


def _serving_q(query: str, k: int = 10, msm: int = 0):
    """Driver-side serving engine over the same segment files (serve.py);
    wrapped back into a Spark DataFrame for the oracle comparison."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from fugu_spark.serve import LocalSearcher

        si = _seg_index(spark, sf_dir)
        pdf = LocalSearcher(si.index_dir).search(query, k=k, min_should_match=msm)
        pdf["score"] = pdf["score"].round(6)
        return spark.createDataFrame(pdf, "doc_id long, score double")

    return run


def _multifield_q(query: str, k: int = 10):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs, idx_text = _index(spark, sf_dir)
        key = sf_dir + "#srcfield"
        if key not in _CACHE:
            _CACHE[key] = (docs, P.build_index(docs, id_col="doc_id", text_col="source"))
        _, idx_src = _CACHE[key]
        out = search_fields({"text": idx_text, "source": idx_src}, query, k=k, docs=docs)
        return out.select("doc_id", F.round("score", 6).alias("score"))

    return run


_TRI_CACHE: dict[str, str] = {}


def _tri_dir(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per sf) the Zoekt-style trigram sidecar used by the
    substring/regex code-search entries (fugu_spark/trigram.py)."""
    if sf_dir not in _TRI_CACHE:
        import os
        import shutil

        import fugu_spark
        from fugu_spark import trigram as TG

        d = (
            f"/tmp/fugu_entry_tri_{os.path.basename(sf_dir.rstrip('/'))}"
            f"_v{fugu_spark.__version__}"
        )
        shutil.rmtree(d, ignore_errors=True)
        TG.build_trigram_index(
            _docs(spark, sf_dir).select("doc_id", "text"), d
        )
        _TRI_CACHE[sf_dir] = d
    return _TRI_CACHE[sf_dir]


def _trigram_substring_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fugu_spark import trigram as TG

    return TG.substring_search(
        spark, _tri_dir(spark, sf_dir), _docs(spark, sf_dir), "merge join"
    )


def _trigram_regex_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fugu_spark import trigram as TG

    return TG.regex_search(
        spark, _tri_dir(spark, sf_dir), _docs(spark, sf_dir), "merge (join|sort)"
    )


def _term_vectors_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fugu_spark.resultops import term_vectors

    _, idx = _index(spark, sf_dir)
    return term_vectors(idx, 7)


_ROUTED_CACHE: dict[str, object] = {}


def _routed_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus partitioned into per-lang member indexes; route=['en']
    opens ONLY the en member — result must equal an index built over
    exactly the en partition (the oracle scores the en-only corpus)."""
    import os
    import shutil

    import fugu_spark
    from fugu_spark.federated import RoutedFederation
    from fugu_spark.segments import build_segments

    if sf_dir not in _ROUTED_CACHE:
        base = (
            f"/tmp/fugu_entry_routed_{os.path.basename(sf_dir.rstrip('/'))}"
            f"_v{fugu_spark.__version__}"
        )
        shutil.rmtree(base, ignore_errors=True)
        docs = _docs(spark, sf_dir).select("doc_id", "text", "lang")
        members = {}
        for key, cond in [("en", F.col("lang") == "en"), ("rest", F.col("lang") != "en")]:
            members[key] = build_segments(
                docs.filter(cond).select("doc_id", "text"),
                f"{base}/{key}", id_col="doc_id", text_col="text",
            )
        _ROUTED_CACHE[sf_dir] = RoutedFederation(members)
    out = _ROUTED_CACHE[sf_dir].search("merge join", k=10, route=["en"])
    return out.select("doc_id", F.round("score", 6).alias("score"))


_FED_CACHE: dict[str, tuple] = {}


def _fed_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus split across TWO segment indexes; federated DFS search
    must score identically to the plain single-index oracle."""
    import os
    import shutil

    import fugu_spark
    from fugu_spark.federated import search_federated
    from fugu_spark.segments import build_segments

    if sf_dir not in _FED_CACHE:
        base = (
            f"/tmp/fugu_entry_fed_{os.path.basename(sf_dir.rstrip('/'))}"
            f"_v{fugu_spark.__version__}"
        )
        shutil.rmtree(base, ignore_errors=True)
        docs = _docs(spark, sf_dir).select("doc_id", "text")
        mid = docs.agg(F.expr("percentile(doc_id, 0.5)")).collect()[0][0]
        a = build_segments(
            docs.filter(F.col("doc_id") <= mid), f"{base}/a",
            id_col="doc_id", text_col="text",
        )
        b = build_segments(
            docs.filter(F.col("doc_id") > mid), f"{base}/b",
            id_col="doc_id", text_col="text",
        )
        _FED_CACHE[sf_dir] = (a, b)
    a, b = _FED_CACHE[sf_dir]
    out = search_federated([a, b], "merge join", k=10)
    return out.select("doc_id", F.round("score", 6).alias("score"))


def _snapshot_restore_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot the segment index into a repository, restore into a
    FRESH directory, search the restored copy — results must equal the
    plain oracle topk (proves the restored index is whole)."""
    import os
    import shutil

    import fugu_spark
    from fugu_spark import snapshot as SN
    from fugu_spark.segment_search import search_segments
    from fugu_spark.segments import SegmentIndex

    si = _seg_index(spark, sf_dir)
    base = (
        f"/tmp/fugu_entry_snap_{os.path.basename(sf_dir.rstrip('/'))}"
        f"_v{fugu_spark.__version__}"
    )
    shutil.rmtree(base, ignore_errors=True)
    SN.snapshot(si.index_dir, f"{base}/repo", "s1")
    restored = SN.restore(f"{base}/repo", "s1", f"{base}/restored")
    out = search_segments(SegmentIndex.load(spark, restored), "merge join", k=10)
    return out.select("doc_id", F.round("score", 6).alias("score"))


def _agg_adjacency_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fugu_spark.aggs import adjacency_matrix_agg

    return adjacency_matrix_agg(
        _docs(spark, sf_dir),
        {
            "de": F.col("lang") == "de",
            "en": F.col("lang") == "en",
            "long": F.col("n_chars") >= 300,
        },
    )


def _agg_rare_terms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fugu_spark.aggs import rare_terms_agg

    _, idx = _index(spark, sf_dir)
    return rare_terms_agg(idx.postings, "term", max_doc_count=385)


def _combined_fields_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucene CombinedFieldQuery (BM25F blend) over text w=1 + source
    w=2 — term-centric: tf/len/df merge across fields BEFORE the BM25
    nonlinearity (vs multifield_or, which sums after)."""
    from fugu_spark.search import combined_fields_search

    docs, idx_text = _index(spark, sf_dir)
    key = sf_dir + "#srcfield"
    if key not in _CACHE:
        _CACHE[key] = (docs, P.build_index(docs, id_col="doc_id", text_col="source"))
    _, idx_src = _CACHE[key]
    out = combined_fields_search(
        {"text": idx_text, "source": idx_src},
        "merge src1",
        weights={"source": 2.0},
        k=10,
    )
    return out.select("doc_id", F.round("score", 6).alias("score"))


def _trigram_ci_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive substring via case-variant trigram groups."""
    from fugu_spark import trigram as TG

    return TG.substring_search(
        spark, _tri_dir(spark, sf_dir), _docs(spark, sf_dir),
        "MERGE Join", ignore_case=True,
    )


def _trigram_grep_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fugu_spark import trigram as TG

    return TG.trigram_grep(
        spark, _tri_dir(spark, sf_dir), _docs(spark, sf_dir), "value\\w* hash"
    )


def _trigram_served_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fugu_spark import trigram as TG

    s = TG.TrigramSearcher(
        _tri_dir(spark, sf_dir), f"{sf_dir}/documents.parquet"
    )
    pdf = s.substring("merge join")
    return spark.createDataFrame(pdf, "doc_id long, n_occ long")


_SYM_CACHE: dict[str, str] = {}

# the driver corpus has no real definitions, so a code file is DERIVED
# deterministically (same trick as _code_index): every lowercase word of
# length ≥ 8 becomes one "def <word>():" line. The DuckDB oracle mirrors
# the derivation with unnest + generate_subscripts over the same words.
_SYM_DERIVE = (
    "array_join(transform(filter(split(lower(text), '[^a-z]+'),"
    " w -> length(w) >= 6), w -> concat('def ', w, '():')), '\n')"
)


def _sym_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select(
        "doc_id", F.expr(_SYM_DERIVE).alias("text")
    )


def _sym_dir(spark: SparkSession, sf_dir: str) -> str:
    if sf_dir not in _SYM_CACHE:
        import os
        import shutil

        import fugu_spark
        from fugu_spark.analytics import symbols as SY

        d = (
            f"/tmp/fugu_entry_sym_{os.path.basename(sf_dir.rstrip('/'))}"
            f"_v{fugu_spark.__version__}"
        )
        shutil.rmtree(d, ignore_errors=True)
        SY.build_symbol_index(SY.extract_symbols(_sym_docs(spark, sf_dir)), d)
        _SYM_CACHE[sf_dir] = d
    return _SYM_CACHE[sf_dir]


def _sym_cols(df: DataFrame) -> DataFrame:
    return df.select(
        "doc_id", F.col("line_no").cast("long").alias("line_no"), "kind", "name"
    )


def _sym_extract_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fugu_spark.analytics import symbols as SY

    return _sym_cols(SY.extract_symbols(_sym_docs(spark, sf_dir)))


def _sym_search_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fugu_spark.analytics import symbols as SY

    return _sym_cols(SY.symbol_search(spark, _sym_dir(spark, sf_dir), "filter"))


def _sym_prefix_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fugu_spark.analytics import symbols as SY

    return _sym_cols(
        SY.symbol_search(spark, _sym_dir(spark, sf_dir), "c", prefix=True)
    )


def _sym_boost_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 'stream window' with Zoekt-style definition boost: docs
    whose derived symbols DEFINE 'stream' score ×1.5. Boost applies to
    the full matched set, then top-10."""
    from fugu_spark.analytics import symbols as SY
    from fugu_spark.search import search, top_k

    docs, idx = _index(spark, sf_dir)
    res = search(idx, "stream window", k=1_000_000, docs=docs)
    syms = SY.extract_symbols(_sym_docs(spark, sf_dir))
    out = top_k(SY.definition_boost(res, syms, ["stream"]), k=10)
    return out.select("doc_id", F.round("score", 6).alias("score"))


def _sym_served_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fugu_spark.analytics import symbols as SY

    pdf = SY.SymbolSearcher(_sym_dir(spark, sf_dir)).lookup("filter")
    pdf = pdf[["doc_id", "line_no", "kind", "name"]].astype(
        {"doc_id": "int64", "line_no": "int64"}
    )
    return spark.createDataFrame(
        pdf, "doc_id long, line_no long, kind string, name string"
    )


_ENG_CACHE: dict[str, object] = {}


def _engine(spark: SparkSession, sf_dir: str):
    """Full FuguSparkEngine (segments + filter_index) over the driver
    table with derived lang/source facets — used by the filter-family
    serving entries (F3/F4/F5, R6 min_score, R3 offset)."""
    if sf_dir not in _ENG_CACHE:
        import os
        import shutil

        import fugu_spark
        from fugu_spark.engine import FuguSparkEngine

        d = (
            f"/tmp/fugu_entry_eng_{os.path.basename(sf_dir.rstrip('/'))}"
            f"_v{fugu_spark.__version__}"
        )
        shutil.rmtree(d, ignore_errors=True)
        _ENG_CACHE[sf_dir] = FuguSparkEngine.build(
            _facet_docs(spark, sf_dir),
            index_dir=d,
            id_col="doc_id",
            text_col="text",
            facets_col="facets",
        )
    return _ENG_CACHE[sf_dir]


def _eng_search_q(query: str, k: int = 10, offset: int = 0, filters=None, min_score=None):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        eng = _engine(spark, sf_dir)
        out = eng.search(query, k=k, offset=offset, filters=filters, min_score=min_score)
        return out.select("doc_id", F.round("score", 6).alias("score"))

    return run


def _batch_syn_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch retrieval with engine-level synonyms (query expansion at
    batch volume): blended-stats synonym leaves inside the one-job batch
    path (fugu_spark/batch.py), rank-identical to the single engine."""
    from fugu_spark.batch import batch_search_segments

    si = _seg_index(spark, sf_dir)
    out = batch_search_segments(
        si, {0: "merge scan", 1: "+merge sort"}, k=5, synonyms={"merge": ["join"]}
    )
    return out.select(
        "query_id",
        "doc_id",
        F.round("score", 6).alias("score"),
        F.col("rank").cast("long").alias("rank"),
    )


def _synonym_q(query: str, synonyms: dict, k: int = 10):
    """Lucene SynonymQuery blended scoring (queryparse.apply_synonyms)."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs, idx = _index(spark, sf_dir)
        out = search(idx, query, k=k, docs=docs, synonyms=synonyms)
        return out.select("doc_id", F.round("score", 6).alias("score"))

    return run


def _explain_q(query: str, doc_id: int):
    """Per-leaf BM25 breakdown (Lucene explain; fugu_spark/explain.py)."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from fugu_spark.explain import explain

        _, idx = _index(spark, sf_dir)
        out = explain(idx, query, doc_id)
        return out.select(
            "term",
            "tf",
            "df",
            F.round("idf", 6).alias("idf"),
            F.round("contribution", 6).alias("contribution"),
        )

    return run


def _sorted_q(query: str, field: str, k: int = 10):
    """Field-sorted results (Tantivy sort_by_field; search.top_k_by_field)."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs, idx = _index(spark, sf_dir)
        out = search(idx, query, k=k, docs=docs, sort_by=field)
        return out.select("doc_id", "sort_key", F.round("score", 6).alias("score"))

    return run


def _search_q(query: str, k: int = 10, lang: str | None = None, msm: int = 0):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs, idx = _index(spark, sf_dir)
        flt = (F.col("lang") == lang) if lang else None
        out = search(idx, query, k=k, doc_filter=flt, docs=docs, min_should_match=msm)
        return out.select("doc_id", F.round("score", 6).alias("score"))

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 for 'merge join' on sf0.001 (SURVEY.md §7.2)."""
    return _search_q("merge join", k=10)(spark, "/root/testdata/sf0.001")


# --------------------------------------------------------------------------
# aggregations (fugu_spark/aggs.py — ES/Tantivy aggregation surface)
# --------------------------------------------------------------------------


def _matched_set(spark: SparkSession, sf_dir: str, qtext: str) -> DataFrame:
    """A query's full matched set (doc_id, score) — what ES scopes aggs to."""
    from fugu_spark.queryparse import expand_plan, parse_query
    from fugu_spark.search import dict_expander, execute_plan

    _, idx = _index(spark, sf_dir)
    plan = expand_plan(parse_query(qtext), dict_expander({None: idx}))
    return execute_plan(idx, plan)


def _agg_terms_stats(spark, sf_dir):
    """terms(lang) bucket agg with a stats(n_chars) sub-agg — ONE groupBy
    (metrics fold into the bucket aggregate; plan pinned in test_aggs)."""
    from fugu_spark.aggs import Stats, terms_agg

    return terms_agg(_docs(spark, sf_dir), "lang", size=10, metrics=[Stats("n_chars")])


def _agg_histogram(spark, sf_dir):
    """histogram(n_chars, interval=100): fixed-interval buckets keyed by
    lower bound (ES bucketing)."""
    from fugu_spark.aggs import histogram_agg

    return histogram_agg(_docs(spark, sf_dir), "n_chars", interval=100)


def _agg_date_histogram(spark, sf_dir):
    """date_histogram(calendar month) over a deterministically derived
    DATE column (epoch 2024-01-01 + doc_id%365 days — pure calendar
    arithmetic, no timestamps, so the oracle is timezone-free)."""
    from fugu_spark.aggs import date_histogram_agg

    d = _docs(spark, sf_dir).withColumn(
        "d", F.date_add(F.lit("2024-01-01").cast("date"), (F.col("doc_id") % 365).cast("int"))
    )
    out = date_histogram_agg(d, "d", "month")
    return out


def _agg_extended_stats(spark, sf_dir):
    """ES extended_stats over n_chars: stats quintet + sum_of_squares /
    population variance / std_deviation (aggs.extended_stats_agg)."""
    from fugu_spark.aggs import extended_stats_agg

    return extended_stats_agg(_docs(spark, sf_dir), "n_chars")


def _agg_pipeline(spark, sf_dir):
    """ES pipeline aggs (derivative, cumulative_sum, moving_avg w=3)
    chained over the monthly date_histogram of the derived DATE column
    (aggs.pipeline_agg — one window over the bucket frame each)."""
    from fugu_spark.aggs import date_histogram_agg, pipeline_agg

    d = _docs(spark, sf_dir).withColumn(
        "d", F.date_add(F.lit("2024-01-01").cast("date"), (F.col("doc_id") % 365).cast("int"))
    )
    out = date_histogram_agg(d, "d", "month")
    out = pipeline_agg(out, "doc_count", "derivative")
    out = pipeline_agg(out, "doc_count", "cumulative_sum")
    return pipeline_agg(out, "doc_count", "moving_avg", window=3)


def _agg_date_hist_empty(spark, sf_dir):
    """date_histogram with min_doc_count=0 over a deliberately GAPPED
    derived DATE column (docs kept only for Jan and late-May..Dec):
    every calendar month between the extremes appears, gaps at 0."""
    from fugu_spark.aggs import date_histogram_agg

    d = (
        _docs(spark, sf_dir)
        .filter((F.col("doc_id") % 365 < 30) | (F.col("doc_id") % 365 >= 150))
        .withColumn(
            "d",
            F.date_add(F.lit("2024-01-01").cast("date"), (F.col("doc_id") % 365).cast("int")),
        )
    )
    out = date_histogram_agg(d, "d", "month", min_doc_count=0)
    return out.select("key", F.col("doc_count").cast("long").alias("doc_count"))


def _agg_auto_date_hist(spark, sf_dir):
    """auto_date_histogram(buckets=10) over the derived 365-day span:
    day/week/month all exceed 10 buckets, quarter (4) is the finest fit
    — the choice rule is pinned by pytest on varying-span fixtures, so
    the oracle recomputes the quarter histogram directly."""
    from fugu_spark.aggs import auto_date_histogram_agg

    d = _docs(spark, sf_dir).withColumn(
        "d", F.date_add(F.lit("2024-01-01").cast("date"), (F.col("doc_id") % 365).cast("int"))
    )
    return auto_date_histogram_agg(d, "d", buckets=10)


def _agg_weighted_avg(spark, sf_dir):
    """ES weighted_avg of n_chars weighted by doc_id
    (aggs.weighted_avg_agg)."""
    from fugu_spark.aggs import weighted_avg_agg

    d = _docs(spark, sf_dir).withColumn("wt", F.col("doc_id").cast("double"))
    return weighted_avg_agg(d, "n_chars", "wt")


def _agg_matrix_stats(spark, sf_dir):
    """ES matrix_stats over (doc_id, n_chars): means, population
    variances, covariance, Pearson correlation in one aggregate
    (aggs.matrix_stats_agg)."""
    from fugu_spark.aggs import matrix_stats_agg

    d = _docs(spark, sf_dir).withColumn("did", F.col("doc_id").cast("double"))
    return matrix_stats_agg(d, "did", "n_chars")


def _agg_range(spark, sf_dir):
    """range agg on n_chars: half-open [from, to) buckets with ES key
    strings; values outside every range drop (ES semantics)."""
    from fugu_spark.aggs import range_agg

    return range_agg(_docs(spark, sf_dir), "n_chars", [(None, 200), (200, 400), (400, None)])


def _agg_percentiles(spark, sf_dir):
    """Exact percentiles of n_chars (linear interpolation — DuckDB
    quantile_cont recomputes the identical definition). The approx
    (t-digest) mode is the at-scale path, bounds-tested in pytest."""
    from fugu_spark.aggs import percentiles_agg

    return percentiles_agg(_docs(spark, sf_dir), "n_chars", (0.25, 0.5, 0.75, 0.95))


def _agg_cardinality(spark, sf_dir):
    """Query-scoped cardinality: distinct sources among docs matching
    'merge' (ES query + cardinality agg). Exact mode for the oracle;
    HLL++ mode is the scale path (bounds-tested in pytest)."""
    from fugu_spark.aggs import cardinality_agg

    return cardinality_agg(
        _docs(spark, sf_dir), "source", matched=_matched_set(spark, sf_dir, "merge")
    )


def _agg_query_terms(spark, sf_dir):
    """The full ES query+aggs shape: terms(lang) bucket counts over the
    matched set of the OR-query 'merge scan'."""
    from fugu_spark.aggs import terms_agg

    return terms_agg(
        _docs(spark, sf_dir), "lang", size=10,
        matched=_matched_set(spark, sf_dir, "merge scan"),
    )


def _agg_top_hits(spark, sf_dir):
    """terms(source) with a top_hits(size=2) sub-agg for query 'merge':
    the 2 best-scoring hits per source bucket (WindowGroupLimit bounds
    map-side state; plan pinned in test_aggs)."""
    from fugu_spark.aggs import top_hits_agg

    return top_hits_agg(
        _matched_set(spark, sf_dir, "merge"), _docs(spark, sf_dir), "source", size=2
    )


def _search_after_q(spark, sf_dir):
    """Cursor pagination (ES search_after / Lucene searchAfter): page 2
    of 'merge join' fetched via the (score, doc_id) cursor from page 1 —
    must equal rank-based OFFSET paging (the oracle), but the plan is
    O(k) at any depth (plain filter below the bounded top-k heap; no
    row_number window, no offset-deep per-partition heaps)."""
    _, idx = _index(spark, sf_dir)
    first = search(idx, "merge join", k=10).collect()  # bounded: k rows
    cursor = (first[-1].score, first[-1].doc_id)
    out = search(idx, "merge join", k=10, search_after=cursor)
    return out.select("doc_id", F.round("score", 6).alias("score"))


def _search_after_served_q(spark, sf_dir):
    """The same cursor page through the driver-side serving path
    (LocalSearcher) — rank/score identity with the table path and the
    OFFSET oracle."""
    from fugu_spark.serve import LocalSearcher

    si = _seg_index(spark, sf_dir)
    ls = LocalSearcher(si.index_dir)
    first = ls.search("merge join", k=10)
    cursor = (float(first["score"].iloc[-1]), int(first["doc_id"].iloc[-1]))
    pdf = ls.search("merge join", k=10, search_after=cursor)
    pdf["score"] = pdf["score"].round(6)
    return spark.createDataFrame(pdf, "doc_id long, score double")


def _dismax_q(spark, sf_dir):
    """DisjunctionMax multi-field scoring (Lucene DisjunctionMaxQuery /
    ES multi_match best_fields, tie_breaker=0.3): per leaf, field scores
    fold max + 0.3 × (sum − max) instead of summing. Fields: text (BM25)
    and source (one-token field → leaf score = idf)."""
    docs, idx_text = _index(spark, sf_dir)
    key = sf_dir + "#srcfield"
    if key not in _CACHE:
        _CACHE[key] = (docs, P.build_index(docs, id_col="doc_id", text_col="source"))
    _, idx_src = _CACHE[key]
    out = search_fields(
        {"text": idx_text, "source": idx_src}, "merge src1", k=10, docs=docs,
        tie_breaker=0.3,
    )
    return out.select("doc_id", F.round("score", 6).alias("score"))


def _agg_composite(spark, sf_dir):
    """ES composite agg page: every (lang, source) bucket combination in
    key order, resuming after the fixed cursor ('es', 'src10') — the
    aggregation analog of search_after (page cost independent of depth;
    the cursor is a filter on the group-by keys)."""
    from fugu_spark.aggs import composite_agg

    return composite_agg(
        _docs(spark, sf_dir), ["lang", "source"], size=10, after_key=("es", "src10")
    )


def _rescore_q(spark, sf_dir):
    """ES rescore (score_mode=total): top-100 window of the cheap OR
    query 'merge join', re-scored with the exact phrase at weight 2 —
    recall from the OR pass, precision from positions work bounded to
    the window."""
    from fugu_spark.resultops import rescore

    _, idx = _index(spark, sf_dir)
    out = rescore(
        idx, "merge join", '"merge join"', window_size=100, k=10, rescore_weight=2.0
    )
    return out.select("doc_id", F.round("score", 6).alias("score"))


def _fvf_q(spark, sf_dir):
    """ES function_score / field_value_factor: BM25('merge') ×
    log1p(0.01 × n_chars) — a pure JVM column expression over the
    matched set joined to the (id, field)-pruned docs scan."""
    from fugu_spark.resultops import field_value_factor
    from fugu_spark.search import top_k

    base = _matched_set(spark, sf_dir, "merge")
    out = field_value_factor(
        base, _docs(spark, sf_dir), "n_chars", factor=0.01, modifier="log1p"
    )
    return top_k(out, k=10).select("doc_id", F.round("score", 6).alias("score"))


def _decay_gauss_q(spark, sf_dir):
    """ES function_score gauss decay: BM25('merge') × exp(−dist²/2σ²)
    on n_chars (origin 2000, scale 1500, offset 100, decay 0.5) — the
    distance-relevance blend (resultops.decay_score, pure column
    exprs), top 10."""
    from fugu_spark.resultops import decay_score
    from fugu_spark.search import top_k

    base = _matched_set(spark, sf_dir, "merge")
    out = decay_score(
        base, _docs(spark, sf_dir), "n_chars", origin=2000.0, scale=1500.0,
        kind="gauss", offset=100.0, decay=0.5,
    )
    return top_k(out, k=10).select("doc_id", F.round("score", 6).alias("score"))


def _phrase_suggest_q(spark, sf_dir):
    """ES phrase suggester: per-word dictionary candidates for the
    misspelled query 'port ag' (candidates {part, sort} x {a, agg})
    re-ranked as whole phrases by the
    corpus add-0.1 bigram LM (resultops.phrase_suggest), top 5."""
    from fugu_spark.resultops import phrase_suggest

    docs, idx = _index(spark, sf_dir)
    out = phrase_suggest(idx, docs, "port ag", n=5)
    return out.select("suggestion", F.round("score", 6).alias("score"))


def _random_sample_q(spark, sf_dir):
    """Deterministic seeded random_score sampling of the matched set
    (resultops.random_score, pinned md5 formula): top 20 of
    BM25('merge') matches by their seed-7 uniform — the reproducible
    eval-sampling / A-B-bucketing shape."""
    from fugu_spark.resultops import random_score
    from fugu_spark.search import top_k

    base = _matched_set(spark, sf_dir, "merge")
    return top_k(random_score(base, seed=7), k=20).select(
        "doc_id", F.round("score", 6).alias("score")
    )


def _terms_set_q(spark, sf_dir):
    """ES terms_set: OR over (merge, join, sort) where each doc's own
    required match count is doc_id % 3 + 1 (resultops.terms_set —
    per-doc minimum_should_match_field), k=100."""
    from fugu_spark.resultops import terms_set

    docs, idx = _index(spark, sf_dir)
    req = docs.withColumn("req", F.col("doc_id") % 3 + 1)
    return terms_set(idx, ["merge", "join", "sort"], req, "req", k=100).select(
        "doc_id", F.round("score", 6).alias("score")
    )


def _pinned_q(spark, sf_dir):
    """ES pinned query: docs 42 and 7 promoted (in that order) ahead of
    the organic BM25('merge join') tail, pinned docs deduped out of the
    tail (resultops.pinned), top 10."""
    from fugu_spark.resultops import pinned

    _, idx = _index(spark, sf_dir)
    return pinned(idx, [42, 7], "merge join", k=10).select(
        "doc_id", F.round("score", 6).alias("score")
    )


def _pinned_served_q(spark, sf_dir):
    """Served-path pinned query (LocalSearcher.search_pinned): same
    semantics and ladder as bm25_pinned, no Spark job on the query
    path; identical oracle."""
    from fugu_spark.serve import LocalSearcher

    si = _seg_index(spark, sf_dir)
    pdf = LocalSearcher(si.index_dir).search_pinned([42, 7], "merge join", k=10)
    pdf["score"] = pdf["score"].round(6)
    return spark.createDataFrame(pdf, "doc_id long, score double")


def _boosting_q(spark, sf_dir):
    """ES boosting query: BM25('merge join') with docs matching the
    phrase "merge join" demoted ×0.3 (resultops.boosting — demotion,
    not exclusion), top 10."""
    from fugu_spark.resultops import boosting

    _, idx = _index(spark, sf_dir)
    return boosting(idx, "merge join", '"merge join"', 0.3, k=10).select(
        "doc_id", F.round("score", 6).alias("score")
    )


_TT_CACHE: dict[str, object] = {}


def _as_of_q(spark, sf_dir):
    """Point-in-time search (segments.at_generation): the index is
    MUTATED after gen 0 — every doc with doc_id%7==0 is rewritten to
    drop its 'merge'/'join' tokens — yet the gen-0-pinned search must
    score exactly like the original corpus, which is what the plain
    DuckDB oracle over the unmodified documents table checks. Later
    generations are invisible via gen-partition pruning; idf/avgdl come
    from the persisted per-generation stats history."""
    import shutil

    import fugu_spark
    from fugu_spark.segment_search import search_segments
    from fugu_spark.segments import build_segments, upsert_segments

    if sf_dir not in _TT_CACHE:
        import os

        d = (
            f"/tmp/fugu_entry_tt_{os.path.basename(sf_dir.rstrip('/'))}"
            f"_v{fugu_spark.__version__}"
        )
        shutil.rmtree(d, ignore_errors=True)
        docs = _docs(spark, sf_dir).select("doc_id", F.col("text").alias("content"))
        si = build_segments(docs, d, id_col="doc_id", text_col="content")
        mutated = docs.filter(F.col("doc_id") % 7 == 0).select(
            "doc_id",
            F.regexp_replace("content", "merge|join", "xqzy").alias("content"),
        )
        _TT_CACHE[sf_dir] = upsert_segments(si, mutated, id_col="doc_id", text_col="content")
    si = _TT_CACHE[sf_dir]
    out = search_segments(si.at_generation(0), "merge join", k=10)
    return out.select("doc_id", F.round("score", 6).alias("score"))


def _as_of_served_q(spark, sf_dir):
    """The same gen-0 pin through the driver-side serving path
    (LocalSearcher(as_of=0)) — pinned dictionary stats re-derived from
    block metadata, deletes filtered to del_gen ≤ 0, same oracle as the
    Spark-path pin."""
    from fugu_spark.serve import LocalSearcher

    _as_of_q(spark, sf_dir)  # ensure the mutated index exists (cached)
    si = _TT_CACHE[sf_dir]
    pdf = LocalSearcher(si.index_dir, as_of=0).search("merge join", k=10)
    pdf["score"] = pdf["score"].round(6)
    return spark.createDataFrame(pdf, "doc_id long, score double")


def _compact_range_q(spark, sf_dir):
    """Tiered merge (compact_range): base build + two INSERT-ONLY upsert
    generations, then merge generations [1, 2] into one — the merged
    index must score exactly like a fresh build over the union corpus
    (insert-only ⇒ no dead postings ⇒ maxDoc stats are exact, so the
    plain SQL oracle over the unioned docs applies). Live-identity
    across merges of ranges WITH dead postings is pinned in
    tests/test_time_travel.py."""
    import os
    import shutil

    import fugu_spark
    from fugu_spark.segment_search import search_segments
    from fugu_spark.segments import build_segments, compact_range, upsert_segments

    d = (
        f"/tmp/fugu_entry_crange_{os.path.basename(sf_dir.rstrip('/'))}"
        f"_v{fugu_spark.__version__}"
    )
    shutil.rmtree(d, ignore_errors=True)
    docs = _docs(spark, sf_dir).select("doc_id", F.col("text").alias("content"))
    si = build_segments(docs, d, id_col="doc_id", text_col="content")
    b1 = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"), "content"
    )
    si = upsert_segments(si, b1, id_col="doc_id", text_col="content")
    b2 = docs.filter(F.col("doc_id") % 9 == 0).select(
        (F.col("doc_id") + 20000).alias("doc_id"), "content"
    )
    si = upsert_segments(si, b2, id_col="doc_id", text_col="content")
    si = compact_range(si, 1, 2)
    out = search_segments(si, "merge join", k=10)
    return out.select("doc_id", F.round("score", 6).alias("score"))


def _stream_window_q(spark, sf_dir):
    """Watermarked windowed streaming aggregation (§2.11 extension):
    daily event counts + value sums by event_type, computed through
    readStream → withWatermark → window() groupBy and drained with
    availableNow. Window starts are emitted as epoch seconds
    (timezone-free hashing). One drain of a static source is
    deterministic; the late-data drop semantics are pinned in
    tests/test_streaming_analytics.py."""
    import os
    import shutil

    import fugu_spark
    from fugu_spark.streaming_analytics import (
        run_complete_to_memory,
        windowed_event_counts,
    )

    # the file stream source wants a DIRECTORY of files (the drop-folder
    # contract) — stage the events table into one
    d = (
        f"/tmp/fugu_entry_evstream_{os.path.basename(sf_dir.rstrip('/'))}"
        f"_v{fugu_spark.__version__}"
    )
    if not os.path.isdir(d):
        os.makedirs(d, exist_ok=True)
        shutil.copy(f"{sf_dir}/events.parquet", f"{d}/events.parquet")
    s = windowed_event_counts(
        spark,
        d,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
        ts_col="ts",
        window="1 day",
        watermark="1 hour",
        group_col="event_type",
        value_col="value",
    )
    import re as _re

    sink = "wins_" + _re.sub(r"\W", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1])
    out = run_complete_to_memory(s, sink, spark)
    return out.select(
        F.col("window.start").cast("long").alias("day_start_s"),
        "event_type",
        F.col("n_events").cast("long"),
        "value_sum",
    ).orderBy("day_start_s", "event_type")


def _stream_dedup_q(spark, sf_dir):
    """Cross-batch stateful streaming dedup (applyInPandasWithState):
    the corpus streams in two micro-batch files — originals, then
    id+10000 copies — and only first occurrences survive (within a
    batch: lowest id; across batches: the earlier batch). The oracle is
    min(doc_id) per content hash over the union, which the batch
    ordering makes identical."""
    import os
    import shutil

    import fugu_spark
    from fugu_spark.streaming_analytics import stream_dedup

    d = (
        f"/tmp/fugu_entry_sdedup_{os.path.basename(sf_dir.rstrip('/'))}"
        f"_v{fugu_spark.__version__}"
    )
    shutil.rmtree(d, ignore_errors=True)
    src, out, cp = f"{d}/src", f"{d}/out", f"{d}/cp"
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    docs.coalesce(1).write.mode("append").parquet(src)
    docs.select((F.col("doc_id") + 10000).alias("doc_id"), "text").coalesce(
        1
    ).write.mode("append").parquet(src)
    stream_dedup(
        spark, src, "doc_id long, text string", out, cp,
        text_col="text", id_col="doc_id", max_files_per_trigger=1,
    )
    return spark.read.parquet(out).orderBy("content_hash")


def _index_stats_q(spark, sf_dir):
    """Operational per-generation report (segments.index_stats) over the
    mutated two-generation index from bm25_as_of — n_terms / n_postings
    per generation and deletes recorded at each generation are all
    recomputable from the corpus + the deterministic mutation, which is
    what the oracle does. (blocks/bytes columns are format-internal and
    excluded from the oracle comparison; pytest covers them.)"""
    from fugu_spark.segments import index_stats

    _as_of_q(spark, sf_dir)  # ensure the two-generation index exists
    si = _TT_CACHE[sf_dir]
    return index_stats(si).select(
        F.col("gen").cast("int"),
        F.col("n_terms").cast("long"),
        "n_postings",
        F.col("n_deleted_docs").cast("long"),
    )


def _dsl_q(spark, sf_dir):
    """Structured query DSL (fugu_spark/dsl.py): the ES-style dict twin
    of 'merge join scan' with minimum_should_match=2 — compiles onto the
    same Leaf plan the string parser builds (rank/score identity per
    shape pinned in tests/test_dsl.py), so one oracle covers both
    syntaxes."""
    from fugu_spark.dsl import search_dsl

    _, idx = _index(spark, sf_dir)
    out = search_dsl(
        idx,
        {"bool": {
            "should": [
                {"term": {"_all": "merge"}},
                {"term": {"_all": "join"}},
                {"term": {"_all": "scan"}},
            ],
            "minimum_should_match": 2,
        }},
        k=10,
    )
    return out.select("doc_id", F.round("score", 6).alias("score"))


def _span_near_q(spark, sf_dir):
    """span_near (queryparse.Leaf.near; fugu_spark/dsl.py span_near node —
    Lucene SpanNearQuery with in_order=false, DSL-only like Lucene's):
    UNORDERED proximity 'merge' within a 3-slack window of 'sort'.
    Pinned tf semantics (Leaf.near docstring): one merged position-sorted
    sweep; tf = positions q where the latest occurrence of every clause
    term at-or-before q fits in a window of slop + n − 1. The oracle
    recomputes the same sweep with per-term running-max window functions."""
    from fugu_spark.dsl import search_dsl

    docs, idx = _index(spark, sf_dir)
    out = search_dsl(
        idx,
        {"span_near": {
            "clauses": [
                {"span_term": {"_all": "merge"}},
                {"span_term": {"_all": "sort"}},
            ],
            "slop": 3,
            "in_order": False,
        }},
        k=10,
        docs=docs,
    )
    return out.select("doc_id", F.round("score", 6).alias("score"))


def _ann_filtered_q(spark, sf_dir):
    """Filtered kNN (similarity.cosine_topk where=): brute-force cosine
    top-10 restricted to label=1 rows — the ES knn `filter` /
    vector-store pre-filter shape. The predicate applies BEFORE any
    similarity work (pushes to the scan; top-k holds k true neighbors
    from the allowed set)."""
    emb = _emb(spark, sf_dir)
    qvec = list(emb.filter(F.col("vec_id") == 0).first().embedding)
    out = similarity.cosine_topk(emb, qvec, k=10, where=F.col("label") == 1)
    return out.select("vec_id", F.round("score", 6).alias("score"))


def _ann_lsh_filtered_q(spark, sf_dir):
    """Filtered kNN on the LSH path at FULL probe (max_probe == n_planes
    accepts every signature) — degenerates to the exact filtered scan,
    so the brute-force filtered SQL is a REAL oracle for the
    filter-then-probe composition (same trick as ann_lsh_top10)."""
    emb = _emb(spark, sf_dir)
    qvec = list(emb.filter(F.col("vec_id") == 0).first().embedding)
    out = similarity.lsh_topk(
        emb, qvec, k=10, n_planes=12, max_probe=12, where=F.col("label") == 1
    )
    return out.select("vec_id", F.round("score", 6).alias("score"))


def _delete_by_query_q(spark, sf_dir):
    """ES _delete_by_query through the engine facade: tombstone every
    doc matching 'sort' (full boolean match set via
    search_segments(k=None) — ids never collected to the driver), then
    COMPACT so stats rewrite: the index must equal a fresh build over
    the surviving docs, which is exactly what the oracle recomputes."""
    import os
    import shutil

    import fugu_spark
    from fugu_spark.engine import FuguSparkEngine

    d = (
        f"/tmp/fugu_entry_dbq_{os.path.basename(sf_dir.rstrip('/'))}"
        f"_v{fugu_spark.__version__}"
    )
    shutil.rmtree(d, ignore_errors=True)
    eng = FuguSparkEngine.build(
        _docs(spark, sf_dir), index_dir=d, id_col="doc_id", text_col="text"
    )
    eng.delete_by_query("sort")
    eng.compact()
    out = eng.search("merge join", k=10)
    return out.select("doc_id", F.round("score", 6).alias("score"))


def _sig_text_q(spark, sf_dir):
    """ES significant_text (JLH over index TOKENS): the terms that
    characterize the matched set of 'merge' vs the corpus — fg df from a
    postings semi-join, bg df from the dictionary."""
    from fugu_spark.aggs import significant_text_agg

    _, idx = _index(spark, sf_dir)
    return significant_text_agg(
        idx, _matched_set(spark, sf_dir, "merge"), size=10, min_doc_count=2
    )


def _agg_filters_q(spark, sf_dir):
    """ES `filters` bucket agg: three named predicate buckets with an
    n_chars sum/avg metric — ONE grand aggregate, zero shuffles (every
    bucket is a conditional aggregate; plan pinned in tests)."""
    from fugu_spark.aggs import filters_agg

    d = _docs(spark, sf_dir)
    return filters_agg(
        d,
        {
            "es_docs": F.col("lang") == "es",
            "long": F.col("n_chars") >= 400,
            "short": F.col("n_chars") < 200,
        },
        field="n_chars",
    )


def _ir_metrics_q(spark, sf_dir):
    """IR evaluation (trec_eval metric set): rank two queries with the
    one-job batch engine, judge against deterministically derived qrels
    (docs containing 'sort'; grade 2 when 'scan' co-occurs), and compute
    per-query P@10 / Recall@10 / RR / nDCG@10 — the eval loop a
    retrieval pipeline runs after every index or model change."""
    from fugu_spark.analytics.ir_eval import relevance_metrics
    from fugu_spark.batch import batch_search_segments

    si = _seg_index(spark, sf_dir)
    results = batch_search_segments(si, [(1, "merge"), (2, "merge join")], k=10)
    toks = F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != "")
    base = _docs(spark, sf_dir).select(
        "doc_id",
        F.array_contains(toks, "sort").alias("has_sort"),
        F.array_contains(toks, "scan").alias("has_scan"),
    ).filter("has_sort")
    qrels = (
        spark.createDataFrame([(1,), (2,)], "query_id long")
        .crossJoin(base)
        .select(
            "query_id", "doc_id",
            (F.lit(1) + F.col("has_scan").cast("int")).alias("grade"),
        )
    )
    return relevance_metrics(results, qrels, k=10)


def _sig_terms_q(spark, sf_dir):
    """ES significant_terms (JLH): which langs are over-represented in
    the matched set of 'merge' vs the whole corpus — one groupBy
    computing fg and bg counts simultaneously."""
    from fugu_spark.aggs import significant_terms_agg

    return significant_terms_agg(
        _docs(spark, sf_dir), _matched_set(spark, sf_dir, "merge"), "lang",
        size=10, min_doc_count=1,
    )


def _ccnet_ppl_q(spark, sf_dir):
    """CCNet-style LM quality scoring: per-doc perplexity under an
    add-α bigram model trained on the corpus itself — the head/middle/
    tail bucketing signal of Wenzek et al. 2020, no external model."""
    from fugu_spark.analytics.textstats import bigram_lm_perplexity

    return bigram_lm_perplexity(_docs(spark, sf_dir))


def _semdedup_q(spark, sf_dir):
    """SemDeDup (arXiv:2303.09540) in exact mode: n_centroids=1
    degenerates the within-cluster pair join to ALL pairs, so the greedy
    lower-id survivor rule has a direct SQL oracle (same trick as
    ann_ivf_top10). τ=0.4 drops ~10% of the synthetic embeddings."""
    return similarity.semdedup(
        _emb(spark, sf_dir), threshold=0.4, n_centroids=1
    ).select("vec_id", "keep")


def _semdedup_clustered_q(spark, sf_dir):
    """The real clustered path (n_centroids=8): k-means assignment is
    deterministic but not SQL-expressible — rows-only driver check; the
    superset-of-exact invariant is pinned in tests/test_semdedup.py."""
    return similarity.semdedup(
        _emb(spark, sf_dir), threshold=0.4, n_centroids=8
    ).select("vec_id", "keep")


# --------------------------------------------------------------------------
# Spark-side queries
# --------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def postings_tf(spark, sf_dir):
        _, idx = _index(spark, sf_dir)
        return idx.postings.select(
            "term", "doc_id", F.col("tf").cast("long").alias("tf")
        )

    def doc_len(spark, sf_dir):
        _, idx = _index(spark, sf_dir)
        return P.doc_stats(idx.postings).select(
            "doc_id", F.col("doc_len").cast("long").alias("doc_len")
        )

    def term_dict(spark, sf_dir):
        _, idx = _index(spark, sf_dir)
        return idx.terms.select(
            "term", F.col("df").cast("long").alias("df"), F.col("cf").cast("long").alias("cf")
        )

    def corpus_stats(spark, sf_dir):
        docs, idx = _index(spark, sf_dir)
        s = idx.stats
        return spark.createDataFrame(
            [(s.n_docs, s.total_tokens, round(s.avgdl, 6))],
            "n_docs long, total_tokens long, avgdl double",
        )

    def allquery(spark, sf_dir):
        docs, idx = _index(spark, sf_dir)
        return search(idx, "", k=1_000_000, docs=docs).select(
            "doc_id", F.round("score", 6).alias("score")
        )

    def point_lookup(spark, sf_dir):
        docs = _docs(spark, sf_dir)
        return docs.filter(F.col("doc_id") == 42).select("doc_id", "lang", "source", "n_chars")

    def facet_counts_lang(spark, sf_dir):
        docs = _facet_docs(spark, sf_dir)
        return facet_counts(docs, "/lang").select(
            "child", F.col("count").cast("long").alias("count")
        )

    def facet_tree(spark, sf_dir):
        docs = _facet_docs(spark, sf_dir)
        return facet_tree_counts(docs).select(
            "prefix", F.col("count").cast("long").alias("count")
        )

    def filter_values_lang(spark, sf_dir):
        return filter_values_at_path(_facet_docs(spark, sf_dir), "/lang")

    def all_filter_paths_q(spark, sf_dir):
        from fugu_spark.facets import all_filter_paths

        return all_filter_paths(_facet_docs(spark, sf_dir))

    def search_facets_src1(spark, sf_dir):
        return search_facets(_facet_docs(spark, sf_dir), "/source", text="1").select(
            "facet", F.col("count").cast("long").alias("count")
        )

    def exact_dedup_q(spark, sf_dir):
        return dedup.exact_dedup(_docs(spark, sf_dir)).select(
            "content_md5", "keep_id", F.col("n_dups").cast("long").alias("n_dups")
        )

    def token_stats(spark, sf_dir):
        docs = _docs(spark, sf_dir)
        return docs.select(
            "doc_id",
            textstats.token_count(F.col("text")).alias("n_tok"),
            textstats.distinct_token_count(F.col("text")).alias("n_distinct"),
            F.round(textstats.avg_token_len(F.col("text")), 6).alias("avg_len"),
        )

    def bpe_tokens(spark, sf_dir):
        return _docs(spark, sf_dir).select(
            "doc_id", textstats.bpe_token_count(F.col("text")).alias("n_bpe")
        )

    def emb_dup_exact(spark, sf_dir):
        """Exact embedding-cosine near-dup pairs on an id-capped slice
        (the brute-force ground truth the LSH-blocked variant targets)."""
        e = _emb(spark, sf_dir).filter(F.col("vec_id") < 80).select("vec_id", "embedding")
        a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
        b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
        return (
            a.join(b, F.col("id_a") < F.col("id_b"))
            .select(
                "id_a",
                "id_b",
                F.round(similarity.cosine_expr(F.col("va"), F.col("vb")), 6).alias("cosine"),
            )
            .filter(F.col("cosine") >= 0.25)
        )

    def quality(spark, sf_dir):
        return _docs(spark, sf_dir).select(
            "doc_id", F.round(textstats.quality_score(F.col("text")), 6).alias("q")
        )

    def lang_id_q(spark, sf_dir):
        return _docs(spark, sf_dir).select(
            "doc_id", textstats.lang_id(F.col("text")).alias("pred_lang")
        )

    def fingerprint(spark, sf_dir):
        return _docs(spark, sf_dir).select(
            "doc_id", textstats.fingerprint_md5(F.col("text")).alias("fp")
        )

    def date_range(spark, sf_dir):
        """X5: RFC3339 round-trip + half-open range filter over events.ts.
        The parquet ts is TIMESTAMP_NTZ (wall clock); we format it as an
        RFC3339 string with 'Z', re-parse through the engine's date layer
        under a UTC session (the instant domain the reference uses), and
        emit epoch micros — tz-independently equal to DuckDB's epoch_us."""
        from fugu_spark.dates import date_range_filter, parse_rfc3339

        spark.conf.set("spark.sql.session.timeZone", "UTC")
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        rfc = F.concat(F.replace(F.col("ts").cast("string"), F.lit(" "), F.lit("T")), F.lit("Z"))
        parsed = parse_rfc3339(rfc)
        return (
            ev.withColumn("_ts", parsed)
            .filter(date_range_filter(F.col("_ts"), "2024-01-05T00:00:00Z", "2024-01-08T00:00:00Z"))
            .select("event_id", F.unix_micros("_ts").alias("ts_us"))
        )

    def ngram_jaccard(spark, sf_dir):
        return dedup.ngram_jaccard_pairs(
            _docs(spark, sf_dir), n=3, threshold=0.01, id_limit=60
        ).select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))

    def dup_groups_q(spark, sf_dir):
        pairs = dedup.ngram_jaccard_pairs(
            _docs(spark, sf_dir), n=3, threshold=0.01, id_limit=60
        )
        return dedup.dup_groups(pairs)

    def ann_cosine_all(spark, sf_dir):
        emb = _emb(spark, sf_dir)
        qvec = list(emb.filter(F.col("vec_id") == 0).first().embedding)
        return emb.select(
            "vec_id",
            F.round(similarity.cosine_expr(F.col("embedding"), similarity._query_lit(qvec)), 6).alias(
                "cosine"
            ),
        )

    def suggestions_q(spark, sf_dir):
        docs = _docs(spark, sf_dir)
        return docs.select(
            "doc_id", F.explode(suggestions_udf(F.col("text"))).alias("suggestion")
        )

    # ---- training-data curation (fugu_spark/analytics/curation.py) ----
    from fugu_spark.analytics import curation

    def split_assign_q(spark, sf_dir):
        return curation.split_assign(_docs(spark, sf_dir)).select("doc_id", "split")

    def paragraph_dedup_q(spark, sf_dir):
        # the synthetic corpus has no blank-line paragraphs; split on a
        # frequent token so segments are multi-word and collide across docs
        return curation.paragraph_dedup(
            _docs(spark, sf_dir), delim_re=" table ", joiner=" table "
        )

    def stratified_sample_q(spark, sf_dir):
        return curation.stratified_sample(
            _docs(spark, sf_dir), 0.2, strata_col="lang"
        ).select("doc_id", "lang")

    def _pii_docs(spark, sf_dir):
        # testdata text contains no PII; inject deterministically so the
        # counts/redaction are non-trivial and oracle-checkable
        d = _docs(spark, sf_dir)
        inj = (
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" mail doc"), F.col("doc_id").cast("string"), F.lit("@example.com")
                ),
            )
            .when(F.col("doc_id") % 3 == 1, F.lit(" call 555-123-4567"))
            .otherwise(F.lit(""))
        )
        return d.withColumn("text", F.concat(F.col("text"), inj))

    def pii_scan_q(spark, sf_dir):
        out = curation.pii_counts(_pii_docs(spark, sf_dir))
        return out.select(
            "doc_id",
            "n_email",
            "n_ipv4",
            "n_phone",
            F.col("has_pii").cast("long").alias("has_pii"),
            F.length(curation.pii_redact(F.col("text"))).cast("long").alias("red_len"),
        )

    def repetition_q(spark, sf_dir):
        r = curation.repetition_stats(_docs(spark, sf_dir))
        return r.select(
            "doc_id",
            "n_tokens",
            F.round("dup_token_frac", 6).alias("dup_token_frac"),
            F.round("top_token_frac", 6).alias("top_token_frac"),
            F.round("top_bigram_frac", 6).alias("top_bigram_frac"),
        )

    def contamination_q(spark, sf_dir):
        d = _docs(spark, sf_dir)
        bench = d.filter(F.col("source") == "src0")
        corpus = d.filter(F.col("source") != "src0")
        c = curation.contamination(corpus, bench, n=3)
        return c.select(
            "doc_id",
            "n_grams",
            "n_contaminated",
            F.round("contamination_frac", 6).alias("contamination_frac"),
        )

    def gopher_quality_q(spark, sf_dir):
        # synthetic text is plain lowercase words: perturb deterministically
        # so every Gopher rule fires on some stratum
        d = _docs(spark, sf_dir)
        suffix = (
            F.when(
                F.col("doc_id") % 5 == 0,
                F.lit("\n- bullet item one\n- bullet item two"),
            )
            .when(F.col("doc_id") % 5 == 1, F.lit(" the dog and the cat trail..."))
            .when(F.col("doc_id") % 5 == 2, F.lit(" ### ## #"))
            .otherwise(F.lit(" the and of that"))
        )
        out = curation.gopher_filters(d.withColumn("text", F.concat(F.col("text"), suffix)))
        return out.select(
            "doc_id",
            F.col("n_words").cast("long").alias("n_words"),
            "mean_word_len",
            "symbol_word_ratio",
            "frac_bullet_lines",
            "frac_ellipsis_lines",
            "frac_alpha_words",
            F.col("n_stop_hits").cast("long").alias("n_stop_hits"),
            F.col("keep").cast("long").alias("keep"),
        )

    def ann_batch_topk_q(spark, sf_dir):
        """Batch ANN: 3 query vectors, ONE job (similarity.batch_cosine_topk)
        — per-query results identical to the brute-force cosine_topk."""
        emb = _emb(spark, sf_dir)
        qs = {
            int(r["vec_id"]): list(r["embedding"])
            for r in emb.filter(F.col("vec_id") < 3).collect()
        }
        out = similarity.batch_cosine_topk(emb, qs, k=5)
        return out.select(
            "query_id",
            "vec_id",
            F.round("score", 6).alias("score"),
            F.col("rank").cast("long").alias("rank"),
        )

    def c4_filters_q(spark, sf_dir):
        # testdata text has no punctuation/braces; perturb deterministically
        d = _docs(spark, sf_dir)
        suffix = (
            F.when(F.col("doc_id") % 4 == 0, F.lit("."))
            .when(F.col("doc_id") % 4 == 1, F.lit(" {x}"))
            .when(F.col("doc_id") % 4 == 2, F.lit(" lorem ipsum."))
            .otherwise(F.lit(""))
        )
        flags = curation.c4_filters(d.withColumn("text", F.concat(F.col("text"), suffix)))
        return flags.select(
            "doc_id",
            *[
                F.col(c).cast("long").alias(c)
                for c in (
                    "too_few_words",
                    "has_long_word",
                    "has_lorem",
                    "has_brace",
                    "ends_with_punct",
                    "keep",
                )
            ],
        )

    def dedup_against_q(spark, sf_dir):
        # new batch = 100 case-perturbed dups of existing docs + 50 novel
        # docs; incremental dedup must keep exactly the novel 50
        d = _docs(spark, sf_dir)
        dup_batch = d.filter(F.col("doc_id") < 100).select(
            (F.col("doc_id") + 10000).alias("doc_id"), F.upper(F.col("text")).alias("text")
        )
        novel_batch = d.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 150)).select(
            (F.col("doc_id") + 20000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" genuinely novel suffix")).alias("text"),
        )
        new_docs = dup_batch.unionByName(novel_batch)
        return curation.dedup_against(new_docs, d).select("doc_id")

    def segments_compact_q(spark, sf_dir):
        """B7/D2 through the driver gate: build, upsert (replacing some
        docs, inserting others), delete, COMPACT, then search — after
        compaction the index must equal a fresh build over the effective
        live corpus, which is exactly what the oracle recomputes."""
        import os
        import shutil

        import fugu_spark
        from fugu_spark.segment_search import search_segments
        from fugu_spark.segments import (
            build_segments,
            compact,
            delete_doc_ids,
            upsert_segments,
        )

        d = (
            f"/tmp/fugu_entry_compact_{os.path.basename(sf_dir.rstrip('/'))}"
            f"_v{fugu_spark.__version__}"
        )
        shutil.rmtree(d, ignore_errors=True)
        docs = _docs(spark, sf_dir)
        base = docs.filter(F.col("doc_id") < 480)
        si = build_segments(base, d, id_col="doc_id", text_col="text")
        upd = docs.filter(F.col("doc_id") >= 470).withColumn(
            "text", F.concat(F.col("text"), F.lit(" compacted extra tokens"))
        )
        si = upsert_segments(si, upd, id_col="doc_id", text_col="text")
        si = delete_doc_ids(si, spark.range(0, 5).withColumnRenamed("id", "doc_id"))
        si = compact(si)
        out = search_segments(si, "merge join", k=10)
        return out.select("doc_id", F.round("score", 6).alias("score"))

    def metadata_facets_q(spark, sf_dir):
        """X7/X8: deterministic metadata JSON → flattened facet paths.
        The synthesized object covers nested keys, array fan-out, an
        empty string (skipped, X8) and a numeric leaf (skipped — only
        non-empty string leaves emit, src/db/utils.rs:11-56)."""
        from fugu_spark.facets import metadata_facets_udf

        d = _docs(spark, sf_dir).withColumn(
            "metadata",
            F.concat(
                F.lit('{"team": "t'),
                (F.col("doc_id") % 3).cast("string"),
                F.lit('", "tags": ["alpha", "beta"], "empty": "", "n": 7}'),
            ),
        )
        return d.select(
            "doc_id", F.explode(metadata_facets_udf(F.col("metadata"))).alias("facet")
        )

    def ns_filter_paths_q(spark, sf_dir):
        """A5: filter paths scoped to one namespace's docs."""
        from fugu_spark.facets import derive_facets, namespace_filter_paths

        d = _docs(spark, sf_dir).withColumn(
            "facets",
            derive_facets(("namespace", F.col("source")), ("lang", F.col("lang"))),
        )
        return namespace_filter_paths(d, "src1")

    def facet_counts_served_q(spark, sf_dir):
        """A1 through the pre-rolled counts_index ledger (ms serving path)
        — must be value-identical to the docs-scan facet_counts_lang."""
        eng = _engine(spark, sf_dir)
        return eng.facet_counts("/lang").select(
            "child", F.col("count").cast("long").alias("count")
        )

    def sha256_invariant_q(spark, sf_dir):
        """X14, the north rule's per-row ingest invariant: sha256 of every
        document's content, computed by the engine's own expression
        (sources.check_sha256_invariant) and cross-checked byte-for-byte
        against DuckDB's sha256."""
        return _docs(spark, sf_dir).select(
            "doc_id", F.sha2(F.col("text"), 256).alias("content_sha256")
        )

    def per_page_clamp_q(spark, sf_dir):
        """F10: out-of-range k clamps to 20 (reference (0,100] rule)."""
        eng = _engine(spark, sf_dir)
        out = eng.search("merge join", k=500)  # > 100 -> clamped to 20
        return out.select("doc_id", F.round("score", 6).alias("score"))

    def multi_filter_or_q(spark, sf_dir):
        """F6: multiple facet filters OR together (reference semantics)."""
        eng = _engine(spark, sf_dir)
        out = eng.search("merge", k=10, filters=["/lang/es", "/lang/de"])
        return out.select("doc_id", F.round("score", 6).alias("score"))

    def point_lookup_served_q(spark, sf_dir):
        """S8 through the doc_store sidecar (pruned row-group read)."""
        eng = _engine(spark, sf_dir)
        return eng.get(42).select("doc_id", "lang", "source", "n_chars")

    def suggest_served_q(spark, sf_dir):
        """D6 autocomplete through the persisted suggest_index (prefix
        byte-range pushdown + delete masking)."""
        eng = _engine(spark, sf_dir)
        return eng.suggest("merge", n=10).select(
            "suggestion", F.col("count").cast("long").alias("count")
        )

    def filter_values_served_q(spark, sf_dir):
        """A6 through the counts ledger."""
        eng = _engine(spark, sf_dir)
        return eng.filter_values("/lang")

    def highlights_q(spark, sf_dir):
        """R6 highlights: top-10 for 'merge' with **-wrapped snippet
        windows. SQL-oracle-able on this corpus because the text is
        space-separated vocabulary where 'merge' is never a substring of
        another token, so strpos/replace reproduce the tokenizer's
        whole-token matching exactly."""
        from fugu_spark.highlights import with_snippets

        docs, idx = _index(spark, sf_dir)
        top = search(idx, "merge", k=10, docs=docs)
        return with_snippets(top, docs, "merge").select(
            "doc_id", F.round("score", 6).alias("score"), "snippet"
        )

    def mix_corpus_q(spark, sf_dir):
        # exact-binary weights (0.5 + 0.25 + 0.25 == 1.0 in f64) so the
        # driver-side threshold arithmetic is bit-identical to the oracle
        return curation.mix_corpus(
            _docs(spark, sf_dir), {"src1": 0.5, "src2": 0.25, "src3": 0.25}
        ).select("doc_id", "source")

    def pack_sequences_q(spark, sf_dir):
        return curation.pack_sequences(_docs(spark, sf_dir), cap_tokens=200, n_streams=8)

    # ---- filter family + score tweaks over the full engine ----

    def _contains_filter_q(spark, sf_dir):
        from fugu_spark.facets import FacetFilter

        eng = _engine(spark, sf_dir)
        out = eng.search(
            "merge", k=10, filters=[FacetFilter(path="", operator="contains", value="rc1")]
        )
        return out.select("doc_id", F.round("score", 6).alias("score"))

    def facet_boost_q(spark, sf_dir):
        """R5 (disabled-variant) score tweak: BM25 × 1.5^matching over the
        full candidate set, then top-10 — rank-safe because the rescore
        precedes truncation."""
        from fugu_spark.facets import facet_boost_score

        docs, idx = _index(spark, sf_dir)
        base = search(idx, "merge", k=100_000, docs=docs)
        fd = _facet_docs(spark, sf_dir).select("doc_id", "facets")
        boosted = base.join(fd, "doc_id").select(
            "doc_id",
            facet_boost_score(F.col("score"), F.col("facets"), ["/lang/es"]).alias("score"),
        )
        from fugu_spark.search import top_k

        return top_k(boosted, k=10).select("doc_id", F.round("score", 6).alias("score"))

    def filter_boost_q(spark, sf_dir):
        """R4 score tweak: BM25 × 0.25^missing-query-facets."""
        from fugu_spark.facets import filter_boost_score

        docs, idx = _index(spark, sf_dir)
        base = search(idx, "merge", k=100_000, docs=docs)
        fd = _facet_docs(spark, sf_dir).select("doc_id", "facets")
        boosted = base.join(fd, "doc_id").select(
            "doc_id",
            filter_boost_score(
                F.col("score"), F.col("facets"), ["/lang/es", "/source/src1"]
            ).alias("score"),
        )
        from fugu_spark.search import top_k

        return top_k(boosted, k=10).select("doc_id", F.round("score", 6).alias("score"))

    def namespaces_q(spark, sf_dir):
        """A2: namespace enumeration from '/namespace/...' facets."""
        from fugu_spark.facets import derive_facets, namespaces

        d = _docs(spark, sf_dir).withColumn(
            "facets", derive_facets(("namespace", F.col("source")))
        )
        return namespaces(d)

    # ORDERING POLICY (the driver executes the FIRST 50 entries in dict
    # insertion order — VERDICT r4 Next #2): never-verified/new entries
    # come FIRST, then the entries whose last driver-green row is two
    # rounds old (the 27 rotated out of r04's window), then a regression
    # core fills to the 50 cap; entries green in r04 rotate to the tail
    # (still pytest-covered and locally oracle-verified every round).
    def percolate_q(spark, sf_dir):
        """Standing-query matching (percolator / Lucene-Monitor shape):
        tag every doc with the registered queries it satisfies — one
        job over the raw doc batch, no index built (fugu_spark.percolate)."""
        from fugu_spark.percolate import compile_queries, percolate

        out = percolate(
            _docs(spark, sf_dir), compile_queries(_PERC_QUERIES), text_col="text"
        )
        return out.orderBy("doc_id", "query_id").select(
            F.col("doc_id").cast("long"), F.col("query_id").cast("long")
        )

    def percolate_knobs_q(spark, sf_dir):
        """Percolation with the engine-level knobs: q1 runs with
        synonyms (merge → {merge, join, sort}: group matches ⇔ any
        member present) AND min_should_match=2 over shoulds
        {syn-group, scan} — docs containing a group member AND scan."""
        from fugu_spark.percolate import compile_queries, percolate

        out = percolate(
            _docs(spark, sf_dir),
            compile_queries({1: "merge scan"}, synonyms={"merge": ["join", "sort"]}),
            text_col="text",
            min_should_match=2,
        )
        return out.orderBy("doc_id", "query_id").select(
            F.col("doc_id").cast("long"), F.col("query_id").cast("long")
        )

    def code_tokens_q(spark, sf_dir):
        """Code-analyzer postings over the derived camelized corpus
        (see _code_index): (term, doc_id, tf) must equal plain
        tokenization of the ORIGINAL text (len ≥ 2 words) — i.e. the
        camelCase/acronym/digit boundary rules recover every original
        word boundary, none extra."""
        camel, idx = _code_index(spark, sf_dir)
        return idx.postings.select(
            "term", F.col("doc_id").cast("long"), F.col("tf").cast("long").alias("tf")
        )

    def bm25_code_q(spark, sf_dir):
        """BM25 top-10 for the camelCase query string 'mergeJoin' with
        the code analyzer: the query side splits to [merge, join]
        through the same boundary rules as the index side, and —
        Tantivy QueryParser semantics for a multi-token word — executes
        as the adjacency PHRASE "merge join"."""
        camel, idx = _code_index(spark, sf_dir)
        out = search(idx, "mergeJoin", k=10, docs=camel, mode="code")
        return out.select("doc_id", F.round("score", 6).alias("score"))

    def code_quality_q(spark, sf_dir):
        """StarCoder/CodeParrot-style code-quality filters (analytics/
        code_quality.py) over a deterministically derived multi-line
        file: every occurrence of the word 'line' in the doc text
        becomes a newline ('line' has no self-overlap, so Spark and
        DuckDB replace() agree), then line-shape + char-class stats and
        the published keep thresholds are pure column exprs both sides."""
        from fugu_spark.analytics.code_quality import code_quality_stats

        src = _docs(spark, sf_dir).select(
            "doc_id", F.expr("replace(text, 'line', '\n')").alias("content")
        )
        return code_quality_stats(src).select(
            "doc_id",
            "n_lines",
            "max_line_len",
            "avg_line_len",
            "alnum_frac",
            "alpha_token_frac",
            "keep_code",
        )

    def bm25_code_served_q(spark, sf_dir):
        """Same query through the SEGMENT build + driver-side serving
        path under the code analyzer (LocalSearcher(mode='code')) —
        rank/score-identical to bm25_code by construction, verified
        against the same phrase oracle."""
        from fugu_spark.serve import LocalSearcher

        si = _code_seg_index(spark, sf_dir)
        pdf = LocalSearcher(si.index_dir, mode="code").search("mergeJoin", k=10)
        pdf["score"] = pdf["score"].round(6)
        return spark.createDataFrame(pdf, "doc_id long, score double")

    def match_count_q(spark, sf_dir):
        """Exact hit count, no top-k (Lucene TotalHitCountCollector;
        fugu_spark/resultops.py)."""
        from fugu_spark.resultops import match_count

        _, idx = _index(spark, sf_dir)
        return match_count(idx, "merge join scan")

    def grouped_lang_q(spark, sf_dir):
        """Field collapsing: top-3 hits per lang (Lucene grouping
        module; fugu_spark/resultops.py)."""
        from fugu_spark.resultops import grouped_topk

        docs, idx = _index(spark, sf_dir)
        out = grouped_topk(idx, "merge join", docs, "lang", k_per_group=3)
        return out.select(
            "group", "doc_id", F.round("score", 6).alias("score"), "rank_in_group"
        )

    def mlt_q(spark, sf_dir):
        """MoreLikeThis: seed doc 42's top-5 tf×idf terms as an OR query,
        seed excluded (fugu_spark/resultops.py)."""
        from fugu_spark.resultops import more_like_this

        _, idx = _index(spark, sf_dir)
        out = more_like_this(idx, 42, max_terms=5, k=10)
        return out.select("doc_id", F.round("score", 6).alias("score"))

    def match_count_served_q(spark, sf_dir):
        """Same exact-count semantics from the driver-side serving path
        (LocalSearcher.count — serve.py)."""
        from fugu_spark.serve import LocalSearcher

        si = _seg_index(spark, sf_dir)
        n = LocalSearcher(si.index_dir).count("merge join scan")
        return spark.createDataFrame([(n,)], "n_matches long")

    def _hybrid_q(fusion: str):
        def run(spark, sf_dir):
            """BM25 + embedding-cosine hybrid retrieval
            (fugu_spark/hybrid.py): top-100 candidates from each engine,
            fused by RRF (1/(60+rank)) or α=0.5 min-max weighted sum."""
            from fugu_spark.hybrid import hybrid_search

            _, idx = _index(spark, sf_dir)
            emb = _emb(spark, sf_dir)
            qvec = list(emb.filter(F.col("vec_id") == 0).first().embedding)
            out = hybrid_search(idx, emb, "merge join", qvec, k=10, fusion=fusion)
            return out.select("doc_id", F.round("score", 6).alias("score"))

        return run

    def batch_mlt_q(spark, sf_dir):
        """Corpus-wide MoreLikeThis in one job: every doc's top-3
        lexically-similar docs (fugu_spark/resultops.py batch_mlt;
        rank identity vs per-seed more_like_this pinned in tests)."""
        from fugu_spark.resultops import batch_mlt

        _, idx = _index(spark, sf_dir)
        out = batch_mlt(idx, max_terms=5, k=3)
        return out.select(
            "seed", "cand", F.round("score", 6).alias("score"), "rank"
        )

    def hybrid_batch_q(spark, sf_dir):
        """Many-query hybrid retrieval in one job: batch BM25 over the
        segment index + batch cosine over the embeddings, fused per
        query by RRF (fugu_spark/hybrid.py batch_rrf_fuse)."""
        from fugu_spark.analytics.similarity import batch_cosine_topk
        from fugu_spark.batch import batch_search_segments
        from fugu_spark.hybrid import batch_rrf_fuse

        si = _seg_index(spark, sf_dir)
        emb = _emb(spark, sf_dir)
        queries = {0: "merge join", 1: "scan sort", 2: "filter index"}
        qvecs = {
            int(r.vec_id): list(r.embedding)
            for r in emb.filter(F.col("vec_id").isin(0, 1, 2)).collect()
        }
        lex = batch_search_segments(si, queries, k=50)
        sem = batch_cosine_topk(emb, qvecs, k=50).withColumnRenamed("vec_id", "doc_id")
        out = batch_rrf_fuse([lex, sem], k=10, n_candidates=50)
        return out.select(
            "query_id", "doc_id", F.round("score", 6).alias("score"), "rank"
        )

    def grouped_served_q(spark, sf_dir):
        """Field collapsing at serving latency (LocalSearcher.grouped_topk
        via the filter_index sidecar) — same semantics and oracle as the
        distributed bm25_grouped_lang entry."""
        from fugu_spark.serve import LocalSearcher

        eng = _engine(spark, sf_dir)
        pdf = LocalSearcher(eng.si.index_dir).grouped_topk(
            "merge join", "lang", k_per_group=3
        )
        pdf["score"] = pdf["score"].round(6)
        return spark.createDataFrame(
            pdf, "group string, doc_id long, score double, rank_in_group int"
        )

    def mlt_served_q(spark, sf_dir):
        """MoreLikeThis at serving latency (LocalSearcher.more_like_this
        over the doc_store + dictionary sidecars) — same semantics as
        the distributed more_like_this entry, same oracle."""
        from fugu_spark.serve import LocalSearcher

        eng = _engine(spark, sf_dir)
        pdf = LocalSearcher(eng.si.index_dir).more_like_this(42, max_terms=5, k=10)
        pdf["score"] = pdf["score"].round(6)
        return spark.createDataFrame(pdf, "doc_id long, score double")

    def spell_suggest_q(spark, sf_dir):
        """'Did you mean' for three misspellings: closest dictionary
        terms (distance ASC, df DESC, term ASC) —
        fugu_spark/resultops.py spell_suggest."""
        from functools import reduce

        from fugu_spark.resultops import spell_suggest

        _, idx = _index(spark, sf_dir)
        parts = [
            spell_suggest(idx, miss, n=5).withColumn("input", F.lit(miss))
            for miss in ("mergd", "scon", "rown")
        ]
        return reduce(lambda a, b: a.unionByName(b), parts).select(
            "input", "term", "distance", F.col("df").cast("long").alias("df")
        )

    out = {
        # --- block 1: new this round (never driver-verified) ---
        # Zoekt-style trigram code search (fugu_spark/trigram.py)
        "trigram_substring": _trigram_substring_q,
        "trigram_regex": _trigram_regex_q,
        "trigram_substring_served": _trigram_served_q,
        "trigram_grep": _trigram_grep_q,
        "trigram_substring_ci": _trigram_ci_q,
        # BM25F-style term-centric field blending (search.py)
        "combined_fields": _combined_fields_q,
        # adjacency_matrix + rare_terms aggs (aggs.py)
        "agg_adjacency": _agg_adjacency_q,
        "agg_rare_terms": _agg_rare_terms_q,
        # snapshot/restore (snapshot.py): search over a restored copy
        "bm25_snapshot_restore": _snapshot_restore_q,
        # federated DFS search over a split corpus (federated.py)
        "bm25_federated": _fed_q,
        "bm25_routed": _routed_q,
        # ES _termvectors (resultops.py)
        "term_vectors_doc": _term_vectors_q,
        # ctags-lite symbol extraction + definition search (analytics/symbols.py)
        "sym_extract": _sym_extract_q,
        "sym_search": _sym_search_q,
        "sym_prefix": _sym_prefix_q,
        "sym_search_served": _sym_served_q,
        "sym_boost_search": _sym_boost_q,
        # ES/Tantivy aggregation surface (fugu_spark/aggs.py)
        "agg_terms_stats": _agg_terms_stats,
        "agg_histogram": _agg_histogram,
        "agg_date_histogram": _agg_date_histogram,
        "agg_range": _agg_range,
        "agg_percentiles": _agg_percentiles,
        "agg_cardinality": _agg_cardinality,
        "agg_query_terms": _agg_query_terms,
        "agg_top_hits": _agg_top_hits,
        "bm25_search_after": _search_after_q,
        "bm25_search_after_served": _search_after_served_q,
        "multifield_dismax": _dismax_q,
        "semdedup_exact": _semdedup_q,
        "semdedup_clustered": _semdedup_clustered_q,
        "agg_composite": _agg_composite,
        "bm25_rescore": _rescore_q,
        "bm25_fvf": _fvf_q,
        "agg_sig_terms": _sig_terms_q,
        "ccnet_perplexity": _ccnet_ppl_q,
        "agg_filters": _agg_filters_q,
        "agg_sig_text": _sig_text_q,
        "ir_metrics": _ir_metrics_q,
        "bm25_dsl": _dsl_q,
        "bm25_span_near": _span_near_q,
        "ann_filtered": _ann_filtered_q,
        "ann_lsh_filtered": _ann_lsh_filtered_q,
        "delete_by_query": _delete_by_query_q,
        "index_stats": _index_stats_q,
        "stream_window_counts": _stream_window_q,
        "stream_dedup": _stream_dedup_q,
        "bm25_as_of": _as_of_q,
        "bm25_as_of_served": _as_of_served_q,
        "segments_compact_range": _compact_range_q,
        "bm25_regex": _search_q("/s.*o.*/", 10),
        "bm25_regex_served": _serving_q("/s.*o.*/ merge", 10),
        "bm25_wildcard_term": _search_q("s?an*", 10),
        "bm25_wildcard_served": _serving_q("merge jo?n*", 10),
        "bm25_msm2": _search_q("merge join scan", 10, msm=2),
        "bm25_msm2_served": _serving_q("merge join scan", 10, msm=2),
        "bm25_sorted_field": _sorted_q("merge join", "n_chars", 10),
        "explain_doc": _explain_q("merge join", 1),
        "bm25_synonym": _synonym_q("merge", {"merge": ["join", "sort"]}, 10),
        "batch_search_syn": _batch_syn_q,
        "percolate_knobs": percolate_knobs_q,
        "grep_lines": lambda spark, sf_dir: __import__(
            "fugu_spark.analytics.codesearch", fromlist=["grep"]
        ).grep(_docs(spark, sf_dir), "merge (join|sort)"),
        "grep_count": lambda spark, sf_dir: __import__(
            "fugu_spark.analytics.codesearch", fromlist=["grep_count"]
        ).grep_count(_docs(spark, sf_dir), "value.*hash"),
        "match_count": match_count_q,
        "match_count_served": match_count_served_q,
        "hybrid_rrf": _hybrid_q("rrf"),
        "hybrid_weighted": _hybrid_q("weighted"),
        "hybrid_batch": hybrid_batch_q,
        "batch_mlt": batch_mlt_q,
        "bm25_grouped_served": grouped_served_q,
        "more_like_this_served": mlt_served_q,
        "spell_suggest": spell_suggest_q,
        "bm25_grouped_lang": grouped_lang_q,
        "more_like_this": mlt_q,
        "percolate": percolate_q,
        "code_tokens": code_tokens_q,
        "bm25_code": bm25_code_q,
        "bm25_code_served": bm25_code_served_q,
        "code_quality": code_quality_q,
        # signed non-word clauses: the occur prefix binds to the phrase
        # token itself ('-"a b"' = negated PhraseQuery — Tantivy parser)
        "bm25_not_phrase": _search_q('-"merge join" scan', 10),
        "bm25_must_phrase": _search_q('+"merge join" scan', 10),
        "bm25_fuzzy": _search_q("scal~2", 10),
        "multifield_exists": _multifield_q("source:* merge", 10),
        "bm25_prefix_served": _serving_q("s*", 10),
        "gopher_quality": gopher_quality_q,
        "ann_batch_topk": ann_batch_topk_q,
        "bm25_streamed": _bm25_streamed_q,
        "batch_search_rich": _batch_q(_BATCH_RICH_QUERIES),
        "bm25_in_set": _multifield_q("source: IN [src1 src2] merge", 10),
        "bm25_phrase_prefix": _search_q('"merge s"*', 10),
        "bm25_prefix_term": _search_q("s*", 10),
        "bm25_term_range": _search_q("merge [scan TO sort]", 10),
        "bm25_segments_prefix": _seg_search_q("s*", 10),
        # --- block 2: last driver-verified in r03 ---
        # Round-5 grew the never-verified pool to 88 entries, so none of
        # these 27 fit the 50-entry window this round (see _WINDOW below);
        # they must LEAD the r06 window (3 rounds stale otherwise). All
        # are green in CORRECTNESS_LOCAL_r05.json regardless.
        "all_filter_paths": all_filter_paths_q,
        "ann_cosine_all": ann_cosine_all,
        "ann_ivf_top10": _ann_ivf_top10,
        "ann_lsh_probe2": _ann_lsh_probe2,
        "ann_lsh_top10": _ann_lsh_top10,
        "bm25_contains_filter": _contains_filter_q,
        "bm25_page2": _eng_search_q("merge join", 10, offset=10),
        "bm25_prefix_filter": _eng_search_q("merge", 10, filters=["lang/e/*"]),
        "bm25_wildcard_filter": _eng_search_q("merge", 10, filters=["*rc1*"]),
        "bm25_segments_and": _seg_search_q("merge AND join", 10),
        "bpe_token_count": bpe_tokens,
        "date_range_filter": date_range,
        "dup_groups": dup_groups_q,
        "emb_dup_exact": emb_dup_exact,
        "facet_boost": facet_boost_q,
        "facet_counts_lang": facet_counts_lang,
        "facet_tree": facet_tree,
        "filter_boost": filter_boost_q,
        "filter_values_lang": filter_values_lang,
        "fingerprint": fingerprint,
        "lang_id": lang_id_q,
        "ngram_jaccard": ngram_jaccard,
        "quality": quality,
        "search_facets_src1": search_facets_src1,
        "suggestions": suggestions_q,
        # The last seven of this block (lang_id … winnow_fps) sit at
        # positions 51-57: with 30 new round-5 entries ahead, the
        # driver's 50-entry cap reaches only 20 of the 27 r03-stale
        # rows. Those seven keep their r03 driver rows + this round's
        # local re-verification (CORRECTNESS_LOCAL_r05.json).
        "token_stats": token_stats,
        "winnow_fps": lambda spark, sf_dir: textstats.winnow_fingerprints(_docs(spark, sf_dir)),
        # --- block 3: regression core (fills to the 50 cap) ---
        "postings_tf": postings_tf,
        "doc_len": doc_len,
        "term_dict": term_dict,
        "corpus_stats": corpus_stats,
        "bm25_top10_single": _search_q("merge", 10),
        "bm25_top10_or": _search_q("merge join", 10),
        "bm25_top10_and": _search_q("merge AND join", 10),
        "bm25_top10_not": _search_q("merge NOT window", 10),
        "bm25_phrase": _search_q('"merge join"', 10),
        "bm25_boost": _search_q("merge^2 join", 10),
        "bm25_segments_or": _seg_search_q("merge join", 10),
        "bm25_segments_wand": _seg_search_q("merge join", 10, force_wand=True),
        "bm25_serving_path": _serving_q("merge join", 10),
        "multifield_or": _multifield_q("merge src1", 10),
        "exact_dedup": exact_dedup_q,
        "batch_search": _batch_search_q,
        # --- block 4: rotating tail (driver-green in r04; pytest-covered
        # and re-verified locally via CORRECTNESS_LOCAL each round) ---
        "bm25_or_k100": _search_q("merge join", 100),
        "bm25_filtered_lang": _search_q("merge", 10, lang="es"),
        "bm25_segments_phrase": _seg_search_q('"merge join"', 10),
        "allquery": allquery,
        "point_lookup": point_lookup,
        "minhash_pairs": lambda spark, sf_dir: dedup.minhash_dedup_pairs(
            _docs(spark, sf_dir), threshold=0.5
        ).select("id_a", "id_b", F.round("est_jaccard", 6).alias("est_jaccard")),
        "simhash_sigs": lambda spark, sf_dir: dedup.simhash_signatures(_docs(spark, sf_dir)),
        "bm25_min_score": _eng_search_q("merge join", 100, min_score=0.35),
        "namespaces": namespaces_q,
        "split_assign": split_assign_q,
        "stratified_sample": stratified_sample_q,
        "pii_scan": pii_scan_q,
        "repetition_stats": repetition_q,
        "contamination": contamination_q,
        "c4_filters": c4_filters_q,
        "dedup_against": dedup_against_q,
        "facet_counts_served": facet_counts_served_q,
        "sha256_invariant": sha256_invariant_q,
        "per_page_clamp": per_page_clamp_q,
        "multi_filter_or": multi_filter_or_q,
        "point_lookup_served": point_lookup_served_q,
        "suggest_served": suggest_served_q,
        "filter_values_served": filter_values_served_q,
        "highlights": highlights_q,
        "mix_corpus": mix_corpus_q,
        "pack_sequences": pack_sequences_q,
        "segments_compact": segments_compact_q,
        "metadata_facets": metadata_facets_q,
        "namespace_filter_paths": ns_filter_paths_q,
        "bm25_phrase_slop": _search_q('"merge join"~2', 10),
        "bm25_segments_phrase_slop": _seg_search_q('"merge join"~2', 10),
        "multifield_qualified": _multifield_q("source:src1 merge", 10),
        "paragraph_dedup": paragraph_dedup_q,
        "bm25_range_syntax": _eng_search_q(
            "merge date_created:[2024-03-01T00:00:00Z TO 2024-06-01T00:00:00Z}", 100
        ),
        # late round-5: function_score decay + boosting — lead the r06 window
        "bm25_decay_gauss": _decay_gauss_q,
        "bm25_boosting": _boosting_q,
        "bm25_pinned": _pinned_q,
        "bm25_pinned_served": _pinned_served_q,
        "bm25_terms_set": _terms_set_q,
        "random_sample": _random_sample_q,
        "phrase_suggest": _phrase_suggest_q,
        "agg_extended_stats": _agg_extended_stats,
        "agg_pipeline": _agg_pipeline,
        "agg_weighted_avg": _agg_weighted_avg,
        "agg_matrix_stats": _agg_matrix_stats,
        "agg_date_hist_empty": _agg_date_hist_empty,
        "agg_auto_date_hist": _agg_auto_date_hist,
    }
    # Driver cap: CORRECTNESS_r{N} verifies only the FIRST 50 entries, so
    # the window is chosen explicitly rather than by dict position. It
    # holds (a) the five entries VERDICT r4 named as round-5 done-criteria
    # (streamed build parity, batch-retrieval v2, and the three parser-tail
    # syntaxes), then (b) one representative per new round-5 capability
    # family (trigram code search, symbols, aggs, federation, snapshot,
    # hybrid, percolate, MLT, code-payload scoring, ...). Every entry NOT
    # in the window is verified by the full local sweep
    # (CORRECTNESS_LOCAL_r05.json: 182/182 green) and the pytest suite;
    # never-windowed new entries (incl. the late-round bm25_span_near,
    # ann_filtered, ann_lsh_filtered, delete_by_query, bm25_decay_gauss,
    # bm25_boosting, bm25_pinned(+_served), bm25_terms_set, random_sample,
    # phrase_suggest, agg_extended_stats, agg_pipeline, agg_weighted_avg,
    # agg_matrix_stats, agg_date_hist_empty, agg_auto_date_hist)
    # should lead the r06 window with the r03-stale block.
    _WINDOW = [
        "bm25_streamed",
        "batch_search_rich",
        "bm25_in_set",
        "bm25_phrase_prefix",
        "bm25_term_range",
        "trigram_substring",
        "trigram_regex",
        "combined_fields",
        "agg_adjacency",
        "agg_rare_terms",
        "bm25_snapshot_restore",
        "bm25_federated",
        "bm25_routed",
        "term_vectors_doc",
        "sym_extract",
        "sym_search",
        "agg_terms_stats",
        "agg_date_histogram",
        "agg_percentiles",
        "agg_composite",
        "agg_sig_terms",
        "bm25_search_after",
        "multifield_dismax",
        "semdedup_exact",
        "bm25_rescore",
        "bm25_fvf",
        "ccnet_perplexity",
        "ir_metrics",
        "bm25_dsl",
        "index_stats",
        "stream_window_counts",
        "bm25_as_of",
        "segments_compact_range",
        "bm25_regex",
        "bm25_wildcard_term",
        "bm25_msm2",
        "bm25_sorted_field",
        "explain_doc",
        "bm25_synonym",
        "percolate",
        "grep_lines",
        "match_count",
        "hybrid_rrf",
        "more_like_this",
        "spell_suggest",
        "bm25_grouped_lang",
        "bm25_code",
        "code_quality",
        "bm25_fuzzy",
        "gopher_quality",
    ]
    _win = set(_WINDOW)
    assert len(_WINDOW) == 50 and len(_win) == 50 and _win <= out.keys()
    out = {k: out[k] for k in _WINDOW} | {k: v for k, v in out.items() if k not in _win}
    return out


def _ann_lsh_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH ANN with full probe: max_probe == n_planes accepts every
    signature, degenerating to the exact scan — a REAL oracle for the
    LSH serving path (same trick as _ann_ivf_top10)."""
    emb = _emb(spark, sf_dir)
    qvec = list(emb.filter(F.col("vec_id") == 0).first().embedding)
    out = similarity.lsh_topk(emb, qvec, k=10, n_planes=12, max_probe=12)
    return out.select("vec_id", F.round("score", 6).alias("score"))


def _ann_lsh_probe2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPROXIMATE LSH path (max_probe=2) — oracle-checked too: the
    hyperplanes are deterministic, so the DuckDB oracle recomputes the
    same signatures from inlined plane constants and applies the same
    Hamming prune before the exact re-rank."""
    emb = _emb(spark, sf_dir)
    qvec = list(emb.filter(F.col("vec_id") == 0).first().embedding)
    out = similarity.lsh_topk(emb, qvec, k=10, n_planes=12, max_probe=2)
    return out.select("vec_id", F.round("score", 6).alias("score"))


def _ann_ivf_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with full probe: nprobe == n_centroids degenerates to the
    exact scan, so this approximate-index path gets a REAL oracle (same
    SQL as ann_cosine_all's brute force, top-10)."""
    emb = _emb(spark, sf_dir)
    qvec = list(emb.filter(F.col("vec_id") == 0).first().embedding)
    indexed, cents = similarity.build_ivf_index(emb, n_centroids=8, iters=4)
    out = similarity.ivf_topk(indexed, cents, qvec, k=10, nprobe=8)
    return out.select("vec_id", F.round("score", 6).alias("score"))


def _facet_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.withColumn(
        "facets", derive_facets(("lang", F.col("lang")), ("source", F.col("source")))
    ).withColumn(
        # deterministic per-doc date (epoch 2024-01-01 + doc_id%365 days) so
        # the engine builds a date_index sidecar and range-syntax queries
        # have an exact SQL oracle
        "date_created",
        F.timestamp_seconds(F.lit(1704067200) + (F.col("doc_id") % 365) * 86400),
    )


# --------------------------------------------------------------------------
# DuckDB oracles
# --------------------------------------------------------------------------

# Shared CTE: tokenization identical to the engine's normative analyzer for
# this corpus (pure lowercase-ascii space-separated words), with ordinal
# positions via a lateral generate_series.
_TOK = """
tok AS (
  SELECT doc_id, l[i] AS term, i - 1 AS pos
  FROM (SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS l
        FROM documents),
       unnest(generate_series(1, len(l))) AS t(i)
),
post AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*) AS doc_len FROM tok GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT sum(doc_len) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) AS avgdl
),
tstat AS (SELECT term, count(*) AS df, sum(tf)::BIGINT AS cf FROM post GROUP BY 1)
"""

# BM25 per-(term,doc) score over `post`:
_SCORE = (
    "ln(1 + (s.n - t.df + 0.5) / (t.df + 0.5)) * p.tf * 2.2 "
    "/ (p.tf + 1.2 * (0.25 + 0.75 * d.doc_len / s.avgdl))"
)

_SCORED = f"""
scored AS (
  SELECT p.doc_id, p.term, {_SCORE} AS sc
  FROM post p JOIN tstat t USING (term) JOIN dl d USING (doc_id), stats s
)
"""


def _topk_sql(where: str, k: int = 10, having: str = "") -> str:
    return f"""WITH {_TOK}, {_SCORED}
SELECT doc_id, round(sum(sc), 6) AS score
FROM scored WHERE {where}
GROUP BY doc_id {having}
ORDER BY sum(sc) DESC, doc_id ASC LIMIT {k}"""


_PHRASE_SQL = f"""WITH {_TOK},
phr AS (
  SELECT a.doc_id, count(*) AS tfp
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.term = 'merge' AND b.term = 'join'
  GROUP BY 1
),
idfs AS (
  SELECT sum(ln(1 + (s.n - t.df + 0.5) / (t.df + 0.5))) AS idf_sum
  FROM tstat t, stats s WHERE t.term IN ('merge', 'join')
)
SELECT p.doc_id,
       round(i.idf_sum * p.tfp * 2.2 / (p.tfp + 1.2 * (0.25 + 0.75 * d.doc_len / s.avgdl)), 6) AS score
FROM phr p JOIN dl d USING (doc_id), stats s, idfs i
ORDER BY 2 DESC, doc_id ASC LIMIT 10"""

# Sloppy phrase '"merge join"~2' (ordered, total-window semantics —
# queryparse.Leaf docstring): tf = distinct end positions of the second
# term having SOME first-term occurrence before them within the window.
_PHRASE_SLOP_SQL = f"""WITH {_TOK},
phr AS (
  SELECT b.doc_id, count(DISTINCT b.pos) AS tfp
  FROM tok a JOIN tok b
    ON a.doc_id = b.doc_id AND b.pos > a.pos AND b.pos - a.pos - 1 <= 2
  WHERE a.term = 'merge' AND b.term = 'join'
  GROUP BY 1
),
idfs AS (
  SELECT sum(ln(1 + (s.n - t.df + 0.5) / (t.df + 0.5))) AS idf_sum
  FROM tstat t, stats s WHERE t.term IN ('merge', 'join')
)
SELECT p.doc_id,
       round(i.idf_sum * p.tfp * 2.2 / (p.tfp + 1.2 * (0.25 + 0.75 * d.doc_len / s.avgdl)), 6) AS score
FROM phr p JOIN dl d USING (doc_id), stats s, idfs i
ORDER BY 2 DESC, doc_id ASC LIMIT 10"""

# Batch retrieval v2: phrase / sloppy-phrase+term / nested-group /
# phrase-NOT shapes, one (query_id, doc_id, score, rank ≤ 5) result set.
# Mirrors fugu_spark.batch's combine semantics per shape.
_BATCH_RICH_SQL = f"""WITH {_TOK}, {_SCORED},
idfs AS (
  SELECT sum(ln(1 + (s.n - t.df + 0.5) / (t.df + 0.5))) AS idf_sum
  FROM tstat t, stats s WHERE t.term IN ('merge', 'join')
),
phr AS (
  SELECT a.doc_id, count(*) AS tfp
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.term = 'merge' AND b.term = 'join' GROUP BY 1
),
phr_sc AS (
  SELECT p.doc_id,
         i.idf_sum * p.tfp * 2.2 / (p.tfp + 1.2 * (0.25 + 0.75 * d.doc_len / s.avgdl)) AS sc
  FROM phr p JOIN dl d USING (doc_id), stats s, idfs i
),
sphr AS (
  SELECT b.doc_id, count(DISTINCT b.pos) AS tfp
  FROM tok a JOIN tok b
    ON a.doc_id = b.doc_id AND b.pos > a.pos AND b.pos - a.pos - 1 <= 2
  WHERE a.term = 'merge' AND b.term = 'join' GROUP BY 1
),
sphr_sc AS (
  SELECT p.doc_id,
         i.idf_sum * p.tfp * 2.2 / (p.tfp + 1.2 * (0.25 + 0.75 * d.doc_len / s.avgdl)) AS sc
  FROM sphr p JOIN dl d USING (doc_id), stats s, idfs i
),
tbl_sc AS (SELECT doc_id, sum(sc) AS sc FROM scored WHERE term = 'table' GROUP BY 1),
srt_sc AS (SELECT doc_id, sum(sc) AS sc FROM scored WHERE term = 'sort' GROUP BY 1),
mj_sc  AS (SELECT doc_id, sum(sc) AS sc FROM scored WHERE term IN ('merge', 'join') GROUP BY 1),
q0 AS (SELECT 0 AS query_id, doc_id, sc AS s FROM phr_sc),
q1 AS (
  SELECT 1, COALESCE(p.doc_id, t.doc_id), COALESCE(p.sc, 0) + COALESCE(t.sc, 0)
  FROM sphr_sc p FULL OUTER JOIN tbl_sc t ON p.doc_id = t.doc_id
),
q2 AS (
  SELECT 2, g.doc_id, g.sc + s.sc
  FROM mj_sc g JOIN srt_sc s ON g.doc_id = s.doc_id
),
q3 AS (
  SELECT 3, doc_id, sc FROM tbl_sc
  WHERE doc_id NOT IN (SELECT doc_id FROM phr)
),
u AS (SELECT * FROM q0 UNION ALL SELECT * FROM q1 UNION ALL SELECT * FROM q2
      UNION ALL SELECT * FROM q3),
ranked AS (
  SELECT query_id, doc_id, round(s, 6) AS score,
         row_number() OVER (PARTITION BY query_id ORDER BY s DESC, doc_id ASC) AS rank
  FROM u
)
SELECT query_id, doc_id, score, rank FROM ranked WHERE rank <= 5"""

# 'merge s*' family — prefix expansion = every dictionary term with the
# prefix ('s' → 6 terms at this vocab, far under the 50-expansion cap,
# so LIKE reproduces the engine's dictionary-ordered expansion exactly)
_PHRASE_PREFIX_SQL = f"""WITH {_TOK},
phr AS (
  SELECT a.doc_id, b.term AS e, count(*) AS tfp
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.term = 'merge' AND b.term LIKE 's%'
  GROUP BY 1, 2
),
idfs AS (
  SELECT t.term AS e,
         (SELECT ln(1 + (s2.n - t2.df + 0.5) / (t2.df + 0.5))
          FROM tstat t2, stats s2 WHERE t2.term = 'merge')
         + ln(1 + (s.n - t.df + 0.5) / (t.df + 0.5)) AS idf_sum
  FROM tstat t, stats s WHERE t.term LIKE 's%'
),
sc AS (
  SELECT p.doc_id,
         i.idf_sum * p.tfp * 2.2 / (p.tfp + 1.2 * (0.25 + 0.75 * d.doc_len / s.avgdl)) AS sc
  FROM phr p JOIN idfs i USING (e) JOIN dl d USING (doc_id), stats s
)
SELECT doc_id, round(sum(sc), 6) AS score FROM sc
GROUP BY doc_id ORDER BY sum(sc) DESC, doc_id ASC LIMIT 10"""

# 'merge [scan TO sort]' — the range leaf is CONSTANT-score 1.0 (Lucene
# semantics, queryparse.Leaf.rng pin); merge scores BM25; flat OR combine
_TERM_RANGE_SQL = f"""WITH {_TOK}, {_SCORED},
m AS (SELECT doc_id, sum(sc) AS s FROM scored WHERE term = 'merge' GROUP BY 1),
r AS (SELECT DISTINCT doc_id FROM post WHERE term >= 'scan' AND term <= 'sort')
SELECT COALESCE(m.doc_id, r.doc_id) AS doc_id,
       round(COALESCE(m.s, 0) + CASE WHEN r.doc_id IS NOT NULL THEN 1.0 ELSE 0.0 END, 6) AS score
FROM m FULL OUTER JOIN r ON m.doc_id = r.doc_id
ORDER BY COALESCE(m.s, 0) + CASE WHEN r.doc_id IS NOT NULL THEN 1.0 ELSE 0.0 END DESC,
         1 ASC LIMIT 10"""

# 'source: IN [src1 src2] merge' — the set sugar becomes a source-scoped
# OR group; the source field is single-token (tf=1, dl=1, avgdl=1 →
# tf_norm = 1) so a set member's score is its bare idf; 'merge' scores in
# both fields (absent from source values here)
_IN_SET_SQL = f"""WITH {_TOK}, {_SCORED},
txt AS (SELECT doc_id, sum(sc) AS s FROM scored WHERE term = 'merge' GROUP BY 1),
sstat AS (SELECT source, count(*) AS df FROM documents GROUP BY source),
src AS (
  SELECT d.doc_id, ln(1 + (s.n - st.df + 0.5) / (st.df + 0.5)) AS s
  FROM documents d JOIN sstat st ON d.source = st.source, stats s
  WHERE d.source IN ('src1', 'src2')
)
SELECT COALESCE(txt.doc_id, src.doc_id) AS doc_id,
       round(COALESCE(txt.s, 0) + COALESCE(src.s, 0), 6) AS score
FROM txt FULL OUTER JOIN src ON txt.doc_id = src.doc_id
ORDER BY COALESCE(txt.s, 0) + COALESCE(src.s, 0) DESC, 1 ASC LIMIT 10"""

_BOOST_SQL = f"""WITH {_TOK}, {_SCORED}
SELECT doc_id, round(sum(CASE WHEN term = 'merge' THEN 2.0 * sc ELSE sc END), 6) AS score
FROM scored WHERE term IN ('merge', 'join')
GROUP BY doc_id
ORDER BY sum(CASE WHEN term = 'merge' THEN 2.0 * sc ELSE sc END) DESC, doc_id ASC LIMIT 10"""

_FILTERED_SQL = f"""WITH {_TOK}, {_SCORED}
SELECT sc.doc_id, round(sum(sc.sc), 6) AS score
FROM scored sc JOIN documents doc ON sc.doc_id = doc.doc_id AND doc.lang = 'es'
WHERE sc.term = 'merge'
GROUP BY sc.doc_id ORDER BY sum(sc.sc) DESC, sc.doc_id ASC LIMIT 10"""

# F3/F4/F5: the same scored-BM25 skeleton with the three non-equality
# facet predicates mirrored over the derived '/lang/x' + '/source/y' paths
_PREFIX_FILTER_SQL = f"""WITH {_TOK}, {_SCORED}
SELECT sc.doc_id, round(sum(sc.sc), 6) AS score
FROM scored sc JOIN documents doc ON sc.doc_id = doc.doc_id AND doc.lang LIKE 'e%'
WHERE sc.term = 'merge'
GROUP BY sc.doc_id ORDER BY sum(sc.sc) DESC, sc.doc_id ASC LIMIT 10"""

_CONTAINS_FILTER_SQL = f"""WITH {_TOK}, {_SCORED}
SELECT sc.doc_id, round(sum(sc.sc), 6) AS score
FROM scored sc JOIN documents doc ON sc.doc_id = doc.doc_id
 AND (contains('/lang/' || doc.lang, 'rc1') OR contains('/source/' || doc.source, 'rc1'))
WHERE sc.term = 'merge'
GROUP BY sc.doc_id ORDER BY sum(sc.sc) DESC, sc.doc_id ASC LIMIT 10"""

_WILDCARD_FILTER_SQL = f"""WITH {_TOK}, {_SCORED}
SELECT sc.doc_id, round(sum(sc.sc), 6) AS score
FROM scored sc JOIN documents doc ON sc.doc_id = doc.doc_id
 AND (contains(lower('/lang/' || doc.lang), 'rc1') OR contains(lower('/source/' || doc.source), 'rc1'))
WHERE sc.term = 'merge'
GROUP BY sc.doc_id ORDER BY sum(sc.sc) DESC, sc.doc_id ASC LIMIT 10"""

# R6 min_score: top-(k+offset) first, THEN the threshold — mirroring the
# engine's truncate-then-filter order
_MIN_SCORE_SQL = f"""WITH {_TOK}, {_SCORED},
ranked AS (
  SELECT doc_id, sum(sc) AS s FROM scored WHERE term IN ('merge', 'join')
  GROUP BY doc_id ORDER BY s DESC, doc_id ASC LIMIT 100
)
SELECT doc_id, round(s, 6) AS score FROM ranked WHERE s >= 0.35"""

# R3/O3 pagination: page 2 of the OR query (offset 10, k 10)
_PAGE2_SQL = f"""WITH {_TOK}, {_SCORED},
r AS (SELECT doc_id, sum(sc) AS s FROM scored WHERE term IN ('merge', 'join') GROUP BY doc_id)
SELECT doc_id, round(s, 6) AS score FROM r ORDER BY s DESC, doc_id ASC LIMIT 10 OFFSET 10"""

# R5 facet boost 1.5^matching; R4 filter boost 0.25^missing
_FACET_BOOST_SQL = f"""WITH {_TOK}, {_SCORED},
r AS (
  SELECT sc.doc_id, sum(sc.sc) * (CASE WHEN max(doc.lang) = 'es' THEN 1.5 ELSE 1.0 END) AS s
  FROM scored sc JOIN documents doc ON sc.doc_id = doc.doc_id
  WHERE sc.term = 'merge' GROUP BY sc.doc_id
)
SELECT doc_id, round(s, 6) AS score FROM r ORDER BY s DESC, doc_id ASC LIMIT 10"""

_FILTER_BOOST_SQL = f"""WITH {_TOK}, {_SCORED},
r AS (
  SELECT sc.doc_id,
         sum(sc.sc) * power(0.25, (CASE WHEN max(doc.lang) <> 'es' THEN 1 ELSE 0 END)
                                + (CASE WHEN max(doc.source) <> 'src1' THEN 1 ELSE 0 END)) AS s
  FROM scored sc JOIN documents doc ON sc.doc_id = doc.doc_id
  WHERE sc.term = 'merge' GROUP BY sc.doc_id
)
SELECT doc_id, round(s, 6) AS score FROM r ORDER BY s DESC, doc_id ASC LIMIT 10"""

_NAMESPACES_SQL = "SELECT DISTINCT source AS value FROM documents"

_STOPWORDS_EN = "'the','a','and','of','to','in','is','it','that','for'"
_SW = {
    "de": "'der','die','das','und','ist','nicht','ein','mit','zu','den'",
    "en": _STOPWORDS_EN,
    "es": "'el','la','de','que','y','en','un','es','no','por'",
    "fr": "'le','la','de','et','un','est','pas','que','en','du'",
}

_RATIOS = ", ".join(
    f"(SELECT count(*) FROM tok t2 WHERE t2.doc_id = dl.doc_id AND t2.term IN ({words}))::DOUBLE / dl.doc_len AS r_{lang}"
    for lang, words in _SW.items()
)

# Multi-field 'merge src1' over fields text + source. The source field has
# exactly one token per doc (tf=1, dl=1, avgdl=1) so its tf-norm is exactly
# 1.0 and the field score reduces to the idf.
_MULTIFIELD_SQL = f"""WITH {_TOK}, {_SCORED},
txt AS (
  SELECT doc_id, sum(sc) AS s FROM scored WHERE term IN ('merge', 'src1') GROUP BY doc_id
),
sstat AS (SELECT source, count(*) AS df FROM documents GROUP BY source),
src AS (
  SELECT d.doc_id, ln(1 + (s.n - st.df + 0.5) / (st.df + 0.5)) AS s
  FROM documents d JOIN sstat st ON d.source = st.source, stats s
  WHERE d.source IN ('merge', 'src1')
)
SELECT COALESCE(txt.doc_id, src.doc_id) AS doc_id,
       round(COALESCE(txt.s, 0) + COALESCE(src.s, 0), 6) AS score
FROM txt FULL OUTER JOIN src ON txt.doc_id = src.doc_id
ORDER BY COALESCE(txt.s, 0) + COALESCE(src.s, 0) DESC, 1 ASC LIMIT 10"""

# 'source:src1 merge': the qualified leaf scores ONLY in the source
# field; the bare 'merge' still scores in both (text + source). The
# source index has one single-token doc per row (tf=1, doc_len=1,
# avgdl=1 → tf_norm=1), so its leaf score is the bare idf.
_MULTIFIELD_QUALIFIED_SQL = f"""WITH {_TOK}, {_SCORED},
txt AS (
  SELECT doc_id, sum(sc) AS s FROM scored WHERE term = 'merge' GROUP BY doc_id
),
sstat AS (SELECT source, count(*) AS df FROM documents GROUP BY source),
src AS (
  SELECT d.doc_id, ln(1 + (s.n - st.df + 0.5) / (st.df + 0.5)) AS s
  FROM documents d JOIN sstat st ON d.source = st.source, stats s
  WHERE d.source IN ('merge', 'src1')
)
SELECT COALESCE(txt.doc_id, src.doc_id) AS doc_id,
       round(COALESCE(txt.s, 0) + COALESCE(src.s, 0), 6) AS score
FROM txt FULL OUTER JOIN src ON txt.doc_id = src.doc_id
ORDER BY COALESCE(txt.s, 0) + COALESCE(src.s, 0) DESC, 1 ASC LIMIT 10"""

# Winnowing (k=5 token grams, window=4): rolling min over 4 consecutive
# 60-bit gram hashes. The gram hash is the first 15 hex chars of md5 —
# identical to fugu_spark.analytics.textstats.gram_hash60.
# ---- curation oracles (fugu_spark/analytics/curation.py) ----
# md5-60bit id hash, identical to curation._id_hash / textstats.gram_hash60
def _hash60_sql(arg: str) -> str:
    return f"('0x' || substr(md5({arg}), 1, 15))::BIGINT"


# Paragraph-level dedup (curation.paragraph_dedup, ' table ' delimiter):
# keep-first by (doc_id, par_idx) per 60-bit paragraph hash, reassemble.
_PARDEDUP_SQL = f"""
WITH pars AS (
  SELECT doc_id, i - 1 AS par_idx, trim(l[i]) AS par
  FROM (SELECT doc_id, regexp_split_to_array(text, ' table ') AS l FROM documents),
       unnest(generate_series(1, len(l))) AS t(i)
  WHERE trim(l[i]) <> ''
),
h AS (SELECT *, ('0x' || substr(md5(par), 1, 15))::BIGINT AS ph FROM pars),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY ph ORDER BY doc_id, par_idx) AS rn FROM h
),
kept AS (SELECT * FROM ranked WHERE rn = 1),
alln AS (SELECT doc_id, count(*) AS n_pars FROM pars GROUP BY 1),
keptagg AS (
  SELECT doc_id, string_agg(par, ' table ' ORDER BY par_idx) AS text_dedup,
         count(*) AS n_pars_kept
  FROM kept GROUP BY 1
)
SELECT d.doc_id,
       coalesce(k.text_dedup, '') AS text_dedup,
       coalesce(a.n_pars, 0) AS n_pars,
       coalesce(k.n_pars_kept, 0) AS n_pars_kept
FROM documents d LEFT JOIN alln a USING (doc_id) LEFT JOIN keptagg k USING (doc_id)"""

# Gopher quality rules (Rae et al. 2021 App. A) over the deterministic
# per-doc perturbation; words are WHITESPACE-split (the paper's unit)
_GOPHER_SQL = r"""
WITH pdocs AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 5 = 0 THEN e'\n- bullet item one\n- bullet item two'
                      WHEN doc_id % 5 = 1 THEN ' the dog and the cat trail...'
                      WHEN doc_id % 5 = 2 THEN ' ### ## #'
                      ELSE ' the and of that' END AS text
  FROM documents
),
w AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS words,
         list_filter(regexp_split_to_array(text, '\n'), x -> trim(x) <> '') AS lines
  FROM pdocs
),
m AS (
  SELECT doc_id,
         len(words) AS n_words,
         list_sum(list_transform(words, x -> len(x)))::DOUBLE / len(words) AS mean_wl,
         ((len(text) - len(replace(text, '#', '')))::DOUBLE
          + (len(text) - len(replace(text, '...', '')))::DOUBLE / 3) / len(words) AS sym_ratio,
         greatest(len(lines), 1)::DOUBLE AS nl,
         len(list_filter(lines, x -> starts_with(trim(x), '- ')
             OR starts_with(trim(x), '* ') OR starts_with(trim(x), '•')))::DOUBLE AS n_bullet,
         len(list_filter(lines, x -> ends_with(rtrim(x), '...')
             OR ends_with(rtrim(x), '…')))::DOUBLE AS n_ell,
         len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE AS n_alpha,
         len(list_filter(['the','be','to','of','and','that','have','with'],
             s -> list_contains(list_transform(words, x -> lower(x)), s))) AS n_stop
  FROM w
)
SELECT doc_id, n_words::BIGINT AS n_words,
       round(mean_wl, 6) AS mean_word_len,
       round(sym_ratio, 6) AS symbol_word_ratio,
       round(n_bullet / nl, 6) AS frac_bullet_lines,
       round(n_ell / nl, 6) AS frac_ellipsis_lines,
       round(n_alpha / n_words, 6) AS frac_alpha_words,
       n_stop::BIGINT AS n_stop_hits,
       (CASE WHEN n_words BETWEEN 50 AND 100000 AND mean_wl >= 3.0 AND mean_wl <= 10.0
             AND sym_ratio <= 0.1 AND n_bullet / nl <= 0.9 AND n_ell / nl <= 0.3
             AND n_alpha / n_words >= 0.8 AND n_stop >= 2
             THEN 1 ELSE 0 END)::BIGINT AS keep
FROM m"""

# Batch ANN: 3 query vectors in one job; per-query brute-force cosine
# ranked, rank over the UNROUNDED score
_ANN_BATCH_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 3),
sc AS (
  SELECT q.query_id, e.vec_id,
         sum(e.embedding[i]::DOUBLE * q.qv[i]::DOUBLE)
           / (sqrt(sum(e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))
              * sqrt(sum(q.qv[i]::DOUBLE * q.qv[i]::DOUBLE))) AS score
  FROM embeddings e, q, unnest(generate_series(1, len(e.embedding))) t(i)
  GROUP BY 1, 2
),
r AS (
  SELECT query_id, vec_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS rank
  FROM sc
)
SELECT query_id, vec_id, round(score, 6) AS score, rank FROM r WHERE rank <= 5"""

_SPLIT_SQL = f"""
SELECT doc_id,
       CASE WHEN {_hash60_sql("'42::' || doc_id::VARCHAR")} % 10000 < 9000 THEN 'train'
            WHEN {_hash60_sql("'42::' || doc_id::VARCHAR")} % 10000 < 9500 THEN 'val'
            ELSE 'test' END AS split
FROM documents"""

_STRAT_SAMPLE_SQL = f"""
SELECT doc_id, lang FROM documents
WHERE {_hash60_sql("'42:' || lang || ':' || doc_id::VARCHAR")} % 1000000 < 200000"""


def _pii_sql() -> str:
    from fugu_spark.analytics.curation import PII_PATTERNS

    e, i, p = PII_PATTERNS["email"], PII_PATTERNS["ipv4"], PII_PATTERNS["phone"]
    return f"""
WITH pdocs AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 3 = 0 THEN ' mail doc' || doc_id::VARCHAR || '@example.com'
                      WHEN doc_id % 3 = 1 THEN ' call 555-123-4567'
                      ELSE '' END AS text
  FROM documents
),
counts AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{e}'))::BIGINT AS n_email,
         len(regexp_extract_all(text, '{i}'))::BIGINT AS n_ipv4,
         len(regexp_extract_all(text, '{p}'))::BIGINT AS n_phone,
         len(regexp_replace(regexp_replace(regexp_replace(text,
             '{e}', '[EMAIL]', 'g'), '{i}', '[IPV4]', 'g'), '{p}', '[PHONE]', 'g'))::BIGINT AS red_len
  FROM pdocs
)
SELECT doc_id, n_email, n_ipv4, n_phone,
       (CASE WHEN n_email > 0 OR n_ipv4 > 0 OR n_phone > 0 THEN 1 ELSE 0 END)::BIGINT AS has_pii,
       red_len
FROM counts"""


_REPETITION_SQL = """
WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS l
  FROM documents
),
tok AS (SELECT doc_id, unnest(l) AS t FROM toks),
tcnt AS (SELECT doc_id, t, count(*) AS c FROM tok GROUP BY 1, 2),
tagg AS (SELECT doc_id, sum(c)::BIGINT AS n, count(*)::BIGINT AS nd, max(c)::BIGINT AS topc
         FROM tcnt GROUP BY 1),
big AS (SELECT doc_id, l[i] || ' ' || l[i+1] AS g
        FROM toks, unnest(generate_series(1, len(l) - 1)) AS u(i) WHERE len(l) >= 2),
bcnt AS (SELECT doc_id, g, count(*) AS c FROM big GROUP BY 1, 2),
bagg AS (SELECT doc_id, sum(c)::BIGINT AS ng, max(c)::BIGINT AS topg FROM bcnt GROUP BY 1)
SELECT t.doc_id,
       coalesce(a.n, 0) AS n_tokens,
       round(CASE WHEN coalesce(a.n, 0) > 0 THEN (a.n - a.nd)::DOUBLE / a.n ELSE 0.0 END, 6) AS dup_token_frac,
       round(CASE WHEN coalesce(a.n, 0) > 0 THEN a.topc::DOUBLE / a.n ELSE 0.0 END, 6) AS top_token_frac,
       round(CASE WHEN coalesce(b.ng, 0) > 0 THEN b.topg::DOUBLE / b.ng ELSE 0.0 END, 6) AS top_bigram_frac
FROM toks t LEFT JOIN tagg a USING (doc_id) LEFT JOIN bagg b USING (doc_id)"""

_CONTAMINATION_SQL = """
WITH toks AS (
  SELECT doc_id, source,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS l
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, source, l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS g
  FROM toks, unnest(generate_series(1, len(l) - 2)) AS u(i) WHERE len(l) >= 3
),
bench AS (SELECT DISTINCT g FROM grams WHERE source = 'src0'),
docg AS (SELECT doc_id, g FROM grams WHERE source <> 'src0'),
agg AS (
  SELECT doc_id, count(*)::BIGINT AS n_grams,
         sum(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_contaminated
  FROM docg LEFT JOIN bench b USING (g) GROUP BY 1
)
SELECT d.doc_id,
       coalesce(a.n_grams, 0) AS n_grams,
       coalesce(a.n_contaminated, 0) AS n_contaminated,
       round(CASE WHEN coalesce(a.n_grams, 0) > 0
                  THEN a.n_contaminated::DOUBLE / a.n_grams ELSE 0.0 END, 6) AS contamination_frac
FROM documents d LEFT JOIN agg a USING (doc_id)
WHERE d.source <> 'src0'"""

_C4_SQL = """
WITH pdocs AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 4 = 0 THEN '.'
                      WHEN doc_id % 4 = 1 THEN ' {x}'
                      WHEN doc_id % 4 = 2 THEN ' lorem ipsum.'
                      ELSE '' END AS text
  FROM documents
),
t AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS l
  FROM pdocs
)
SELECT doc_id,
       (CASE WHEN len(l) < 5 THEN 1 ELSE 0 END)::BIGINT AS too_few_words,
       (CASE WHEN len(list_filter(l, x -> len(x) > 25)) > 0 THEN 1 ELSE 0 END)::BIGINT AS has_long_word,
       (CASE WHEN contains(lower(text), 'lorem ipsum') THEN 1 ELSE 0 END)::BIGINT AS has_lorem,
       (CASE WHEN contains(text, '{') THEN 1 ELSE 0 END)::BIGINT AS has_brace,
       (CASE WHEN regexp_matches(rtrim(text), '[.!?"'']$') THEN 1 ELSE 0 END)::BIGINT AS ends_with_punct,
       (CASE WHEN len(l) >= 5 AND len(list_filter(l, x -> len(x) > 25)) = 0
                  AND NOT contains(lower(text), 'lorem ipsum') AND NOT contains(text, '{')
                  AND regexp_matches(rtrim(text), '[.!?"'']$')
             THEN 1 ELSE 0 END)::BIGINT AS keep
FROM t"""

# B7/D2: BM25 over the EFFECTIVE live corpus after upsert+delete+compact
# (base < 480, docs >= 470 replaced/inserted with modified text, 0-4
# deleted) — compaction must make the index equal a fresh build of this.
def _compact_sql() -> str:
    corpus = """
  SELECT doc_id, text FROM documents WHERE doc_id < 470 AND doc_id NOT IN (0, 1, 2, 3, 4)
  UNION ALL
  SELECT doc_id, text || ' compacted extra tokens' FROM documents WHERE doc_id >= 470"""
    return f"""WITH corpus AS ({corpus}),
tok AS (
  SELECT doc_id, l[i] AS term
  FROM (SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS l
        FROM corpus),
       unnest(generate_series(1, len(l))) AS t(i)
),
post AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*) AS doc_len FROM tok GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM corpus) AS n,
         (SELECT sum(doc_len) FROM dl)::DOUBLE / (SELECT count(*) FROM corpus) AS avgdl
),
tstat AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
scored AS (
  SELECT p.doc_id, p.term, {_SCORE} AS sc
  FROM post p JOIN tstat t USING (term) JOIN dl d USING (doc_id), stats s
)
SELECT doc_id, round(sum(sc), 6) AS score FROM scored WHERE term IN ('merge', 'join')
GROUP BY doc_id ORDER BY sum(sc) DESC, doc_id ASC LIMIT 10"""


def _dbq_sql() -> str:
    """delete_by_query('sort') + compact ≡ fresh build over the docs
    whose token set lacks 'sort' — the oracle recomputes BM25 stats
    over exactly that surviving corpus (same shape as _compact_sql)."""
    corpus = """
  SELECT doc_id, text FROM documents
  WHERE doc_id NOT IN (
    SELECT DISTINCT doc_id
    FROM (SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS l
          FROM documents),
         unnest(generate_series(1, len(l))) AS t(i)
    WHERE l[i] = 'sort')"""
    return f"""WITH corpus AS ({corpus}),
tok AS (
  SELECT doc_id, l[i] AS term
  FROM (SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS l
        FROM corpus),
       unnest(generate_series(1, len(l))) AS t(i)
),
post AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*) AS doc_len FROM tok GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM corpus) AS n,
         (SELECT sum(doc_len) FROM dl)::DOUBLE / (SELECT count(*) FROM corpus) AS avgdl
),
tstat AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
scored AS (
  SELECT p.doc_id, p.term, {_SCORE} AS sc
  FROM post p JOIN tstat t USING (term) JOIN dl d USING (doc_id), stats s
)
SELECT doc_id, round(sum(sc), 6) AS score FROM scored WHERE term IN ('merge', 'join')
GROUP BY doc_id ORDER BY sum(sc) DESC, doc_id ASC LIMIT 10"""


_METADATA_FACETS_SQL = """
SELECT doc_id, '/metadata/team/t' || (doc_id % 3)::VARCHAR AS facet FROM documents
UNION ALL SELECT doc_id, '/metadata/tags/alpha' FROM documents
UNION ALL SELECT doc_id, '/metadata/tags/beta' FROM documents"""

_NS_FILTER_PATHS_SQL = """
WITH scoped AS (SELECT * FROM documents WHERE source = 'src1')
SELECT DISTINCT '/namespace' AS parent, source AS leaf FROM scoped
UNION SELECT DISTINCT '/lang', lang FROM scoped"""

# R6 highlights: window=60 chars around the first whole-token match of
# 'merge', every in-window match wrapped in '**', ellipses at cut edges.
# strpos/replace are token-exact here because 'merge' is never a
# substring of another vocabulary token in this corpus.
def _highlights_sql() -> str:
    return f"""WITH {_TOK}, {_SCORED},
top10 AS (
  SELECT doc_id, sum(sc) AS s FROM scored WHERE term = 'merge'
  GROUP BY doc_id ORDER BY s DESC, doc_id ASC LIMIT 10
),
snip AS (
  SELECT t.doc_id, t.s, d.text,
         strpos(d.text, 'merge') - 1 AS p,  -- 0-based first match
         len(d.text) AS L
  FROM top10 t JOIN documents d USING (doc_id)
)
SELECT doc_id, round(s, 6) AS score,
       (CASE WHEN greatest(0, p - 60) > 0 THEN '…' ELSE '' END)
       || replace(substr(text, greatest(0, p - 60) + 1,
                         least(L, p + 5 + 60) - greatest(0, p - 60)),
                  'merge', '**merge**')
       || (CASE WHEN least(L, p + 5 + 60) < L THEN '…' ELSE '' END) AS snippet
FROM snip"""


_MIX_SQL = f"""
WITH w(s, wt) AS (VALUES ('src1', 0.5), ('src2', 0.25), ('src3', 0.25)),
n AS (SELECT source AS s, count(*)::BIGINT AS cnt FROM documents GROUP BY 1),
cap AS (SELECT min(cnt / wt) AS c FROM n JOIN w USING (s)),
thr AS (SELECT s, round(wt * c / cnt * 1000000)::BIGINT AS t FROM n JOIN w USING (s), cap)
SELECT d.doc_id, d.source FROM documents d JOIN thr ON d.source = thr.s
WHERE {_hash60_sql("'42:' || d.source || ':' || d.doc_id::VARCHAR")} % 1000000 < thr.t"""

_PACK_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> ''))::BIGINT AS n_tokens
  FROM documents
),
s AS (
  SELECT doc_id, n_tokens,
         {_hash60_sql("'42:pack:' || doc_id::VARCHAR")} % 8 AS stream
  FROM toks
)
SELECT doc_id, n_tokens, stream,
       floor((sum(n_tokens) OVER (PARTITION BY stream ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) - n_tokens) / 200)::BIGINT AS pack_id
FROM s"""

_FP_EXPR = (
    "md5(array_to_string(list_filter(regexp_split_to_array(lower({t}), '[^a-z0-9]+'),"
    " x -> x <> ''), ' '))"
)

_DEDUP_AGAINST_SQL = f"""
WITH newd AS (
  SELECT doc_id + 10000 AS doc_id, upper(text) AS text FROM documents WHERE doc_id < 100
  UNION ALL
  SELECT doc_id + 20000, text || ' genuinely novel suffix' FROM documents
  WHERE doc_id >= 100 AND doc_id < 150
),
corpus_fp AS (SELECT DISTINCT {_FP_EXPR.format(t="text")} AS f FROM documents)
SELECT n.doc_id FROM newd n
WHERE {_FP_EXPR.format(t="n.text")} NOT IN (SELECT f FROM corpus_fp)"""


_WINNOW_SQL = """WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS l
  FROM documents
),
grams AS (
  SELECT doc_id, i,
         ('0x' || substr(md5(l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3] || ' ' || l[i+4]), 1, 15))::BIGINT AS h
  FROM toks, unnest(generate_series(1, len(l) - 4)) AS t(i)
),
counts AS (SELECT doc_id, count(*) AS ng FROM grams GROUP BY 1),
wins AS (
  SELECT g.doc_id, i, c.ng,
         min(h) OVER (PARTITION BY g.doc_id ORDER BY i ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS w
  FROM grams g JOIN counts c USING (doc_id)
)
SELECT DISTINCT doc_id, w AS fingerprint FROM wins WHERE ng <= 4 AND i = ng
UNION
SELECT DISTINCT doc_id, w AS fingerprint FROM wins WHERE ng > 4 AND i >= 4"""

_NGRAM_CTES = """toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS l
  FROM documents WHERE doc_id < 60
),
grams AS (
  SELECT DISTINCT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS gram
  FROM toks, unnest(generate_series(1, len(l) - 2)) AS t(i)
),
sizes AS (SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jpairs AS (
  SELECT id_a, id_b, i::DOUBLE / (sa.n_grams + sb.n_grams - i) AS jaccard
  FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
)"""

_NGRAM_SQL = f"""WITH {_NGRAM_CTES}
SELECT id_a, id_b, round(jaccard, 6) AS jaccard FROM jpairs WHERE jaccard >= 0.01"""

# Connected components over the same pairs: transitive closure by
# recursive CTE (tiny at oracle scale), keep_id = min reachable id.
_DUPGROUPS_SQL = f"""WITH RECURSIVE {_NGRAM_CTES},
edges AS (
  SELECT id_a AS a, id_b AS b FROM jpairs WHERE jaccard >= 0.01
  UNION SELECT id_b, id_a FROM jpairs WHERE jaccard >= 0.01
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
)
SELECT a AS doc_id, least(a, min(b)) AS keep_id FROM reach GROUP BY a"""


# MinHash oracle: recompute the EXACT signatures (md5-60bit shingle hash
# mod p31, (a·x+b) mod p31 per slot — same spec as dedup.minhash_signatures),
# derive LSH-band candidates (a pair is a candidate iff some band of
# consecutive slots matches entirely — what the Spark side's xxhash64
# band-bucket join computes, minus negligible hash collisions), then
# est_jaccard = matching-slot fraction over candidates.
def _minhash_oracle_sql(
    num_hashes: int = 64, k: int = 3, bands: int = 16, threshold: float = 0.5
) -> str:
    from fugu_spark.analytics.dedup import MINHASH_P, minhash_params

    a, b = minhash_params(num_hashes)
    params = ", ".join(f"({i},{ai},{bi})" for i, (ai, bi) in enumerate(zip(a, b)))
    rpb = num_hashes // bands
    return f"""WITH params(i, a, b) AS (VALUES {params}),
toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS l
  FROM documents
),
grams AS (
  SELECT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS gram
  FROM toks, unnest(generate_series(1, len(l) - {k - 1})) AS t(i)
  WHERE len(l) >= {k}
  UNION ALL
  SELECT doc_id, array_to_string(l, ' ') FROM toks WHERE len(l) BETWEEN 1 AND {k - 1}
),
gh AS (SELECT doc_id, ('0x' || substr(md5(gram), 1, 15))::BIGINT % {MINHASH_P} AS x FROM grams),
sig AS (
  SELECT d.doc_id, p.i, coalesce(min((p.a * g.x + p.b) % {MINHASH_P}), 0) AS slot
  FROM documents d CROSS JOIN params p LEFT JOIN gh g ON g.doc_id = d.doc_id
  GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT id_a, id_b FROM (
    SELECT sa.doc_id AS id_a, sb.doc_id AS id_b
    FROM sig sa JOIN sig sb ON sa.i = sb.i AND sa.slot = sb.slot AND sa.doc_id < sb.doc_id
    GROUP BY sa.doc_id, sb.doc_id, sa.i // {rpb}
    HAVING count(*) = {rpb}
  )
),
est AS (
  SELECT c.id_a, c.id_b,
         sum(CASE WHEN sa.slot = sb.slot THEN 1 ELSE 0 END)::DOUBLE / {num_hashes} AS est_jaccard
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.id_a
  JOIN sig sb ON sb.doc_id = c.id_b AND sb.i = sa.i
  GROUP BY 1, 2
)
SELECT id_a, id_b, round(est_jaccard, 6) AS est_jaccard FROM est WHERE est_jaccard >= {threshold}"""


# SimHash oracle: identical 60-bit weighted-bit-majority signature from
# the same md5-60bit token hash (dedup.simhash_signatures spec).
_SIMHASH_SQL = f"""WITH {_TOK},
tokc AS (SELECT doc_id, term, count(*) AS w FROM tok GROUP BY 1, 2),
th AS (SELECT doc_id, ('0x' || substr(md5(term), 1, 15))::BIGINT AS h, w FROM tokc),
acc AS (
  SELECT doc_id, j, sum(CASE WHEN ((h >> j) & 1) = 1 THEN w ELSE -w END) AS a
  FROM th, unnest(generate_series(0, 59)) AS t(j)
  GROUP BY 1, 2
),
sh AS (
  SELECT doc_id, sum(CASE WHEN a > 0 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT AS simhash
  FROM acc GROUP BY 1
)
SELECT d.doc_id, coalesce(s.simhash, 0) AS simhash FROM documents d LEFT JOIN sh s USING (doc_id)"""


# Exact ANN top-10 (shared by the full-probe IVF and full-probe LSH
# entries — both degenerate to the brute-force scan).
_EXACT_ANN_TOP10_SQL = """
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    sc AS (
      SELECT e.vec_id,
             sum(e.embedding[i]::DOUBLE * q.qe[i]::DOUBLE)
               / (sqrt(sum(e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))
                  * sqrt(sum(q.qe[i]::DOUBLE * q.qe[i]::DOUBLE))) AS cosine
      FROM embeddings e, q, unnest(generate_series(1, len(e.embedding))) t(i)
      GROUP BY e.vec_id
    )
    SELECT vec_id, round(cosine, 6) AS score FROM sc
    ORDER BY cosine DESC, vec_id ASC LIMIT 10"""


# Filtered kNN: identical brute-force cosine, restricted to label = 1
# BEFORE the top-k (pre-filter semantics — the top-10 holds 10 true
# neighbors from the allowed set, never an under-filled post-filter).
_FILTERED_ANN_TOP10_SQL = """
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    sc AS (
      SELECT e.vec_id,
             sum(e.embedding[i]::DOUBLE * q.qe[i]::DOUBLE)
               / (sqrt(sum(e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))
                  * sqrt(sum(q.qe[i]::DOUBLE * q.qe[i]::DOUBLE))) AS cosine
      FROM embeddings e, q, unnest(generate_series(1, len(e.embedding))) t(i)
      WHERE e.label = 1
      GROUP BY e.vec_id
    )
    SELECT vec_id, round(cosine, 6) AS score FROM sc
    ORDER BY cosine DESC, vec_id ASC LIMIT 10"""


# Approximate-LSH oracle: the hyperplanes are deterministic functions of
# (n_planes, dim, seed), so they are inlined as constants; signatures,
# the query signature, the Hamming-<=max_probe prune, and the exact
# cosine re-rank are all recomputed independently in SQL.
def _lsh_probe_oracle_sql(
    n_planes: int = 12, dim: int = 64, seed: int = 42, max_probe: int = 2, k: int = 10
) -> str:
    from fugu_spark.analytics.similarity import _planes

    pl = _planes(dim, n_planes, seed)
    vals = ", ".join(
        f"({i},{j},{float(pl[i, j])!r})" for i in range(n_planes) for j in range(dim)
    )
    return f"""WITH planes(i, j, v) AS (VALUES {vals}),
dots AS (
  SELECT e.vec_id, p.i, sum(e.embedding[p.j + 1]::DOUBLE * p.v) AS dp
  FROM embeddings e, planes p GROUP BY 1, 2
),
sigs AS (
  SELECT vec_id, sum(CASE WHEN dp > 0 THEN (1::BIGINT << i) ELSE 0 END) AS sig
  FROM dots GROUP BY 1
),
q AS (SELECT sig AS qsig FROM sigs WHERE vec_id = 0),
qe AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
cand AS (SELECT s.vec_id FROM sigs s, q WHERE bit_count(xor(s.sig, q.qsig)) <= {max_probe}),
sc AS (
  SELECT e.vec_id,
         sum(e.embedding[i]::DOUBLE * qe.qv[i]::DOUBLE)
           / (sqrt(sum(e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))
              * sqrt(sum(qe.qv[i]::DOUBLE * qe.qv[i]::DOUBLE))) AS score
  FROM embeddings e JOIN cand c USING (vec_id), qe,
       unnest(generate_series(1, len(e.embedding))) t(i)
  GROUP BY e.vec_id
)
SELECT vec_id, round(score, 6) AS score FROM sc ORDER BY score DESC, vec_id ASC LIMIT {k}"""


# Percolation oracle: boolean match sets for _PERC_QUERIES, mirrored in
# plain SQL — q1 'merge AND join', q2 '"merge join"', q3 'window NOT
# merge', q4 'table OR sort', q5 '"merge join"~2' (ordered window ≤ 3).
_PERCOLATE_SQL = f"""WITH {_TOK},
t AS (SELECT DISTINCT doc_id, term FROM tok),
adj AS (SELECT DISTINCT a.doc_id FROM tok a JOIN tok b
        ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        WHERE a.term = 'merge' AND b.term = 'join'),
slop AS (SELECT DISTINCT a.doc_id FROM tok a JOIN tok b
         ON a.doc_id = b.doc_id AND b.pos > a.pos AND b.pos - a.pos - 1 <= 2
         WHERE a.term = 'merge' AND b.term = 'join')
SELECT doc_id, query_id FROM (
  SELECT doc_id, CAST(1 AS BIGINT) AS query_id FROM (
    SELECT doc_id FROM t WHERE term = 'merge'
    INTERSECT SELECT doc_id FROM t WHERE term = 'join')
  UNION ALL SELECT doc_id, 2 FROM adj
  UNION ALL SELECT doc_id, 3 FROM t
    WHERE term = 'window'
      AND doc_id NOT IN (SELECT doc_id FROM t WHERE term = 'merge')
  UNION ALL SELECT doc_id, 4 FROM (
    SELECT doc_id FROM t WHERE term = 'table'
    UNION SELECT doc_id FROM t WHERE term = 'sort')
  UNION ALL SELECT doc_id, 5 FROM slop
  UNION ALL SELECT doc_id, 6 FROM t
    WHERE term = 'window'
      AND doc_id IN (SELECT doc_id FROM t WHERE term IN ('table', 'sort'))
) ORDER BY doc_id, query_id"""


def oracle_sql() -> dict[str, str]:
    # ``code`` analyzer oracle: the Spark side indexes a CAMELIZED
    # corpus (initcap + concat of the len≥2 words) with the boundary-
    # splitting analyzer; the oracle tokenizes the ORIGINAL text with
    # the plain pipeline + len≥2 filter — equality proves the analyzer
    # reconstructs exactly the original word stream. The corpus is
    # digit-free, so len(x) >= 2 subsumes the non-empty filter.
    tok_code = _TOK.replace("x -> x <> ''", "x -> len(x) >= 2")
    code_tokens_sql = f"""WITH {tok_code}
SELECT term, doc_id, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2"""
    # 'mergeJoin' is ONE query word that the code analyzer splits into
    # two tokens — Tantivy's QueryParser turns a multi-token word into
    # a PhraseQuery (positions permitting), and the engine pins the
    # same semantics (queryparse Leaf.is_phrase), so the oracle is the
    # adjacency-phrase score, not a two-term OR.
    bm25_code_sql = f"""WITH {tok_code},
phr AS (
  SELECT a.doc_id, count(*) AS tfp
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.term = 'merge' AND b.term = 'join'
  GROUP BY 1
),
idfs AS (
  SELECT sum(ln(1 + (s.n - t.df + 0.5) / (t.df + 0.5))) AS idf_sum
  FROM tstat t, stats s WHERE t.term IN ('merge', 'join')
)
SELECT p.doc_id,
       round(i.idf_sum * p.tfp * 2.2 / (p.tfp + 1.2 * (0.25 + 0.75 * d.doc_len / s.avgdl)), 6) AS score
FROM phr p JOIN dl d USING (doc_id), stats s, idfs i
ORDER BY 2 DESC, doc_id ASC LIMIT 10"""
    # StarCoder-style code-quality stats over the derived multi-line
    # content (replace 'line' -> newline; no self-overlap so both
    # replace()s agree). Thresholds: max_line<=1000, avg<=100,
    # alnum_frac>0.25 (analytics/code_quality.py).
    code_quality_sql = """WITH src AS (
  SELECT doc_id, replace(text, 'line', chr(10)) AS c FROM documents
),
l AS (
  SELECT doc_id, c, string_split(c, chr(10)) AS ls,
         list_filter(regexp_split_to_array(c, '\\s+'), x -> x <> '') AS toks
  FROM src
),
m AS (
  SELECT doc_id,
         len(ls)::BIGINT AS n_lines,
         list_max(list_transform(ls, x -> len(x)))::BIGINT AS max_line_len,
         round((len(c) - (len(ls) - 1))::DOUBLE / len(ls), 6) AS avg_line_len,
         round(CASE WHEN len(c) > 0
               THEN len(regexp_replace(c, '[^0-9A-Za-z]', '', 'g'))::DOUBLE / len(c)
               ELSE 0.0 END, 6) AS alnum_frac,
         round(CASE WHEN len(toks) > 0
               THEN len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE / len(toks)
               ELSE 0.0 END, 6) AS alpha_token_frac
  FROM l
)
SELECT doc_id, n_lines, max_line_len, avg_line_len, alnum_frac, alpha_token_frac,
       (max_line_len <= 1000 AND avg_line_len <= 100 AND alnum_frac > 0.25) AS keep_code
FROM m"""
    # signed phrase clauses: '-"merge join" scan' scores 'scan' over
    # docs WITHOUT the adjacent phrase; '+"merge join" scan' requires
    # the phrase (phrase score) and adds the optional scan score
    not_phrase_sql = f"""WITH {_TOK}, {_SCORED},
phr AS (
  SELECT DISTINCT a.doc_id FROM tok a
  JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.term = 'merge' AND b.term = 'join'
)
SELECT doc_id, round(sum(sc), 6) AS score
FROM scored
WHERE term = 'scan' AND doc_id NOT IN (SELECT doc_id FROM phr)
GROUP BY doc_id
ORDER BY sum(sc) DESC, doc_id ASC LIMIT 10"""
    must_phrase_sql = f"""WITH {_TOK}, {_SCORED},
phr AS (
  SELECT a.doc_id, count(*) AS tfp FROM tok a
  JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.term = 'merge' AND b.term = 'join'
  GROUP BY 1
),
idfs AS (
  SELECT sum(ln(1 + (s.n - t.df + 0.5) / (t.df + 0.5))) AS idf_sum
  FROM tstat t, stats s WHERE t.term IN ('merge', 'join')
),
phr_sc AS (
  SELECT p.doc_id,
         i.idf_sum * p.tfp * 2.2 / (p.tfp + 1.2 * (0.25 + 0.75 * d.doc_len / s.avgdl)) AS sc
  FROM phr p JOIN dl d USING (doc_id), stats s, idfs i
),
scan_sc AS (SELECT doc_id, sum(sc) AS sc FROM scored WHERE term = 'scan' GROUP BY 1)
SELECT p.doc_id, round(p.sc + coalesce(s2.sc, 0), 6) AS score
FROM phr_sc p LEFT JOIN scan_sc s2 USING (doc_id)
ORDER BY (p.sc + coalesce(s2.sc, 0)) DESC, p.doc_id ASC LIMIT 10"""
    # result-shaping collectors (fugu_spark/resultops.py): exact hit
    # count, per-group (lang) top-3 collapse, MoreLikeThis (seed 42's
    # top-5 tf×idf terms OR-scored, seed excluded)
    match_count_sql = f"""WITH {_TOK}
SELECT count(DISTINCT doc_id) AS n_matches FROM tok
WHERE term IN ('merge', 'join', 'scan')"""
    grouped_lang_sql = f"""WITH {_TOK}, {_SCORED},
sc AS (
  SELECT doc_id, sum(sc) AS score FROM scored
  WHERE term IN ('merge', 'join') GROUP BY 1
),
g AS (
  SELECT d.lang AS "group", s.doc_id, s.score,
         row_number() OVER (PARTITION BY d.lang ORDER BY s.score DESC, s.doc_id ASC)
           AS rank_in_group
  FROM sc s JOIN documents d USING (doc_id)
)
SELECT "group", doc_id, round(score, 6) AS score, rank_in_group
FROM g WHERE rank_in_group <= 3 ORDER BY "group", rank_in_group"""
    mlt_sql = f"""WITH {_TOK}, {_SCORED},
seed AS (SELECT term, tf FROM post WHERE doc_id = 42),
sel AS (
  SELECT s.term FROM seed s JOIN tstat t USING (term), stats st
  ORDER BY s.tf * ln(1 + (st.n - t.df + 0.5) / (t.df + 0.5)) DESC, s.term ASC
  LIMIT 5
),
sc AS (
  SELECT doc_id, sum(sc) AS score FROM scored
  WHERE term IN (SELECT term FROM sel) AND doc_id <> 42 GROUP BY 1
)
SELECT doc_id, round(score, 6) AS score FROM sc
ORDER BY score DESC, doc_id ASC LIMIT 10"""
    # hybrid retrieval (fugu_spark/hybrid.py): BM25 top-100 + cosine
    # top-100 candidate lists; ranks are row_number (score DESC, doc_id
    # ASC) — double-identical scores on both sides make ranks identical
    _HYBRID_CANDS = f"""WITH {_TOK}, {_SCORED},
bm AS (
  SELECT doc_id, sum(sc) AS s FROM scored
  WHERE term IN ('merge', 'join') GROUP BY 1
),
bmr AS (
  SELECT doc_id, s, row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank
  FROM bm QUALIFY rank <= 100
),
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
cos AS (
  SELECT e.vec_id AS doc_id,
         sum(e.embedding[i]::DOUBLE * q.qe[i]::DOUBLE)
           / (sqrt(sum(e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))
              * sqrt(sum(q.qe[i]::DOUBLE * q.qe[i]::DOUBLE))) AS s
  FROM embeddings e, q, unnest(generate_series(1, len(e.embedding))) t(i)
  GROUP BY e.vec_id
),
cosr AS (
  SELECT doc_id, s, row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank
  FROM cos QUALIFY rank <= 100
)"""
    hybrid_rrf_sql = f"""{_HYBRID_CANDS},
u AS (SELECT doc_id, rank FROM bmr UNION ALL SELECT doc_id, rank FROM cosr),
f AS (SELECT doc_id, sum(1.0 / (60.0 + rank)) AS score FROM u GROUP BY 1)
SELECT doc_id, round(score, 6) AS score FROM f
ORDER BY score DESC, doc_id ASC LIMIT 10"""
    hybrid_weighted_sql = f"""{_HYBRID_CANDS},
bmn AS (
  SELECT doc_id, CASE WHEN max(s) OVER () > min(s) OVER ()
    THEN 0.5 * (s - min(s) OVER ()) / (max(s) OVER () - min(s) OVER ())
    ELSE 0.0 END AS part
  FROM bmr
),
cosn AS (
  SELECT doc_id, CASE WHEN max(s) OVER () > min(s) OVER ()
    THEN 0.5 * (s - min(s) OVER ()) / (max(s) OVER () - min(s) OVER ())
    ELSE 0.0 END AS part
  FROM cosr
),
u AS (SELECT * FROM bmn UNION ALL SELECT * FROM cosn),
f AS (SELECT doc_id, sum(part) AS score FROM u GROUP BY 1)
SELECT doc_id, round(score, 6) AS score FROM f
ORDER BY score DESC, doc_id ASC LIMIT 10"""
    batch_mlt_sql = f"""WITH {_TOK}, {_SCORED},
sel AS (
  SELECT doc_id AS seed, term FROM (
    SELECT p.doc_id, p.term,
           row_number() OVER (
             PARTITION BY p.doc_id
             ORDER BY p.tf * ln(1 + (s.n - t.df + 0.5) / (t.df + 0.5)) DESC,
                      p.term ASC
           ) AS rn
    FROM post p JOIN tstat t USING (term), stats s
  ) WHERE rn <= 5
),
pairs AS (
  SELECT sel.seed, sc.doc_id AS cand, sum(sc.sc) AS score
  FROM sel JOIN scored sc USING (term)
  WHERE sc.doc_id <> sel.seed GROUP BY 1, 2
),
topk AS (
  SELECT seed, cand, score,
         row_number() OVER (PARTITION BY seed ORDER BY score DESC, cand ASC) AS rank
  FROM pairs
)
SELECT seed, cand, round(score, 6) AS score, rank
FROM topk WHERE rank <= 3 ORDER BY seed, rank"""
    hybrid_batch_sql = f"""WITH {_TOK}, {_SCORED},
qt(query_id, term) AS (VALUES
  (0, 'merge'), (0, 'join'), (1, 'scan'), (1, 'sort'),
  (2, 'filter'), (2, 'index')),
bm AS (
  SELECT qt.query_id, sc.doc_id, sum(sc.sc) AS s
  FROM qt JOIN scored sc USING (term) GROUP BY 1, 2
),
bmr AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY s DESC, doc_id ASC) AS rank
  FROM bm QUALIFY rank <= 50
),
qv AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id IN (0, 1, 2)),
cos AS (
  SELECT qv.query_id, e.vec_id AS doc_id,
         sum(e.embedding[i]::DOUBLE * qv.qe[i]::DOUBLE)
           / (sqrt(sum(e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))
              * sqrt(sum(qv.qe[i]::DOUBLE * qv.qe[i]::DOUBLE))) AS s
  FROM embeddings e, qv, unnest(generate_series(1, len(e.embedding))) t(i)
  GROUP BY 1, 2
),
cosr AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY s DESC, doc_id ASC) AS rank
  FROM cos QUALIFY rank <= 50
),
u AS (SELECT * FROM bmr UNION ALL SELECT * FROM cosr),
f AS (SELECT query_id, doc_id, sum(1.0 / (60.0 + rank)) AS score FROM u GROUP BY 1, 2),
topk AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank
  FROM f
)
SELECT query_id, doc_id, round(score, 6) AS score, rank
FROM topk WHERE rank <= 10 ORDER BY query_id, rank"""
    _SYM_ORACLE = """
WITH words AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                     w -> length(w) >= 6) AS ws
  FROM documents
),
syms AS (
  SELECT doc_id, generate_subscripts(ws, 1)::BIGINT AS line_no,
         'def' AS kind, unnest(ws) AS name
  FROM words
)
"""
    trigram_substring_sql = """
        SELECT doc_id,
               CAST((length(text) - length(replace(text, 'merge join', '')))
                    / length('merge join') AS BIGINT) AS n_occ
        FROM documents WHERE instr(text, 'merge join') > 0 ORDER BY doc_id"""
    return {
        # --- trigram code search (fugu_spark/trigram.py) ---
        "trigram_substring": trigram_substring_sql,
        "trigram_substring_served": trigram_substring_sql,
        "trigram_regex": """
            SELECT doc_id,
                   length(regexp_extract_all(text, 'merge (join|sort)'))::BIGINT
                     AS n_matches
            FROM documents WHERE regexp_matches(text, 'merge (join|sort)')
            ORDER BY doc_id""",
        # documents.text is single-line in the synthetic corpus (same
        # note as grep_lines); multi-line numbering is pytest-pinned
        "trigram_grep": (
            "SELECT doc_id, 1 AS line_no, text AS line FROM documents "
            "WHERE regexp_matches(text, 'value\\w* hash')"
        ),
        # adjacency_matrix: conditional counts, pairwise keys a&b in
        # ascending name order, empty buckets omitted (ES contract)
        "agg_adjacency": """
WITH m AS (
  SELECT count(CASE WHEN lang = 'de' THEN 1 END) AS c_de,
         count(CASE WHEN lang = 'en' THEN 1 END) AS c_en,
         count(CASE WHEN n_chars >= 300 THEN 1 END) AS c_long,
         count(CASE WHEN lang = 'de' AND lang = 'en' THEN 1 END) AS c_de_en,
         count(CASE WHEN lang = 'de' AND n_chars >= 300 THEN 1 END) AS c_de_long,
         count(CASE WHEN lang = 'en' AND n_chars >= 300 THEN 1 END) AS c_en_long
  FROM documents
)
SELECT key, doc_count FROM (
  SELECT 'de' AS key, c_de AS doc_count FROM m UNION ALL
  SELECT 'de&en', c_de_en FROM m UNION ALL
  SELECT 'de&long', c_de_long FROM m UNION ALL
  SELECT 'en', c_en FROM m UNION ALL
  SELECT 'en&long', c_en_long FROM m UNION ALL
  SELECT 'long', c_long FROM m
) WHERE doc_count > 0 ORDER BY key""",
        "agg_rare_terms": f"""WITH {_TOK}
SELECT term AS key, count(*)::BIGINT AS doc_count
FROM post GROUP BY term HAVING count(*) <= 385
ORDER BY doc_count, key""",
        # BM25F pseudo-stats: tf = tf_text + 2·[source=t]; len = len_text
        # + 2 (source is one token per doc); avgdl = avgdl_text + 2;
        # df = docs containing t in EITHER field
        "combined_fields": f"""WITH {_TOK},
cpost AS (
  SELECT term, doc_id, sum(wtf) AS tf FROM (
    SELECT term, doc_id, tf::DOUBLE AS wtf FROM post
    UNION ALL
    SELECT lower(source) AS term, doc_id, 2.0 AS wtf FROM documents
  ) GROUP BY 1, 2
),
cdl AS (
  SELECT d.doc_id, COALESCE(dl.doc_len, 0) + 2.0 AS len_c
  FROM documents d LEFT JOIN dl USING (doc_id)
),
cs AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT sum(doc_len) FROM dl)::DOUBLE
           / (SELECT count(*) FROM documents) + 2.0 AS avgdl
),
ct AS (SELECT term, count(*) AS df FROM cpost GROUP BY 1),
csc AS (
  SELECT p.doc_id,
         ln(1 + (cs.n - ct.df + 0.5) / (ct.df + 0.5)) * p.tf * 2.2
           / (p.tf + 1.2 * (0.25 + 0.75 * d.len_c / cs.avgdl)) AS sc
  FROM cpost p JOIN ct USING (term) JOIN cdl d USING (doc_id), cs
  WHERE p.term IN ('merge', 'src1')
)
SELECT doc_id, round(sum(sc), 6) AS score FROM csc
GROUP BY doc_id ORDER BY sum(sc) DESC, doc_id ASC LIMIT 10""",
        "trigram_substring_ci": """
        SELECT doc_id,
               CAST((length(lower(text)) - length(replace(lower(text), 'merge join', '')))
                    / length('merge join') AS BIGINT) AS n_occ
        FROM documents WHERE instr(lower(text), 'merge join') > 0 ORDER BY doc_id""",
        # --- symbols: the oracle re-derives the "def <word>():" corpus
        # with unnest + generate_subscripts over the same word list
        "sym_extract": _SYM_ORACLE + "SELECT doc_id, line_no, kind, name FROM syms ORDER BY doc_id, line_no",
        "sym_search": _SYM_ORACLE
        + "SELECT doc_id, line_no, kind, name FROM syms WHERE name = 'filter' ORDER BY doc_id, line_no",
        "sym_search_served": _SYM_ORACLE
        + "SELECT doc_id, line_no, kind, name FROM syms WHERE name = 'filter' ORDER BY doc_id, line_no",
        "sym_prefix": _SYM_ORACLE
        + "SELECT doc_id, line_no, kind, name FROM syms WHERE name LIKE 'c%' ORDER BY name, doc_id, line_no",
        # definition boost: docs whose derived symbols (words len>=6)
        # include 'stream' score x1.5; docs matching only 'window' don't
        "sym_boost_search": f"""WITH {_TOK}, {_SCORED},
defs AS (
  SELECT DISTINCT doc_id FROM tok WHERE term = 'stream'
),
boosted AS (
  SELECT s.doc_id,
         sum(s.sc) * (CASE WHEN max(d.doc_id) IS NOT NULL THEN 1.5 ELSE 1.0 END)
           AS score
  FROM scored s LEFT JOIN defs d USING (doc_id)
  WHERE s.term IN ('stream', 'window')
  GROUP BY s.doc_id
)
SELECT doc_id, round(score, 6) AS score FROM boosted
ORDER BY score DESC, doc_id ASC LIMIT 10""",
        # --- aggregations (fugu_spark/aggs.py) ---
        "agg_terms_stats": """
            SELECT lang AS key, count(*) AS doc_count,
                   count(n_chars) AS n_chars_count,
                   min(n_chars) AS n_chars_min, max(n_chars) AS n_chars_max,
                   sum(n_chars)::BIGINT AS n_chars_sum,
                   round(avg(n_chars), 6) AS n_chars_avg
            FROM documents GROUP BY lang
            ORDER BY doc_count DESC, key ASC LIMIT 10""",
        "agg_histogram": """
            SELECT floor(n_chars / 100.0) * 100.0 AS key, count(*) AS doc_count
            FROM documents GROUP BY 1 ORDER BY 1""",
        "agg_date_histogram": """
            SELECT CAST(date_trunc('month', DATE '2024-01-01' + (doc_id % 365)::INT) AS DATE)
                     AS key,
                   count(*) AS doc_count
            FROM documents GROUP BY 1 ORDER BY 1""",
        "agg_auto_date_hist": """
            SELECT CAST(date_trunc('quarter', DATE '2024-01-01' + (doc_id % 365)::INT) AS DATE)
                     AS key,
                   count(*) AS doc_count,
                   'quarter' AS interval
            FROM documents GROUP BY 1 ORDER BY 1""",
        "agg_date_hist_empty": """
            WITH base AS (
              SELECT CAST(date_trunc('month', DATE '2024-01-01' + (doc_id % 365)::INT) AS DATE)
                       AS key,
                     count(*) AS doc_count
              FROM documents
              WHERE (doc_id % 365) < 30 OR (doc_id % 365) >= 150
              GROUP BY 1),
            ext AS (SELECT min(key) AS lo, max(key) AS hi FROM base),
            spine AS (
              SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS DATE) AS key
              FROM ext)
            SELECT s.key, coalesce(b.doc_count, 0)::BIGINT AS doc_count
            FROM spine s LEFT JOIN base b USING (key) ORDER BY s.key""",
        "agg_weighted_avg": """
            SELECT round(sum(n_chars::DOUBLE * doc_id::DOUBLE)
                         / sum(doc_id::DOUBLE), 6) AS weighted_avg
            FROM documents""",
        "agg_matrix_stats": """
            SELECT count(doc_id::DOUBLE) AS doc_count,
                   round(avg(doc_id::DOUBLE), 6) AS did_mean,
                   round(avg(n_chars::DOUBLE), 6) AS n_chars_mean,
                   round(var_pop(doc_id::DOUBLE), 6) AS did_variance,
                   round(var_pop(n_chars::DOUBLE), 6) AS n_chars_variance,
                   round(covar_pop(doc_id::DOUBLE, n_chars::DOUBLE), 6) AS covariance,
                   round(corr(doc_id::DOUBLE, n_chars::DOUBLE), 6) AS correlation
            FROM documents""",
        "agg_extended_stats": """
            SELECT count(n_chars::DOUBLE) AS n_chars_count,
                   min(n_chars::DOUBLE) AS n_chars_min,
                   max(n_chars::DOUBLE) AS n_chars_max,
                   sum(n_chars::DOUBLE) AS n_chars_sum,
                   round(avg(n_chars::DOUBLE), 6) AS n_chars_avg,
                   round(sum(n_chars::DOUBLE * n_chars::DOUBLE), 6)
                     AS n_chars_sum_of_squares,
                   round(var_pop(n_chars::DOUBLE), 6) AS n_chars_variance,
                   round(stddev_pop(n_chars::DOUBLE), 6) AS n_chars_std_deviation
            FROM documents""",
        "agg_pipeline": """
            WITH h AS (
              SELECT CAST(date_trunc('month', DATE '2024-01-01' + (doc_id % 365)::INT) AS DATE)
                       AS key,
                     count(*) AS doc_count
              FROM documents GROUP BY 1)
            SELECT key, doc_count,
                   doc_count - lag(doc_count) OVER (ORDER BY key) AS derivative,
                   sum(doc_count) OVER (ORDER BY key
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumulative_sum,
                   round(avg(doc_count) OVER (ORDER BY key
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS moving_avg
            FROM h ORDER BY key""",
        "agg_range": """
            WITH r AS (
              SELECT CASE WHEN n_chars < 200 THEN '*-200'
                          WHEN n_chars >= 200 AND n_chars < 400 THEN '200-400'
                          WHEN n_chars >= 400 THEN '400-*' END AS key
              FROM documents)
            SELECT key, count(*) AS doc_count FROM r
            WHERE key IS NOT NULL GROUP BY 1 ORDER BY 1""",
        "agg_percentiles": """
            WITH q AS (SELECT quantile_cont(n_chars, [0.25, 0.5, 0.75, 0.95]) AS v
                       FROM documents)
            SELECT p.percent::DOUBLE AS percent, round(q.v[p.i], 6) AS value
            FROM q, (VALUES (1, 0.25), (2, 0.5), (3, 0.75), (4, 0.95)) AS p(i, percent)
            ORDER BY percent""",
        "agg_cardinality": f"""WITH {_TOK}
            SELECT count(DISTINCT source) AS source_cardinality FROM documents
            WHERE doc_id IN (SELECT doc_id FROM tok WHERE term = 'merge')""",
        "agg_query_terms": f"""WITH {_TOK}
            SELECT lang AS key, count(*) AS doc_count FROM documents
            WHERE doc_id IN (SELECT doc_id FROM tok WHERE term IN ('merge', 'scan'))
            GROUP BY lang ORDER BY doc_count DESC, key ASC LIMIT 10""",
        "agg_top_hits": f"""WITH {_TOK}, {_SCORED},
            sc AS (SELECT doc_id, sum(sc) AS score FROM scored
                   WHERE term = 'merge' GROUP BY 1),
            g AS (
              SELECT d.source AS key, s.doc_id, round(s.score, 6) AS score,
                     row_number() OVER (PARTITION BY d.source
                                        ORDER BY s.score DESC, s.doc_id ASC) AS hit_rank
              FROM sc s JOIN documents d USING (doc_id))
            SELECT key, doc_id, score, hit_rank FROM g
            WHERE hit_rank <= 2 ORDER BY key, hit_rank""",
        # tiered merge over an insert-only history == fresh build over
        # the union corpus (no dead postings → maxDoc stats are exact)
        "segments_compact_range": (
            """WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id + 10000, text FROM documents WHERE doc_id % 5 = 0
  UNION ALL SELECT doc_id + 20000, text FROM documents WHERE doc_id % 9 = 0
), """
            + _TOK.replace("FROM documents", "FROM corpus").lstrip()
            + ", "
            + _SCORED
            + """
, r AS (SELECT doc_id, sum(sc) AS s FROM scored
        WHERE term IN ('merge', 'join') GROUP BY doc_id)
SELECT doc_id, round(s, 6) AS score FROM r
ORDER BY s DESC, doc_id ASC LIMIT 10"""
        ),
        # watermarked daily windowed counts == plain GROUP BY on a finite
        # source (epoch-second window starts keep the hash timezone-free)
        "stream_window_counts": """
            SELECT epoch(date_trunc('day', ts))::BIGINT AS day_start_s,
                   event_type, count(*) AS n_events,
                   round(sum(value), 6) AS value_sum
            FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
        # streaming first-seen dedup == min doc_id per content hash over
        # the union (batch order makes the two coincide)
        "stream_dedup": """
            WITH c AS (
              SELECT doc_id, text FROM documents
              UNION ALL SELECT doc_id + 10000, text FROM documents)
            SELECT md5(text) AS content_hash, min(doc_id) AS doc_id
            FROM c GROUP BY md5(text) ORDER BY 1""",
        # per-generation index stats recomputed from corpus + mutation
        "index_stats": """
            WITH mut AS (
              SELECT doc_id, regexp_replace(text, 'merge|join', 'xqzy', 'g') AS text
              FROM documents WHERE doc_id % 7 = 0
            ),
            t0 AS (
              SELECT doc_id, unnest(list_filter(
                       regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                       x -> x <> '')) AS term
              FROM documents),
            t1 AS (
              SELECT doc_id, unnest(list_filter(
                       regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                       x -> x <> '')) AS term
              FROM mut),
            p0 AS (SELECT count(DISTINCT term) AS nt,
                          count(*) AS np
                   FROM (SELECT DISTINCT term, doc_id FROM t0)),
            p1 AS (SELECT count(DISTINCT term) AS nt, count(*) AS np
                   FROM (SELECT DISTINCT term, doc_id FROM t1))
            SELECT 0 AS gen, p0.nt::BIGINT AS n_terms, p0.np::BIGINT AS n_postings,
                   0::BIGINT AS n_deleted_docs FROM p0
            UNION ALL
            SELECT 1, p1.nt::BIGINT, p1.np::BIGINT,
                   (SELECT count(*) FROM mut)::BIGINT FROM p1
            ORDER BY gen""",
        # point-in-time pin == the original corpus, by construction
        "bm25_as_of": f"""WITH {_TOK}, {_SCORED},
r AS (SELECT doc_id, sum(sc) AS s FROM scored
      WHERE term IN ('merge', 'join') GROUP BY doc_id)
SELECT doc_id, round(s, 6) AS score FROM r
ORDER BY s DESC, doc_id ASC LIMIT 10""",
        "bm25_as_of_served": f"""WITH {_TOK}, {_SCORED},
r AS (SELECT doc_id, sum(sc) AS s FROM scored
      WHERE term IN ('merge', 'join') GROUP BY doc_id)
SELECT doc_id, round(s, 6) AS score FROM r
ORDER BY s DESC, doc_id ASC LIMIT 10""",
        # filters agg: conditional aggregates, one row per named bucket
        "agg_filters": """
            SELECT * FROM (
              SELECT 'es_docs' AS key,
                     count(*) FILTER (lang = 'es') AS doc_count,
                     (sum(n_chars) FILTER (lang = 'es'))::BIGINT AS n_chars_sum,
                     round(avg(n_chars) FILTER (lang = 'es'), 6) AS n_chars_avg
              FROM documents
              UNION ALL
              SELECT 'long', count(*) FILTER (n_chars >= 400),
                     (sum(n_chars) FILTER (n_chars >= 400))::BIGINT,
                     round(avg(n_chars) FILTER (n_chars >= 400), 6) FROM documents
              UNION ALL
              SELECT 'short', count(*) FILTER (n_chars < 200),
                     (sum(n_chars) FILTER (n_chars < 200))::BIGINT,
                     round(avg(n_chars) FILTER (n_chars < 200), 6) FROM documents
            ) ORDER BY key""",
        # significant_text: token-level JLH (fg df via matched semi-join,
        # bg df = dictionary df)
        "agg_sig_text": f"""WITH {_TOK},
m AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'merge'),
fgt AS (SELECT count(*) AS n FROM m),
fg AS (SELECT t.term, count(DISTINCT t.doc_id) AS fg_count
       FROM tok t JOIN m USING (doc_id) GROUP BY t.term
       HAVING count(DISTINCT t.doc_id) >= 2),
bg AS (SELECT term, count(*) AS bg_count FROM post GROUP BY term)
SELECT fg.term AS key, fg.fg_count::BIGINT AS fg_count,
       bg.bg_count::BIGINT AS bg_count,
       round((fg.fg_count / CAST(fgt.n AS DOUBLE) - bg.bg_count / CAST(s.n AS DOUBLE))
             * ((fg.fg_count / CAST(fgt.n AS DOUBLE))
                / (bg.bg_count / CAST(s.n AS DOUBLE))), 6) AS score
FROM fg JOIN bg USING (term), fgt, stats s
ORDER BY score DESC, key ASC LIMIT 10""",
        # trec_eval metric set over the batch-ranked queries + derived qrels
        "ir_metrics": f"""WITH {_TOK}, {_SCORED},
res AS (
  SELECT * FROM (
    SELECT 1 AS qid, doc_id, row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank
    FROM (SELECT doc_id, sum(sc) AS s FROM scored WHERE term = 'merge' GROUP BY 1))
  WHERE rank <= 10
  UNION ALL
  SELECT * FROM (
    SELECT 2 AS qid, doc_id, row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank
    FROM (SELECT doc_id, sum(sc) AS s FROM scored
          WHERE term IN ('merge', 'join') GROUP BY 1))
  WHERE rank <= 10
),
qr AS (
  SELECT q.qid, d.doc_id, 1 + (list_contains(l, 'scan'))::INT AS grade
  FROM (SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS l
        FROM documents) d, (VALUES (1), (2)) q(qid)
  WHERE list_contains(l, 'sort')
),
j AS (SELECT r.qid, r.rank, COALESCE(qr.grade, 0) AS rel
      FROM res r LEFT JOIN qr ON r.qid = qr.qid AND r.doc_id = qr.doc_id),
perq AS (
  SELECT qid,
         sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS n_hits,
         min(CASE WHEN rel > 0 THEN rank END) AS first_rel,
         sum(CASE WHEN rel > 0 THEN (pow(2, rel) - 1) / log2(rank + 1) ELSE 0 END) AS dcg
  FROM j GROUP BY qid),
nrel AS (SELECT qid, count(*) AS n_rel FROM qr GROUP BY qid),
ideal AS (
  SELECT qid, sum((pow(2, grade) - 1) / log2(r + 1)) AS idcg
  FROM (SELECT qid, grade,
               row_number() OVER (PARTITION BY qid ORDER BY grade DESC) AS r FROM qr)
  WHERE r <= 10 GROUP BY qid)
SELECT p.qid::BIGINT AS query_id,
       round(p.n_hits / 10.0, 6) AS p_at_k,
       round(CASE WHEN COALESCE(n.n_rel, 0) > 0
                  THEN p.n_hits / CAST(n.n_rel AS DOUBLE) ELSE 0 END, 6) AS recall_at_k,
       round(CASE WHEN p.first_rel IS NOT NULL
                  THEN 1.0 / p.first_rel ELSE 0 END, 6) AS rr,
       round(CASE WHEN COALESCE(i.idcg, 0) > 0
                  THEN p.dcg / i.idcg ELSE 0 END, 6) AS ndcg_at_k
FROM perq p LEFT JOIN nrel n USING (qid) LEFT JOIN ideal i USING (qid)
ORDER BY query_id""",
        # significant_terms (JLH): fg/bg shares from ONE flagged scan
        "agg_sig_terms": f"""WITH {_TOK},
m AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'merge'),
fl AS (SELECT d.lang AS key, CASE WHEN m.doc_id IS NOT NULL THEN 1 ELSE 0 END AS fg
       FROM documents d LEFT JOIN m ON d.doc_id = m.doc_id),
pv AS (SELECT key, count(*) AS bg_count, sum(fg) AS fg_count FROM fl GROUP BY 1),
t AS (SELECT count(*) AS bgt, sum(fg) AS fgt FROM fl)
SELECT key, fg_count::BIGINT AS fg_count, bg_count::BIGINT AS bg_count,
       round((fg_count / CAST(t.fgt AS DOUBLE) - bg_count / CAST(t.bgt AS DOUBLE))
             * ((fg_count / CAST(t.fgt AS DOUBLE)) / (bg_count / CAST(t.bgt AS DOUBLE))),
             6) AS score
FROM pv, t WHERE fg_count >= 1
ORDER BY score DESC, key ASC LIMIT 10""",
        # add-α bigram LM perplexity, model = the corpus itself
        "ccnet_perplexity": f"""WITH {_TOK},
uni AS (SELECT term AS w, count(*) AS c_w FROM tok GROUP BY 1),
big_src AS (SELECT doc_id, pos, term AS w,
                   lag(term) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
            FROM tok),
ctx AS (SELECT prev, count(*) AS c_prev FROM big_src WHERE prev IS NOT NULL GROUP BY 1),
big AS (SELECT prev, w, count(*) AS c_big FROM big_src
        WHERE prev IS NOT NULL GROUP BY 1, 2),
tot AS (SELECT count(DISTINCT term) AS v, count(*) AS n FROM tok),
lp AS (
  SELECT s.doc_id,
         CASE WHEN s.prev IS NULL
              THEN ln((COALESCE(u.c_w, 0) + 0.1) / (tot.n + 0.1 * tot.v))
              ELSE ln((COALESCE(b.c_big, 0) + 0.1)
                      / (COALESCE(c.c_prev, 0) + 0.1 * tot.v))
         END AS lp
  FROM big_src s LEFT JOIN big b ON s.prev = b.prev AND s.w = b.w
                 LEFT JOIN ctx c ON s.prev = c.prev
                 LEFT JOIN uni u ON s.w = u.w, tot)
SELECT doc_id, count(*)::BIGINT AS n_tokens, round(exp(-avg(lp)), 6) AS perplexity
FROM lp GROUP BY doc_id""",
        # composite agg: lexicographic after-cursor over the bucket keys
        "agg_composite": """
            SELECT lang, source, count(*) AS doc_count FROM documents
            WHERE lang > 'es' OR (lang = 'es' AND source > 'src10')
            GROUP BY lang, source ORDER BY lang, source LIMIT 10""",
        # rescore: top-100 by OR base, score' = base + 2*phrase; docs
        # outside the window never re-enter (ES rescore semantics)
        "bm25_rescore": f"""WITH {_TOK}, {_SCORED},
base AS (SELECT doc_id, sum(sc) AS s FROM scored
         WHERE term IN ('merge', 'join') GROUP BY doc_id),
win AS (SELECT doc_id, s FROM base ORDER BY s DESC, doc_id ASC LIMIT 100),
phr AS (
  SELECT a.doc_id, count(*) AS tfp
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.term = 'merge' AND b.term = 'join' GROUP BY 1),
idfs AS (
  SELECT sum(ln(1 + (s.n - t.df + 0.5) / (t.df + 0.5))) AS idf_sum
  FROM tstat t, stats s WHERE t.term IN ('merge', 'join')),
resc AS (
  SELECT p.doc_id,
         i.idf_sum * p.tfp * 2.2 / (p.tfp + 1.2 * (0.25 + 0.75 * d.doc_len / s.avgdl)) AS s2
  FROM phr p JOIN dl d USING (doc_id), stats s, idfs i)
SELECT w.doc_id, round(w.s + 2.0 * COALESCE(r.s2, 0), 6) AS score
FROM win w LEFT JOIN resc r USING (doc_id)
ORDER BY w.s + 2.0 * COALESCE(r.s2, 0) DESC, w.doc_id ASC LIMIT 10""",
        # function_score field_value_factor with the log1p modifier
        "bm25_fvf": f"""WITH {_TOK}, {_SCORED},
base AS (SELECT doc_id, sum(sc) AS s FROM scored WHERE term = 'merge' GROUP BY 1)
SELECT b.doc_id, round(b.s * ln(1 + 0.01 * d.n_chars), 6) AS score
FROM base b JOIN documents d USING (doc_id)
ORDER BY b.s * ln(1 + 0.01 * d.n_chars) DESC, b.doc_id ASC LIMIT 10""",
        # SemDeDup greedy rule, all-pairs (the n_centroids=1 degeneracy):
        # x dropped iff some lower-id y has cos(x, y) >= τ
        "semdedup_exact": """
            WITH pairs AS (
              SELECT b.vec_id AS ib,
                     sum(a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)
                       / (sqrt(sum(a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE))
                          * sqrt(sum(b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))) AS cos
              FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id,
                   unnest(generate_series(1, len(a.embedding))) t(i)
              GROUP BY b.vec_id, a.vec_id
            ),
            drops AS (SELECT DISTINCT ib FROM pairs WHERE cos >= 0.4)
            SELECT e.vec_id, (d.ib IS NULL) AS keep
            FROM embeddings e LEFT JOIN drops d ON e.vec_id = d.ib""",
        # search_after cursor == rank-based deep paging, by definition of
        # the (score DESC, doc_id ASC) total order
        "bm25_search_after": f"""WITH {_TOK}, {_SCORED},
r AS (SELECT doc_id, sum(sc) AS s FROM scored
      WHERE term IN ('merge', 'join') GROUP BY doc_id)
SELECT doc_id, round(s, 6) AS score FROM r
ORDER BY s DESC, doc_id ASC LIMIT 10 OFFSET 10""",
        "bm25_search_after_served": f"""WITH {_TOK}, {_SCORED},
r AS (SELECT doc_id, sum(sc) AS s FROM scored
      WHERE term IN ('merge', 'join') GROUP BY doc_id)
SELECT doc_id, round(s, 6) AS score FROM r
ORDER BY s DESC, doc_id ASC LIMIT 10 OFFSET 10""",
        # dis_max tie=0.3: leaf 'merge' lives only in text (no source is
        # named 'merge'); leaf 'src1' lives in both → per doc
        # max(txt,src) + 0.3*(sum-max); leaves sum
        "multifield_dismax": f"""WITH {_TOK}, {_SCORED},
txt_m AS (SELECT doc_id, sum(sc) AS s FROM scored WHERE term = 'merge' GROUP BY 1),
txt_s AS (SELECT doc_id, sum(sc) AS s FROM scored WHERE term = 'src1' GROUP BY 1),
sstat AS (SELECT source, count(*) AS df FROM documents GROUP BY source),
src_s AS (
  SELECT d.doc_id, ln(1 + (s.n - st.df + 0.5) / (st.df + 0.5)) AS s
  FROM documents d JOIN sstat st ON d.source = st.source, stats s
  WHERE d.source = 'src1'),
ids AS (SELECT doc_id FROM txt_m UNION SELECT doc_id FROM txt_s
        UNION SELECT doc_id FROM src_s),
l AS (
  SELECT i.doc_id,
         COALESCE(m.s, 0) AS leaf_merge,
         greatest(COALESCE(ts.s, 0), COALESCE(ss.s, 0))
           + 0.3 * (COALESCE(ts.s, 0) + COALESCE(ss.s, 0)
                    - greatest(COALESCE(ts.s, 0), COALESCE(ss.s, 0))) AS leaf_src1
  FROM ids i LEFT JOIN txt_m m USING (doc_id)
             LEFT JOIN txt_s ts USING (doc_id)
             LEFT JOIN src_s ss USING (doc_id))
SELECT doc_id, round(leaf_merge + leaf_src1, 6) AS score FROM l
ORDER BY leaf_merge + leaf_src1 DESC, doc_id ASC LIMIT 10""",
        "bm25_regex": _topk_sql("regexp_full_match(term, 's.*o.*')"),
        "bm25_regex_served": _topk_sql(
            "regexp_full_match(term, 's.*o.*') OR term = 'merge'"
        ),
        "bm25_wildcard_term": _topk_sql("regexp_full_match(term, 's.an.*')"),
        "bm25_wildcard_served": _topk_sql(
            "regexp_full_match(term, 'jo.n.*') OR term = 'merge'"
        ),
        "bm25_msm2": _topk_sql(
            "term IN ('merge','join','scan')",
            having="HAVING count(DISTINCT term) >= 2",
        ),
        # the structured-DSL twin of bm25_msm2 — same plan, same oracle
        "bm25_dsl": _topk_sql(
            "term IN ('merge','join','scan')",
            having="HAVING count(DISTINCT term) >= 2",
        ),
        "bm25_msm2_served": _topk_sql(
            "term IN ('merge','join','scan')",
            having="HAVING count(DISTINCT term) >= 2",
        ),
        # percolation with synonyms + msm=2: docs containing any of
        # {merge, join, sort} AND 'scan'
        "percolate_knobs": f"""WITH {_TOK}
SELECT g.doc_id, 1 AS query_id
FROM (SELECT DISTINCT doc_id FROM tok WHERE term IN ('merge','join','sort')) g
JOIN (SELECT DISTINCT doc_id FROM tok WHERE term = 'scan') s USING (doc_id)
ORDER BY g.doc_id""",
        # batch path with synonyms: q0 = syn-group(merge,join) OR scan;
        # q1 = +syn-group +sort (both must)
        "batch_search_syn": f"""WITH {_TOK}, {_SCORED},
grp AS (SELECT doc_id, sum(tf) AS tf FROM post WHERE term IN ('merge','join') GROUP BY doc_id),
bdf AS (SELECT max(df) AS df FROM tstat WHERE term IN ('merge','join')),
synsc AS (
  SELECT g.doc_id,
         ln(1 + (s.n - b.df + 0.5) / (b.df + 0.5)) * g.tf * 2.2
           / (g.tf + 1.2 * (0.25 + 0.75 * d.doc_len / s.avgdl)) AS sc
  FROM grp g JOIN dl d USING (doc_id), stats s, bdf b
),
q0 AS (
  SELECT 0 AS query_id, doc_id, sum(sc) AS score FROM (
    SELECT doc_id, sc FROM synsc
    UNION ALL
    SELECT doc_id, sc FROM scored WHERE term = 'scan'
  ) GROUP BY doc_id
),
q1 AS (
  SELECT 1 AS query_id, y.doc_id, y.sc + z.sc AS score
  FROM synsc y JOIN (SELECT doc_id, sc FROM scored WHERE term = 'sort') z USING (doc_id)
),
u AS (SELECT * FROM q0 UNION ALL SELECT * FROM q1),
r AS (
  SELECT query_id, doc_id, round(score, 6) AS score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank
  FROM u
)
SELECT query_id, doc_id, score, rank FROM r WHERE rank <= 5""",
        # Lucene SynonymQuery blend: idf from the group's MAX df, tf
        # summed per doc across {merge, join, sort}, one BM25 term
        "bm25_synonym": f"""WITH {_TOK},
grp AS (
  SELECT doc_id, sum(tf) AS tf
  FROM post WHERE term IN ('merge','join','sort') GROUP BY doc_id
),
bdf AS (
  SELECT max(df) AS df FROM tstat WHERE term IN ('merge','join','sort')
)
SELECT g.doc_id,
       round(ln(1 + (s.n - b.df + 0.5) / (b.df + 0.5)) * g.tf * 2.2
             / (g.tf + 1.2 * (0.25 + 0.75 * d.doc_len / s.avgdl)), 6) AS score
FROM grp g JOIN dl d USING (doc_id), stats s, bdf b
ORDER BY 2 DESC, g.doc_id ASC LIMIT 10""",
        "explain_doc": f"""WITH {_TOK}, {_SCORED}
SELECT p.term, p.tf, t.df,
       round(ln(1 + (s.n - t.df + 0.5) / (t.df + 0.5)), 6) AS idf,
       round(sc, 6) AS contribution
FROM scored x
JOIN post p ON x.doc_id = p.doc_id AND x.term = p.term
JOIN tstat t ON t.term = p.term, stats s
WHERE p.doc_id = 1 AND p.term IN ('merge','join')""",
        "bm25_sorted_field": f"""WITH {_TOK}, {_SCORED},
matched AS (
  SELECT doc_id, round(sum(sc), 6) AS score
  FROM scored WHERE term IN ('merge','join') GROUP BY doc_id
)
SELECT m.doc_id, d.n_chars AS sort_key, m.score
FROM matched m JOIN documents d USING (doc_id)
ORDER BY d.n_chars DESC, m.doc_id ASC LIMIT 10""",
        # documents.text is single-line in the synthetic corpus, so every
        # match is line 1 / count 1 — the oracle pins the regex-match set
        # and projection shape; multi-line line numbering is pytest-pinned
        # (tests/test_codesearch.py)
        "grep_lines": (
            "SELECT doc_id, 1 AS line_no, text AS line FROM documents "
            "WHERE regexp_matches(text, 'merge (join|sort)')"
        ),
        "grep_count": (
            "SELECT doc_id, 1 AS n_matches FROM documents "
            "WHERE regexp_matches(text, 'value.*hash')"
        ),
        "match_count": match_count_sql,
        "match_count_served": match_count_sql,
        "hybrid_rrf": hybrid_rrf_sql,
        "hybrid_weighted": hybrid_weighted_sql,
        "hybrid_batch": hybrid_batch_sql,
        "batch_mlt": batch_mlt_sql,
        "bm25_grouped_served": grouped_lang_sql,
        "more_like_this_served": mlt_sql,
        "spell_suggest": f"""WITH {_TOK},
miss(input) AS (VALUES ('mergd'), ('scon'), ('rown')),
c AS (
  SELECT m.input, t.term, levenshtein(t.term, m.input) AS distance, t.df,
         row_number() OVER (
           PARTITION BY m.input
           ORDER BY levenshtein(t.term, m.input) ASC, t.df DESC, t.term ASC
         ) AS rn
  FROM tstat t, miss m
  WHERE t.term <> m.input AND levenshtein(t.term, m.input) <= 2
)
SELECT input, term, distance, df FROM c WHERE rn <= 5""",
        "bm25_grouped_lang": grouped_lang_sql,
        "more_like_this": mlt_sql,
        # percolation is BOOLEAN matching — per standing query: all
        # musts present, no must_nots, ≥1 should when mustless; phrase
        # = adjacency, sloppy phrase = ordered window ≤ slop + n - 1
        "percolate": _PERCOLATE_SQL,
        "code_tokens": code_tokens_sql,
        "bm25_code": bm25_code_sql,
        "bm25_code_served": bm25_code_sql,
        "code_quality": code_quality_sql,
        "bm25_not_phrase": not_phrase_sql,
        "bm25_must_phrase": must_phrase_sql,
        # fuzzy 'scal~2' expands to every dictionary term within edit
        # distance 2 (scan, small at this vocab; cap 50 never binds),
        # each BM25-scored — Leaf.fuzzy pinned semantics
        "bm25_fuzzy": _topk_sql("levenshtein(term, 'scal') <= 2"),
        # 'source:*' ExistsQuery sugar: every doc with a source token
        # scores a constant 1.0 (unbounded term range), plus 'merge'
        # scoring in the text field
        "multifield_exists": f"""WITH {_TOK}, {_SCORED},
txt AS (SELECT doc_id, sum(sc) AS s FROM scored WHERE term = 'merge' GROUP BY 1)
SELECT d.doc_id, round(1.0 + COALESCE(txt.s, 0), 6) AS score
FROM documents d LEFT JOIN txt ON d.doc_id = txt.doc_id
ORDER BY 1.0 + COALESCE(txt.s, 0) DESC, d.doc_id ASC LIMIT 10""",
        # streamed build must equal a fresh full-corpus build → same
        # topk oracle as the cold-build entries
        "bm25_streamed": _topk_sql("term IN ('merge','join')"),
        "batch_search_rich": _BATCH_RICH_SQL,
        "bm25_in_set": _IN_SET_SQL,
        "bm25_phrase_prefix": _PHRASE_PREFIX_SQL,
        "bm25_prefix_term": _topk_sql("term LIKE 's%'"),
        # served prefix: LocalSearcher expands against the clustered
        # dictionary and runs the OR-group locally — same oracle
        "bm25_prefix_served": _topk_sql("term LIKE 's%'"),
        "gopher_quality": _GOPHER_SQL,
        "ann_batch_topk": _ANN_BATCH_SQL,
        "bm25_term_range": _TERM_RANGE_SQL,
        "bm25_segments_prefix": _topk_sql("term LIKE 's%'"),
        "postings_tf": f"WITH {_TOK} SELECT term, doc_id, tf FROM post",
        "doc_len": f"WITH {_TOK} SELECT doc_id, doc_len FROM dl",
        "term_dict": f"WITH {_TOK} SELECT term, df, cf FROM tstat",
        "corpus_stats": f"""WITH {_TOK}
            SELECT (SELECT count(*) FROM documents) AS n_docs,
                   (SELECT sum(doc_len) FROM dl)::BIGINT AS total_tokens,
                   round((SELECT sum(doc_len) FROM dl)::DOUBLE / (SELECT count(*) FROM documents), 6) AS avgdl""",
        "bm25_top10_single": _topk_sql("term = 'merge'"),
        "bm25_top10_or": _topk_sql("term IN ('merge','join')"),
        "bm25_top10_and": _topk_sql(
            "term IN ('merge','join')", having="HAVING count(DISTINCT term) = 2"
        ),
        "bm25_top10_not": _topk_sql(
            "term = 'merge' AND doc_id NOT IN (SELECT doc_id FROM post WHERE term = 'window')"
        ),
        "bm25_phrase": _PHRASE_SQL,
        "bm25_phrase_slop": _PHRASE_SLOP_SQL,
        "bm25_segments_phrase_slop": _PHRASE_SLOP_SQL,
        # span_near 'merge NEAR/3 sort' (unordered; window = slop + n − 1 = 4).
        # Pinned merged-sweep tf (queryparse.Leaf.near): per-term running-max
        # window functions recompute "latest occurrence at-or-before q".
        "bm25_span_near": f"""WITH {_TOK},
occ AS (SELECT doc_id, pos, term FROM tok WHERE term IN ('merge', 'sort')),
w AS (
  SELECT doc_id, pos,
    MAX(CASE WHEN term = 'merge' THEN pos END) OVER
      (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS l0,
    MAX(CASE WHEN term = 'sort' THEN pos END) OVER
      (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS l1
  FROM occ),
phr AS (
  SELECT doc_id, count(*) AS tfp FROM w
  WHERE l0 IS NOT NULL AND l1 IS NOT NULL AND pos - least(l0, l1) <= 4
  GROUP BY 1),
idfs AS (
  SELECT sum(ln(1 + (s.n - t.df + 0.5) / (t.df + 0.5))) AS idf_sum
  FROM tstat t, stats s WHERE t.term IN ('merge', 'sort')
)
SELECT p.doc_id,
       round(i.idf_sum * p.tfp * 2.2 / (p.tfp + 1.2 * (0.25 + 0.75 * d.doc_len / s.avgdl)), 6) AS score
FROM phr p JOIN dl d USING (doc_id), stats s, idfs i
ORDER BY 2 DESC, doc_id ASC LIMIT 10""",
        # range clauses filter (no score contribution — dates.extract_date_ranges
        # pin); derived date = epoch 2024-01-01 + doc_id%365 days, so the
        # [2024-03-01, 2024-06-01) window is a pure doc_id predicate
        "bm25_range_syntax": f"""WITH {_TOK}, {_SCORED}
SELECT sc.doc_id, round(sum(sc.sc), 6) AS score
FROM scored sc
WHERE sc.term = 'merge'
  AND (1704067200 + (sc.doc_id % 365) * 86400) >= 1709251200
  AND (1704067200 + (sc.doc_id % 365) * 86400) <  1717200000
GROUP BY sc.doc_id ORDER BY sum(sc.sc) DESC, sc.doc_id ASC LIMIT 100""",
        # function_score gauss decay on n_chars: multiplier
        # exp(−max(0,|v−2000|−100)² / 2σ²), σ² = 1500² / (2·ln 2)
        "bm25_decay_gauss": f"""WITH {_TOK}, {_SCORED},
base AS (SELECT doc_id, sum(sc) AS s FROM scored WHERE term = 'merge' GROUP BY 1),
dec AS (
  SELECT b.doc_id,
         b.s * exp(-pow(greatest(abs(d.n_chars - 2000.0) - 100.0, 0.0), 2)
                   / (2.0 * (1500.0 * 1500.0 / (2.0 * ln(2.0))))) AS s
  FROM base b JOIN documents d USING (doc_id))
SELECT doc_id, round(s, 6) AS score FROM dec
ORDER BY s DESC, doc_id ASC LIMIT 10""",
        # phrase suggester: per-word levenshtein candidates (top 5 by
        # distance, df DESC, term) scored by the add-0.1 bigram LM
        "phrase_suggest": f"""WITH {_TOK},
dict AS (SELECT term, count(DISTINCT doc_id) AS df, count(*) AS cf
         FROM tok GROUP BY 1),
tot AS (SELECT count(*)::DOUBLE AS n, count(DISTINCT term)::DOUBLE AS v FROM tok),
c0 AS (SELECT term, cf, row_number() OVER (
         ORDER BY levenshtein(term, 'port'), df DESC, term) AS rk
       FROM dict WHERE levenshtein(term, 'port') <= 1),
c1 AS (SELECT term, cf, row_number() OVER (
         ORDER BY levenshtein(term, 'ag'), df DESC, term) AS rk
       FROM dict WHERE levenshtein(term, 'ag') <= 1),
big AS (SELECT a.term AS w0, b.term AS w1, count(*)::DOUBLE AS c
        FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        GROUP BY 1, 2),
sc AS (SELECT p0.term || ' ' || p1.term AS suggestion,
              ln((p0.cf + 0.1) / (t.n + 0.1 * t.v))
            + ln((coalesce(bg.c, 0) + 0.1) / (p0.cf + 0.1 * t.v)) AS s
       FROM (SELECT * FROM c0 WHERE rk <= 5) p0
       CROSS JOIN (SELECT * FROM c1 WHERE rk <= 5) p1
       LEFT JOIN big bg ON bg.w0 = p0.term AND bg.w1 = p1.term, tot t)
SELECT suggestion, round(s, 6) AS score FROM sc
ORDER BY s DESC, suggestion ASC LIMIT 5""",
        # seeded random_score: identical md5 formula both engines
        "random_sample": f"""WITH {_TOK}, {_SCORED},
m AS (SELECT DISTINCT doc_id FROM scored WHERE term = 'merge'),
r AS (SELECT doc_id,
             (('0x' || substr(md5(doc_id::VARCHAR || ':7'), 1, 8))::UBIGINT)::DOUBLE
               / 4294967296.0 AS s
      FROM m)
SELECT doc_id, round(s, 6) AS score FROM r
ORDER BY s DESC, doc_id ASC LIMIT 20""",
        # terms_set: distinct-match count gated per doc by doc_id%3+1
        "bm25_terms_set": f"""WITH {_TOK}, {_SCORED},
nm AS (SELECT doc_id, count(DISTINCT term) AS c FROM tok
       WHERE term IN ('merge', 'join', 'sort') GROUP BY 1),
agg AS (SELECT doc_id, sum(sc) AS s FROM scored
        WHERE term IN ('merge', 'join', 'sort') GROUP BY 1)
SELECT a.doc_id, round(a.s, 6) AS score
FROM agg a JOIN nm USING (doc_id)
WHERE nm.c >= (a.doc_id % 3 + 1)
ORDER BY a.s DESC, a.doc_id ASC LIMIT 100""",
        # pinned query: ladder scores 1e9 - position for the pins, then
        # the organic set minus the pins
        "bm25_pinned": f"""WITH {_TOK}, {_SCORED},
org AS (SELECT doc_id, sum(sc) AS s FROM scored
        WHERE term IN ('merge', 'join') GROUP BY 1),
pin(doc_id, s) AS (VALUES (42, 1000000000.0), (7, 999999999.0)),
uni AS (
  SELECT doc_id, s FROM pin
  UNION ALL
  SELECT o.doc_id, o.s FROM org o
  WHERE o.doc_id NOT IN (SELECT doc_id FROM pin))
SELECT doc_id, round(s, 6) AS score FROM uni
ORDER BY s DESC, doc_id ASC LIMIT 10""",
        "bm25_pinned_served": f"""WITH {_TOK}, {_SCORED},
org AS (SELECT doc_id, sum(sc) AS s FROM scored
        WHERE term IN ('merge', 'join') GROUP BY 1),
pin(doc_id, s) AS (VALUES (42, 1000000000.0), (7, 999999999.0)),
uni AS (
  SELECT doc_id, s FROM pin
  UNION ALL
  SELECT o.doc_id, o.s FROM org o
  WHERE o.doc_id NOT IN (SELECT doc_id FROM pin))
SELECT doc_id, round(s, 6) AS score FROM uni
ORDER BY s DESC, doc_id ASC LIMIT 10""",
        # boosting query: phrase matches demoted x0.3, never excluded
        "bm25_boosting": f"""WITH {_TOK}, {_SCORED},
base AS (SELECT doc_id, sum(sc) AS s FROM scored
         WHERE term IN ('merge', 'join') GROUP BY 1),
phr AS (
  SELECT DISTINCT a.doc_id
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.term = 'merge' AND b.term = 'join'),
dem AS (
  SELECT b.doc_id,
         b.s * CASE WHEN p.doc_id IS NOT NULL THEN 0.3 ELSE 1.0 END AS s
  FROM base b LEFT JOIN phr p USING (doc_id))
SELECT doc_id, round(s, 6) AS score FROM dem
ORDER BY s DESC, doc_id ASC LIMIT 10""",
        "bm25_boost": _BOOST_SQL,
        "bm25_or_k100": _topk_sql("term IN ('merge','join')", k=100),
        "bm25_filtered_lang": _FILTERED_SQL,
        "bm25_segments_or": _topk_sql("term IN ('merge','join')"),
        "bm25_snapshot_restore": _topk_sql("term IN ('merge','join')"),
        "bm25_federated": _topk_sql("term IN ('merge','join')"),
        # routed search scores over the en-only corpus: same tokenize/
        # score CTEs with every documents reference scoped to lang='en'
        "bm25_routed": _topk_sql("term IN ('merge','join')").replace(
            "FROM documents", "FROM (SELECT * FROM documents WHERE lang = 'en')"
        ),
        "term_vectors_doc": f"""WITH {_TOK},
own AS (
  SELECT term, count(*)::BIGINT AS tf, list(pos ORDER BY pos) AS positions
  FROM tok WHERE doc_id = 7 GROUP BY term
)
SELECT o.term, o.tf, o.positions, t.df::BIGINT AS df, t.cf
FROM own o JOIN tstat t USING (term) ORDER BY o.term""",
        "bm25_segments_wand": _topk_sql("term IN ('merge','join')"),
        "bm25_segments_and": _topk_sql(
            "term IN ('merge','join')", having="HAVING count(DISTINCT term) = 2"
        ),
        "bm25_segments_phrase": _PHRASE_SQL,
        "bm25_serving_path": _topk_sql("term IN ('merge','join')"),
        "multifield_or": _MULTIFIELD_SQL,
        "multifield_qualified": _MULTIFIELD_QUALIFIED_SQL,
        "allquery": "SELECT doc_id, 1.0::DOUBLE AS score FROM documents",
        "point_lookup": "SELECT doc_id, lang, source, n_chars FROM documents WHERE doc_id = 42",
        "facet_counts_lang": "SELECT '/lang/' || lang AS child, count(*) AS count FROM documents GROUP BY lang",
        "facet_tree": """
            SELECT '/lang' AS prefix, count(*) AS count FROM documents
            UNION ALL SELECT '/lang/' || lang, count(*) FROM documents GROUP BY lang
            UNION ALL SELECT '/source', count(*) FROM documents
            UNION ALL SELECT '/source/' || source, count(*) FROM documents GROUP BY source""",
        "filter_values_lang": "SELECT DISTINCT lang AS value FROM documents",
        "all_filter_paths": """
            SELECT DISTINCT '/lang' AS parent, lang AS leaf FROM documents
            UNION SELECT DISTINCT '/source', source FROM documents""",
        "search_facets_src1": """
            SELECT '/source/' || source AS facet, count(*) AS count FROM documents
            WHERE source LIKE '%1%' GROUP BY source""",
        "exact_dedup": """
            SELECT md5(text) AS content_md5, min(doc_id) AS keep_id, count(*) AS n_dups
            FROM documents GROUP BY text""",
        "token_stats": f"""WITH {_TOK}
            SELECT doc_id, count(*) AS n_tok, count(DISTINCT term) AS n_distinct,
                   round(avg(len(term)), 6) AS avg_len
            FROM tok GROUP BY doc_id""",
        "bpe_token_count": r"""
            SELECT doc_id,
                   len(regexp_extract_all(text, '''(?:[sdmt]|ll|ve|re)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s'']+|''| ?\s+'))::BIGINT AS n_bpe
            FROM documents""",
        "emb_dup_exact": """
            WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 80),
            p AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                     round(sum(a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)
                           / (sqrt(sum(a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE))
                              * sqrt(sum(b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))), 6) AS cosine
              FROM e a, e b, unnest(generate_series(1, len(a.embedding))) t(i)
              WHERE a.vec_id < b.vec_id
              GROUP BY 1, 2
            )
            SELECT id_a, id_b, cosine FROM p WHERE cosine >= 0.25""",
        "quality": f"""WITH {_TOK}
            SELECT dl.doc_id,
                   round(0.4 * least(1.0, dl.doc_len / 100.0)
                       + 0.4 * (SELECT count(DISTINCT term) FROM tok t2 WHERE t2.doc_id = dl.doc_id)::DOUBLE / dl.doc_len
                       + 0.2 * (1.0 - (SELECT count(*) FROM tok t3 WHERE t3.doc_id = dl.doc_id AND t3.term IN ({_STOPWORDS_EN}))::DOUBLE / dl.doc_len),
                     6) AS q
            FROM dl""",
        "lang_id": f"""WITH {_TOK},
            ratios AS (SELECT dl.doc_id, {_RATIOS} FROM dl)
            SELECT doc_id,
                   CASE WHEN greatest(r_de, r_en, r_es, r_fr) <= 0.05 THEN 'und'
                        WHEN r_de >= r_en AND r_de >= r_es AND r_de >= r_fr THEN 'de'
                        WHEN r_en >= r_es AND r_en >= r_fr THEN 'en'
                        WHEN r_es >= r_fr THEN 'es'
                        ELSE 'fr' END AS pred_lang
            FROM ratios""",
        "fingerprint": """
            SELECT doc_id,
                   md5(array_to_string(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> ''), ' ')) AS fp
            FROM documents""",
        "date_range_filter": """
            SELECT event_id, epoch_us(ts) AS ts_us FROM events
            WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
              AND ts <  TIMESTAMP '2024-01-08 00:00:00'""",
        "ngram_jaccard": _NGRAM_SQL,
        "dup_groups": _DUPGROUPS_SQL,
        "winnow_fps": _WINNOW_SQL,
        "ann_cosine_all": """
            WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
            SELECT e.vec_id,
                   round(sum(e.embedding[i]::DOUBLE * q.qe[i]::DOUBLE)
                         / (sqrt(sum(e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))
                            * sqrt(sum(q.qe[i]::DOUBLE * q.qe[i]::DOUBLE))), 6) AS cosine
            FROM embeddings e, q, unnest(generate_series(1, len(e.embedding))) t(i)
            GROUP BY e.vec_id""",
        # IVF nprobe == n_centroids and LSH max_probe == n_planes are both
        # exact → shared brute-force top-10 oracle
        "ann_ivf_top10": _EXACT_ANN_TOP10_SQL,
        "ann_lsh_top10": _EXACT_ANN_TOP10_SQL,
        # filtered kNN: pre-filter (label=1) then exact / full-probe LSH —
        # both equal the brute-force scan over the allowed set
        "ann_filtered": _FILTERED_ANN_TOP10_SQL,
        "ann_lsh_filtered": _FILTERED_ANN_TOP10_SQL,
        "delete_by_query": _dbq_sql(),
        "ann_lsh_probe2": _lsh_probe_oracle_sql(),
        "minhash_pairs": _minhash_oracle_sql(),
        "simhash_sigs": _SIMHASH_SQL,
        "suggestions": """
            WITH toks AS (
              SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
            )
            SELECT doc_id, array_to_string(w[1:least(3, len(w))], ' ') AS suggestion
            FROM toks
            WHERE len(array_to_string(w[1:least(3, len(w))], ' ')) > 3
              AND len(array_to_string(w[1:least(3, len(w))], ' ')) < 50""",
        "bm25_prefix_filter": _PREFIX_FILTER_SQL,
        "bm25_contains_filter": _CONTAINS_FILTER_SQL,
        "bm25_wildcard_filter": _WILDCARD_FILTER_SQL,
        "bm25_min_score": _MIN_SCORE_SQL,
        "bm25_page2": _PAGE2_SQL,
        "facet_boost": _FACET_BOOST_SQL,
        "filter_boost": _FILTER_BOOST_SQL,
        "namespaces": _NAMESPACES_SQL,
        "split_assign": _SPLIT_SQL,
        "paragraph_dedup": _PARDEDUP_SQL,
        # batch retrieval: the per-(query, doc) combine over a leaf VALUES
        # table — mirrors fugu_spark.batch exactly (must count, must_not
        # exclusion, boost multipliers, (score DESC, doc_id ASC) ranking)
        "batch_search": f"""WITH {_TOK}, {_SCORED},
leaves(qid, leaf_id, term, boost, is_must, is_not) AS (
  VALUES (0,0,'merge',1.0,0,0),(0,1,'join',1.0,0,0),
         (1,0,'merge',1.0,1,0),(1,1,'sort',1.0,1,0),
         (2,0,'table',1.0,0,0),(2,1,'window',1.0,0,1),
         (3,0,'merge',2.0,0,0),(3,1,'join',1.0,0,0)
),
nm AS (
  SELECT qid, count(DISTINCT CASE WHEN is_must = 1 THEN leaf_id END) AS n_musts
  FROM leaves GROUP BY 1
),
contrib AS (
  SELECT l.qid, l.leaf_id, s.doc_id, l.boost * s.sc AS sc, l.is_must, l.is_not
  FROM scored s JOIN leaves l ON s.term = l.term
),
agg AS (
  SELECT qid, doc_id,
         sum(CASE WHEN is_not = 0 THEN sc ELSE 0 END) AS score,
         count(DISTINCT CASE WHEN is_must = 1 THEN leaf_id END) AS must_cnt,
         max(is_not) AS excl
  FROM contrib GROUP BY 1, 2
),
ranked AS (
  SELECT a.qid AS query_id, a.doc_id, round(a.score, 6) AS score,
         row_number() OVER (PARTITION BY a.qid ORDER BY a.score DESC, a.doc_id ASC) AS rank
  FROM agg a JOIN nm ON a.qid = nm.qid
  WHERE a.must_cnt = nm.n_musts AND a.excl = 0
)
SELECT query_id, doc_id, score, rank FROM ranked WHERE rank <= 5""",
        "stratified_sample": _STRAT_SAMPLE_SQL,
        "pii_scan": _pii_sql(),
        "repetition_stats": _REPETITION_SQL,
        "contamination": _CONTAMINATION_SQL,
        "c4_filters": _C4_SQL,
        "dedup_against": _DEDUP_AGAINST_SQL,
        "facet_counts_served": "SELECT '/lang/' || lang AS child, count(*) AS count FROM documents GROUP BY lang",
        "sha256_invariant": "SELECT doc_id, sha256(text) AS content_sha256 FROM documents",
        "per_page_clamp": f"""WITH {_TOK}, {_SCORED}
SELECT doc_id, round(sum(sc), 6) AS score FROM scored WHERE term IN ('merge', 'join')
GROUP BY doc_id ORDER BY sum(sc) DESC, doc_id ASC LIMIT 20""",
        "multi_filter_or": f"""WITH {_TOK}, {_SCORED}
SELECT sc.doc_id, round(sum(sc.sc), 6) AS score
FROM scored sc JOIN documents doc ON sc.doc_id = doc.doc_id AND doc.lang IN ('es', 'de')
WHERE sc.term = 'merge'
GROUP BY sc.doc_id ORDER BY sum(sc.sc) DESC, sc.doc_id ASC LIMIT 10""",
        "point_lookup_served": "SELECT doc_id, lang, source, n_chars FROM documents WHERE doc_id = 42",
        "suggest_served": """
            WITH toks AS (
              SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
            ),
            sug AS (
              SELECT doc_id, array_to_string(w[1:least(3, len(w))], ' ') AS suggestion
              FROM toks
              WHERE len(array_to_string(w[1:least(3, len(w))], ' ')) > 3
                AND len(array_to_string(w[1:least(3, len(w))], ' ')) < 50
            )
            SELECT suggestion, count(*)::BIGINT AS count FROM sug
            WHERE lower(suggestion) LIKE 'merge%'
            GROUP BY suggestion ORDER BY count DESC, suggestion ASC LIMIT 10""",
        "filter_values_served": "SELECT DISTINCT lang AS value FROM documents",
        "highlights": _highlights_sql(),
        "mix_corpus": _MIX_SQL,
        "pack_sequences": _PACK_SQL,
        "segments_compact": _compact_sql(),
        "metadata_facets": _METADATA_FACETS_SQL,
        "namespace_filter_paths": _NS_FILTER_PATHS_SQL,
    }
