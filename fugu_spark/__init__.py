"""fugu_spark — a PySpark-native full-text index + BM25 search engine.

A from-scratch rebuild of the capabilities of mycorrhiza-inc/fugu (a Rust
HTTP search server built on Tantivy): inverted-index construction, BM25
top-k retrieval, hierarchical facets, and facet analytics — re-expressed
as idiomatic Spark DataFrame jobs designed for 100 TB-class corpora.

Layout
------
- :mod:`fugu_spark.session`    — SparkSession factory with engine defaults
- :mod:`fugu_spark.corpus`     — deterministic synthetic source-code corpus
- :mod:`fugu_spark.tokenizer`  — vectorized (Arrow/pandas) tokenizers
- :mod:`fugu_spark.postings`   — postings / doc-stats / term-dictionary build
- :mod:`fugu_spark.bm25`       — BM25 scoring expressions (k1=1.2, b=0.75)
- :mod:`fugu_spark.queryparse` — query-string → QueryPlan (AND/OR/NOT/phrase/boost)
- :mod:`fugu_spark.search`     — query execution over postings tables
- :mod:`fugu_spark.segments`   — compressed segment files, manifest, resume
- :mod:`fugu_spark.facets`     — facet derivation, filters, counts, tree
- :mod:`fugu_spark.analytics`  — dedup / similarity / text-quality pipelines

All index/query semantics mirror the reference (citations in docstrings as
/root/reference/<file>:<lines>); all execution is Spark-first.
"""

__version__ = "0.4.0"  # bump when the on-disk segment layout changes

BM25_K1 = 1.2  # reference default: /root/reference/API.md:82-84
BM25_B = 0.75  # reference default: /root/reference/API.md:82-84
POSTING_BLOCK_SIZE = 128  # Tantivy segment format block size (public)
MAX_TOKEN_BYTES = 40  # Tantivy RemoveLongFilter::limit(40)
