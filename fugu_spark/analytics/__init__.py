"""Large-scale training-data-pipeline operations over the documents corpus:
deduplication, similarity search, text analysis, multimodal plumbing.

These are first-class engine components alongside the search core — the
operations a 100 TB text/code corpus pipeline needs before indexing.
"""

from . import dedup, multimodal, similarity, textstats  # noqa: F401
