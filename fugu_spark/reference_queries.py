"""The reference query set (FIXTURES.md §2): 25 queries covering every
query-surface category; the rank-identity target of the engine
(BASELINE.json north_rule: "matching the reference's top-k docIDs and
BM25 scores (rank-identical) on the reference query set").

Filters use the facet grammar of SURVEY.md §2.5; vocabulary terms come
from the deterministic corpus generator (fugu_spark.corpus).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class RefQuery:
    query_id: int
    query_text: str
    top_k: int = 10
    filters: tuple[str, ...] = ()


REFERENCE_QUERIES: list[RefQuery] = [
    RefQuery(1, "merge"),                         # single term
    RefQuery(2, "merge AND join"),                # 2-term AND
    RefQuery(3, "merge AND join AND scan"),       # 3-term AND
    RefQuery(4, "merge join"),                    # 2-term OR (default Should)
    RefQuery(5, "merge OR join OR scan"),         # explicit OR
    RefQuery(6, "merge NOT join"),                # NOT
    RefQuery(7, '"merge join"'),                  # exact phrase (adjacent)
    RefQuery(8, '"scan merge"'),                  # phrase, other order
    RefQuery(9, "merge^2 join"),                  # boost
    RefQuery(10, "merge^2 join^3 scan"),          # multiple boosts
    RefQuery(11, "merge42"),                      # mixed-alnum vocab term
    RefQuery(12, "merge_join"),                   # underscored → 2 tokens → phrase
    RefQuery(13, "merge.join"),                   # dotted → 2 tokens → phrase
    RefQuery(14, "the if return"),                # hot stop-word-like terms
    RefQuery(15, "y" * 39),                       # rare term (39-char survivor)
    RefQuery(16, "zzz_term_not_in_corpus"),       # absent term
    RefQuery(17, ""),                             # empty → AllQuery
    RefQuery(18, "MERGE Join"),                   # mixed-case input
    RefQuery(19, "Ünïcode"),                      # Unicode term
    RefQuery(20, "merge join", top_k=1),          # k=1
    RefQuery(21, "merge join", top_k=100),        # k=100
    RefQuery(22, "merge", filters=("/lang/py",)),          # equals filter
    RefQuery(23, "merge", filters=("/repo/org0/*",)),      # prefix filter
    RefQuery(24, "merge join", filters=("*core*",)),       # wildcard filter
    RefQuery(25, "", filters=("/lang/rs",)),               # filters-only AllQuery
]
