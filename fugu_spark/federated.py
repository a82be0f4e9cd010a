"""Federated search over multiple segment indexes (the ES cross-cluster
/ multi-shard shape) with DFS-global statistics.

A 100-TB deployment does not run one index directory: it runs many —
per tenant, per time partition, per ingest region — and queries fan out
and merge (Lucene's shard model; ES calls the cross-index form CCS).
Two public scoring contracts exist and both are implemented:

- ``dfs=True`` (ES `dfs_query_then_fetch`): ONE pre-phase computes
  global term statistics (Σ df, Σ N, length-weighted avgdl) and every
  member scores with them. Scores are then IDENTICAL to a single index
  built over the union corpus — the invariant the tests and the oracle
  entry pin exactly. The pre-phase costs one small job over the
  members' dictionaries pruned to the query's terms.
- ``dfs=False`` (ES default `query_then_fetch`): members score with
  local stats; cheaper (no pre-phase) but scores are only comparable
  within a member — the documented ES trade-off, reproduced verbatim.

Merge is rank-safe with per-member top-k: a doc's score depends only on
its own postings and the (global or local) stats, so the union's top-k
is contained in the members' top-k's.

Doc ids must be globally unique across members (the same contract ES
places on `_id` routing; builders here derive ids from the corpus, so
disjointness is the natural state).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from . import BM25_B, BM25_K1
from .postings import CorpusStats
from .search import top_k
from .segment_search import search_segments
from .segments import SegmentIndex
from .tokenizer import DEFAULT_MODE


@dataclass
class _DfsMember(SegmentIndex):
    """A member index whose ``terms`` frame carries the federation's
    global df/cf and whose stats are the federation's. The flag routes
    segment_search's dictionary lookups through the patched frame
    instead of the on-disk (local-stats) dictionary."""

    dfs_global: bool = True


def _global_stats(indexes: list[SegmentIndex]) -> CorpusStats:
    n = sum(si.stats.n_docs for si in indexes)
    total = sum(si.stats.total_tokens for si in indexes)
    return CorpusStats(
        n_docs=n, avgdl=(total / n) if n else 0.0, total_tokens=total
    )


def _dfs_members(indexes: list[SegmentIndex]) -> list[SegmentIndex]:
    """Patch every member with federation-global df/cf and stats.

    Global df = Σ member df per term (a doc lives in exactly one
    member). max_tf / min_doc_len stay LOCAL — they bound the member's
    own postings, which keeps WAND/MaxScore upper bounds valid (global
    idf × local tf bound ≥ any local score)."""
    gstats = _global_stats(indexes)
    gdf = None
    for si in indexes:
        part = si.terms.select("term", "df", "cf")
        gdf = part if gdf is None else gdf.unionByName(part)
    gdf = gdf.groupBy("term").agg(
        F.sum("df").alias("_gdf"), F.sum("cf").alias("_gcf")
    )
    out = []
    for si in indexes:
        patched = (
            si.terms.join(gdf, "term", "left")
            .select(
                "term",
                F.coalesce("_gdf", "df").cast("long").alias("df"),
                F.coalesce("_gcf", "cf").cast("long").alias("cf"),
                "max_tf",
                "min_doc_len",
                "term_bucket",
                "n_blocks",
            )
        )
        m = _DfsMember(
            spark=si.spark, index_dir=si.index_dir, terms=patched, stats=gstats
        )
        if getattr(si, "as_of", None) is not None:
            raise ValueError("federate live indexes, not point-in-time readers")
        out.append(m)
    return out


def search_federated(
    indexes: list[SegmentIndex],
    query_text: str | None,
    k: int = 10,
    dfs: bool = True,
    mode: str = DEFAULT_MODE,
    k1: float = BM25_K1,
    b: float = BM25_B,
    **kwargs,
) -> DataFrame:
    """Top-k over the union of member indexes → DataFrame(doc_id, score).

    ``kwargs`` pass through to each member's ``search_segments``
    (filters, min_should_match, synonyms, …)."""
    if not indexes:
        raise ValueError("search_federated needs ≥1 index")
    members = _dfs_members(indexes) if dfs else indexes
    parts = [
        search_segments(m, query_text, k=k, mode=mode, k1=k1, b=b, **kwargs)
        for m in members
    ]
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    return top_k(allp, k=k)


@dataclass
class RoutedFederation:
    """ES data-stream / index-pattern routing: a federation whose
    members are keyed by a partition value (time bucket, tenant, lang).
    A query that names its routes opens ONLY those members — partition
    pruning lifted from the file level to the whole-index level, which
    is how a 100-TB estate avoids touching 99% of its indexes for a
    scoped query. Unrouted queries search everything (federated merge).

    Scoring contract per search: DFS stats are computed over the
    SEARCHED members only (ES computes dfs over the shards it queries —
    a routed search is its own corpus), so a routed result equals a
    single index built over exactly that partition (pinned)."""

    members: dict[str, SegmentIndex]

    def search(
        self,
        query_text: str | None,
        k: int = 10,
        route: list[str] | None = None,
        dfs: bool = True,
        **kwargs,
    ) -> DataFrame:
        if route is not None:
            missing = [r for r in route if r not in self.members]
            if missing:
                raise ValueError(f"unknown routes {missing}; have {sorted(self.members)}")
            chosen = [self.members[r] for r in route]
        else:
            chosen = list(self.members.values())
        return search_federated(chosen, query_text, k=k, dfs=dfs, **kwargs)
