"""SynonymQuery (queryparse.apply_synonyms + blended scoring) — Lucene
semantics pinned:

- the group scores as ONE pseudo-term: idf from the group's MAX df,
  tf = per-doc SUM over member terms, one BM25 contribution;
- group members are alternatives: the leaf is live if ANY member is
  indexed, and a Must synonym leaf never anchors conjunctive pruning;
- engine-level parameter ({term: [alternatives...]}), no query syntax —
  exactly like Lucene, where synonyms come from the analysis chain.
"""

from __future__ import annotations

import pytest

from fugu_spark import postings as P
from fugu_spark.bm25 import idf_py
from fugu_spark.queryparse import apply_synonyms, parse_query
from fugu_spark.search import search

DOCS = [
    (0, "fast merge path fast"),      # fast x2
    (1, "quick merge route"),         # quick
    (2, "rapid rapid scan"),          # rapid x2
    (3, "slow merge walk"),           # none of the group
    (4, "fast quick results"),        # fast + quick
]
SCHEMA = "doc_id long, text string"
SYN = {"fast": ["quick", "rapid"]}


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.createDataFrame(DOCS, SCHEMA).cache()
    idx = P.build_index(docs, id_col="doc_id", text_col="text")
    return docs, idx


def _ranks(df):
    return [(r["doc_id"], round(r["score"], 9)) for r in df.collect()]


def test_apply_synonyms_rewrites_leaf():
    plan = apply_synonyms(parse_query("fast merge"), SYN)
    a, b = plan.leaves
    assert a.synonym and a.terms == ("fast", "quick", "rapid") and not a.is_phrase
    assert not b.synonym and b.terms == ("merge",)


def test_apply_synonyms_skips_phrases_and_patterns():
    plan = apply_synonyms(parse_query('"fast merge" fast* /fa.*/'), SYN)
    assert all(not l.synonym for l in plan.leaves)


def test_synonym_blended_score(corpus):
    """Hand-computed Lucene blend for doc 4 (fast + quick, tf_sum = 2)."""
    docs, idx = corpus
    got = dict(_ranks(search(idx, "fast", k=10, docs=docs, synonyms=SYN)))
    assert set(got) == {0, 1, 2, 4}
    n, avgdl = 5, sum(len(t.split()) for _, t in DOCS) / 5
    df_max = 3  # fast appears in docs {0,4}, quick {1,4}, rapid {2} -> max df... fast df=2, quick df=2, rapid df=1
    df_max = 2
    idf = idf_py(df_max, n)
    for d, tf, dl in ((4, 2.0, 3), (0, 2.0, 4), (2, 2.0, 3), (1, 1.0, 3)):
        tfn = tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
        assert got[d] == pytest.approx(idf * tfn, abs=1e-9), d


def test_synonym_group_outscores_weaker_tf(corpus):
    docs, idx = corpus
    got = dict(_ranks(search(idx, "fast", k=10, docs=docs, synonyms=SYN)))
    # doc 4 (fast+quick, tf_sum 2, dl 3) beats doc 1 (quick alone, tf 1)
    assert got[4] > got[1]


def test_synonym_in_boolean(corpus):
    docs, idx = corpus
    # must = synonym group, should = merge (optional once a must exists)
    got = {d for d, _ in _ranks(search(idx, "+fast merge", k=10, docs=docs, synonyms=SYN))}
    assert got == {0, 1, 2, 4}
    # msm=1 makes the should required: docs matching the group AND merge
    got = {d for d, _ in _ranks(
        search(idx, "+fast merge", k=10, docs=docs, synonyms=SYN, min_should_match=1)
    )}
    assert got == {0, 1}  # docs matching the group AND containing merge
    got = {d for d, _ in _ranks(search(idx, "merge -fast", k=10, docs=docs, synonyms=SYN))}
    assert got == {3}


def test_synonym_live_if_any_member_indexed(corpus):
    docs, idx = corpus
    got = {d for d, _ in _ranks(
        search(idx, "+fast merge", k=10, docs=docs, synonyms={"fast": ["zzzmissing"]})
    )}
    assert got == {0, 4}  # group live through 'fast' itself


def test_synonym_nested_group(corpus):
    docs, idx = corpus
    got = {d for d, _ in _ranks(
        search(idx, "(fast OR scan) AND merge", k=10, docs=docs, synonyms=SYN)
    )}
    assert got == {0, 1}  # (group|scan) docs {0,1,2,4} ∩ merge docs {0,1,3}


def test_synonym_segments_served_engine_parity(spark, corpus, tmp_path):
    from fugu_spark.engine import FuguSparkEngine
    from fugu_spark.segment_search import search_segments
    from fugu_spark.segments import build_segments
    from fugu_spark.serve import LocalSearcher

    docs, idx = corpus
    si = build_segments(docs, str(tmp_path / "syn"), id_col="doc_id", text_col="text")
    ls = LocalSearcher(si.index_dir)
    eng = FuguSparkEngine.build(docs, str(tmp_path / "syneng"), id_col="doc_id", text_col="text")
    for q in ("fast", "+fast merge", "merge -fast", "fast scan"):
        mem = _ranks(search(idx, q, k=10, docs=docs, synonyms=SYN))
        seg = _ranks(search_segments(si, q, k=10, docs=docs, synonyms=SYN))
        pdf = ls.search(q, k=10, synonyms=SYN)
        srv = [(int(r.doc_id), round(r.score, 9)) for r in pdf.itertuples()]
        egn = _ranks(eng.search(q, k=10, synonyms=SYN))
        assert mem == seg == srv == egn, q
