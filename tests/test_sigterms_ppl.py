"""significant_terms aggregation (JLH) and CCNet-style bigram-LM
perplexity — both checked against pure-Python recomputations on the
fixture corpus."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from fugu_spark.aggs import significant_terms_agg
from fugu_spark.analytics.textstats import bigram_lm_perplexity
from fugu_spark.postings import build_index
from fugu_spark.queryparse import expand_plan, parse_query
from fugu_spark.search import dict_expander, execute_plan

from .test_search import DOCS

LANGS = ["py", "rs", "go"]


def _tok(t):
    return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [(i, t, LANGS[i % 3]) for i, t in DOCS.items()]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


@pytest.fixture(scope="module")
def index(spark, docs_df):
    return build_index(docs_df, text_col="text")


class TestSignificantTerms:
    def test_jlh_scores(self, docs_df, index):
        plan = expand_plan(parse_query("merge"), dict_expander({None: index}))
        matched = execute_plan(index, plan)
        got = significant_terms_agg(
            docs_df, matched, "lang", size=10, min_doc_count=1
        ).collect()

        fg_docs = {0, 2, 4, 8, 9}
        fg = Counter(LANGS[d % 3] for d in fg_docs)
        bg = Counter(LANGS[d % 3] for d in DOCS)
        fg_tot, bg_tot = sum(fg.values()), sum(bg.values())
        want = {}
        for k in bg:
            if fg.get(k, 0) < 1:
                continue
            fp, bp = fg[k] / fg_tot, bg[k] / bg_tot
            want[k] = round((fp - bp) * (fp / bp), 6)
        assert {r.key: r.score for r in got} == want
        for r in got:
            assert (r.fg_count, r.bg_count) == (fg[r.key], bg[r.key])
        # ordered by score desc
        scores = [r.score for r in got]
        assert scores == sorted(scores, reverse=True)

    def test_min_doc_count_gates(self, docs_df, index):
        plan = expand_plan(parse_query("rare_unique_term"), dict_expander({None: index}))
        matched = execute_plan(index, plan)  # one doc
        got = significant_terms_agg(docs_df, matched, "lang", min_doc_count=2).collect()
        assert got == []


def _ppl_oracle(alpha=0.1):
    streams = {d: _tok(t) for d, t in DOCS.items()}
    uni = Counter(w for s in streams.values() for w in s)
    big = Counter(
        (s[i - 1], s[i]) for s in streams.values() for i in range(1, len(s))
    )
    ctx = Counter(s[i - 1] for s in streams.values() for i in range(1, len(s)))
    v = len(uni)
    n = sum(uni.values())
    out = {}
    for d, s in streams.items():
        lps = []
        for i, w in enumerate(s):
            if i == 0:
                lps.append(math.log((uni[w] + alpha) / (n + alpha * v)))
            else:
                lps.append(
                    math.log(
                        (big[(s[i - 1], w)] + alpha) / (ctx[s[i - 1]] + alpha * v)
                    )
                )
        out[d] = (len(s), round(math.exp(-sum(lps) / len(lps)), 6))
    return out


class TestBigramPerplexity:
    def test_matches_hand_model(self, docs_df):
        got = {
            r.doc_id: (r.n_tokens, r.perplexity)
            for r in bigram_lm_perplexity(docs_df).collect()
        }
        want = _ppl_oracle()
        assert set(got) == set(want)
        for d in got:
            assert got[d][0] == want[d][0]
            assert got[d][1] == pytest.approx(want[d][1], rel=1e-6)

    def test_repeated_text_scores_lower(self, spark):
        """A doc of one repeated bigram must be far less perplexing than a
        doc of all-distinct words under a model trained on both."""
        df = spark.createDataFrame(
            [(0, "a b a b a b a b"), (1, "q w e r t y u i")],
            "doc_id long, text string",
        )
        got = {r.doc_id: r.perplexity for r in bigram_lm_perplexity(df).collect()}
        assert got[0] < got[1]

    def test_external_lm_corpus(self, spark, docs_df):
        """lm_docs trains the model on a different corpus: a doc made of
        in-model bigrams scores lower than out-of-vocabulary text."""
        score_df = spark.createDataFrame(
            [(100, "merge join hash join"), (101, "zz yy xx ww")],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: r.perplexity
            for r in bigram_lm_perplexity(score_df, lm_docs=docs_df).collect()
        }
        assert got[100] < got[101]


class TestSignificantText:
    def test_jlh_over_tokens(self, docs_df, index):
        from collections import Counter

        from fugu_spark.aggs import significant_text_agg

        plan = expand_plan(parse_query("merge"), dict_expander({None: index}))
        matched = execute_plan(index, plan)
        got = {
            r.key: (r.fg_count, r.bg_count, r.score)
            for r in significant_text_agg(index, matched, size=50, min_doc_count=1).collect()
        }
        fg_docs = {0, 2, 4, 8, 9}
        fg = Counter(t for d in fg_docs for t in set(_tok(DOCS[d])))
        bg = Counter(t for d in DOCS for t in set(_tok(DOCS[d])))
        for term, (fgc, bgc, score) in got.items():
            assert fgc == fg[term] and bgc == bg[term], term
            fp, bp = fgc / len(fg_docs), bgc / len(DOCS)
            assert score == pytest.approx(round((fp - bp) * (fp / bp), 6), abs=1e-6)
        # 'merge' itself must top the list (fg% is 100%)
        top = max(got, key=lambda t: got[t][2])
        assert top == "merge"

    def test_stopword_guard(self, docs_df, index):
        from fugu_spark.aggs import significant_text_agg

        plan = expand_plan(parse_query("quick"), dict_expander({None: index}))
        matched = execute_plan(index, plan)
        out = significant_text_agg(
            index, matched, size=50, min_doc_count=1, max_bg_frac=0.3
        ).collect()
        # every surviving term's corpus df <= 30% of 12 docs
        assert all(r.bg_count <= 0.3 * 12 for r in out)
