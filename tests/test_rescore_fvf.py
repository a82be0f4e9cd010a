"""Rescoring (ES rescore, score_mode=total) and function_score
field_value_factor — hand-derived answers on the fixture corpus plus
window semantics (rescoring never recalls docs outside the window)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from fugu_spark.postings import build_index
from fugu_spark.resultops import field_value_factor, rescore
from fugu_spark.search import search

from .oracle import PyIndex
from .test_search import DOCS


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        [(i, t, len(t)) for i, t in DOCS.items()],
        "doc_id long, content string, n_chars long",
    )


@pytest.fixture(scope="module")
def index(spark, docs_df):
    return build_index(docs_df)


@pytest.fixture(scope="module")
def oracle():
    return PyIndex(DOCS)


class TestRescore:
    def test_total_equals_base_plus_rescore(self, index, oracle):
        base = dict(oracle.search("merge join", k=100))
        re = dict(oracle.search('"merge join"', k=100))
        want = {d: s + 2.0 * re.get(d, 0.0) for d, s in base.items()}
        got = {
            r.doc_id: r.score
            for r in rescore(
                index, "merge join", '"merge join"', window_size=100, k=10,
                rescore_weight=2.0,
            ).collect()
        }
        for d, s in got.items():
            assert s == pytest.approx(want[d], abs=1e-9)
        # ranking follows the combined score
        ranked = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[: len(got)]
        assert list(got) == [d for d, _ in ranked]

    def test_window_bounds_recall(self, index, oracle):
        """window_size=1: only the single best base hit is rescored and
        returned — docs outside the window never reappear (ES)."""
        out = rescore(index, "merge join", '"merge join"', window_size=1, k=10).collect()
        assert len(out) == 1
        best_base = oracle.search("merge join", k=1)[0][0]
        assert out[0].doc_id == best_base

    def test_no_rescore_match_keeps_base(self, index, oracle):
        base = dict(oracle.search("merge", k=100))
        got = {
            r.doc_id: r.score
            for r in rescore(index, "merge", '"rare_unique_term appears"', 100, k=10).collect()
        }
        # doc 11 holds the phrase but does NOT match 'merge' -> absent
        assert 11 not in got
        for d, s in got.items():
            assert s == pytest.approx(base[d], abs=1e-9)


class TestFieldValueFactor:
    def test_modifiers(self, index, docs_df, oracle):
        base = search(index, "merge", k=100)
        want_base = dict(oracle.search("merge", k=100))
        for mod, fn in [
            ("none", lambda v: v),
            ("log1p", lambda v: math.log1p(v)),
            ("sqrt", lambda v: math.sqrt(v)),
        ]:
            got = {
                r.doc_id: r.score
                for r in field_value_factor(
                    base, docs_df, "n_chars", factor=0.1, modifier=mod
                ).collect()
            }
            for d, s in got.items():
                assert s == pytest.approx(
                    want_base[d] * fn(0.1 * len(DOCS[d])), abs=1e-9
                ), (mod, d)

    def test_missing_substitutes(self, index, docs_df, spark):
        base = search(index, "merge", k=100)
        holes = docs_df.withColumn(
            "n_chars", F.when(F.col("doc_id") % 2 == 0, F.col("n_chars"))
        )
        got = {
            r.doc_id: r.score
            for r in field_value_factor(base, holes, "n_chars", missing=5.0).collect()
        }
        plain = {r.doc_id: r.score for r in base.collect()}
        for d, s in got.items():
            v = len(DOCS[d]) if d % 2 == 0 else 5.0
            assert s == pytest.approx(plain[d] * v, abs=1e-9)

    def test_bad_modifier(self, index, docs_df):
        base = search(index, "merge", k=10)
        with pytest.raises(ValueError):
            field_value_factor(base, docs_df, "n_chars", modifier="exp")


class TestDecayScore:
    """function_score decay (gauss/exp/linear) — hand-derived multipliers
    per the Lucene formulas, missing-field neutrality, parameter guards."""

    ORIGIN, SCALE, OFFSET, DECAY = 40.0, 20.0, 5.0, 0.5

    def _want_mult(self, v, kind):
        dist = max(0.0, abs(v - self.ORIGIN) - self.OFFSET)
        if kind == "gauss":
            sigma2 = self.SCALE**2 / (2.0 * math.log(1.0 / self.DECAY))
            return math.exp(-(dist**2) / (2.0 * sigma2))
        if kind == "exp":
            return math.exp(math.log(self.DECAY) / self.SCALE * dist)
        s = self.SCALE / (1.0 - self.DECAY)
        return max(0.0, (s - dist) / s)

    @pytest.mark.parametrize("kind", ["gauss", "exp", "linear"])
    def test_kinds(self, index, docs_df, oracle, kind):
        from fugu_spark.resultops import decay_score

        base = search(index, "merge", k=100)
        want_base = dict(oracle.search("merge", k=100))
        got = {
            r.doc_id: r.score
            for r in decay_score(
                base, docs_df, "n_chars", self.ORIGIN, self.SCALE,
                kind=kind, offset=self.OFFSET, decay=self.DECAY,
            ).collect()
        }
        assert set(got) == set(want_base)
        for d, s in got.items():
            assert s == pytest.approx(
                want_base[d] * self._want_mult(len(DOCS[d]), kind), abs=1e-9
            ), (kind, d)

    def test_at_scale_distance_multiplier_is_decay(self, index, docs_df, spark):
        """A doc exactly scale+offset from origin scores base × decay —
        the defining point of all three curves."""
        from fugu_spark.resultops import decay_score

        base = search(index, "merge", k=100)
        some = base.limit(1).collect()[0]
        pinned = docs_df.withColumn(
            "n_chars",
            F.when(F.col("doc_id") == some.doc_id,
                   F.lit(self.ORIGIN + self.OFFSET + self.SCALE)).otherwise(F.col("n_chars")),
        )
        for kind in ("gauss", "exp", "linear"):
            got = {
                r.doc_id: r.score
                for r in decay_score(
                    base, pinned, "n_chars", self.ORIGIN, self.SCALE,
                    kind=kind, offset=self.OFFSET, decay=self.DECAY,
                ).collect()
            }
            assert got[some.doc_id] == pytest.approx(some.score * self.DECAY, abs=1e-9)

    def test_missing_field_is_neutral(self, index, docs_df):
        from fugu_spark.resultops import decay_score

        base = search(index, "merge", k=100)
        holes = docs_df.withColumn(
            "n_chars", F.when(F.col("doc_id") % 2 == 0, F.col("n_chars"))
        )
        plain = {r.doc_id: r.score for r in base.collect()}
        got = {
            r.doc_id: r.score
            for r in decay_score(base, holes, "n_chars", self.ORIGIN, self.SCALE).collect()
        }
        for d, s in got.items():
            if d % 2 != 0:
                assert s == pytest.approx(plain[d], abs=1e-9)

    def test_param_guards(self, index, docs_df):
        from fugu_spark.resultops import decay_score

        base = search(index, "merge", k=10)
        with pytest.raises(ValueError):
            decay_score(base, docs_df, "n_chars", 0.0, 0.0)
        with pytest.raises(ValueError):
            decay_score(base, docs_df, "n_chars", 0.0, 10.0, decay=1.0)
        with pytest.raises(ValueError):
            decay_score(base, docs_df, "n_chars", 0.0, 10.0, kind="cosine")


class TestBoosting:
    """ES boosting query: negative matches are demoted by negative_boost,
    never excluded, and the negative side never recalls new docs."""

    def test_demotes_negative_matches(self, index, oracle):
        from fugu_spark.resultops import boosting

        base = dict(oracle.search("merge join", k=100))
        neg = dict(oracle.search('"merge join"', k=100))
        want = {d: s * (0.3 if d in neg else 1.0) for d, s in base.items()}
        got = {
            r.doc_id: r.score
            for r in boosting(index, "merge join", '"merge join"', 0.3, k=100).collect()
        }
        assert set(got) == set(want)
        for d, s in got.items():
            assert s == pytest.approx(want[d], abs=1e-9)

    def test_negative_never_recalls(self, index, oracle):
        from fugu_spark.resultops import boosting

        base = dict(oracle.search("merge", k=100))
        got = {r.doc_id for r in boosting(index, "merge", "join", 0.0, k=100).collect()}
        assert got == set(base)

    def test_guard(self, index):
        from fugu_spark.resultops import boosting

        with pytest.raises(ValueError):
            boosting(index, "merge", "join", 1.5)


class TestPinned:
    """ES pinned query: promoted ids first in given order, organic tail
    deduped, guards on empty/duplicate pins."""

    def test_order_and_dedup(self, index, oracle):
        from fugu_spark.resultops import pinned

        base = dict(oracle.search("merge join", k=100))
        some_organic = sorted(base)[:2]  # pin two docs that also match
        out = pinned(index, [some_organic[1], some_organic[0]], "merge join", k=100).collect()
        got_ids = [r.doc_id for r in out]
        # pins lead, in the order given
        assert got_ids[:2] == [some_organic[1], some_organic[0]]
        # organic tail = base minus pinned, in base score order
        want_tail = [d for d, _ in sorted(base.items(), key=lambda kv: (-kv[1], kv[0]))
                     if d not in some_organic]
        assert got_ids[2:] == want_tail
        # organic scores unchanged
        for r in out[2:]:
            assert r.score == pytest.approx(base[r.doc_id], abs=1e-9)

    def test_pin_outside_matched_set(self, index, oracle):
        from fugu_spark.resultops import pinned

        base = dict(oracle.search("merge", k=100))
        missing = max(DOCS) + 50  # not in the corpus' matched set
        got_ids = [r.doc_id for r in pinned(index, [missing], "merge", k=100).collect()]
        assert got_ids[0] == missing and set(got_ids[1:]) == set(base)

    def test_guards(self, index):
        from fugu_spark.resultops import pinned

        with pytest.raises(ValueError):
            pinned(index, [], "merge")
        with pytest.raises(ValueError):
            pinned(index, [1, 1], "merge")


class TestTermsSet:
    """ES terms_set: per-doc minimum_should_match from a doc field —
    hand-derived qualification + score identity with the OR query."""

    TERMS = ["merge", "join", "sort"]

    def _matched(self, d):
        toks = {t for t, _ in __import__("fugu_spark.tokenizer", fromlist=["tokenize_py"])
                .tokenize_py(DOCS[d])}
        return sum(1 for t in self.TERMS if t in toks)

    def test_per_doc_gate_and_scores(self, index, docs_df, oracle, spark):
        from fugu_spark.resultops import terms_set

        # per-doc requirement: doc_id % 3 + 1 ∈ {1, 2, 3}
        req = docs_df.withColumn("req", F.col("doc_id") % 3 + 1)
        base = dict(oracle.search("merge join sort", k=100))
        got = {
            r.doc_id: r.score
            for r in terms_set(index, self.TERMS, req, "req", k=100).collect()
        }
        want = {
            d: s for d, s in base.items() if self._matched(d) >= (d % 3 + 1)
        }
        assert got.keys() == want.keys()
        for d, s in got.items():
            assert s == pytest.approx(want[d], abs=1e-9)

    def test_null_requirement_never_matches(self, index, docs_df):
        from fugu_spark.resultops import terms_set

        req = docs_df.withColumn(
            "req", F.when(F.col("doc_id") % 2 == 0, F.lit(1))
        )
        got = {r.doc_id for r in terms_set(index, self.TERMS, req, "req", k=100).collect()}
        assert got and all(d % 2 == 0 for d in got)

    def test_guards(self, index, docs_df):
        from fugu_spark.resultops import terms_set

        with pytest.raises(ValueError):
            terms_set(index, [], docs_df, "n_chars")
        with pytest.raises(ValueError):
            terms_set(index, ["merge", "merge"], docs_df, "n_chars")
        with pytest.raises(ValueError):
            terms_set(index, ["two words"], docs_df, "n_chars")


class TestRandomScore:
    """Deterministic seeded random_score: pinned md5 formula, seed
    sensitivity, replace vs multiply."""

    def _want(self, d, seed):
        import hashlib

        h = hashlib.md5(f"{d}:{seed}".encode()).hexdigest()[:8]
        return int(h, 16) / 2**32

    def test_pinned_formula_and_determinism(self, index):
        from fugu_spark.resultops import random_score

        base = search(index, "merge", k=100)
        got = {r.doc_id: r.score for r in random_score(base, seed=7).collect()}
        again = {r.doc_id: r.score for r in random_score(base, seed=7).collect()}
        assert got == again
        for d, s in got.items():
            assert s == pytest.approx(self._want(d, 7), abs=1e-12)
            assert 0.0 <= s < 1.0

    def test_seed_changes_order(self, index):
        from fugu_spark.resultops import random_score

        base = search(index, "merge", k=100)
        a = [r.doc_id for r in random_score(base, seed=1).orderBy(F.desc("score")).collect()]
        b = [r.doc_id for r in random_score(base, seed=2).orderBy(F.desc("score")).collect()]
        assert set(a) == set(b) and a != b

    def test_multiply_mode(self, index, oracle):
        from fugu_spark.resultops import random_score

        want_base = dict(oracle.search("merge", k=100))
        base = search(index, "merge", k=100)
        got = {
            r.doc_id: r.score
            for r in random_score(base, seed=3, weight=2.0, mode="multiply").collect()
        }
        for d, s in got.items():
            assert s == pytest.approx(want_base[d] * 2.0 * self._want(d, 3), abs=1e-9)

    def test_bad_mode(self, index):
        from fugu_spark.resultops import random_score

        with pytest.raises(ValueError):
            random_score(search(index, "merge", k=10), mode="add")


class TestPhraseSuggest:
    """ES phrase suggester: whole-query did-you-mean via per-word
    dictionary candidates re-ranked by the corpus bigram LM — expected
    values recomputed in pure Python from the fixture corpus."""

    @staticmethod
    def _lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    def _model(self):
        import re

        streams = {d: [t for t in re.split(r"[^a-z0-9]+", DOCS[d].lower()) if t]
                   for d in DOCS}
        cf, df, big = {}, {}, {}
        for toks in streams.values():
            for t in toks:
                cf[t] = cf.get(t, 0) + 1
            for t in set(toks):
                df[t] = df.get(t, 0) + 1
            for a, b in zip(toks, toks[1:]):
                big[(a, b)] = big.get((a, b), 0) + 1
        return cf, df, big, sum(cf.values()), len(cf)

    def _expected(self, words, per_word=5, max_distance=1, alpha=0.1):
        import math

        cf, df, big, n_tok, v = self._model()
        slots = []
        for w in words:
            cands = sorted(
                ((self._lev(t, w), -df[t], t) for t in cf
                 if self._lev(t, w) <= max_distance),
            )[:per_word]
            slots.append([t for _, _, t in cands])
        combos = [[t] for t in slots[0]]
        for s in slots[1:]:
            combos = [c + [t] for c in combos for t in s]
        out = []
        for c in combos:
            sc = math.log((cf[c[0]] + alpha) / (n_tok + alpha * v))
            for a, b in zip(c, c[1:]):
                sc += math.log((big.get((a, b), 0) + alpha) / (cf[a] + alpha * v))
            out.append((" ".join(c), sc))
        return sorted(out, key=lambda kv: (-kv[1], kv[0]))

    def test_corrects_misspelling(self, index, docs_df):
        from fugu_spark.resultops import phrase_suggest

        got = [
            (r.suggestion, r.score)
            for r in phrase_suggest(
                index, docs_df.withColumnRenamed("content", "text"), "mergw joim", n=5
            ).collect()
        ]
        want = self._expected(["mergw", "joim"])[:5]
        assert [g[0] for g in got] == [w[0] for w in want]
        for (gs, gv), (ws, wv) in zip(got, want):
            assert gv == pytest.approx(wv, abs=1e-9), gs
        assert got[0][0] == "merge join"

    def test_no_candidates_is_empty(self, index, docs_df):
        from fugu_spark.resultops import phrase_suggest

        out = phrase_suggest(
            index, docs_df.withColumnRenamed("content", "text"), "zzzzqqq xylophone"
        )
        assert out.count() == 0

    def test_guards(self, index, docs_df):
        from fugu_spark.resultops import phrase_suggest

        d = docs_df.withColumnRenamed("content", "text")
        with pytest.raises(ValueError):
            phrase_suggest(index, d, "merge")
        with pytest.raises(ValueError):
            phrase_suggest(index, d, "a b c d e merge join sort scan table")


def test_decay_null_field_is_neutral_explicitly(spark):
    """ADVICE r5: a NULL decay field must multiply by exactly 1.0 via the
    explicit isNull gate (previously an accident of greatest() skipping
    the NULL distance)."""
    from fugu_spark.resultops import decay_score

    scored = spark.createDataFrame([(1, 2.5), (2, 2.5)], "doc_id long, score double")
    docs = spark.createDataFrame([(1, 100.0), (2, None)], "doc_id long, v double")
    for kind in ("gauss", "exp", "linear"):
        out = {
            r.doc_id: r.score
            for r in decay_score(
                scored, docs, "v", origin=100.0, scale=10.0, kind=kind
            ).collect()
        }
        assert out[2] == 2.5  # NULL field: unchanged
        assert out[1] == 2.5  # at origin: multiplier 1.0
