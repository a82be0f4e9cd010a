"""Tokenization fixtures (FIXTURES.md §3) — hand-computed goldens pinning
every quirk in SURVEY.md §2.3 for both modes."""

from __future__ import annotations

import pandas as pd
import pytest

from fugu_spark.tokenizer import classify_token, tokenize_batch, tokenize_py


class TestTantivyDefault:
    def test_basic_lowercase(self):
        assert tokenize_py("Hello World") == [("hello", 0), ("world", 1)]

    def test_dotted_splits(self):
        # underscore is NOT alphanumeric in Rust → splits; dot splits too
        assert tokenize_py("foo.bar") == [("foo", 0), ("bar", 1)]

    def test_underscore_splits(self):
        assert tokenize_py("foo_bar") == [("foo", 0), ("bar", 1)]

    def test_number_with_dot(self):
        assert tokenize_py("3.14") == [("3", 0), ("14", 1)]

    def test_email(self):
        assert tokenize_py("a@b.com") == [("a", 0), ("b", 1), ("com", 2)]

    def test_long_token_dropped_positions_keep_ordinals(self):
        # 45-byte token removed AFTER position assignment → gap in ordinals
        text = "aa " + "x" * 45 + " bb"
        assert tokenize_py(text) == [("aa", 0), ("bb", 2)]

    def test_exactly_39_kept_40_dropped(self):
        assert tokenize_py("y" * 39) == [("y" * 39, 0)]
        assert tokenize_py("z" * 40) == []

    def test_unicode_words(self):
        assert tokenize_py("Ünïcode Wörds") == [("ünïcode", 0), ("wörds", 1)]

    def test_punctuation_only(self):
        assert tokenize_py("==!=>= ***") == []

    def test_empty_and_none(self):
        assert tokenize_py("") == []
        assert tokenize_py(None) == []

    def test_tabs_newlines(self):
        assert tokenize_py("a\tb\nc") == [("a", 0), ("b", 1), ("c", 2)]


class TestStandardTokenizer:
    M = "standard_tokenizer"

    def test_foo_dot_bar_only_foo(self):
        # '.bar' classifies Punctuation → dropped (src/tokeinze.rs:317-357)
        toks = tokenize_py("foo.bar", self.M)
        assert [t for t, _ in toks] == ["foo"]

    def test_foo_underscore_bar_dropped(self):
        # underscore fails Word/AlphaNum regexes → Punctuation → dropped
        assert tokenize_py("foo_bar", self.M) == []

    def test_word_and_number(self):
        toks = tokenize_py("abc 123", self.M)
        assert toks == [("abc", 0), ("123", 4)]  # byte-offset positions

    def test_classification_cascade(self):
        assert classify_token("abc") == "word"
        assert classify_token("123") == "number"
        assert classify_token("abc123") == "alphanum"
        assert classify_token("foo_bar") == "punctuation"
        assert classify_token(".") == "punctuation"

    def test_lowercased(self):
        assert tokenize_py("HELLO", self.M) == [("hello", 0)]


class TestBatchMatchesPy:
    @pytest.mark.parametrize("mode", ["tantivy_default", "standard_tokenizer"])
    def test_batch_equals_py(self, mode):
        texts = pd.Series(
            [
                "Hello World foo.bar foo_bar 3.14",
                "",
                "x" * 45 + " kept",
                "Ünïcode Wörds\tand\nlines",
                None,
                "the the the merge join",
            ]
        )
        batch = tokenize_batch(texts, mode)
        for idx, text in texts.items():
            got = [
                (r.term, r.pos)
                for r in batch[batch["idx"] == idx].itertuples()
            ]
            assert got == tokenize_py(text, mode), f"mismatch mode={mode} idx={idx}"


class TestCodeMode:
    """``code`` analyzer (EXTENSION, SURVEY.md §2 code-analyzer row):
    boundary preprocess + the normative tantivy_default pipeline."""

    M = "code"

    def test_camel_case(self):
        assert tokenize_py("parseHTTPResponse", self.M) == [
            ("parse", 0), ("http", 1), ("response", 2)]

    def test_acronym_then_word(self):
        assert tokenize_py("URLDecoder", self.M) == [("url", 0), ("decoder", 1)]

    def test_letter_digit_boundaries(self):
        assert tokenize_py("utf8Parser decode8Bit", self.M) == [
            ("utf", 0), ("8", 1), ("parser", 2),
            ("decode", 3), ("8", 4), ("bit", 5)]

    def test_snake_and_kebab_inherit_default_split(self):
        assert tokenize_py("snake_case kebab-case", self.M) == [
            ("snake", 0), ("case", 1), ("kebab", 2), ("case", 3)]

    def test_phrase_positions_adjacent_inside_identifier(self):
        # "http response" as a phrase must match inside parseHTTPResponse
        toks = tokenize_py("x parseHTTPResponse y", self.M)
        d = {t: p for t, p in toks}
        assert d["response"] == d["http"] + 1

    def test_long_token_filter_applies_after_split(self):
        # a 45-char camel identifier splits into short kept subtokens
        ident = "prefix" + "Aaaa" * 10  # 46 chars, all subtokens short
        toks = [t for t, _ in tokenize_py(ident, self.M)]
        assert toks == ["prefix"] + ["aaaa"] * 10

    def test_non_ascii_passthrough(self):
        assert tokenize_py("Ünïcode Wörds", self.M) == [("ünïcode", 0), ("wörds", 1)]

    def test_batch_and_postings_parity(self):
        from fugu_spark.tokenizer import postings_batch

        texts = pd.Series(
            [
                "parseHTTPResponse(utf8Parser, snake_case, X86_64)",
                "def build_index(docs): return BM25Scorer(k1=1.2)",
                None,
                "",
                "日本語withÜmlaut42 iOS9",
                "the the the mergeJoin merge_join",
            ]
        )
        batch = tokenize_batch(texts, self.M)
        for idx, text in texts.items():
            got = [(r.term, r.pos) for r in batch[batch["idx"] == idx].itertuples()]
            assert got == tokenize_py(text, self.M), f"idx={idx}"
        pb = postings_batch(texts, self.M)
        for idx, text in texts.items():
            want: dict[str, list[int]] = {}
            for t, p in tokenize_py(text, self.M):
                want.setdefault(t, []).append(p)
            sub = pb[pb["idx"] == idx]
            got = {r.term: list(r.positions) for r in sub.itertuples()}
            assert got == want, f"idx={idx}"
            if want:
                assert set(sub["tf"]) == {len(v) for v in want.values()} or all(
                    int(r.tf) == len(want[r.term]) for r in sub.itertuples()
                )
