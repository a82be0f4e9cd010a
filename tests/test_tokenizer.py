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
