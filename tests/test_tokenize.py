"""Tokenizer golden cases (FIXTURES.md §3) + counting + hashing."""

import numpy as np
import pandas as pd
import pytest

from engine.tokenize import (tokenize, count_terms, stable_hash64,
                             doc_ids_from_urls)

GOLDEN = [
    ("The quick brown Fox.", ["the", "quick", "brown", "fox"]),
    ("state-of-the-art", ["state", "of", "the", "art"]),
    ("don't", ["don", "t"]),
    ("Müller", ["müller"]),
    ("42km in 3 days", ["42km", "in", "3", "days"]),
    ("こんにちは世界", ["こ", "ん", "に", "ち", "は", "世", "界"]),
    ("abcこんde 12", ["abc", "こ", "ん", "de", "12"]),
    ("foo_bar", ["foo", "bar"]),
    ("", []),
    ("   \n\t ", []),
    ("A&B **bold** [x](y)", ["a", "b", "bold", "x", "y"]),
]


@pytest.mark.parametrize("text,expected", GOLDEN)
def test_golden(text, expected):
    assert tokenize(text) == expected


def test_cjk_simple_mode():
    # SQL-parity mode keeps CJK runs whole
    assert tokenize("abcこんにちはdef", cjk_unigrams=False) == ["abcこんにちはdef"]


def test_count_terms():
    df = count_terms(["the cat the hat", "cat dog"], np.array([10, 20]))
    by = {(r.doc_id, r.term): (r.tf, r.doclen) for r in df.itertuples()}
    assert by[(10, "the")] == (2, 4)
    assert by[(10, "cat")] == (1, 4)
    assert by[(20, "dog")] == (1, 2)
    assert by[(20, "cat")] == (1, 2)


def test_count_terms_empty():
    df = count_terms([], np.array([], dtype=np.int64))
    assert len(df) == 0
    df = count_terms(["", "..."], np.array([1, 2]))
    assert len(df) == 0


def test_stable_hash_deterministic():
    a = stable_hash64(["foo", "bar", "foo"])
    assert a[0] == a[2] != a[1]
    # must be stable across calls and identical to a fresh pandas hash
    b = pd.util.hash_array(np.array(["foo"], dtype=object), categorize=False)
    assert a[0] == b[0]


def test_doc_ids_positive_int64():
    ids = doc_ids_from_urls([f"https://x/{i}" for i in range(1000)])
    assert ids.dtype == np.int64
    assert (ids >= 0).all()
    assert len(np.unique(ids)) == 1000
