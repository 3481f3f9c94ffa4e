"""Tests for engine/filtering.py: Gopher repetition metrics, unigram-LM
perplexity, and benchmark decontamination — each vectorized op checked
against an independent naive Python implementation."""

import collections

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray

from engine.filtering import (DECONTAM_N, GOPHER_DUP_N, DecontamScorer,
                              LMScorer, collect_benchmark_grams,
                              decontaminate_over, gopher_batch,
                              lm_perplexity_over, train_unigram_lm)
from engine.textstats import micro_units
from engine.tokenize import tokenize


def _docs_table(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def _naive_gopher(text):
    toks = tokenize(text)
    out = {"n_tokens": len(toks), "n_distinct": len(set(toks)),
           "total_token_chars": sum(len(t) for t in toks)}
    for n in (1, 2, 3):
        grams = [tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)]
        c = collections.Counter(grams)
        out[f"top{n}_count"] = max(c.values()) if c else 0
    g5 = [tuple(toks[i:i + GOPHER_DUP_N])
          for i in range(len(toks) - GOPHER_DUP_N + 1)]
    c5 = collections.Counter(g5)
    out["dup5_positions"] = sum(v for v in c5.values() if v >= 2)
    return out


def test_gopher_vs_bruteforce():
    rng = np.random.default_rng(7)
    vocab = ["alpha", "beta", "gamma", "delta", "x1", "y2"]
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(0, 40))))
             for _ in range(50)]
    texts += ["", "a a a a a a a a", "one two three four five one two "
              "three four five one two three four five"]
    got = gopher_batch(_docs_table(texts)).to_pandas()
    assert len(got) == len(texts)
    for i, t in enumerate(texts):
        want = _naive_gopher(t)
        row = got.iloc[i]
        for k, v in want.items():
            assert row[k] == v, (i, k, row[k], v)


def test_gopher_dup5_counts_all_positions():
    # "a b c d e" x3 -> every 5-gram window that repeats is counted
    text = " ".join(["a b c d e"] * 3)
    row = gopher_batch(_docs_table([text])).to_pandas().iloc[0]
    assert row["n_tokens"] == 15
    assert row["top1_count"] == 3
    # 11 windows of 5; the 5-gram starting at each position mod 5
    # repeats (periodic text) -> all 11 positions are covered
    assert row["dup5_positions"] == 11


def _naive_bits(toks, cf, t_total):
    total = 0
    log2_t = np.log2(np.float64(t_total))
    for t in toks:
        c = cf.get(t, 1)
        total += int(micro_units(
            np.array([log2_t - np.log2(np.float64(c))]))[0])
    return total


def test_lm_scorer_exact_bits():
    texts = ["the cat sat", "the the dog", "cat", ""]
    all_toks = [t for x in texts for t in tokenize(x)]
    cf = pd.Series(collections.Counter(all_toks)).sort_values(
        ascending=False)
    t_total = len(all_toks)
    scorer = LMScorer(cf, t_total)
    out = scorer(_docs_table(texts)).to_pandas()
    # empty doc dropped
    assert list(out["doc_id"]) == [0, 1, 2]
    for _, row in out.iterrows():
        toks = tokenize(texts[int(row["doc_id"])])
        assert row["n_tokens"] == len(toks)
        assert row["bits_micro"] == _naive_bits(
            toks, cf.to_dict(), t_total)


def test_lm_scorer_oov_floor():
    cf = pd.Series({"the": 5})          # vocabulary of one term
    scorer = LMScorer(cf, 10)
    out = scorer(_docs_table(["the zebra"])).to_pandas()
    want = _naive_bits(["the", "zebra"], {"the": 5}, 10)
    assert out["bits_micro"].iloc[0] == want
    assert scorer.oov_bits == int(micro_units(
        np.array([np.log2(10.0)]))[0])


def test_lm_perplexity_over_ray():
    texts = ["spark ray data " * 5, "ray ray ray", "unique words here"]
    ds = ray.data.from_arrow(_docs_table(texts))
    out = lm_perplexity_over(ds).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    all_toks = [t for x in texts for t in tokenize(x)]
    cf = dict(collections.Counter(all_toks))
    for _, row in out.iterrows():
        toks = tokenize(texts[int(row["doc_id"])])
        assert row["bits_micro"] == _naive_bits(toks, cf, len(all_toks))
    # repetitive doc scores fewer bits/token than the rare-word doc
    bpt = out["bits_micro"] / out["n_tokens"]
    assert bpt.iloc[1] < bpt.iloc[2]


def test_train_unigram_lm_top_v_cap():
    texts = ["a a a b b c", "a b c d e f"]
    ds = ray.data.from_arrow(_docs_table(texts))
    cf = train_unigram_lm(ds, top_v=3)
    assert len(cf) == 3
    assert cf.index[0] == "a" and cf.iloc[0] == 4
    # ties broken by term asc after cf desc
    assert set(cf.index) == {"a", "b", "c"}


def test_decontam_scorer():
    bench_texts = ["one two three four five six"]
    corpus = ["zero one two three four five seven",   # 1 overlapping 5-gram
              "no overlap at all in this doc really",
              "one two three four"]                   # < 5 tokens: no grams
    bench_ds = ray.data.from_arrow(_docs_table(bench_texts))
    grams = collect_benchmark_grams(bench_ds, DECONTAM_N)
    assert len(grams) == 2  # 6 tokens -> 2 distinct 5-grams
    scorer = DecontamScorer(grams, DECONTAM_N)
    out = scorer(_docs_table(corpus)).to_pandas()
    assert list(out["doc_id"]) == [0, 1]              # doc 2 dropped
    assert out.loc[out.doc_id == 0, "n_overlap"].iloc[0] == 1
    assert out.loc[out.doc_id == 0, "n_grams"].iloc[0] == 3
    assert out.loc[out.doc_id == 1, "n_overlap"].iloc[0] == 0


def test_decontaminate_over_ray():
    texts = ["shared secret phrase lives here today"] * 2 + \
            ["totally different content in this one"]
    docs = ray.data.from_arrow(_docs_table(texts[1:]))  # ids 0,1 shifted
    bench = ray.data.from_arrow(_docs_table(texts[:1]))
    out = decontaminate_over(docs, bench).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert out["n_overlap"].iloc[0] == out["n_grams"].iloc[0] > 0
    assert out["n_overlap"].iloc[1] == 0


def test_sentence_guard_filters():
    from engine.chunk import sentence_sql_guard
    t = _docs_table(["plain words only", "has a. sentence boundary",
                     "", "x" * 300])
    kept = sentence_sql_guard(200)(t).to_pandas()
    assert list(kept["doc_id"]) == [0]


def test_dsir_weights():
    from engine.filtering import (DSIR_TARGET_MOD, dsir_bits,
                                  dsir_bucket_counts, dsir_weights_over)
    # docs 0 and 7 are "target" (mod 7); raw docs resembling the target
    # must get a higher weight than dissimilar ones
    texts = ["data processing pipeline runs fast",      # 0: target
             "data processing pipeline runs fast",      # 1: raw, = target
             "totally unrelated gibberish words here",  # 2: raw
             "data processing pipeline runs fast",      # 3: raw, = target
             "x", "y", "z",                             # 4-6: raw
             "data processing pipeline runs fast"]      # 7: target
    ds = ray.data.from_arrow(_docs_table(texts))
    tgt, raw = dsir_bucket_counts(ds)
    assert tgt.sum() == 2 * 9   # 2 target docs x (5 uni + 4 bi)
    bits = dsir_bits(tgt, raw)
    assert bits.dtype == np.int64
    out = dsir_weights_over(ds).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert list(out["doc_id"]) == [1, 2, 3, 4, 5, 6]   # raw split only
    w = dict(zip(out["doc_id"], out["logw_micro"]))
    assert w[1] == w[3] > w[2]
    # independent recomputation for one doc
    from engine.tokenize import tokenize, HASH_FNS
    toks = tokenize(texts[2])
    grams = toks + [" ".join(p) for p in zip(toks, toks[1:])]
    buckets = HASH_FNS["md5"](np.array(grams, dtype=object)) % 4096
    assert w[2] == int(bits[buckets.astype(np.int64)].sum())
