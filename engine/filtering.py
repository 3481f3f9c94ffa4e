"""Training-data quality filtering: Gopher-style repetition metrics,
CCNet-style unigram-LM perplexity, and benchmark decontamination.

These extend the reference's text-analysis surface (SURVEY.md §2
extensions; the reference's nearest analog is metadata attach,
/root/reference/rust/src/text_loader.rs:33-52) with the three filters a
100-TB pretraining-data pipeline runs between extraction and indexing:

* ``gopher_batch`` — per-doc repetition signals from Gopher (Rae et al.
  2021, "Scaling Language Models", §A1.1): type/token counts, most
  frequent n-gram count for n=1..3, and the number of token positions
  covered by duplicated 5-grams.  All outputs are INTEGERS (counts, not
  ratios) so the driver hash never compares rounded floats; callers
  derive the fractions downstream.
* ``LMScorer`` / ``lm_perplexity_over`` — CCNet (Wenzek et al. 2019)
  scores documents with a language-model perplexity and keeps the
  low-perplexity head.  No pretrained KenLM exists in this container,
  so the LM is a unigram model trained ON THE CORPUS ITSELF in a first
  Ray pass (per-batch partial tf -> small groupby -> top-V vocabulary
  collected once), broadcast via ``ray.put``, and applied in a second
  vectorized pass.  Per-token cost is quantized to integer micro-bits
  BEFORE summing (``round((log2(T) - log2(cf)) * 1e6)``), making the
  per-doc sum exact integer arithmetic — the DuckDB oracle reproduces
  it bit-for-bit.
* ``decontaminate_over`` — test-set decontamination (GPT-3 appendix C
  style): any document sharing a 5-gram with the benchmark set is
  flagged.  The benchmark side is the SMALL side by construction, so it
  is collected once, deduplicated, and broadcast (``ray.put``) — the
  corpus side streams through ``map_batches`` with one vectorized
  membership probe per batch; no shuffle at any scale.

Scale notes (100 TB): gopher_batch is embarrassingly parallel (no
shuffle).  The LM train pass shuffles only (term, partial-count) pairs
pre-aggregated per batch, and the broadcast vocabulary is capped at
``top_v`` terms (out-of-vocabulary tokens score at the cf=1 floor).
Decontamination broadcasts the benchmark gram set — benchmarks are
MB-scale while the corpus is TB-scale, which is exactly the broadcast-
small-side shape; at extreme benchmark sizes the set degrades to a
Bloom filter (documented, not needed here).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from engine.config import pool_size
from engine.textstats import micro_units
from engine.tokenize import tokenize_batch

GOPHER_DUP_N = 5          # duplicated-n-gram window (Gopher uses 5..10)
LM_TOP_V = 65536          # broadcast vocabulary cap (OOV -> cf floor 1)
DECONTAM_N = 5            # benchmark overlap n-gram order


# ---------------------------------------------------------------------------
# shared n-gram machinery (vectorized; no per-token Python loops)
# ---------------------------------------------------------------------------

def _flatten(tok_lists: list[list[str]]):
    """tok_lists -> (flat object array, per-doc lens, per-doc offsets)."""
    lens = np.fromiter((len(t) for t in tok_lists), dtype=np.int64,
                       count=len(tok_lists))
    total = int(lens.sum())
    flat = np.empty(total, dtype=object)
    pos = 0
    for t in tok_lists:
        flat[pos:pos + len(t)] = t
        pos += len(t)
    offs = np.concatenate(([0], np.cumsum(lens)))
    return flat, lens, offs


def _chain_codes(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Combine two int code arrays into dense codes of the pair — the
    successive-pairing trick that keeps n-gram keys in bounded int64
    space (codes never exceed the number of DISTINCT grams seen)."""
    m = int(b.max()) + 1 if b.size else 1
    return pd.factorize(a.astype(np.int64) * m + b)[0]


def _gram_positions(lens: np.ndarray, offs: np.ndarray, n: int):
    """Start positions (into the flat array) of all within-doc n-grams,
    plus the per-doc n-gram counts."""
    n_grams = np.maximum(lens - (n - 1), 0)
    if not n_grams.sum():
        return np.empty(0, dtype=np.int64), n_grams
    w0 = np.concatenate(([0], np.cumsum(n_grams)))
    within = np.arange(int(n_grams.sum())) - np.repeat(w0[:-1], n_grams)
    starts = np.repeat(offs[:-1][n_grams > 0], n_grams[n_grams > 0]) \
        + within
    return starts, n_grams


def _ngram_codes(codes: np.ndarray, starts: np.ndarray, n: int) -> np.ndarray:
    """Dense codes of the n-gram at each start position (chained pairs)."""
    g = codes[starts]
    for k in range(1, n):
        g = _chain_codes(g, codes[starts + k])
    return g


def _per_doc_top_count(doc_of_gram: np.ndarray, gram_codes: np.ndarray,
                       n_docs: int, min_mult: int = 1,
                       covered: bool = False) -> np.ndarray:
    """Per-doc statistic over (doc, gram) counts: the max count
    (``covered=False``) or the number of positions covered by grams
    with count >= ``min_mult`` (``covered=True``).  One np.unique over
    the combined key; doc-major order makes reduceat per-doc exact."""
    out = np.zeros(n_docs, dtype=np.int64)
    if not gram_codes.size:
        return out
    m = int(gram_codes.max()) + 1
    key = doc_of_gram.astype(np.int64) * m + gram_codes
    uk, counts = np.unique(key, return_counts=True)
    udoc = uk // m
    # run boundaries per doc within the sorted unique keys
    first = np.concatenate(([0], np.flatnonzero(np.diff(udoc)) + 1))
    docs = udoc[first]
    if covered:
        vals = np.where(counts >= min_mult, counts, 0)
        out[docs] = np.add.reduceat(vals, first)
    else:
        out[docs] = np.maximum.reduceat(counts, first)
    return out


# ---------------------------------------------------------------------------
# Gopher repetition metrics
# ---------------------------------------------------------------------------

def gopher_batch(batch: pa.Table) -> pa.Table:
    """-> (doc_id, n_tokens, n_distinct, top1_count, top2_count,
    top3_count, dup5_positions, total_token_chars) — all int64.

    ``topN_count`` is the count of the doc's most frequent N-gram
    (0 when the doc has no N-gram); ``dup5_positions`` counts 5-gram
    start positions whose 5-gram occurs more than once in the doc —
    Gopher's duplicate-n-gram signal as a count instead of a char
    fraction, keeping the whole row integer-exact for the value hash.
    """
    ids = batch.column("doc_id").to_numpy()
    toks = tokenize_batch(batch.column("text").to_pylist())
    n_docs = len(toks)
    flat, lens, offs = _flatten(toks)
    codes = pd.factorize(flat)[0] if flat.size else \
        np.empty(0, dtype=np.int64)
    tok_chars = np.zeros(n_docs, dtype=np.int64)
    n_distinct = np.zeros(n_docs, dtype=np.int64)
    if flat.size:
        charlens = np.fromiter((len(t) for t in flat), dtype=np.int64,
                               count=flat.size)
        nz = lens > 0
        tok_chars[nz] = np.add.reduceat(charlens, offs[:-1][nz])
        doc_of_tok = np.repeat(np.arange(n_docs), lens)
        m = int(codes.max()) + 1
        uniq_dt = np.unique(doc_of_tok * m + codes)
        ud, cnt = np.unique(uniq_dt // m, return_counts=True)
        n_distinct[ud] = cnt

    tops = {}
    for n in (1, 2, 3):
        starts, n_grams = _gram_positions(lens, offs, n)
        g = _ngram_codes(codes, starts, n)
        doc_of_gram = np.repeat(np.arange(n_docs), n_grams)
        tops[n] = _per_doc_top_count(doc_of_gram, g, n_docs)
    starts5, n_grams5 = _gram_positions(lens, offs, GOPHER_DUP_N)
    g5 = _ngram_codes(codes, starts5, GOPHER_DUP_N)
    dup5 = _per_doc_top_count(np.repeat(np.arange(n_docs), n_grams5), g5,
                              n_docs, min_mult=2, covered=True)
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_tokens": pa.array(lens),
        "n_distinct": pa.array(n_distinct),
        "top1_count": pa.array(tops[1]),
        "top2_count": pa.array(tops[2]),
        "top3_count": pa.array(tops[3]),
        "dup5_positions": pa.array(dup5),
        "total_token_chars": pa.array(tok_chars),
    })


def gopher_over(docs) -> "ray.data.Dataset":
    return docs.map_batches(gopher_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# CCNet-style unigram-LM perplexity
# ---------------------------------------------------------------------------

def train_unigram_lm(docs, top_v: int = LM_TOP_V,
                     with_total: bool = False):
    """Pass 1: corpus unigram counts -> vocab Series (cf by term),
    optionally with the EXACT corpus token total in the same pass.

    Per-batch partial tf is the combiner (only (term, count) pairs
    shuffle); the groupby output is pruned per block to the top terms
    BEFORE collection, so at most ~V * n_blocks rows reach the driver
    (the same exact-prune argument as docops._topk_by: after the hash
    shuffle each term lives in exactly one block).  The total rides the
    shuffle as a sentinel "" key (the tokenizer never emits an empty
    token); its count is the corpus maximum, so the per-block prune
    always keeps it."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        toks = tokenize_batch(batch.column("text").to_pylist())
        flat, _, _ = _flatten(toks)
        if not flat.size:
            return pa.table({"term": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        vc = pd.Series(flat).value_counts()
        terms = vc.index.to_numpy(dtype=object)
        counts = vc.to_numpy().astype(np.int64)
        if with_total:
            terms = np.concatenate([terms, np.array([""], dtype=object)])
            counts = np.concatenate([counts, [int(flat.size)]])
        return pa.table({"term": pa.array(terms, pa.string()),
                         "c": pa.array(counts)})

    agg = docs.map_batches(partial, batch_format="pyarrow") \
        .groupby("term").aggregate(Sum("c", alias_name="cf"))

    def prune(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(
            ["cf", "term"], ascending=[False, True]).head(top_v + 1)
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = agg.map_batches(prune, batch_format="pyarrow").to_pandas()
    is_sent = parts["term"] == ""
    t_total = int(parts.loc[is_sent, "cf"].sum())
    vocab = parts[~is_sent].sort_values(
        ["cf", "term"], ascending=[False, True]).head(top_v)
    cf = pd.Series(vocab["cf"].to_numpy(np.int64),
                   index=vocab["term"].to_numpy(object))
    return (cf, t_total) if with_total else cf


class LMScorer:
    """Actor-pool scorer: broadcast (cf-by-term, T) resolved once per
    actor in __init__; per-batch work is one vectorized lookup + exact
    integer accumulation of micro-bits."""

    def __init__(self, cf_ref, t_total: int):
        cf = ray.get(cf_ref) if not isinstance(cf_ref, pd.Series) else cf_ref
        self.t_total = int(t_total)
        log2_t = np.log2(np.float64(self.t_total)) if self.t_total else 0.0
        # precompute integer micro-bits per vocab term (and OOV floor)
        bits = micro_units(log2_t - np.log2(cf.to_numpy(np.float64)))
        self.bits = pd.Series(bits, index=cf.index)
        self.oov_bits = int(micro_units(
            np.array([log2_t - np.log2(1.0)]))[0])

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        toks = tokenize_batch(batch.column("text").to_pylist())
        flat, lens, _ = _flatten(toks)
        n_docs = len(toks)
        bits_doc = np.zeros(n_docs, dtype=np.int64)
        if flat.size:
            per_tok = self.bits.reindex(flat).to_numpy(np.float64)
            per_tok = np.where(np.isnan(per_tok), self.oov_bits,
                               per_tok).astype(np.int64)
            doc_of_tok = np.repeat(np.arange(n_docs), lens)
            np.add.at(bits_doc, doc_of_tok, per_tok)
        keep = lens > 0
        return pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "n_tokens": pa.array(lens[keep]),
            "bits_micro": pa.array(bits_doc[keep]),
        })


def lm_perplexity_over(docs, top_v: int = LM_TOP_V) -> "ray.data.Dataset":
    """Two-pass CCNet shape: train-on-corpus unigram LM, broadcast,
    score.  ``bits_micro`` = sum over tokens of
    ``round((log2(T) - log2(cf)) * 1e6)`` — integer-exact; mean
    bits/token (and 2**(bits/n) perplexity) derive downstream."""
    cf, t_total = train_unigram_lm(docs, top_v, with_total=True)
    cf_ref = ray.put(cf)
    return docs.map_batches(LMScorer, batch_format="pyarrow",
                            fn_constructor_args=(cf_ref, t_total),
                            concurrency=pool_size())


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------

def _gram_strings(toks: list[list[str]], n: int):
    """All within-doc n-gram STRINGS (' '-joined) + per-doc counts.
    Strings (not hashes) so membership is collision-free and the DuckDB
    oracle compares the identical keys; the hashed variant is the
    documented fallback if benchmark grams ever outgrow broadcast."""
    flat, lens, offs = _flatten(toks)
    starts, n_grams = _gram_positions(lens, offs, n)
    if not starts.size:
        return np.empty(0, dtype=object), n_grams
    s = pd.Series(flat[starts])
    for k in range(1, n):
        s = s.str.cat(pd.Series(flat[starts + k]), sep=" ")
    return s.to_numpy(dtype=object), n_grams


def collect_benchmark_grams(bench_docs, n: int = DECONTAM_N) -> np.ndarray:
    """Distinct n-grams of the benchmark side (small by construction;
    per-batch dedup before the driver-side union)."""
    def f(batch: pa.Table) -> pa.Table:
        toks = tokenize_batch(batch.column("text").to_pylist())
        grams, _ = _gram_strings(toks, n)
        return pa.table({"g": pa.array(pd.unique(grams), pa.string())})

    parts = bench_docs.map_batches(f, batch_format="pyarrow").to_pandas()
    return pd.unique(parts["g"].to_numpy(dtype=object))


class DecontamScorer:
    """Probe each doc's n-grams against the broadcast benchmark set."""

    def __init__(self, grams_ref, n: int = DECONTAM_N):
        grams = ray.get(grams_ref) if not isinstance(grams_ref, np.ndarray) \
            else grams_ref
        self.index = pd.Index(grams)
        self.n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        toks = tokenize_batch(batch.column("text").to_pylist())
        grams, n_grams = _gram_strings(toks, self.n)
        n_docs = len(toks)
        hits = np.zeros(n_docs, dtype=np.int64)
        if grams.size:
            hit = self.index.get_indexer(grams) >= 0
            doc_of_gram = np.repeat(np.arange(n_docs), n_grams)
            np.add.at(hits, doc_of_gram, hit.astype(np.int64))
        keep = n_grams > 0
        return pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "n_grams": pa.array(n_grams[keep]),
            "n_overlap": pa.array(hits[keep]),
        })


def decontaminate_over(docs, bench_docs,
                       n: int = DECONTAM_N) -> "ray.data.Dataset":
    """Flag corpus docs sharing any n-gram with the benchmark set.
    Output: (doc_id, n_grams, n_overlap) for docs with >= 1 n-gram."""
    grams = collect_benchmark_grams(bench_docs, n)
    grams_ref = ray.put(grams)
    return docs.map_batches(DecontamScorer, batch_format="pyarrow",
                            fn_constructor_args=(grams_ref, n),
                            concurrency=pool_size())


# ---------------------------------------------------------------------------
# DSIR-style importance weights (hashed n-gram features)
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 4096       # hashed feature space (paper uses ~10k)
DSIR_TARGET_MOD = 7       # doc_id % 7 == 0 is the deterministic "target"


def _dsir_features(toks: list[list[str]]):
    """Unigram + bigram feature STRINGS per doc (paper's feature set);
    -> (grams object array, per-doc feature counts)."""
    g1, n1 = _gram_strings(toks, 1)
    g2, n2 = _gram_strings(toks, 2)
    # interleave per doc: all unigrams then all bigrams of each doc
    n_docs = len(toks)
    doc_of = np.concatenate([np.repeat(np.arange(n_docs), n1),
                             np.repeat(np.arange(n_docs), n2)])
    grams = np.concatenate([g1, g2]) if g1.size or g2.size else \
        np.empty(0, dtype=object)
    order = np.argsort(doc_of, kind="stable")
    return grams[order], n1 + n2


def dsir_bucket_counts(docs, target_mod: int = DSIR_TARGET_MOD,
                       n_buckets: int = DSIR_BUCKETS):
    """Pass 1: hashed-feature histograms for the target and raw splits.
    Per-batch partial bincounts emit at most 2*n_buckets rows each; one
    tiny groupby(key).sum collapses them — the shuffle payload is
    O(n_buckets * n_blocks), never O(corpus)."""
    from ray.data.aggregate import Sum
    from engine.tokenize import HASH_FNS

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        toks = tokenize_batch(batch.column("text").to_pylist())
        grams, n_feats = _dsir_features(toks)
        out_k, out_c = [], []
        if grams.size:
            buckets = (HASH_FNS["md5"](grams)
                       % np.uint64(n_buckets)).astype(np.int64)
            doc_of = np.repeat(ids, n_feats)
            is_tgt = (doc_of % target_mod == 0)
            for split, mask in ((0, is_tgt), (1, ~is_tgt)):
                h = np.bincount(buckets[mask], minlength=n_buckets)
                nz = np.flatnonzero(h)
                out_k.append(split * n_buckets + nz)
                out_c.append(h[nz])
        k = np.concatenate(out_k) if out_k else np.empty(0, np.int64)
        c = np.concatenate(out_c) if out_c else np.empty(0, np.int64)
        return pa.table({"key": pa.array(k, pa.int64()),
                         "c": pa.array(c.astype(np.int64))})

    agg = docs.map_batches(partial, batch_format="pyarrow") \
        .groupby("key").aggregate(Sum("c", alias_name="c")).to_pandas()
    tgt = np.zeros(n_buckets, dtype=np.int64)
    raw = np.zeros(n_buckets, dtype=np.int64)
    key = agg["key"].to_numpy(np.int64)
    cnt = agg["c"].to_numpy(np.int64)
    t_mask = key < n_buckets
    tgt[key[t_mask]] = cnt[t_mask]
    raw[key[~t_mask] - n_buckets] = cnt[~t_mask]
    return tgt, raw


def dsir_bits(tgt: np.ndarray, raw: np.ndarray) -> np.ndarray:
    """Per-bucket integer micro-log-ratio with Laplace smoothing:
    round((ln(ct+1) - ln(Tt+B) - ln(cr+1) + ln(Tr+B)) * 1e6) — the
    exact left-to-right float64 op order the DuckDB oracle uses."""
    b = tgt.size
    tt, tr = int(tgt.sum()), int(raw.sum())
    v = (np.log(tgt.astype(np.float64) + 1.0) - np.log(float(tt + b))
         - np.log(raw.astype(np.float64) + 1.0) + np.log(float(tr + b)))
    return micro_units(v)


class DSIRScorer:
    """Broadcast bits vector resolved once per actor; per-batch work is
    hash -> gather -> per-doc reduceat (integer-exact)."""

    def __init__(self, bits_ref, target_mod: int = DSIR_TARGET_MOD,
                 n_buckets: int = DSIR_BUCKETS):
        self.bits = ray.get(bits_ref) if not isinstance(bits_ref, np.ndarray) \
            else bits_ref
        self.target_mod = target_mod
        self.n_buckets = n_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        from engine.tokenize import HASH_FNS
        ids = batch.column("doc_id").to_numpy()
        keep_doc = ids % self.target_mod != 0
        toks = tokenize_batch(
            np.asarray(batch.column("text").to_pylist(),
                       dtype=object)[keep_doc].tolist())
        ids = ids[keep_doc]
        grams, n_feats = _dsir_features(toks)
        logw = np.zeros(len(toks), dtype=np.int64)
        if grams.size:
            buckets = (HASH_FNS["md5"](grams)
                       % np.uint64(self.n_buckets)).astype(np.int64)
            w = self.bits[buckets]
            nz = n_feats > 0
            offs = np.concatenate(([0], np.cumsum(n_feats)))
            logw[nz] = np.add.reduceat(w, offs[:-1][nz])
        keep = n_feats > 0
        return pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "n_feats": pa.array(n_feats[keep]),
            "logw_micro": pa.array(logw[keep]),
        })


def dsir_weights_over(docs, target_mod: int = DSIR_TARGET_MOD,
                      n_buckets: int = DSIR_BUCKETS) -> "ray.data.Dataset":
    """DSIR (Xie et al. 2023) importance weights: log w(x) = sum over
    hashed unigram+bigram features of the smoothed target/raw
    log-probability ratio.  Two passes: tiny histogram shuffle, then a
    broadcast-bits scoring pass over the raw split."""
    tgt, raw = dsir_bucket_counts(docs, target_mod, n_buckets)
    bits_ref = ray.put(dsir_bits(tgt, raw))
    return docs.map_batches(DSIRScorer, batch_format="pyarrow",
                            fn_constructor_args=(bits_ref, target_mod,
                                                 n_buckets),
                            concurrency=pool_size())
