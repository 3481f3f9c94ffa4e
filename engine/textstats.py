"""Text-analysis operators for training-data pipelines: language-ID,
quality scoring, token counting, document fingerprinting.

Extensions beyond the reference inventory (SURVEY.md §2 records them as
extensions; the reference's nearest analog is the metadata attach,
/root/reference/rust/src/text_loader.rs:33-52).  All are stateless
vectorized ``map_batches`` stages over a ``text`` column; the language
marker sets and hash parameters are module constants so every task sees
identical state with no broadcast needed.

Every SQL-expressible op here has a DuckDB oracle in __ray_entry__.py;
the fingerprint (rolling hash) is pytest-verified instead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from engine.tokenize import tokenize_batch, stable_hash64


def micro_units(x: np.ndarray) -> np.ndarray:
    """float -> int64 micro-units with HALF-AWAY-FROM-ZERO ties, matching
    DuckDB ``CAST(round(x * 1e6) AS BIGINT)`` bit-for-bit.

    Contract queries hash integer micro-units instead of rounded floats:
    np.round is half-even while DuckDB rounds half-away, so exact ties
    (e.g. 105/128 = 0.8203125 -> 820312.5) used to flip the 6th decimal
    between engine and oracle.  Integers also survive nondeterministic
    float-sum orders when the scaling happens per element BEFORE summing.
    """
    v = np.asarray(x, dtype=np.float64) * 1e6
    return np.trunc(v + np.copysign(0.5, v)).astype(np.int64)


# ---------------------------------------------------------------------------
# language-ID: marker-token voting (n-gram-free heuristic; SQL-expressible)
# ---------------------------------------------------------------------------

# fixed marker sets; scored by token hits, argmax wins, ties broken by
# alphabetical language code, all-zero -> 'unknown'
LANG_MARKERS: dict[str, frozenset[str]] = {
    "de": frozenset("der die das und ist nicht mit ein eine für".split()),
    "en": frozenset("the of and to a in is it that for".split()),
    "es": frozenset("el la los las y es un una para con".split()),
    "fr": frozenset("le la les et est un une pour dans que".split()),
}
# CJK presence is its own vote (any CJK token -> score per CJK token)
_LANG_ORDER = sorted(LANG_MARKERS) + ["ja"]


def _per_doc_isin_counts(tok_lists: list[list[str]],
                         vocab: frozenset[str]) -> np.ndarray:
    """Count tokens from ``vocab`` per doc — one np.isin over the
    concatenated token array + reduceat, no per-token Python loop."""
    lens = np.fromiter((len(t) for t in tok_lists), dtype=np.int64,
                       count=len(tok_lists))
    out = np.zeros(len(tok_lists), dtype=np.int64)
    if lens.sum() == 0:
        return out
    allt = np.concatenate([np.asarray(t, dtype=object)
                           for t in tok_lists if t])
    hits = np.isin(allt, np.asarray(sorted(vocab), dtype=object))
    nz = lens > 0
    offs = np.concatenate(([0], np.cumsum(lens[nz])[:-1]))
    out[nz] = np.add.reduceat(hits.astype(np.int64), offs)
    return out


def langid_batch(batch: pa.Table) -> pa.Table:
    """-> adds pred_lang:string.  Marker scoring is one np.isin per
    language over the concatenated token array; the CJK vote is an RE2
    char-class count (CJK chars tokenize to unigrams, so tokens whose
    first char is CJK == CJK chars in the lowercased text)."""
    import pyarrow.compute as pc
    texts = batch.column("text").to_pylist()
    toks = tokenize_batch(texts)
    score_mat = np.stack(
        [_per_doc_isin_counts(toks, LANG_MARKERS[l])
         for l in sorted(LANG_MARKERS)], axis=1)
    lower = pc.utf8_lower(pa.array(texts, pa.large_string()))
    cjk = pc.count_substring_regex(
        lower, "[぀-ヿ㐀-䶿一-鿿]").to_numpy(zero_copy_only=False)
    score_mat = np.concatenate([score_mat, cjk[:, None]], axis=1)
    best = score_mat.max(axis=1)
    pred_idx = score_mat.argmax(axis=1)  # first max = alphabetical min
    langs = np.asarray(_LANG_ORDER, dtype=object)
    preds = np.where(best == 0, "unknown", langs[pred_idx])
    return batch.append_column(
        "pred_lang", pa.array(preds.tolist(), pa.string()))


# ---------------------------------------------------------------------------
# quality scoring: length / punctuation / stopword ratios
# ---------------------------------------------------------------------------

STOPSET = LANG_MARKERS["en"]


def quality_batch(batch: pa.Table) -> pa.Table:
    """-> (.. n_tokens, stopword_ratio_ppm, alnum_ratio_ppm).

    Ratios are emitted as INTEGER parts-per-million (micro_units) so the
    driver's value hash never compares rounded floats; the alnum count is
    an RE2 ``[\\pL\\pN]`` match count (pyarrow C++ kernel) — the exact
    regex family the DuckDB oracle uses."""
    import pyarrow.compute as pc
    texts = batch.column("text").to_pylist()
    toks = tokenize_batch(texts)
    n_tokens = np.fromiter((len(t) for t in toks), dtype=np.int64,
                           count=len(toks))
    stop = _per_doc_isin_counts(toks, STOPSET).astype(np.float64)
    text_arr = pa.array(texts, pa.large_string())
    n_chars = pc.utf8_length(text_arr).to_numpy(zero_copy_only=False)
    alnum = pc.count_substring_regex(
        text_arr, r"[\pL\pN]").to_numpy(zero_copy_only=False).astype(np.float64)
    denom_t = np.maximum(n_tokens, 1).astype(np.float64)
    denom_c = np.maximum(n_chars, 1).astype(np.float64)
    out = batch.append_column("n_tokens", pa.array(n_tokens))
    out = out.append_column("stopword_ratio_ppm",
                            pa.array(micro_units(stop / denom_t)))
    out = out.append_column("alnum_ratio_ppm",
                            pa.array(micro_units(alnum / denom_c)))
    return out


# ---------------------------------------------------------------------------
# token counting: whitespace and BPE-ish regex counts
# ---------------------------------------------------------------------------

import re

_WS_SPLIT = re.compile(r"\s+")
# GPT-2-style pre-tokenizer shape: optional space + word / number / other
_BPEISH = re.compile(r"[^\W\d_]+|\d+|[^\w\s]+", re.UNICODE)


def token_count_batch(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    ws = np.array([len(_WS_SPLIT.split(t.strip())) if t.strip() else 0
                   for t in texts], dtype=np.int64)
    bpe = np.array([len(_BPEISH.findall(t)) for t in texts], dtype=np.int64)
    out = batch.append_column("ws_tokens", pa.array(ws))
    out = out.append_column("bpeish_tokens", pa.array(bpe))
    return out


# ---------------------------------------------------------------------------
# document fingerprinting: rolling polynomial hash + winnowing minimum
# ---------------------------------------------------------------------------

_FP_BASE = np.uint64(1_000_003)
_FP_WINDOW = 8


def _rolling_hashes(token_hashes: np.ndarray, w: int = _FP_WINDOW) -> np.ndarray:
    """Polynomial rolling hash of every w-token window (vectorized)."""
    n = token_hashes.size
    if n == 0:
        return np.array([], dtype=np.uint64)
    if n < w:
        w = n
    powers = _FP_BASE ** np.arange(w, dtype=np.uint64)  # wraps mod 2^64
    # windows via stride trick, then matmul-free weighted sum
    idx = np.arange(n - w + 1)[:, None] + np.arange(w)[None, :]
    return (token_hashes[idx] * powers[None, :]).sum(axis=1, dtype=np.uint64)


def fingerprint_batch(batch: pa.Table, hash_fn: str = "sip") -> pa.Table:
    """-> adds fingerprint:int64 — the minimum rolling-window hash
    (winnowing-style document sketch; equal fingerprints flag likely
    shared passages).  ``hash_fn="md5"`` = oracle-parity mode: the
    token hash and the mod-2^64 polynomial are reproduced in DuckDB
    (md5_number_lower + HUGEINT split-multiply)."""
    from engine.tokenize import HASH_FNS
    hasher = HASH_FNS[hash_fn]
    toks = tokenize_batch(batch.column("text").to_pylist())
    lens = np.fromiter((len(t) for t in toks), dtype=np.int64,
                       count=len(toks))
    fps = np.zeros(len(toks), dtype=np.int64)
    flat = [t for ts in toks for t in ts]
    if flat:
        # ONE vectorized hash call for the whole batch, then all
        # full-width windows of every doc scored together: window
        # starts = per-doc offset + within-doc arange, min per doc via
        # reduceat over the window-count runs.  Bit-identical to the
        # per-doc loop (same uint64 arithmetic, same mask-after-min).
        h_all = hasher(np.asarray(flat, dtype=object))
        offs = np.concatenate(([0], np.cumsum(lens)))
        mask = np.uint64(0x7FFFFFFFFFFFFFFF)
        w = _FP_WINDOW
        big = np.flatnonzero(lens >= w)
        if big.size:
            n_win = lens[big] - w + 1
            w0 = np.concatenate(([0], np.cumsum(n_win)))
            within = np.arange(int(n_win.sum())) - np.repeat(w0[:-1], n_win)
            starts = np.repeat(offs[big], n_win) + within
            powers = _FP_BASE ** np.arange(w, dtype=np.uint64)
            wh = (h_all[starts[:, None] + np.arange(w)]
                  * powers[None, :]).sum(axis=1, dtype=np.uint64)
            fps[big] = (np.minimum.reduceat(wh, w0[:-1])
                        & mask).astype(np.int64)
        for i in np.flatnonzero((lens > 0) & (lens < w)):  # rare shorts
            h = h_all[offs[i]:offs[i + 1]]
            fps[i] = int(_rolling_hashes(h).min() & mask)
    return batch.append_column("fingerprint", pa.array(fps, pa.int64()))
