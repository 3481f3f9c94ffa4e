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


def _is_cjk(tok: str) -> bool:
    c = tok[0]
    return ("぀" <= c <= "ヿ") or ("㐀" <= c <= "鿿")


def langid_batch(batch: pa.Table) -> pa.Table:
    """-> adds pred_lang:string. Vectorized per batch over token lists."""
    toks = tokenize_batch(batch.column("text").to_pylist())
    preds = []
    for ts in toks:
        scores = {lang: 0 for lang in _LANG_ORDER}
        for t in ts:
            for lang, markers in LANG_MARKERS.items():
                if t in markers:
                    scores[lang] += 1
            if _is_cjk(t):
                scores["ja"] += 1
        best = max(scores.values())
        pred = "unknown" if best == 0 else min(
            l for l, s in scores.items() if s == best)
        preds.append(pred)
    return batch.append_column("pred_lang", pa.array(preds, pa.string()))


# ---------------------------------------------------------------------------
# quality scoring: length / punctuation / stopword ratios
# ---------------------------------------------------------------------------

STOPSET = LANG_MARKERS["en"]


def quality_batch(batch: pa.Table) -> pa.Table:
    """-> (.. n_tokens, stopword_ratio, alnum_ratio) rounded to 6 dp so
    the engine and the SQL oracle agree bit-for-bit after rounding."""
    texts = batch.column("text").to_pylist()
    toks = tokenize_batch(texts)
    n_tokens = np.array([len(t) for t in toks], dtype=np.int64)
    stop = np.array([sum(1 for x in t if x in STOPSET) for t in toks],
                    dtype=np.float64)
    n_chars = np.array([len(t) for t in texts], dtype=np.int64)
    alnum = np.array([sum(1 for ch in t if ch.isalnum()) for t in texts],
                     dtype=np.float64)
    denom_t = np.maximum(n_tokens, 1).astype(np.float64)
    denom_c = np.maximum(n_chars, 1).astype(np.float64)
    out = batch.append_column("n_tokens", pa.array(n_tokens))
    out = out.append_column("stopword_ratio",
                            pa.array(np.round(stop / denom_t, 6)))
    out = out.append_column("alnum_ratio",
                            pa.array(np.round(alnum / denom_c, 6)))
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


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """-> adds fingerprint:int64 — the minimum rolling-window hash
    (winnowing-style document sketch; equal fingerprints flag likely
    shared passages)."""
    toks = tokenize_batch(batch.column("text").to_pylist())
    fps = []
    for ts in toks:
        if not ts:
            fps.append(0)
            continue
        h = stable_hash64(np.asarray(ts, dtype=object))
        fps.append(int(_rolling_hashes(h).min() & np.uint64(0x7FFFFFFFFFFFFFFF)))
    return batch.append_column("fingerprint", pa.array(fps, pa.int64()))
