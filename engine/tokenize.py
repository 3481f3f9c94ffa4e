"""Unicode analyzer + term-frequency counting.

Reference analog: the tokenizer-encode step of the embedding path
(/root/reference/rust/src/embeddings/utils.rs:6-33,
/root/reference/rust/src/embeddings/local/bert.rs:114-127) — there a HF
WordPiece vocab, here a closed-form Unicode analyzer (FIXTURES.md §3):

  * lowercase (str.lower — simple case mapping)
  * token = maximal run of Unicode letters/digits (underscore excluded)
  * CJK characters (Han / Hiragana / Katakana) are emitted as unigram
    tokens, matching the DuckDB/RE2 pattern
    ``[\\p{Han}\\p{Hiragana}\\p{Katakana}]|([\\p{N}]|[^\\P{L}\\p{Han}\\p{Hiragana}\\p{Katakana}])+``
  * no stopword removal, no stemming (BM25 handles stopwords via idf;
    skew is handled in the shuffle, SURVEY.md §4)

All batch entry points are vectorized where the work allows: the regex
scan is per-document (C-level ``findall``), counting is pandas C groupby.
"""

from __future__ import annotations

import re
from typing import Iterable

import numpy as np
import pandas as pd

# Letters+digits runs.  [^\W_] == \w minus underscore; with re.UNICODE this
# is "Unicode alphanumeric", aligning with RE2 [\p{L}\p{N}] on the
# character classes the fixtures exercise.
_WORD_RE = re.compile(r"[^\W_]+", re.UNICODE)

# CJK ranges emitted as unigrams: Hiragana, Katakana (+ phonetic ext),
# CJK Unified Ideographs (+ ext A).  Mirrors RE2 \p{Hiragana}\p{Katakana}\p{Han}
# on the BMP subset the fixture generator uses.
_CJK_RE = re.compile(
    "([぀-ゟ゠-ヿㇰ-ㇿ㐀-䶿一-鿿])"
)


def tokenize(text: str, cjk_unigrams: bool = True) -> list[str]:
    """Analyze one document into its token list (FIXTURES.md §3 goldens)."""
    lower = text.lower()
    if not cjk_unigrams or lower.isascii():
        # ASCII fast path (most web docs): no CJK runs possible
        return _WORD_RE.findall(lower)
    out: list[str] = []
    for run in _WORD_RE.findall(lower):
        if cjk_unigrams and _CJK_RE.search(run):
            # split the run so each CJK char is its own token while
            # non-CJK subruns stay intact: "abcこんde" -> abc こ ん de
            for piece in _CJK_RE.split(run):
                if piece:
                    out.append(piece)
        else:
            out.append(run)
    return out


def tokenize_batch(texts: Iterable[str], cjk_unigrams: bool = True) -> list[list[str]]:
    return [tokenize(t, cjk_unigrams) for t in texts]


def stable_hash64(values: np.ndarray | list) -> np.ndarray:
    """Deterministic 64-bit hash of a string array.

    Uses pandas' SipHash-based ``hash_array`` with its fixed default key —
    stable across processes and Python hash randomization (unlike builtin
    ``hash``), vectorized in C.  Used for doc_id assignment
    (hash64(url)), term->part routing, and salts; determinism at any
    parallelism is a north-rule requirement (SURVEY.md §7.5).
    """
    arr = np.asarray(values, dtype=object)
    return pd.util.hash_array(arr, categorize=False)


def md5_hash64(values: np.ndarray | list) -> np.ndarray:
    """64-bit string hash equal to DuckDB's ``md5_number_lower``:
    little-endian uint64 of md5-digest bytes 8..16.

    Slower than stable_hash64 (one hashlib call per string) but exactly
    reproducible in ANSI-ish SQL — the hash mode the contract oracles
    use so MinHash/SimHash/fingerprint/hashing-embedder entries get a
    REAL DuckDB check instead of a rows-only one.  The engine default
    stays SipHash (vectorized); both flow through identical downstream
    code.
    """
    import hashlib
    return np.fromiter(
        (int.from_bytes(hashlib.md5(str(s).encode("utf-8")).digest()[8:],
                        "little") for s in values),
        dtype=np.uint64, count=len(values))


HASH_FNS = {"sip": stable_hash64, "md5": md5_hash64}


def doc_ids_from_urls(urls: np.ndarray | list) -> np.ndarray:
    """doc_id = hash64(url) masked to int64-positive (Arrow/DuckDB-safe).

    Deterministic dense-enumeration-free id assignment (SURVEY.md §7.4):
    ids don't depend on task order or partitioning.  63-bit space; at
    10^12 docs the collision expectation is ~2.7% for a full corpus —
    ``EngineConfig(wide_doc_ids=True)`` runs the collision-resolution
    pre-pass (engine/build.py resolve_id_collisions: detect shared ids,
    salted-rehash remap broadcast into tokenize) so distinct urls always
    index under distinct ids.
    """
    return (stable_hash64(urls) & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)


def count_terms(
    texts: Iterable[str],
    doc_ids: np.ndarray,
    cjk_unigrams: bool = True,
    positions: bool = False,
):
    """Per-(doc, term) tf for a batch -> DataFrame(doc_id, term, tf, doclen).

    The in-batch combiner (reference analog: SPLADE's per-doc max-pool
    reduce, /root/reference/rust/src/embeddings/local/bert.rs:386-388 —
    here the reduce is tf counting).  Counting is one pandas C groupby
    over the exploded token array, not a per-row Python Counter loop.

    ``positions=True`` returns ``(df, pos_flat)`` where ``pos_flat``
    holds the ascending within-doc token positions of every occurrence,
    concatenated in the DataFrame's row order (row i owns the next
    ``tf[i]`` values) — the positional-index build payload.  The rows
    come out in the SAME order as the default path (ascending
    (batch-row, first-seen-term-code) key): the stable sort groups the
    identical keys np.unique would emit, so enabling positions never
    changes posting bytes.
    """
    tok_lists = tokenize_batch(texts, cjk_unigrams)
    lens = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=len(tok_lists))
    if lens.sum() == 0:
        df = pd.DataFrame(
            {"doc_id": np.array([], np.int64), "term": np.array([], object),
             "tf": np.array([], np.int32), "doclen": np.array([], np.int32)}
        )
        return (df, np.array([], np.int32)) if positions else df
    all_tokens = np.concatenate([np.asarray(t, dtype=object) for t in tok_lists if t])
    # integer-key counting: factorize terms once (C), then one
    # np.unique over (doc position, term code) int64 keys — ~3x faster
    # than a pandas object groupby on the same data
    codes, uniq = pd.factorize(all_tokens, sort=False)
    doc_pos = np.repeat(np.arange(len(tok_lists), dtype=np.int64), lens)
    key = doc_pos * np.int64(uniq.size) + codes
    pos_flat = None
    if positions:
        # stable argsort groups identical keys while keeping token
        # order inside each (doc, term) group — i.e. ascending
        # within-doc positions, exactly what the codec requires
        order = np.argsort(key, kind="stable")
        ks = key[order]
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        uk = ks[starts]
        counts = np.diff(np.concatenate((starts, [ks.size])))
        tok_pos = (np.arange(doc_pos.size, dtype=np.int64)
                   - np.repeat(np.concatenate(([0], np.cumsum(lens)[:-1])),
                               lens))
        pos_flat = tok_pos[order].astype(np.int32)
    else:
        uk, counts = np.unique(key, return_counts=True)
    out_pos = uk // np.int64(uniq.size)
    out_code = uk % np.int64(uniq.size)
    ids_arr = np.asarray(doc_ids, dtype=np.int64)
    df = pd.DataFrame({
        "doc_id": ids_arr[out_pos],
        "term": np.asarray(uniq, dtype=object)[out_code],
        "tf": counts.astype(np.int32),
        "doclen": lens[out_pos].astype(np.int32),
    })
    return (df, pos_flat) if positions else df
