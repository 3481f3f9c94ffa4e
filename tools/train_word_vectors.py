"""Train a real word-vector matrix for WeightsEmbedder — pure numpy.

The reference's embedders load learned weights from disk
(/root/reference/rust/src/embeddings/embed/embedder.rs:52-124
``from_pretrained``).  No torch/onnxruntime/weights exist in this
container, so this script TRAINS a matrix offline with the classic
count-based pipeline (Levy & Goldberg 2014: PPMI + truncated SVD
factorization of the word co-occurrence matrix ≈ skip-gram with
negative sampling) over a parquet document corpus, producing the
``.npz`` the ``WeightsEmbedder`` actor pool loads once per actor.

Rows are HASHED vocab buckets (token -> stable_hash64 % n_buckets),
matching WeightsEmbedder._encode's lookup exactly, so the trained
matrix drops into the existing slot unchanged.

Usage:
    python tools/train_word_vectors.py [docs.parquet] [out.npz] \
        [n_buckets] [dim]

Defaults train on /root/testdata/sf0.001/documents.parquet into
engine/data/word_vectors.npz (1024 buckets x 64 dims, ~256 KB —
small enough to check in).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow.parquet as pq

from engine.tokenize import stable_hash64, tokenize_batch

WINDOW = 5


def bucket_sequences(texts: list[str], n_buckets: int) -> list[np.ndarray]:
    """Token streams -> hashed-bucket id streams (WeightsEmbedder's
    row mapping: stable_hash64(token) % n_buckets)."""
    seqs = []
    for toks in tokenize_batch(texts):
        if not toks:
            seqs.append(np.empty(0, dtype=np.int64))
            continue
        h = stable_hash64(np.asarray(toks, dtype=object))
        seqs.append((h % np.uint64(n_buckets)).astype(np.int64))
    return seqs


def cooccurrence(seqs: list[np.ndarray], n_buckets: int,
                 window: int = WINDOW) -> np.ndarray:
    """Symmetric windowed co-occurrence counts, fully vectorized:
    one np.add.at per (offset, doc-batch) — no per-token Python."""
    C = np.zeros((n_buckets, n_buckets), dtype=np.float64)
    for off in range(1, window + 1):
        lefts, rights = [], []
        for s in seqs:
            if s.size > off:
                lefts.append(s[:-off])
                rights.append(s[off:])
        if not lefts:
            continue
        a = np.concatenate(lefts)
        b = np.concatenate(rights)
        np.add.at(C, (a, b), 1.0)
        np.add.at(C, (b, a), 1.0)
    return C


def ppmi(C: np.ndarray) -> np.ndarray:
    """Positive pointwise mutual information of the count matrix."""
    total = C.sum()
    if total == 0:
        return C
    row = C.sum(axis=1, keepdims=True)
    col = C.sum(axis=0, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        pmi = np.log((C * total) / (row @ col))
    pmi[~np.isfinite(pmi)] = 0.0
    return np.maximum(pmi, 0.0)


def train(texts: list[str], n_buckets: int = 1024,
          dim: int = 64) -> np.ndarray:
    seqs = bucket_sequences(texts, n_buckets)
    M = ppmi(cooccurrence(seqs, n_buckets))
    # truncated SVD; U * sqrt(S) is the standard symmetric embedding.
    # The TOP component is dropped ("all-but-the-top", Mu et al. 2018):
    # it encodes the common-word direction and makes every document
    # vector point the same way (measured mean pairwise cosine 0.87 on
    # the fixture corpus with it, ~0.5 without).
    U, S, _ = np.linalg.svd(M, full_matrices=False)
    emb = U[:, 1:dim + 1] * np.sqrt(S[1:dim + 1])[None, :]
    return emb.astype(np.float32)


def main():
    docs = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/testdata/sf0.001/documents.parquet"
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "engine", "data", "word_vectors.npz")
    n_buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    dim = int(sys.argv[4]) if len(sys.argv) > 4 else 64
    texts = pq.read_table(docs, columns=["text"]).column("text").to_pylist()
    emb = train(texts, n_buckets, dim)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(out, embedding=emb)
    print(f"trained {emb.shape} on {len(texts)} docs -> {out} "
          f"({os.path.getsize(out)} bytes)")


if __name__ == "__main__":
    main()
