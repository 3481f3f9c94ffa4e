"""Semantic chunkers: the reference's encoder-driven A7/A8 stages.

Reference semantics reimplemented over the deterministic hashing
embedder (engine/embed.py — a learned encoder drops into the same
actor slot):

* ``StatisticalChunker`` (/root/reference/rust/src/chunkers/statistical.rs:43-384):
  split into sentences, embed, compare each sentence against the rolling
  context of the current chunk (windowed cosine, :206-262), split where
  similarity drops below a threshold, re-pack small runs to a token-count
  band (:343-383).  The reference binary-searches the threshold to hit a
  target chunk-size band (:264-332); we pin a fixed threshold +
  percentile fallback — deterministic and test-stable.

* ``CumulativeChunker`` (/root/reference/rust/src/chunkers/cumulative.rs:6-142):
  greedy merge — append the next sentence to the current chunk while
  cosine(chunk_so_far, next_sentence) >= threshold (0.9 in the
  reference).

Both are ACTOR-POOL stages: the encoder is constructed once per actor
in ``__init__`` and reused per batch (SURVEY.md §2.3 shape).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from engine.embed import HashingEmbedder


def split_sentences(text: str) -> list[str]:
    """Whitespace-preserving sentence split on '. ' / '\\n' boundaries
    (reference statistical.rs:116-135 splits on whitespace windows; we
    keep the simpler, pinned '. '-boundary rule of engine.chunk)."""
    out: list[str] = []
    for para in text.split("\n"):
        parts = para.split(". ")
        for i, p in enumerate(parts):
            s = p if i == len(parts) - 1 else p + "."
            if s.strip():
                out.append(s.strip())
    return out


class StatisticalChunker:
    """Actor-pool semantic chunker: boundary where the sentence's cosine
    to the rolling context falls below ``threshold``."""

    def __init__(self, dim: int = 64, threshold: float | str = 0.25,
                 window: int = 3, min_sentences: int = 1,
                 max_sentences: int = 12,
                 id_col: str = "doc_id", text_col: str = "text"):
        self.embedder = HashingEmbedder(dim=dim)   # once per actor
        # threshold="adaptive" derives the boundary per document from
        # the similarity distribution itself: median - 0.5 * std of the
        # rolling-context cosines (the reference's statistical shape —
        # it tunes the threshold from score statistics via binary
        # search, statistical.rs:264-332; median/std helpers :14-41 are
        # SURVEY F7).  A fixed float stays the deterministic default.
        self.threshold = threshold
        self.window = window
        self.min_sentences = min_sentences
        self.max_sentences = max_sentences
        self.id_col, self.text_col = id_col, text_col

    def _sims(self, sents: list[str], emb: np.ndarray) -> np.ndarray:
        """Rolling-context cosine of each sentence vs the previous
        ``window`` sentences (the boundary signal)."""
        sims = np.empty(len(sents) - 1, dtype=np.float64)
        for i in range(1, len(sents)):
            ctx = emb[max(0, i - self.window):i].mean(axis=0)
            n = np.linalg.norm(ctx)
            sims[i - 1] = float(emb[i] @ ctx / n) if n > 0 else 0.0
        return sims

    def chunk_text(self, text: str) -> list[str]:
        sents = split_sentences(text)
        if len(sents) <= 1:
            return [text] if text.strip() else []
        emb = self.embedder.embed_texts(sents)
        if self.threshold == "adaptive":
            sims = self._sims(sents, emb)
            thr = float(np.median(sims) - 0.5 * np.std(sims))
        else:
            thr = float(self.threshold)
        chunks: list[list[str]] = [[sents[0]]]
        ctx_vecs = [emb[0]]
        for s, v in zip(sents[1:], emb[1:]):
            ctx = np.mean(ctx_vecs[-self.window:], axis=0)
            n = np.linalg.norm(ctx)
            sim = float(v @ ctx / n) if n > 0 else 0.0
            if (sim < thr and
                    len(chunks[-1]) >= self.min_sentences) or \
                    len(chunks[-1]) >= self.max_sentences:
                chunks.append([s])
                ctx_vecs = [v]
            else:
                chunks[-1].append(s)
                ctx_vecs.append(v)
        return [" ".join(c) for c in chunks]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy()
        texts = batch.column(self.text_col).to_pylist()
        out_id, out_cid, out_chunk = [], [], []
        for did, t in zip(ids, texts):
            cs = self.chunk_text(t)
            out_id.extend([int(did)] * len(cs))
            out_cid.extend(range(len(cs)))
            out_chunk.extend(cs)
        return pa.table({
            self.id_col: pa.array(out_id, pa.int64()),
            "chunk_id": pa.array(out_cid, pa.int64()),
            "chunk": pa.array(out_chunk, pa.large_string()),
        })


class CumulativeChunker:
    """Greedy merge while cosine(current chunk, next sentence) >=
    threshold (reference cumulative.rs: 0.9 over learned embeddings; the
    hashing embedder's geometry needs a looser default)."""

    def __init__(self, dim: int = 64, threshold: float = 0.2,
                 id_col: str = "doc_id", text_col: str = "text"):
        self.embedder = HashingEmbedder(dim=dim)
        self.threshold = threshold
        self.id_col, self.text_col = id_col, text_col

    def chunk_text(self, text: str) -> list[str]:
        sents = split_sentences(text)
        if len(sents) <= 1:
            return [text] if text.strip() else []
        chunks: list[str] = []
        cur = sents[0]
        for s in sents[1:]:
            pair = self.embedder.embed_texts([cur, s])
            if float(pair[0] @ pair[1]) >= self.threshold:
                cur = cur + " " + s
            else:
                chunks.append(cur)
                cur = s
        chunks.append(cur)
        return chunks

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy()
        texts = batch.column(self.text_col).to_pylist()
        out_id, out_cid, out_chunk = [], [], []
        for did, t in zip(ids, texts):
            cs = self.chunk_text(t)
            out_id.extend([int(did)] * len(cs))
            out_cid.extend(range(len(cs)))
            out_chunk.extend(cs)
        return pa.table({
            self.id_col: pa.array(out_id, pa.int64()),
            "chunk_id": pa.array(out_cid, pa.int64()),
            "chunk": pa.array(out_chunk, pa.large_string()),
        })


def semantic_chunk_documents(docs, kind: str = "statistical",
                             concurrency: int = 2, batch_size: int = 128,
                             **kwargs):
    """Dataset -> exploded semantic chunks via an actor pool."""
    cls = StatisticalChunker if kind == "statistical" else CumulativeChunker
    return docs.map_batches(cls, fn_constructor_kwargs=kwargs,
                            batch_format="pyarrow", batch_size=batch_size,
                            concurrency=concurrency)
