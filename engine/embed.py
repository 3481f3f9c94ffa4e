"""Embedding stage: the reference's A1-A4 actor-pool slot.

The reference embeds chunks with model weights loaded once per process
(``Arc<Embedder>`` shared across tasks, /root/reference/rust/src/lib.rs:839;
BertEmbedder ctor /root/reference/rust/src/embeddings/local/bert.rs:86-145,
embed 240-276, batch 32).  In Ray Data that shape is a callable CLASS on
``map_batches(Cls, concurrency=N, batch_size=B)``: heavy init in
``__init__`` (once per actor), vectorized scoring in ``__call__``.

No model weights exist in this container, so the default embedder is a
DETERMINISTIC feature-hashing embedder: tf-weighted signed token hashing
into ``dim`` buckets, L2-normalized (the reference's normalization,
/root/reference/rust/src/embeddings/mod.rs:80-82).  It is a real
vectorizer (the classic hashing trick), not a mock: cosine similarity
under it approximates token-multiset overlap, so downstream operators
(knn, near-dup, reranking, semantic chunking) are exercised with real
geometry.  Swapping in a learned model is a one-class change with the
same actor signature (documented, not built: no weights available).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from engine.tokenize import stable_hash64, tokenize_batch


class HashingEmbedder:
    """Actor-pool embedder: __init__ once per actor, __call__ per batch.

    State built in __init__ (the "model load"): nothing heavy for the
    hashing trick itself, but the init/call split is the load-bearing
    contract — a weights-based embedder drops into the same slot.
    """

    def __init__(self, dim: int = 64, id_col: str = "doc_id",
                 text_col: str = "text", out_col: str = "embedding",
                 hash_fn: str = "sip", out_dtype: str = "float32"):
        from engine.tokenize import HASH_FNS
        self.dim = np.uint64(dim)
        self.id_col, self.text_col, self.out_col = id_col, text_col, out_col
        self.hasher = HASH_FNS[hash_fn]
        # float32 is the storage default (vector-index convention);
        # "float64" is the oracle-parity mode — DuckDB computes the
        # check in doubles, and f32 quantization noise (~1e-6 on a
        # 64-dim cosine) would swamp the 6-dp value hash
        self.out_dtype = out_dtype

    def embed_texts(self, texts: list[str]) -> np.ndarray:
        """-> (n, dim) float64, L2-normalized rows."""
        toks = tokenize_batch(texts)
        out = np.zeros((len(texts), int(self.dim)), dtype=np.float64)
        for i, ts in enumerate(toks):
            if not ts:
                continue
            uniq, counts = np.unique(np.asarray(ts, dtype=object),
                                     return_counts=True)
            h = self.hasher(uniq)
            bucket = (h % self.dim).astype(np.int64)
            sign = np.where((h >> np.uint64(63)) & np.uint64(1), -1.0, 1.0)
            np.add.at(out[i], bucket, sign * counts)
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        return out / norms

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = self.embed_texts(batch.column(self.text_col).to_pylist())
        pa_type = pa.float64() if self.out_dtype == "float64" else pa.float32()
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.ravel(), pa_type), int(self.dim))
        return batch.append_column(self.out_col, col)


def embed_documents(docs, dim: int = 64, concurrency: int = 4,
                    batch_size: int = 256, id_col: str = "doc_id",
                    text_col: str = "text", hash_fn: str = "sip",
                    out_dtype: str = "float32",
                    weights_path: str | None = None):
    """Dataset -> Dataset with an ``embedding: fixed_size_list<float>``
    column, computed by an actor pool (stateful stage, SURVEY.md §2.3).
    ``weights_path`` switches the pool to the loadable-weights adapter
    (each actor loads the matrix once in __init__)."""
    if weights_path is not None:
        return docs.map_batches(
            WeightsEmbedder,
            fn_constructor_kwargs={"weights_path": weights_path,
                                   "id_col": id_col, "text_col": text_col},
            batch_format="pyarrow", batch_size=batch_size,
            concurrency=concurrency)
    return docs.map_batches(
        HashingEmbedder,
        fn_constructor_kwargs={"dim": dim, "id_col": id_col,
                               "text_col": text_col, "hash_fn": hash_fn,
                               "out_dtype": out_dtype},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


class WeightsEmbedder:
    """Loadable-weights embedder adapter — the reference's
    ``from_pretrained`` slot (/root/reference/rust/src/embeddings/embed/
    embedder.rs:52-124 loads architecture + weights from disk/hub) made
    concrete without shipping model binaries: ``__init__`` loads an
    ``.npz`` weight matrix ONCE PER ACTOR (the heavy "model load" the
    actor-pool shape exists for); ``__call__`` embeds batches.

    Encoding: token -> hashed vocab bucket -> weight row; document
    vector = L2-normalized tf-weighted mean of token rows (a real
    word-embedding model when the matrix is trained — word2vec/GloVe
    mean-pooling — and a drop-in slot for any learned matrix).  A
    transformer replaces ``_encode``; the Ray plumbing (weights path in
    ``fn_constructor_kwargs``, per-actor load, batched __call__) is
    identical.
    """

    def __init__(self, weights_path: str, id_col: str = "doc_id",
                 text_col: str = "text", out_col: str = "embedding",
                 pooling: str = "mean"):
        wz = np.load(weights_path)
        self.matrix = np.ascontiguousarray(wz["embedding"],
                                           dtype=np.float64)
        self.n_buckets = np.uint64(self.matrix.shape[0])
        self.dim = int(self.matrix.shape[1])
        self.id_col, self.text_col, self.out_col = id_col, text_col, out_col
        # pooling over the token axis (reference G4 dispatch,
        # /root/reference/rust/src/embeddings/local/pooling.rs:51-74):
        # mean = tf-weighted mean of token rows; max = elementwise max;
        # last = the final token's row (the reference's last-token mode)
        if pooling not in ("mean", "max", "last"):
            raise ValueError(f"unknown pooling {pooling!r}")
        self.pooling = pooling

    def _encode(self, tok_lists: list[list[str]]) -> np.ndarray:
        out = np.zeros((len(tok_lists), self.dim), dtype=np.float64)
        for i, ts in enumerate(tok_lists):
            if not ts:
                continue
            if self.pooling == "last":
                row = int(stable_hash64([ts[-1]])[0] % self.n_buckets)
                out[i] = self.matrix[row]
                continue
            uniq, counts = np.unique(np.asarray(ts, dtype=object),
                                     return_counts=True)
            rows = (stable_hash64(uniq) % self.n_buckets).astype(np.int64)
            if self.pooling == "max":
                out[i] = self.matrix[rows].max(axis=0)
            else:
                w = counts.astype(np.float64)
                out[i] = (self.matrix[rows] * w[:, None]).sum(axis=0) / w.sum()
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        return out / norms

    def embed_texts(self, texts: list[str]) -> np.ndarray:
        return self._encode(tokenize_batch(texts))

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = self.embed_texts(batch.column(self.text_col).to_pylist())
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.ravel(), pa.float32()), self.dim)
        return batch.append_column(self.out_col, col)


# a REAL learned matrix, checked in: PPMI+SVD word vectors trained by
# tools/train_word_vectors.py on the sf0.001 documents corpus (Levy &
# Goldberg 2014 count-based factorization — pure numpy, no torch).
# Rows are stable_hash64(token) % n_buckets, matching _encode above, so
# WeightsEmbedder(weights_path=TRAINED_WEIGHTS) runs a trained model
# end-to-end — the reference's ``from_pretrained`` analog with actual
# fitted weights rather than a random stand-in.
import os as _os
TRAINED_WEIGHTS = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                                "data", "word_vectors.npz")


def save_random_weights(path: str, n_buckets: int = 4096, dim: int = 64,
                        seed: int = 7) -> str:
    """Test-double weight file (seeded normal matrix) in the format
    WeightsEmbedder loads — stands in for a trained checkpoint."""
    rng = np.random.default_rng(seed)
    np.savez(path, embedding=rng.standard_normal(
        (n_buckets, dim)).astype(np.float32))
    return path


# ---------------------------------------------------------------------------
# Late chunking (reference config.rs:52-59 ``late_chunking``)
# ---------------------------------------------------------------------------

class LateChunkingEmbedder:
    """Actor-pool stage implementing LATE chunking: encode the WHOLE
    document's token sequence ONCE, then pool each chunk's embedding
    from its token SPAN — one encoder pass + O(tokens) prefix sums per
    document instead of one encoder pass per chunk (the Jina
    late-chunking execution shape; the reference exposes the switch in
    ``TextEmbedConfig::late_chunking``).

    With the engine's LINEAR encoders (hashing / word-vector rows) the
    pooled chunk vector is mathematically equal to embedding the chunk
    alone — pytest asserts that equivalence, which is exactly the
    property that BREAKS when a contextual encoder fills this slot (the
    full-document pass then injects cross-chunk context; only
    ``_token_vectors`` changes).

    Output: one row per chunk — (doc_id, chunk_id, chunk, embedding).
    """

    def __init__(self, chunk_size: int = 1000, overlap: int = 0,
                 strategy: str = "sentence", dim: int = 64,
                 weights_path: str | None = None,
                 id_col: str = "doc_id", text_col: str = "text",
                 hash_fn: str = "sip", out_dtype: str = "float32"):
        from engine.chunk import SPLITTERS, split_fixed
        from engine.tokenize import HASH_FNS
        self.split = SPLITTERS.get(strategy, split_fixed)
        self.chunk_size, self.overlap = chunk_size, overlap
        self.id_col, self.text_col = id_col, text_col
        # the per-actor "model load": token-vector table (trained rows)
        # or the hashing trick's implicit signed one-hot
        if weights_path is not None:
            wz = np.load(weights_path)
            self.matrix = np.ascontiguousarray(wz["embedding"],
                                               dtype=np.float64)
            self.n_buckets = np.uint64(self.matrix.shape[0])
            self.dim = int(self.matrix.shape[1])
        else:
            self.matrix = None
            self.dim = dim
        self.hasher = HASH_FNS[hash_fn]
        self.out_dtype = out_dtype

    def _token_vectors(self, toks: list[str]) -> np.ndarray:
        """(T, dim) token-level embeddings from ONE full-document pass.
        A contextual encoder replaces this method only."""
        h = self.hasher(np.asarray(toks, dtype=object))
        if self.matrix is not None:
            return self.matrix[(h % self.n_buckets).astype(np.int64)]
        out = np.zeros((len(toks), self.dim), dtype=np.float64)
        bucket = (h % np.uint64(self.dim)).astype(np.int64)
        sign = np.where((h >> np.uint64(63)) & np.uint64(1), -1.0, 1.0)
        out[np.arange(len(toks)), bucket] = sign
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        from engine.tokenize import tokenize_batch
        ids = batch.column(self.id_col).to_numpy()
        texts = batch.column(self.text_col).to_pylist()
        out_id, out_cid, out_chunk, out_vec = [], [], [], []
        for did, text in zip(ids, texts):
            chunks = self.split(text, self.chunk_size, self.overlap)
            if not chunks:
                continue
            tok_lists = tokenize_batch(chunks)
            spans = np.cumsum([0] + [len(t) for t in tok_lists])
            all_toks = [t for ts in tok_lists for t in ts]
            if all_toks:
                V = self._token_vectors(all_toks)       # ONE pass
                P = np.vstack([np.zeros((1, self.dim)),
                               np.cumsum(V, axis=0)])  # prefix sums
            for ci, chunk in enumerate(chunks):
                lo, hi = spans[ci], spans[ci + 1]
                if hi > lo:
                    v = (P[hi] - P[lo]) / (hi - lo)
                    n = np.linalg.norm(v)
                    v = v / n if n else v
                else:
                    v = np.zeros(self.dim)
                out_id.append(int(did))
                out_cid.append(ci)
                out_chunk.append(chunk)
                out_vec.append(v)
        vecs = (np.vstack(out_vec) if out_vec
                else np.empty((0, self.dim)))
        return pa.table({
            self.id_col: pa.array(out_id, pa.int64()),
            "chunk_id": pa.array(out_cid, pa.int64()),
            "chunk": pa.array(out_chunk, pa.large_string()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.ravel(),
                         pa.float64() if self.out_dtype == "float64"
                         else pa.float32()), self.dim),
        })


def chunk_and_embed(docs, cfg, concurrency: int = 4,
                    batch_size: int = 64, dim: int = 64,
                    weights_path: str | None = None,
                    id_col: str = "doc_id", text_col: str = "text"):
    """Config-routed chunk+embed: ``late_chunking=True`` runs the
    one-pass LateChunkingEmbedder actor pool; otherwise chunk rows are
    exploded first and embedded per chunk (early chunking)."""
    if cfg.late_chunking:
        return docs.map_batches(
            LateChunkingEmbedder,
            fn_constructor_kwargs={
                "chunk_size": cfg.chunk_size, "overlap": cfg.chunk_overlap,
                "strategy": cfg.splitting_strategy, "dim": dim,
                "weights_path": weights_path,
                "id_col": id_col, "text_col": text_col},
            batch_format="pyarrow", batch_size=batch_size,
            concurrency=concurrency)
    from engine.chunk import chunk_by_config
    chunks = chunk_by_config(docs, cfg, id_col=id_col, text_col=text_col)
    return embed_documents(chunks, dim=dim, concurrency=concurrency,
                           batch_size=batch_size, id_col=id_col,
                           text_col="chunk", weights_path=weights_path)


# ---------------------------------------------------------------------------
# Reranker (reference A5): actor-pool cross-scorer over top-k candidates
# ---------------------------------------------------------------------------

class Reranker:
    """Deterministic stand-in for the reference's ONNX cross-encoder
    (/root/reference/rust/src/reranker/model.rs:139-276): per (query,
    document) pair a relevance score through a sigmoid, then sort desc
    and assign 1-based ranks.  Our pair score is the cosine of the
    hashing embeddings (a real cross-scorer would drop into the same
    actor slot); sigmoid and rank semantics mirror model.rs:239,253-268.
    """

    def __init__(self, dim: int = 64, hash_fn: str = "sip"):
        self.embedder = HashingEmbedder(dim=dim, hash_fn=hash_fn)

    def score_pairs(self, query: str, texts: list[str]) -> np.ndarray:
        qv = self.embedder.embed_texts([query])[0]
        dv = self.embedder.embed_texts(texts)
        raw = dv @ qv
        return 1.0 / (1.0 + np.exp(-raw))  # sigmoid, model.rs:239

    def rerank(self, query: str, docs: list[tuple[int, str]]):
        """-> [(rank, doc_id, score)] sorted score desc, doc_id asc."""
        if not docs:
            return []
        ids = np.array([d for d, _ in docs], dtype=np.int64)
        scores = self.score_pairs(query, [t for _, t in docs])
        order = np.lexsort((ids, -scores))
        return [(r + 1, int(ids[i]), float(scores[i]))
                for r, i in enumerate(order)]


# ---------------------------------------------------------------------------
# Hybrid fusion (reference: dense + SPLADE prefetch fused with RRF,
# /root/reference/examples/hybridsearch.py:64-77)
# ---------------------------------------------------------------------------

def rrf_fuse(rankings: list[list[int]], k: int = 10,
             rrf_k: int = 60) -> list[tuple[int, float]]:
    """Reciprocal-rank fusion: score(d) = sum over rankings of
    1/(rrf_k + rank_d); ties broken doc_id asc.  Qdrant's RRF default
    constant 60."""
    scores: dict[int, float] = {}
    for ranking in rankings:
        for r, d in enumerate(ranking, 1):
            scores[d] = scores.get(d, 0.0) + 1.0 / (rrf_k + r)
    ids = np.fromiter(scores.keys(), dtype=np.int64, count=len(scores))
    vals = np.fromiter(scores.values(), dtype=np.float64, count=len(scores))
    order = np.lexsort((ids, -vals))[:k]
    return [(int(ids[i]), float(vals[i])) for i in order]


# ---------------------------------------------------------------------------
# Multi-vector (late-interaction) embedding + MaxSim retrieval
# (reference ColBERT/ColPali family: EmbeddingResult::MultiVector,
#  /root/reference/rust/src/embeddings/embed/types.rs:6-9, scorers in
#  rust/src/embeddings/local/colbert.rs)
# ---------------------------------------------------------------------------

def _formula_token_matrix(n_buckets: int, dim: int,
                          hash_fn: str = "md5") -> np.ndarray:
    """(n_buckets, dim) float64 token-vector table from a PURE HASH
    FORMULA — every cell is hash("mv{b}_{j}") scaled to [-0.5, 0.5),
    rows L2-normalized.  md5 mode makes every cell reproducible in
    DuckDB (`md5_number_lower` + exact power-of-two scaling), which is
    what lets MaxSim retrieval have a full SQL oracle; a trained matrix
    (.npz) drops in via MultiVectorEmbedder(weights_path=...)."""
    from engine.tokenize import HASH_FNS
    hasher = HASH_FNS[hash_fn]
    keys = np.array([f"mv{b}_{j}" for b in range(n_buckets)
                     for j in range(dim)], dtype=object)
    vals = hasher(keys).astype(np.float64) / float(1 << 64) - 0.5
    mat = vals.reshape(n_buckets, dim)
    norms = np.sqrt((mat * mat).sum(axis=1, keepdims=True))
    norms[norms == 0.0] = 1.0
    return mat / norms


class MultiVectorEmbedder:
    """Actor-pool stage emitting MULTI-vector rows: one L2-normalized
    vector per DISTINCT document token (the ColBERT document-side
    representation; identical tokens contribute one vector because
    MaxSim's max over duplicates equals the max over distincts).

    Output: (doc_id, n_tokens, tok_vecs list<fixed_size_list<f64,dim>>).
    Storage note, stated honestly: multi-vector indexes are O(distinct
    tokens x dim) per doc — 2 orders beyond a pooled vector; at corpus
    scale they live behind the same IndexSink/parquet layout with doc-id
    partitioning, and retrieval fuses embed+score per batch
    (maxsim_topk) precisely so the representation never materializes
    across stages.
    """

    def __init__(self, dim: int = 64, n_buckets: int = 1024,
                 hash_fn: str = "sip", weights_path: str | None = None,
                 id_col: str = "doc_id", text_col: str = "text"):
        if weights_path is not None:
            wz = np.load(weights_path)
            mat = np.ascontiguousarray(wz["embedding"], dtype=np.float64)
            norms = np.sqrt((mat * mat).sum(axis=1, keepdims=True))
            norms[norms == 0.0] = 1.0
            self.matrix = mat / norms
        else:
            self.matrix = _formula_token_matrix(n_buckets, dim, hash_fn)
        self.n_buckets = np.uint64(self.matrix.shape[0])
        self.dim = int(self.matrix.shape[1])
        from engine.tokenize import HASH_FNS
        self.hasher = HASH_FNS[hash_fn]
        self.id_col, self.text_col = id_col, text_col

    def vecs_for_terms(self, terms: list[str]) -> np.ndarray:
        """(len(terms), dim) rows — also the query-side encoder."""
        if not terms:
            return np.empty((0, self.dim))
        h = self.hasher(np.asarray(terms, dtype=object))
        return self.matrix[(h % self.n_buckets).astype(np.int64)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        from engine.tokenize import tokenize_batch
        ids = batch.column(self.id_col).to_numpy()
        tok_lists = tokenize_batch(batch.column(self.text_col).to_pylist())
        out_id, out_n, mats = [], [], []
        for did, ts in zip(ids, tok_lists):
            terms = sorted(set(ts))
            if not terms:
                continue
            out_id.append(int(did))
            out_n.append(len(terms))
            mats.append(self.vecs_for_terms(terms))
        flat = (np.vstack(mats) if mats else np.empty((0, self.dim)))
        inner = pa.FixedSizeListArray.from_arrays(
            pa.array(flat.ravel(), pa.float64()), self.dim)
        offsets = pa.array(np.concatenate(
            ([0], np.cumsum(out_n))).astype(np.int32))
        return pa.table({
            self.id_col: pa.array(out_id, pa.int64()),
            "n_tokens": pa.array(out_n, pa.int64()),
            "tok_vecs": pa.ListArray.from_arrays(offsets, inner),
        })


def maxsim_topk(
    docs: "ray.data.Dataset",
    query: str,
    k: int = 10,
    n_buckets: int = 1024,
    dim: int = 64,
    hash_fn: str = "sip",
    weights_path: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> list[tuple[int, float]]:
    """Late-interaction retrieval: score(q, d) = sum over query token
    positions of max over doc tokens of cos(q_tok, d_tok) (the ColBERT
    MaxSim operator) -> top-k (doc_id, score), score desc / doc_id asc.

    Scale shape: embed + score are FUSED in one map_batches (the per-doc
    multi-vector never crosses a stage boundary); per batch the scoring
    is one (q_len x total_tokens) mult-sum + a maximum.reduceat over doc
    runs; only k rows (with boundary ties) per batch reach the merge.
    """
    from engine.similarity import _topk_with_ties
    from engine.tokenize import tokenize

    q_terms = tokenize(query)
    if not q_terms or k <= 0:
        return []
    kw = dict(dim=dim, n_buckets=n_buckets, hash_fn=hash_fn,
              weights_path=weights_path, id_col=id_col, text_col=text_col)

    class _Scorer(MultiVectorEmbedder):
        def __init__(self):
            super().__init__(**kw)
            self.q = self.vecs_for_terms(q_terms)   # (q_len, dim)

        def __call__(self, batch: pa.Table) -> pa.Table:
            from engine.tokenize import tokenize_batch
            ids = batch.column(self.id_col).to_numpy()
            tok_lists = tokenize_batch(
                batch.column(self.text_col).to_pylist())
            out_id, out_n, mats = [], [], []
            for did, ts in zip(ids, tok_lists):
                terms = sorted(set(ts))
                if terms:
                    out_id.append(int(did))
                    out_n.append(len(terms))
                    mats.append(self.vecs_for_terms(terms))
            if not out_id:
                return pa.table({"doc_id": pa.array([], pa.int64()),
                                 "score": pa.array([], pa.float64())})
            flat = np.vstack(mats)                       # (T, dim)
            # sequential per-row sums (match the oracle's sum shape)
            sims = np.stack([(flat * qv).sum(axis=1) for qv in self.q])
            starts = np.concatenate(([0], np.cumsum(out_n)[:-1]))
            mx = np.maximum.reduceat(sims, starts, axis=1)  # (q, docs)
            scores = mx.sum(axis=0)
            part = _topk_with_ties(scores, min(k, scores.size))
            return pa.table({
                "doc_id": pa.array(np.asarray(out_id)[part], pa.int64()),
                "score": pa.array(scores[part], pa.float64()),
            })

    from engine.config import pool_size
    cand = docs.map_batches(_Scorer, batch_format="pyarrow",
                            batch_size=256,
                            concurrency=pool_size()).to_pandas()
    cand = cand.sort_values(["score", "doc_id"],
                            ascending=[False, True]).head(k)
    return [(int(d), float(s))
            for d, s in zip(cand["doc_id"], cand["score"])]


def sparse_doc_vectors(tf_rows, n_docs: int, avgdl: float,
                       k1: float = 1.2, b: float = 0.75,
                       num_blocks: int | None = None):
    """Document-side sparse vectors (the reference's SPLADE document
    embedding, rust/src/embeddings/local/bert.rs:379-396 — per-document
    weighted term lists upserted to a sparse vector store,
    examples/splade.py:37-76): each (doc, term) gets the engine's BM25
    contribution ``idf(df) * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))``
    as integer micro-units, the doc-side dual of ``search_weighted``
    (query weight x THESE stored weights is the learned-sparse dot
    product).

    ``tf_rows``: Dataset of (term, doc_id, tf, dl) rows, unique per
    (doc, term) — the ``count_terms`` per-batch combiner output.

    Scale shape: ONE keyed hash repartition on ``term`` co-locates all
    of a term's rows, so each output block computes its terms' exact
    GLOBAL df with one in-block factorize — no driver-side vocabulary,
    no broadcast df map (a web-scale vocabulary never fits one); the
    same shuffle class the index build itself uses.  ``n_docs`` /
    ``avgdl`` are the only scalars shipped in.  Returns a Dataset of
    (doc_id, term, w_micro) triplets, streaming."""
    from engine.textstats import micro_units

    # keyed repartition requires the hash-shuffle strategy; set it on
    # the DATASET's captured context copy (derived datasets inherit it)
    # so the session-global context stays untouched — the
    # build/docvalues shuffle discipline, scoped tighter
    import ray
    from ray.data.context import ShuffleStrategy
    ctx = tf_rows.context
    n_cpus = int(ray.cluster_resources().get("CPU", 8))
    if num_blocks is None:      # cluster-sized; explicit for big jobs
        num_blocks = max(4, n_cpus * 2)
    n_aggr = max(2, min(num_blocks, n_cpus // 2))
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ctx.max_hash_shuffle_aggregators = n_aggr
    # both overrides: the repartition here AND any downstream groupby
    # (assemble_sparse_vectors) run on this context copy — an unsized
    # aggregator pool deadlocks small sessions (the build's rule)
    cpu_override = 0.5 / -(-num_blocks // n_aggr)
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = \
        cpu_override
    ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = \
        cpu_override
    ctx.min_hash_shuffle_aggregator_wait_time_in_s = 30

    n = float(n_docs)
    avg = float(avgdl)

    def score(t: pa.Table) -> pa.Table:
        terms = np.asarray(t.column("term").to_pylist(), dtype=object)
        out_schema = pa.schema([("doc_id", pa.int64()),
                                ("term", pa.string()),
                                ("w_micro", pa.int64())])
        if terms.size == 0:
            return out_schema.empty_table()
        uniq, inv, counts = np.unique(terms, return_inverse=True,
                                      return_counts=True)
        df = counts[inv].astype(np.float64)   # exact global df per row
        tf = t.column("tf").to_numpy().astype(np.float64)
        dl = t.column("dl").to_numpy().astype(np.float64)
        # the query path's float order (engine/query.py _score): idf
        # first, then tf saturation — keeps micro-units bit-identical
        # to the SQL oracle's expression tree
        idf = np.log(1.0 + (n - df + 0.5) / (df + 0.5))
        w = idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avg))
        return pa.table({
            "doc_id": t.column("doc_id"),
            "term": t.column("term"),
            "w_micro": pa.array(micro_units(w), pa.int64()),
        })

    return (tf_rows
            .repartition(num_blocks, keys=["term"], sort=False)
            .map_batches(score, batch_format="pyarrow", batch_size=None))


def assemble_sparse_vectors(triplets, top_per_doc: int | None = None,
                            num_blocks: int | None = None):
    """(doc_id, term, w_micro) triplets -> one row per document with
    parallel ``terms`` / ``weights_micro`` list columns sorted by
    (w_micro desc, term asc) — the upsert payload shape of the
    reference's sparse-vector stores (examples/splade.py:57-76 upserts
    {indices, values} per point).  ``top_per_doc`` keeps only each
    document's heaviest terms (sparse-store size control).

    One doc_id-keyed hash repartition co-locates each document's rows;
    assembly is then fully vectorized per block — one lexsort, run
    boundaries from one diff, list columns built zero-copy via
    ``pa.ListArray.from_arrays`` offsets.  (A groupby().map_groups
    version was 24x slower at 200k docs: per-group pandas overhead over
    hundreds of thousands of tiny groups is the anti-pattern this
    avoids.)"""
    import ray
    from ray.data.context import ShuffleStrategy

    ctx = triplets.context
    n_cpus = int(ray.cluster_resources().get("CPU", 8))
    if num_blocks is None:      # cluster-sized; explicit for big jobs
        num_blocks = max(4, n_cpus * 2)
    n_aggr = max(2, min(num_blocks, n_cpus // 2))
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ctx.max_hash_shuffle_aggregators = n_aggr
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = \
        0.5 / -(-num_blocks // n_aggr)
    ctx.min_hash_shuffle_aggregator_wait_time_in_s = 30

    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("terms", pa.list_(pa.string())),
                            ("weights_micro", pa.list_(pa.int64()))])

    def assemble(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        ids = t.column("doc_id").to_numpy()
        terms = np.asarray(t.column("term").to_pylist(), dtype=object)
        w = t.column("w_micro").to_numpy()
        # primary doc_id, then w desc, then term asc (last key primary)
        order = np.lexsort((terms, -w, ids))
        ids, terms, w = ids[order], terms[order], w[order]
        starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        counts = np.diff(np.r_[starts, ids.size])
        if top_per_doc is not None:
            rank = np.arange(ids.size) - np.repeat(starts, counts)
            keep = rank < top_per_doc
            ids, terms, w = ids[keep], terms[keep], w[keep]
            starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
            counts = np.diff(np.r_[starts, ids.size])
        offsets = pa.array(np.r_[0, np.cumsum(counts)], pa.int32())
        return pa.table({
            "doc_id": pa.array(ids[starts], pa.int64()),
            "terms": pa.ListArray.from_arrays(
                offsets, pa.array(terms, pa.string())),
            "weights_micro": pa.ListArray.from_arrays(
                offsets, pa.array(w, pa.int64())),
        })

    return (triplets
            .repartition(num_blocks, keys=["doc_id"], sort=False)
            .map_batches(assemble, batch_format="pyarrow",
                         batch_size=None))
