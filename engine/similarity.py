"""Similarity search over an embedding column (list<float>).

The reference's retrieval path delegates ANN to LanceDB/Qdrant
(/root/reference/examples/SearchAgent/SearchR1/lance_retrieval.py:120,
/root/reference/examples/hybridsearch.py:64-77); here both the exact and
the bucketed variants are in-engine Ray Data pipelines:

  * ``knn_cosine`` — brute-force cosine top-k: the query matrix is
    ray.put ONCE and read inside each task (broadcast, not re-shipped
    per batch); each batch does one numpy matmul and emits only its
    local top-k, so the global merge handles k*n_batches rows, not the
    full corpus.
  * ``lsh_knn`` — LSH-bucketed variant (the scale path): vectors are
    bucketed by sign-random-projection code; the query probes the
    ``nprobe`` nearest buckets by Hamming distance.  With nprobe covering
    all buckets the result equals brute force (that setting is the
    DuckDB-checked configuration; production uses small nprobe).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _as_matrix(col) -> np.ndarray:
    """list<float> / fixed_size_list<float> Arrow column -> (n, d)
    float64 matrix, zero-copy-ish."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    if pa.types.is_fixed_size_list(col.type):
        d = col.type.list_size
    else:
        offsets = col.offsets.to_numpy(zero_copy_only=False)
        d = int(offsets[1] - offsets[0])
    return flat.reshape(-1, d)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _topk_with_ties(sims: np.ndarray, kk: int) -> np.ndarray:
    """Indices of the top ``kk`` sims INCLUDING every exact tie with the
    kk-th value, so the downstream (cos DESC, vec_id ASC) sort keeps the
    same boundary rows the oracle would (duplicate vectors tie exactly)."""
    if kk >= sims.size:
        return np.arange(sims.size)
    part = np.argpartition(-sims, kk - 1)[:kk]
    return np.flatnonzero(sims >= sims[part].min())


def knn_cosine(
    embeddings: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    round_dp: int | None = 6,
) -> pd.DataFrame:
    """Brute-force cosine top-k -> DataFrame(query_id, vec_id, cos).

    Scale shape: O(corpus) matmuls fan out; only O(k) rows per (batch,
    query) reach the final merge.  cos rounded to ``round_dp`` dp
    (oracle parity); ``round_dp=None`` keeps full precision (callers
    that re-quantize, e.g. to integer ppm, need the raw value).
    """
    qm = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    q_ref = ray.put(qm)
    qids = list(query_ids)

    def local_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        vecs = _normalize(_as_matrix(batch.column(vec_col)))
        ids = batch.column(id_col).to_numpy()
        sims = q @ vecs.T                      # (n_q, n_batch)
        out_q, out_id, out_cos = [], [], []
        kk = min(k + (1 if exclude_self else 0), ids.size)
        for qi in range(q.shape[0]):
            part = _topk_with_ties(sims[qi], kk)
            out_q.extend([qids[qi]] * part.size)
            out_id.extend(ids[part].tolist())
            out_cos.extend(sims[qi][part].tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_id, pa.int64()),
            "cos": pa.array(out_cos, pa.float64()),
        })

    cand = embeddings.map_batches(local_topk, batch_format="pyarrow",
                                  batch_size=4096).to_pandas()
    if exclude_self:
        cand = cand[cand["query_id"] != cand["vec_id"]]
    cand = cand.sort_values(["query_id", "cos", "vec_id"],
                            ascending=[True, False, True])
    out = cand.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    if round_dp is not None:
        out["cos"] = out["cos"].round(round_dp)
    return out


# ---------------------------------------------------------------------------
# LSH-bucketed variant
# ---------------------------------------------------------------------------

def _lsh_planes(d: int, n_bits: int, seed: int = 1234) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((n_bits, d))


def _codes(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (m @ planes.T) > 0
    return (bits.astype(np.uint64) << np.arange(planes.shape[0], dtype=np.uint64)).sum(axis=1)


def lsh_knn(
    embeddings: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: list[int],
    k: int = 10,
    n_bits: int = 4,
    nprobe: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> pd.DataFrame:
    """Sign-random-projection bucketed ANN.  nprobe=None probes ALL 2^n_bits
    buckets (exact; the correctness-gate configuration); small nprobe is
    the production trade-off."""
    qm = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    planes = _lsh_planes(qm.shape[1], n_bits)
    n_buckets = 1 << n_bits
    if nprobe is None:
        nprobe = n_buckets
    qcodes = _codes(qm, planes)
    # buckets to probe per query, by Hamming distance (ties: lower code)
    allcodes = np.arange(n_buckets, dtype=np.uint64)
    probe_sets = []
    for qc in qcodes:
        ham = np.array([bin(int(qc ^ c)).count("1") for c in allcodes])
        order = np.lexsort((allcodes, ham))
        probe_sets.append(np.sort(allcodes[order[:nprobe]].astype(np.int64)))
    q_ref = ray.put((qm, planes, probe_sets))
    qids = list(query_ids)

    def bucketed_topk(batch: pa.Table) -> pa.Table:
        q, pl, probes = ray.get(q_ref)
        vecs = _normalize(_as_matrix(batch.column(vec_col)))
        ids = batch.column(id_col).to_numpy()
        codes = _codes(vecs, pl).astype(np.int64)
        out_q, out_id, out_cos = [], [], []
        for qi in range(q.shape[0]):
            mask = np.isin(codes, probes[qi])
            if not mask.any():
                continue
            sims = vecs[mask] @ q[qi]
            sel_ids = ids[mask]
            kk = min(k + 1, sims.size)
            part = _topk_with_ties(sims, kk)
            out_q.extend([qids[qi]] * part.size)
            out_id.extend(sel_ids[part].tolist())
            out_cos.extend(sims[part].tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_id, pa.int64()),
            "cos": pa.array(out_cos, pa.float64()),
        })

    cand = embeddings.map_batches(bucketed_topk, batch_format="pyarrow",
                                  batch_size=4096).to_pandas()
    if exclude_self:
        cand = cand[cand["query_id"] != cand["vec_id"]]
    cand = cand.sort_values(["query_id", "cos", "vec_id"],
                            ascending=[True, False, True])
    out = cand.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    out["cos"] = out["cos"].round(6)
    return out


def _kmeans_centroids(sample: np.ndarray, n_centroids: int,
                      iters: int = 8, seed: int = 4242) -> np.ndarray:
    """Deterministic spherical k-means on a driver-side sample.

    At 10^12 scale the sample is a `ds.random_sample` pulled once; the
    centroid matrix (n_centroids x d, a few MB) is broadcast via
    ray.put — training is O(sample), never O(corpus).
    """
    rng = np.random.default_rng(seed)
    sample = _normalize(sample)
    idx = rng.choice(sample.shape[0], size=min(n_centroids, sample.shape[0]),
                     replace=False)
    cents = sample[np.sort(idx)].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ cents.T, axis=1)
        for c in range(cents.shape[0]):
            m = assign == c
            if m.any():
                cents[c] = sample[m].mean(axis=0)
        cents = _normalize(cents)
    return cents


def ivf_knn(
    embeddings: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int | None = None,
    sample_size: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> pd.DataFrame:
    """IVF (inverted-file) ANN: vectors are assigned to their nearest
    spherical-kmeans centroid; a query scans only the ``nprobe``
    nearest cells.  nprobe=None probes ALL cells (== exact brute force,
    the correctness-gate configuration); small nprobe is the production
    recall/latency trade-off.  Two passes over the corpus: one sampled
    read to train centroids, one scan to score — no shuffle at all
    (cell assignment happens inside the scoring task)."""
    qm = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    # train on a SEEDED RANDOM sample, not a row-order prefix (a prefix
    # is biased by storage order at scale); parquet count() is
    # metadata-only, so sizing the fraction costs no scan
    n_rows = embeddings.count()
    if n_rows <= sample_size:
        sample_tab = embeddings.to_pandas()
    else:
        frac = min(1.0, (sample_size * 1.3) / n_rows)
        sample_tab = (embeddings.random_sample(frac, seed=4242)
                      .limit(sample_size).to_pandas())
    sample = np.stack(sample_tab[vec_col].to_numpy()).astype(np.float64)
    cents = _kmeans_centroids(sample, n_centroids)
    if nprobe is None:
        nprobe = cents.shape[0]
    # cells to probe per query, by centroid similarity (ties: lower id)
    sims_qc = qm @ cents.T
    probe_sets = []
    for qi in range(qm.shape[0]):
        order = np.lexsort((np.arange(cents.shape[0]), -sims_qc[qi]))
        probe_sets.append(np.sort(order[:nprobe].astype(np.int64)))
    q_ref = ray.put((qm, cents, probe_sets))
    qids = list(query_ids)

    def cell_topk(batch: pa.Table) -> pa.Table:
        q, ce, probes = ray.get(q_ref)
        vecs = _normalize(_as_matrix(batch.column(vec_col)))
        ids = batch.column(id_col).to_numpy()
        cell = np.argmax(vecs @ ce.T, axis=1)
        out_q, out_id, out_cos = [], [], []
        for qi in range(q.shape[0]):
            mask = np.isin(cell, probes[qi])
            if not mask.any():
                continue
            sims = vecs[mask] @ q[qi]
            sel = ids[mask]
            kk = min(k + 1, sims.size)
            part = _topk_with_ties(sims, kk)
            out_q.extend([qids[qi]] * part.size)
            out_id.extend(sel[part].tolist())
            out_cos.extend(sims[part].tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_id, pa.int64()),
            "cos": pa.array(out_cos, pa.float64()),
        })

    cand = embeddings.map_batches(cell_topk, batch_format="pyarrow",
                                  batch_size=4096).to_pandas()
    if exclude_self:
        cand = cand[cand["query_id"] != cand["vec_id"]]
    cand = cand.sort_values(["query_id", "cos", "vec_id"],
                            ascending=[True, False, True])
    out = cand.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    out["cos"] = out["cos"].round(6)
    return out


def neardup_pairs_blocked(
    embeddings: "ray.data.Dataset",
    threshold: float,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Embedding-cosine near-dup pairs within a blocking key ->
    (id_a, id_b, cos).  The blocking key (a label, an LSH bucket, a
    cluster id) bounds the quadratic comparison to within-group pairs —
    the standard scale pattern for near-dup mining."""
    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        vecs = _normalize(np.stack(g[vec_col].to_numpy()).astype(np.float64))
        ids = g[id_col].to_numpy()
        order = np.argsort(ids, kind="stable")
        vecs, ids = vecs[order], ids[order]
        sims = vecs @ vecs.T
        iu = np.triu_indices(ids.size, 1)
        mask = sims[iu] > threshold
        return pd.DataFrame({
            "id_a": ids[iu[0][mask]], "id_b": ids[iu[1][mask]],
            "cos": np.round(sims[iu][mask], 6),
        })

    out = (embeddings.groupby(block_col)
           .map_groups(pairs, batch_format="pandas").to_pandas())
    if out.empty:
        return pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                             "id_b": pd.Series(dtype=np.int64),
                             "cos": pd.Series(dtype=np.float64)})
    out["id_a"] = out["id_a"].astype(np.int64)
    out["id_b"] = out["id_b"].astype(np.int64)
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
