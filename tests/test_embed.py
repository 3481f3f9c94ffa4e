"""Embedding actor-pool stage + reranker + RRF (engine/embed.py).

Mirrors the reference's embedding tests: dimension assertion
(/root/reference/tests/model_tests/test_bert.py:29-40 asserts dim 384)
and deterministic golden values
(/root/reference/rust/src/embeddings/local/bert.rs:407-419).
"""

import numpy as np
import pytest

from engine.embed import HashingEmbedder, Reranker, embed_documents, rrf_fuse


def test_deterministic_and_normalized():
    e = HashingEmbedder(dim=32)
    v1 = e.embed_texts(["hash join table", "", "the the the"])
    v2 = HashingEmbedder(dim=32).embed_texts(["hash join table", "",
                                              "the the the"])
    assert np.array_equal(v1, v2)
    assert v1.shape == (3, 32)
    assert np.linalg.norm(v1[0]) == pytest.approx(1.0)
    assert np.linalg.norm(v1[1]) == 0.0  # empty doc -> zero vector
    assert np.linalg.norm(v1[2]) == pytest.approx(1.0)


def test_cosine_reflects_overlap():
    e = HashingEmbedder(dim=64)
    v = e.embed_texts(["alpha beta gamma", "alpha beta gamma",
                       "delta epsilon zeta"])
    assert v[0] @ v[1] == pytest.approx(1.0)
    assert abs(v[0] @ v[2]) < 0.9  # disjoint tokens: far from identical


def test_embed_documents_actor_pool(ray_session):
    import ray.data
    ds = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet",
                               columns=["doc_id", "text"])
    out = embed_documents(ds, dim=16, concurrency=2, batch_size=128)
    tab = out.to_pandas()
    assert len(tab) == ds.count()
    assert all(len(v) == 16 for v in tab["embedding"])
    # stable across runs (determinism at any parallelism)
    tab2 = embed_documents(ds, dim=16, concurrency=2).to_pandas()
    a = tab.sort_values("doc_id")["embedding"].to_list()
    b = tab2.sort_values("doc_id")["embedding"].to_list()
    assert all(np.array_equal(x, y) for x, y in zip(a, b))


def test_reranker_rank_semantics():
    r = Reranker(dim=64)
    docs = [(5, "hash join table query"), (2, "unrelated words entirely"),
            (9, "hash join table query")]
    ranked = r.rerank("hash join", docs)
    assert [x[0] for x in ranked] == [1, 2, 3]       # 1-based ranks
    assert ranked[0][2] >= ranked[-1][2]             # desc scores
    # identical texts tie -> doc_id asc
    ids_of_ties = [d for _, d, s in ranked if s == ranked[0][2]]
    assert ids_of_ties == sorted(ids_of_ties)
    assert all(0.0 < s < 1.0 for _, _, s in ranked)  # sigmoid range
    assert r.rerank("q", []) == []


def test_rrf_fuse():
    fused = rrf_fuse([[1, 2, 3], [3, 2, 4]], k=4, rrf_k=60)
    scores = dict(fused)
    assert scores[2] == pytest.approx(1 / 62 + 1 / 62)
    assert scores[3] == pytest.approx(1 / 63 + 1 / 61)
    assert scores[1] == pytest.approx(1 / 61)
    assert scores[4] == pytest.approx(1 / 63)
    # 2 and 3 tie exactly? 1/62+1/62 vs 1/63+1/61 -> not equal; order by score
    assert [d for d, _ in fused] == sorted(
        scores, key=lambda d: (-scores[d], d))


def test_weights_embedder_loads_and_embeds(tmp_path):
    """Loadable-weights adapter: per-actor weight load, deterministic
    embeddings, parallelism-invariant through the actor pool."""
    import pandas as pd
    import ray.data
    from engine.embed import WeightsEmbedder, save_random_weights

    path = save_random_weights(str(tmp_path / "w.npz"), n_buckets=512,
                               dim=16)
    e = WeightsEmbedder(path)
    v = e.embed_texts(["alpha beta beta", "alpha beta beta", "", "unrelated"])
    assert v.shape == (4, 16)
    assert np.array_equal(v[0], v[1])                 # deterministic
    assert np.linalg.norm(v[0]) == pytest.approx(1.0)  # L2-normalized
    assert np.linalg.norm(v[2]) == 0.0                 # empty -> zero
    assert abs(float(v[0] @ v[3])) < 0.9               # distinct docs differ

    docs = pd.DataFrame({"doc_id": np.arange(20, dtype=np.int64),
                         "text": [f"w{i} w{i+1} common" for i in range(20)]})
    a = (embed_documents(ray.data.from_pandas(docs), weights_path=path,
                         concurrency=2, batch_size=4)
         .to_pandas().sort_values("doc_id"))
    b = (embed_documents(ray.data.from_pandas(docs).repartition(5),
                         weights_path=path, concurrency=2, batch_size=4)
         .to_pandas().sort_values("doc_id"))
    va = np.stack(a["embedding"].to_numpy())
    vb = np.stack(b["embedding"].to_numpy())
    assert np.array_equal(va, vb)
    # matches the single-process adapter bit-for-bit (f32 storage)
    want = e.embed_texts(docs["text"].tolist()).astype(np.float32)
    assert np.array_equal(va, want)


def test_weights_embedder_pooling_modes(tmp_path):
    """G4 pooling dispatch: mean/max/last over the token axis."""
    from engine.embed import WeightsEmbedder, save_random_weights
    path = save_random_weights(str(tmp_path / "w2.npz"), n_buckets=64,
                               dim=8)
    texts = ["alpha beta", "beta alpha", "gamma alpha"]
    mean = WeightsEmbedder(path, pooling="mean").embed_texts(texts)
    mx = WeightsEmbedder(path, pooling="max").embed_texts(texts)
    last = WeightsEmbedder(path, pooling="last").embed_texts(texts)
    # mean and max are order-insensitive; last is not
    assert np.array_equal(mean[0], mean[1])
    assert np.array_equal(mx[0], mx[1])
    assert not np.array_equal(last[0], last[1])
    # last == the final token's normalized row
    single_beta = WeightsEmbedder(path, pooling="last").embed_texts(["beta"])
    assert np.array_equal(last[0], single_beta[0])
    with pytest.raises(ValueError):
        WeightsEmbedder(path, pooling="cls")


def test_trained_word_vectors_end_to_end():
    """The checked-in .npz is a REAL trained artifact: (a) it loads into
    the WeightsEmbedder slot and embeds deterministically, (b) retraining
    with tools/train_word_vectors.py on the same public corpus reproduces
    it exactly (the matrix is a pure function of the training data — not
    a random blob), (c) a doc still embeds nearer its own truncation than
    the corpus average."""
    import pyarrow.parquet as pq
    from engine.embed import WeightsEmbedder, TRAINED_WEIGHTS

    e = WeightsEmbedder(TRAINED_WEIGHTS)
    texts = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                          columns=["text"]).column("text").to_pylist()
    vecs = e.embed_texts(texts[:40])
    assert vecs.shape == (40, e.dim)
    assert np.allclose(np.linalg.norm(vecs, axis=1), 1.0)
    half = [t[: len(t) // 2] for t in texts[:40]]
    self_sim = np.einsum("ij,ij->i", vecs, e.embed_texts(half))
    cross = vecs @ vecs.T
    mean_cross = (cross.sum() - np.trace(cross)) / (40 * 39)
    assert self_sim.mean() > mean_cross + 0.03
    # determinism (actor-pool restart invariance)
    assert np.array_equal(vecs, WeightsEmbedder(TRAINED_WEIGHTS)
                          .embed_texts(texts[:40]))
    # (b) retrain -> bitwise-identical matrix
    import importlib.util, os
    spec = importlib.util.spec_from_file_location(
        "twv", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools", "train_word_vectors.py"))
    twv = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(twv)
    retrained = twv.train(texts, n_buckets=1024, dim=64)
    assert np.array_equal(retrained, e.matrix.astype(np.float32))


def test_word_vector_training_learns_structure():
    """On a corpus with PLANTED topic structure the PPMI+SVD trainer
    places within-topic tokens closer than cross-topic tokens — the
    property no random matrix has (the sf0.001 fixture corpus is
    near-random bag-of-words, so this is tested on generated topical
    docs instead)."""
    import importlib.util, os
    from engine.tokenize import stable_hash64
    spec = importlib.util.spec_from_file_location(
        "twv2", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools", "train_word_vectors.py"))
    twv = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(twv)

    rng = np.random.default_rng(11)
    topic_a = [f"alpha{i}" for i in range(12)]
    topic_b = [f"beta{i}" for i in range(12)]
    docs = []
    for _ in range(120):
        vocab = topic_a if rng.random() < 0.5 else topic_b
        docs.append(" ".join(rng.choice(vocab, 40)))
    M = twv.train(docs, n_buckets=512, dim=16).astype(np.float64)
    M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)

    def rows(words):
        return (stable_hash64(np.asarray(words, dtype=object))
                % np.uint64(512)).astype(np.int64)

    ra, rb = rows(topic_a), rows(topic_b)
    within = np.concatenate([(M[r] @ M[r].T)[np.triu_indices(len(r), 1)]
                             for r in (ra, rb)])
    across = (M[ra] @ M[rb].T).ravel()
    assert within.mean() > across.mean() + 0.15


def test_late_chunking_linear_equivalence(ray_session):
    """Late chunking (one full-doc encode + per-span prefix-sum pooling)
    equals early chunking (embed each chunk alone) for LINEAR encoders —
    the invariant a contextual encoder in the same slot breaks.  Checked
    for both the hashing embedder and the trained word-vector matrix."""
    import ray.data
    import pandas as pd
    import pyarrow as pa
    from engine.chunk import split_sentence
    from engine.config import EngineConfig
    from engine.embed import (LateChunkingEmbedder, HashingEmbedder,
                              WeightsEmbedder, TRAINED_WEIGHTS,
                              chunk_and_embed)

    texts = ["alpha beta gamma. delta epsilon zeta. " * 12,
             "one two three four five. " * 20, "short"]
    df = pd.DataFrame({"doc_id": [1, 2, 3], "text": texts})
    for weights in (None, TRAINED_WEIGHTS):
        late = LateChunkingEmbedder(chunk_size=80, strategy="sentence",
                                    weights_path=weights)
        out = late(pa.table(df)).to_pandas()
        enc = (HashingEmbedder() if weights is None
               else WeightsEmbedder(weights))
        for t, did in zip(texts, df["doc_id"]):
            chunks = split_sentence(t, 80)
            got = np.array(out[out["doc_id"] == did]
                           .sort_values("chunk_id")["embedding"].tolist())
            want = enc.embed_texts(chunks)
            assert got.shape == want.shape
            assert np.allclose(got, want, atol=1e-6)
    # config-routed pipeline: late vs early produce identical vectors
    ds = ray.data.from_pandas(df)
    late_cfg = EngineConfig(splitting_strategy="sentence", chunk_size=80,
                            late_chunking=True)
    early_cfg = EngineConfig(splitting_strategy="sentence", chunk_size=80)
    a = (chunk_and_embed(ds, late_cfg).to_pandas()
         .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True))
    b = (chunk_and_embed(ds, early_cfg).to_pandas()
         .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True))
    assert a["chunk"].tolist() == b["chunk"].tolist()
    assert np.allclose(np.array(a["embedding"].tolist()),
                       np.array(b["embedding"].tolist()), atol=1e-6)


# ---------------------------------------------------------------------------
# multi-vector (late-interaction) embedding + MaxSim
# ---------------------------------------------------------------------------

def _mv_corpus():
    import pandas as pd
    return pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["hash join table", "hash join", "sort merge join",
                 "b tree index scan", "hash table probe",
                 "completely unrelated words here"]})


def test_multivector_rows_and_maxsim(ray_session):
    import ray.data
    from engine.embed import MultiVectorEmbedder, maxsim_topk
    df = _mv_corpus()
    ds = ray.data.from_pandas(df)
    mv = (ds.map_batches(MultiVectorEmbedder, concurrency=2,
                         fn_constructor_kwargs={"hash_fn": "md5"},
                         batch_format="pyarrow")
          .to_pandas().sort_values("doc_id"))
    # one row per doc, n_tokens = distinct tokens, vectors L2-normalized
    assert list(mv["doc_id"]) == list(df["doc_id"])
    assert list(mv["n_tokens"]) == [3, 2, 3, 4, 3, 4]
    v0 = np.array(mv["tok_vecs"].iloc[0].tolist())
    assert v0.shape == (3, 64)
    assert np.allclose(np.linalg.norm(v0, axis=1), 1.0)

    hits = maxsim_topk(ds, "hash join table", k=3, hash_fn="md5")
    # exact-match doc scores q_len * cos(1.0) = 3.0 and ranks first
    assert hits[0][0] == 0
    assert abs(hits[0][1] - 3.0) < 1e-9
    # subset queries: every doc containing all query terms ties at top
    hits2 = maxsim_topk(ds, "hash join", k=2, hash_fn="md5")
    assert [d for d, _ in hits2] == [0, 1]


def test_maxsim_parallelism_invariant(ray_session):
    import ray.data
    from engine.embed import maxsim_topk
    df = _mv_corpus()
    a = maxsim_topk(ray.data.from_pandas(df), "hash table", k=4)
    b = maxsim_topk(ray.data.from_pandas(df).repartition(5),
                    "hash table", k=4)
    assert a == b


def test_maxsim_empty_and_degenerate(ray_session):
    import ray.data
    from engine.embed import maxsim_topk
    df = _mv_corpus()
    ds = ray.data.from_pandas(df)
    assert maxsim_topk(ds, "", k=5) == []
    assert maxsim_topk(ds, "hash", k=0) == []
    assert maxsim_topk(ds, "...", k=5) == []


def test_multivector_trained_weights(ray_session):
    """weights_path mode: rows come from the trained PPMI+SVD matrix
    (normalized), not the formula table."""
    import os
    import ray.data
    from engine.embed import MultiVectorEmbedder
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "engine", "data", "word_vectors.npz")
    mv = MultiVectorEmbedder(weights_path=path)
    v = mv.vecs_for_terms(["hash", "join"])
    assert v.shape == (2, 64)
    assert np.allclose(np.linalg.norm(v, axis=1), 1.0)


def _sparse_fixture():
    """40 docs x 12-term vocab, deterministic tf/dl rows unique per
    (doc, term) — the count_terms combiner shape."""
    rng = np.random.default_rng(11)
    vocab = [f"t{i:02d}" for i in range(12)]
    rows = []
    for d in range(40):
        picks = rng.choice(12, size=rng.integers(2, 8), replace=False)
        tfs = rng.integers(1, 6, size=picks.size)
        dl = int(tfs.sum())
        for p, tf in zip(picks, tfs):
            rows.append((vocab[int(p)], 1000 + d, int(tf), dl))
    import pandas as pd
    return pd.DataFrame(rows, columns=["term", "doc_id", "tf", "dl"])


def test_sparse_doc_vectors_exact(ray_session):
    """The one-keyed-shuffle df computation is exact: every (doc, term)
    weight equals a driver-computed reference with true global dfs —
    and is split-invariant (8 input blocks, 8 shuffle partitions)."""
    import ray.data
    from engine.embed import sparse_doc_vectors
    from engine.textstats import micro_units

    df = _sparse_fixture()
    n = df["doc_id"].nunique()
    avgdl = df.groupby("doc_id")["dl"].first().sum() / n
    got = (sparse_doc_vectors(ray.data.from_pandas(df).repartition(8),
                              n, avgdl, num_blocks=8)
           .to_pandas().sort_values(["doc_id", "term"])
           .reset_index(drop=True))

    k1, b = 1.2, 0.75
    ref = df.copy()
    ref["df"] = ref.groupby("term")["doc_id"].transform("nunique")
    idf = np.log(1.0 + (n - ref["df"] + 0.5) / (ref["df"] + 0.5))
    w = (idf * ref["tf"] * (k1 + 1.0)
         / (ref["tf"] + k1 * (1.0 - b + b * ref["dl"] / avgdl)))
    ref["w_micro"] = micro_units(w.to_numpy())
    ref = (ref[["doc_id", "term", "w_micro"]]
           .sort_values(["doc_id", "term"]).reset_index(drop=True))
    assert got.equals(ref)


def test_assemble_sparse_vectors_and_upsert(ray_session, tmp_path):
    """Per-doc assembly (w desc, term asc; top_per_doc cap) and the
    sparse upsert flow of the reference's examples/splade.py:57-76 —
    parallel term/weight lists per point, streamed through a
    VectorAdapter."""
    import json
    import glob
    from functools import partial
    import ray.data
    from engine.embed import sparse_doc_vectors, assemble_sparse_vectors
    from engine.sink import JsonlVectorAdapter, upsert_embeddings

    df = _sparse_fixture()
    n = df["doc_id"].nunique()
    avgdl = df.groupby("doc_id")["dl"].first().sum() / n
    trip = sparse_doc_vectors(ray.data.from_pandas(df), n, avgdl,
                              num_blocks=4)
    tp = trip.to_pandas()
    asm = assemble_sparse_vectors(trip, top_per_doc=3,
                                  num_blocks=4).to_pandas()
    assert len(asm) == n
    for _, row in asm.iterrows():
        mine = (tp[tp["doc_id"] == row["doc_id"]]
                .sort_values(["w_micro", "term"],
                             ascending=[False, True]).head(3))
        assert list(row["terms"]) == mine["term"].tolist()
        assert [int(v) for v in row["weights_micro"]] == \
            mine["w_micro"].tolist()
        ws = [int(v) for v in row["weights_micro"]]
        assert ws == sorted(ws, reverse=True)

    stem = str(tmp_path / "sparse")
    # upsert the assembled Dataset DIRECTLY (streaming, no pandas
    # round-trip — object-ndarray list cells don't re-arrow cleanly)
    n_up = upsert_embeddings(
        assemble_sparse_vectors(
            sparse_doc_vectors(ray.data.from_pandas(df), n, avgdl,
                               num_blocks=4),
            top_per_doc=3, num_blocks=4),
        partial(JsonlVectorAdapter, stem, vec_col="weights_micro",
                text_col="terms"),
        batch_size=16, concurrency=1)
    assert n_up == n
    lines = []
    for p in glob.glob(f"{stem}-*.jsonl"):
        with open(p) as f:
            lines += [json.loads(ln) for ln in f]
    assert len(lines) == n
    by_id = {r["id"]: r for r in lines}
    some = asm.iloc[0]
    assert by_id[int(some["doc_id"])]["embedding"] == \
        [float(v) for v in some["weights_micro"]]
    assert by_id[int(some["doc_id"])]["text"] == list(some["terms"])
