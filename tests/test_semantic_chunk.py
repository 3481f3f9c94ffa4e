"""Semantic chunker tests (engine/semantic_chunk.py, reference A7/A8).

Mirrors the reference's chunker smoke tests
(/root/reference/rust/src/chunkers/statistical.rs:394-413): chunks are
non-empty, cover the input sentences, and are deterministic.
"""

import numpy as np

from engine.semantic_chunk import (StatisticalChunker, CumulativeChunker,
                                   split_sentences,
                                   semantic_chunk_documents)


TEXT = ("alpha beta gamma delta. alpha beta gamma again. "
        "alpha gamma beta mix. completely different topic words here. "
        "unrelated vocabulary cluster tokens. another far topic sentence.")


def test_split_sentences():
    s = split_sentences("a b. c d. e")
    assert s == ["a b.", "c d.", "e"]
    assert split_sentences("") == []
    assert split_sentences("one\ntwo") == ["one", "two"]


def test_statistical_chunker_properties():
    c = StatisticalChunker(threshold=0.25)
    chunks = c.chunk_text(TEXT)
    assert chunks and all(ch.strip() for ch in chunks)
    # sentence coverage: rejoining chunks yields every sentence once
    joined = " ".join(chunks)
    for s in split_sentences(TEXT):
        assert s in joined
    # deterministic
    assert chunks == StatisticalChunker(threshold=0.25).chunk_text(TEXT)
    # topically-shifted text splits into >1 chunk
    assert len(chunks) > 1


def test_statistical_max_band():
    many = ". ".join(["same words repeated"] * 30)
    c = StatisticalChunker(threshold=-1.0, max_sentences=5)  # never split on sim
    chunks = c.chunk_text(many)
    assert all(len(split_sentences(ch)) <= 5 for ch in chunks)


def test_cumulative_chunker():
    c = CumulativeChunker(threshold=0.2)
    chunks = c.chunk_text(TEXT)
    assert chunks and len(chunks) > 1
    assert chunks == CumulativeChunker(threshold=0.2).chunk_text(TEXT)
    # single sentence -> single chunk
    assert c.chunk_text("just one sentence") == ["just one sentence"]
    assert c.chunk_text("") == []


def test_actor_pool_dataset(ray_session):
    import ray.data
    ds = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet",
                               columns=["doc_id", "text"]).limit(50)
    out = semantic_chunk_documents(ds, kind="statistical",
                                   concurrency=2).to_pandas()
    assert set(out.columns) == {"doc_id", "chunk_id", "chunk"}
    assert out.groupby("doc_id")["chunk_id"].min().eq(0).all()
    # every sampled doc produced at least one chunk
    assert out["doc_id"].nunique() == 50


def test_adaptive_threshold_variant(ray_session):
    """F7 median/std adaptive threshold: lossless coverage, determinism,
    and boundaries derived from the doc's own similarity distribution."""
    import numpy as np
    import pandas as pd
    import ray.data
    from engine.semantic_chunk import StatisticalChunker, semantic_chunk_documents

    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["alpha beta gamma. alpha beta delta. cars trucks roads. "
                 "cars roads fuel. alpha beta term. music songs piano."] * 3 +
                ["one two. one two. one two."] * 3,
    })
    c = StatisticalChunker(threshold="adaptive")
    for t in docs["text"]:
        chunks = c.chunk_text(t)
        assert chunks
        joined = " ".join(chunks)
        # sentence coverage: every sentence survives, in order
        from engine.semantic_chunk import split_sentences
        assert [s for ch in chunks for s in split_sentences(ch)] == \
            split_sentences(t)
    a = (semantic_chunk_documents(ray.data.from_pandas(docs),
                                  threshold="adaptive", concurrency=2)
         .to_pandas().sort_values(["doc_id", "chunk_id"])
         .reset_index(drop=True))
    b = (semantic_chunk_documents(ray.data.from_pandas(docs).repartition(4),
                                  threshold="adaptive", concurrency=2)
         .to_pandas().sort_values(["doc_id", "chunk_id"])
         .reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
