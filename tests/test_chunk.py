"""Chunker spec tests (engine/chunk.py pinned spec).

Mirrors the reference's chunk-count golden style
(/root/reference/processors/src/pdf/pdf_processor.rs:104-123 asserts
4,271 chunks at chunk_size=128) with property tests: losslessness,
budget, explode row counts.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from engine.chunk import (split_markdown, split_fixed, chunk_documents,
                          make_chunk_batch)
from engine.fixtures import gen_row


def _fixture_texts(n=40):
    return [gen_row(i)["text"] for i in range(n)]


def test_lossless_no_overlap():
    for t in _fixture_texts():
        for size in (64, 128, 1000):
            chunks = split_markdown(t, size)
            assert "".join(chunks) == t
            assert all(chunks)


def test_budget_respected():
    for t in _fixture_texts(20):
        for size in (50, 200):
            for c in split_markdown(t, size):
                assert len(c) <= size


def test_oversize_paragraph_recurses():
    text = "word " * 500  # single huge 'paragraph', no \n\n
    chunks = split_markdown(text.strip(), 100)
    assert all(len(c) <= 100 for c in chunks)
    assert "".join(chunks) == text.strip()


def test_unsplittable_run_falls_to_chars():
    text = "x" * 350
    chunks = split_markdown(text, 100)
    assert chunks == ["x" * 100] * 3 + ["x" * 50]


def test_overlap_prefixes():
    t = "aaaa\n\nbbbb\n\ncccc\n\ndddd"
    base = split_markdown(t, 8)
    ov = split_markdown(t, 8, overlap=3)
    assert len(ov) == len(base)
    assert ov[0] == base[0]
    for prev, got, b in zip(base, ov[1:], base[1:]):
        assert got == prev[-3:] + b


def test_fixed_windows():
    assert split_fixed("abcdefghij", 4) == ["abcd", "efgh", "ij"]
    assert split_fixed("abcdefghij", 4, overlap=2) == [
        "abcd", "cdef", "efgh", "ghij", "ij"]
    assert split_fixed("", 4) == []


def test_degenerate_params():
    with pytest.raises(ValueError):
        split_markdown("x", 0)
    with pytest.raises(ValueError):
        split_markdown("x", 4, overlap=4)
    with pytest.raises(ValueError):
        split_fixed("x", 4, overlap=4)


def test_chunk_batch_explodes():
    batch = pa.table({
        "doc_id": pa.array([7, 8], pa.int64()),
        "text": pa.array(["abcdefgh", ""], pa.string()),
    })
    out = make_chunk_batch(chunk_size=3, mode="fixed")(batch)
    assert out.column("doc_id").to_pylist() == [7, 7, 7]
    assert out.column("chunk_id").to_pylist() == [0, 1, 2]
    assert out.column("chunk").to_pylist() == ["abc", "def", "gh"]
    assert out.column("n_chars").to_pylist() == [3, 3, 2]


def test_chunk_documents_dataset(ray_session):
    import ray.data
    ds = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet",
                               columns=["doc_id", "text"])
    out = chunk_documents(ds, chunk_size=100, mode="markdown").to_pandas()
    docs = ds.to_pandas()
    # every doc with text produced >= 1 chunk; reassembly matches
    joined = out.sort_values(["doc_id", "chunk_id"]).groupby("doc_id")[
        "chunk"].agg("".join)
    for _, row in docs.iterrows():
        if row["text"]:
            assert joined[row["doc_id"]] == row["text"]


# --- independent oracle implementation (iterative, stack-based — written
# separately from engine.chunk._pack's recursive form) -----------------------

def _oracle_pack(text, size):
    LEVELS = ["\n\n", "\n", ". ", " "]

    def units_of(s, sep):
        if sep == ". ":
            ps = s.split(". ")
        else:
            ps = s.split(sep)
        if len(ps) == 1:
            return [s]
        return [p + sep for p in ps[:-1]] + [ps[-1]]

    def pack(s, level):
        if len(s) <= size:
            return [s] if s else []
        if level >= len(LEVELS):
            return [s[i:i + size] for i in range(0, len(s), size)]
        us = units_of(s, LEVELS[level])
        if len(us) == 1:
            return pack(s, level + 1)
        out, cur = [], ""
        for u in us:
            if len(cur) + len(u) <= size:
                cur += u
                continue
            if cur:
                out.append(cur)
            if len(u) <= size:
                cur = u
            else:
                ps = pack(u, level + 1)
                out.extend(ps[:-1])
                cur = ps[-1] if ps else ""
        if cur:
            out.append(cur)
        return out

    return pack(text, 0)


def test_markdown_matches_independent_oracle_fixture():
    for t in _fixture_texts(30):
        for size in (40, 128, 500):
            assert split_markdown(t, size) == _oracle_pack(t, size), (size, t[:60])


def test_markdown_matches_independent_oracle_random():
    from hypothesis import given, settings, strategies as st
    alphabet = st.sampled_from(list("ab c.\n") + ["\n\n", ". ", "  "])

    @settings(max_examples=200, deadline=None)
    @given(st.lists(alphabet, max_size=80).map("".join),
           st.integers(min_value=1, max_value=30))
    def run(text, size):
        got = split_markdown(text, size)
        assert got == _oracle_pack(text, size)
        assert "".join(got) == text
        assert all(len(c) <= size for c in got)

    run()


def test_split_sentence_strategy():
    from engine.chunk import split_sentence
    text = ("First sentence here. Second one is a bit longer. Third. "
            "Fourth sentence ends the text")
    chunks = split_sentence(text, chunk_size=40)
    assert "".join(chunks) == text                 # lossless
    assert all(len(c) <= 40 for c in chunks)       # budget
    # sentence units are kept whole when they fit: every chunk except
    # the last ends with a sentence boundary
    assert all(c.endswith(". ") or c.endswith(".") for c in chunks[:-1])
    # oversize single sentence falls back to word/char splits
    big = "word " * 30
    over = split_sentence(big.strip(), chunk_size=20)
    assert "".join(over) == big.strip()
    assert all(len(c) <= 20 for c in over)
    # overlap semantics match the markdown splitter's
    ov = split_sentence(text, chunk_size=40, overlap=5)
    assert ov[1].startswith(chunks[0][-5:])


def test_chunk_by_config_routing(ray_session):
    import ray.data
    from engine.chunk import chunk_by_config, split_sentence, split_markdown
    from engine.config import EngineConfig

    df = pd.DataFrame({"doc_id": [1, 2],
                       "text": ["alpha beta. gamma delta. " * 20,
                                "para one\n\npara two\n\n" + "x " * 50]})
    ds = ray.data.from_pandas(df)
    for strat, fn in (("sentence", split_sentence),
                      ("markdown", split_markdown)):
        cfg = EngineConfig(splitting_strategy=strat, chunk_size=60)
        out = (chunk_by_config(ds, cfg).to_pandas()
               .sort_values(["doc_id", "chunk_id"]))
        want = [c for t in df["text"] for c in fn(t, 60)]
        assert out["chunk"].tolist() == want
    # semantic routes to the actor pool (schema check only)
    outs = chunk_by_config(ds, EngineConfig(splitting_strategy="semantic")
                           ).to_pandas()
    assert {"doc_id", "chunk_id", "chunk"} <= set(outs.columns)
    with pytest.raises(ValueError):
        chunk_by_config(ds, EngineConfig(splitting_strategy="nope"))
    # config round-trips through to_dict/from_dict with the new fields
    cfg = EngineConfig(splitting_strategy="fixed", chunk_size=123,
                       chunk_overlap=7, late_chunking=True)
    assert EngineConfig.from_dict(cfg.to_dict()) == cfg
