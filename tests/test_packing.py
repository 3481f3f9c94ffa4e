"""Distributed prefix-scan sequence packing vs a naive serial cumsum."""

import numpy as np
import pyarrow as pa

import ray

from engine.packing import pack_sequences
from engine.tokenize import tokenize


def _naive(ids, texts, budget):
    order = np.argsort(ids)
    out = {}
    run = 0
    for i in order:
        nt = len(tokenize(texts[i]))
        out[int(ids[i])] = (nt, run // budget, run % budget)
        run += nt
    return out


def test_pack_sequences_matches_serial_scan():
    rng = np.random.default_rng(11)
    # SPARSE, shuffled doc ids spanning many range buckets
    ids = rng.choice(10_000_000, size=400, replace=False).astype(np.int64)
    texts = [" ".join(rng.choice(["a", "bb", "ccc", "dddd"],
                                 size=int(rng.integers(0, 60))))
             for _ in ids]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids), "text": pa.array(texts, pa.string())}))
    got = pack_sequences(ds, budget=100, n_buckets=32).to_pandas()
    want = _naive(ids, texts, 100)
    assert len(got) == len(ids)
    for _, r in got.iterrows():
        nt, seq, off = want[int(r["doc_id"])]
        assert (r["n_tokens"], r["seq_id"], r["off_in_seq"]) == \
            (nt, seq, off), int(r["doc_id"])


def test_pack_sequences_boundary_doc():
    # doc that STARTS before the boundary stays in the earlier sequence
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["a " * 90, "b " * 20, "c " * 5], pa.string()),
    }))
    got = pack_sequences(ds, budget=100, n_buckets=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(got["seq_id"]) == [0, 0, 1]      # doc 1 starts at 90 < 100
    assert list(got["off_in_seq"]) == [0, 90, 10]
