"""Posting-list codec round-trips + block-max metadata (FIXTURES.md §5)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from engine.postings import (varbyte_encode, varbyte_decode, encode_postings,
                             decode_postings, decode_skips, decode_block)


def test_varbyte_roundtrip_basic():
    for vals in ([0], [1], [127], [128], [16383], [16384], [2**40, 0, 5],
                 [2**63 - 1], list(range(1000))):
        arr = np.array(vals, dtype=np.uint64)
        assert (varbyte_decode(varbyte_encode(arr), len(arr)) == arr).all()


def test_varbyte_empty():
    assert varbyte_encode(np.array([], np.uint64)) == b""
    assert varbyte_decode(b"").size == 0


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
def test_varbyte_roundtrip_prop(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert (varbyte_decode(varbyte_encode(arr), len(arr)) == arr).all()


def _mk(n, seed=0, gap_scale=1000):
    rng = np.random.default_rng(seed)
    gaps = rng.integers(1, gap_scale, size=n).astype(np.uint64)
    ids = np.cumsum(gaps)
    tfs = rng.integers(1, 50, size=n).astype(np.uint64)
    dls = rng.integers(20, 2000, size=n).astype(np.uint64)
    return ids, tfs, dls


@pytest.mark.parametrize("n,bs", [(1, 128), (127, 128), (128, 128),
                                  (129, 128), (1000, 128), (1000, 64),
                                  (5, 2), (300, 7)])
def test_postings_roundtrip(n, bs):
    ids, tfs, dls = _mk(n)
    pb, sb = encode_postings(ids, tfs, dls, bs)
    out_ids, out_tfs = decode_postings(pb, sb, n, bs)
    assert (out_ids == ids).all()
    assert (out_tfs == tfs).all()


def test_postings_huge_gaps():
    ids = np.array([1, 2**28, 2**28 + 1, 2**45], dtype=np.uint64)
    tfs = np.array([1, 2, 3, 4], dtype=np.uint64)
    dls = np.array([10, 10, 10, 10], dtype=np.uint64)
    pb, sb = encode_postings(ids, tfs, dls, 2)
    out_ids, out_tfs = decode_postings(pb, sb, 4, 2)
    assert (out_ids == ids).all() and (out_tfs == tfs).all()


def test_blockmax_metadata():
    ids, tfs, dls = _mk(1000, seed=3)
    bs = 128
    pb, sb = encode_postings(ids, tfs, dls, bs)
    skips = decode_skips(sb)
    n_blocks = (1000 + bs - 1) // bs
    assert skips.shape == (n_blocks, 4)
    for bi in range(n_blocks):
        lo, hi = bi * bs, min((bi + 1) * bs, 1000)
        assert skips[bi, 0] == ids[hi - 1]
        assert skips[bi, 2] == tfs[lo:hi].max()
        assert skips[bi, 3] == dls[lo:hi].min()
        # random block access decodes independently
        b_ids, b_tfs = decode_block(pb, skips, bi, 1000, bs)
        assert (b_ids == ids[lo:hi]).all()
        assert (b_tfs == tfs[lo:hi]).all()


def test_unsorted_rejected():
    with pytest.raises(ValueError):
        encode_postings(np.array([5, 3], np.uint64),
                        np.array([1, 1], np.uint64),
                        np.array([1, 1], np.uint64))


def test_empty_postings():
    pb, sb = encode_postings(np.array([], np.uint64), np.array([], np.uint64),
                             np.array([], np.uint64))
    assert pb == b"" and sb == b""
    ids, tfs = decode_postings(pb, sb, 0)
    assert ids.size == 0 and tfs.size == 0


def test_bulk_encoder_matches_per_term():
    """encode_postings_many == looped encode_postings, byte for byte
    (blobs, offsets, skip ranges) on random multi-term parts."""
    from engine.postings import encode_postings_many
    rng = np.random.default_rng(3)
    for trial in range(15):
        T = int(rng.integers(1, 30))
        sizes = rng.integers(1, 300, T)
        tstarts = np.concatenate(([0], np.cumsum(sizes)[:-1]))
        tends = np.cumsum(sizes)
        d, t, l = [], [], []
        for s in sizes:
            d.append(np.cumsum(rng.integers(1, 1000, s).astype(np.uint64)))
            t.append(rng.integers(1, 50, s).astype(np.uint64))
            l.append(rng.integers(1, 5000, s).astype(np.uint64))
        d_s, t_s, l_s = map(np.concatenate, (d, t, l))
        B = int(rng.choice([4, 17, 128]))
        pb2, sb2, po, pl, so, sl = encode_postings_many(
            d_s, t_s, l_s, tstarts, tends, B)
        off = soff = 0
        pparts, sparts = [], []
        for i, (lo, hi) in enumerate(zip(tstarts, tends)):
            pb, sb = encode_postings(d_s[lo:hi], t_s[lo:hi], l_s[lo:hi], B)
            assert (po[i], pl[i], so[i], sl[i]) == (off, len(pb),
                                                    soff, len(sb))
            off += len(pb)
            soff += len(sb)
            pparts.append(pb)
            sparts.append(sb)
        assert pb2 == b"".join(pparts) and sb2 == b"".join(sparts)
