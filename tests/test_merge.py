"""Segment merging: merged halves must be bit-identical to one build
over the union corpus (part checksums equal), and queries through the
merged index are rank-identical."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from engine.build import build_index
from engine.config import EngineConfig
from engine.merge import merge_indexes
from engine.query import InvertedIndex
from engine.tokenize import stable_hash64

CFG = EngineConfig(num_parts=8, docmeta_parts=3)


@pytest.fixture(scope="module")
def split_dirs(e2e_webtext, tmp_path_factory):
    """Split the e2e webtext by url hash into two shard dirs (duplicate
    urls share the hash, so dedup stays within a shard)."""
    base = tmp_path_factory.mktemp("halves")
    tabs = [pq.read_table(os.path.join(e2e_webtext, f))
            for f in sorted(os.listdir(e2e_webtext))
            if f.endswith(".parquet")]
    tab = pa.concat_tables(tabs)
    h = stable_hash64(np.asarray(tab.column("url").to_pylist(),
                                 dtype=object)) % np.uint64(2)
    for half in (0, 1):
        d = base / f"half{half}"
        d.mkdir()
        pq.write_table(tab.filter(pa.array(h == half)),
                       str(d / "part-0.parquet"))
    return str(base / "half0"), str(base / "half1")


def test_merge_equals_full_build(ray_session, e2e_webtext, split_dirs,
                                 tmp_path_factory):
    out = tmp_path_factory.mktemp("merged")
    m_full = build_index(e2e_webtext, str(out / "full"), CFG)
    m_a = build_index(split_dirs[0], str(out / "a"), CFG)
    m_b = build_index(split_dirs[1], str(out / "b"), CFG)
    assert (m_a["stats"]["n_docs"] + m_b["stats"]["n_docs"]
            == m_full["stats"]["n_docs"])

    m_merged = merge_indexes([str(out / "a"), str(out / "b")],
                             str(out / "merged"))
    assert m_merged["stats"] == m_full["stats"]
    cks_full = {k: v["checksum"] for k, v in m_full["parts"].items()}
    cks_merged = {k: v["checksum"] for k, v in m_merged["parts"].items()}
    assert cks_full == cks_merged

    # query through the merged index: rank-identical to the full build
    qf = InvertedIndex(str(out / "full"))
    qm = InvertedIndex(str(out / "merged"))
    for q in ("the", "the of and", "rucâïshp", "引化日取日"):
        assert qm.search(q, k=10) == qf.search(q, k=10)


def test_update_index_equals_full_build(ray_session, e2e_webtext,
                                        split_dirs, tmp_path_factory):
    """update_index(full corpus) onto a half-corpus index: the anti-join
    skips every already-indexed url, the delta covers exactly the other
    half, and the merged output is bit-identical to one build over the
    whole corpus."""
    from engine.build import update_index

    out = tmp_path_factory.mktemp("upd")
    m_full = build_index(e2e_webtext, str(out / "full"), CFG)
    m_a = build_index(split_dirs[0], str(out / "a"), CFG)
    assert m_a["stats"]["n_docs"] < m_full["stats"]["n_docs"]

    m_upd = update_index(e2e_webtext, str(out / "a"), str(out / "upd"))
    assert m_upd["stats"] == m_full["stats"]
    cks_full = {k: v["checksum"] for k, v in m_full["parts"].items()}
    cks_upd = {k: v["checksum"] for k, v in m_upd["parts"].items()}
    assert cks_full == cks_upd

    # idempotence: updating with an already-covered source adds nothing
    m_again = update_index(e2e_webtext, str(out / "upd"),
                           str(out / "again"))
    assert m_again["stats"] == m_full["stats"]


def test_update_index_carries_deletes(ray_session, split_dirs,
                                      tmp_path_factory):
    from engine import index_io
    from engine.build import update_index

    out = tmp_path_factory.mktemp("upd_del")
    build_index(split_dirs[0], str(out / "a"), CFG)
    idx = InvertedIndex(str(out / "a"))
    victim = idx.search("the", k=1)[0][0]
    index_io.delete_docs(str(out / "a"), [victim])
    update_index(split_dirs[1], str(out / "a"), str(out / "upd"))
    assert index_io.load_deletes(str(out / "upd")).tolist() == [victim]
    merged = InvertedIndex(str(out / "upd"))
    assert victim not in [d for d, _ in merged.search("the", k=10**6)]


def test_merge_rejects_incompatible(ray_session, split_dirs,
                                    tmp_path_factory):
    out = tmp_path_factory.mktemp("incompat")
    build_index(split_dirs[0], str(out / "a"), CFG)
    build_index(split_dirs[1], str(out / "b"),
                EngineConfig(num_parts=4, docmeta_parts=3))
    with pytest.raises(ValueError, match="incompatible"):
        merge_indexes([str(out / "a"), str(out / "b")], str(out / "m"))
