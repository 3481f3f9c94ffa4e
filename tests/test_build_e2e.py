"""End-to-end build: webtext -> index, checked against brute-force truth.

Covers FIXTURES.md §5 merge-equivalence (identical segments at different
parallelism) and the dedup-by-url rule, plus manifest stats.
"""

import collections
import json
import os

import numpy as np
import pyarrow.parquet as pq
import pytest
import ray.data

from engine import index_io
from engine.build import build_index
from engine.config import EngineConfig
from engine.postings import decode_postings
from engine.tokenize import tokenize, doc_ids_from_urls

CFG = EngineConfig(num_parts=8, docmeta_parts=3)


def _expected_corpus(src_dir):
    """Brute-force expected docs after dedup: url -> (doc_id, text)."""
    import glob
    tables = [pq.read_table(f) for f in sorted(glob.glob(f"{src_dir}/*.parquet"))]
    import pyarrow as pa
    t = pa.concat_tables(tables)
    best = {}
    for url, ts, text in zip(t["url"].to_pylist(),
                             t["warc_ts"].cast("int64").to_pylist(),
                             t["text"].to_pylist()):
        if url not in best or ts < best[url][0]:
            best[url] = (ts, text)
    urls = sorted(best)
    ids = doc_ids_from_urls(urls)
    return {u: (int(i), best[u][1]) for u, i in zip(urls, ids)}


@pytest.fixture(scope="module")
def built(unit_webtext, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("idx") / "unit_index")
    manifest = build_index(unit_webtext, idx, CFG)
    return unit_webtext, idx, manifest


def test_manifest_stats(built):
    src, idx, manifest = built
    exp = _expected_corpus(src)
    assert manifest["stats"]["n_docs"] == len(exp)
    exp_tokens = sum(len(tokenize(t)) for _, t in exp.values())
    assert manifest["stats"]["total_tokens"] == exp_tokens
    assert manifest["stats"]["avgdl"] == pytest.approx(exp_tokens / len(exp))
    # per-part lineage + metrics present (north_rule)
    assert manifest["parts"]
    for key, pm in manifest["parts"].items():
        assert pm["checksum"]
        assert "wall_s" in pm


def test_docmeta_complete(built):
    src, idx, _ = built
    exp = _expected_corpus(src)
    dm = index_io.read_docmeta(idx, CFG)
    got = dict(zip(dm["doc_id"].to_pylist(), dm["url"].to_pylist()))
    assert len(got) == len(exp)
    for url, (did, _) in exp.items():
        assert got[did] == url


def test_postings_match_bruteforce(built):
    src, idx, _ = built
    exp = _expected_corpus(src)
    # brute-force inverted index
    truth = collections.defaultdict(dict)
    for url, (did, text) in exp.items():
        for term, tf in collections.Counter(tokenize(text)).items():
            truth[term][did] = tf
    n_terms_seen = 0
    for part in range(CFG.num_parts):
        terms, postings, skips = index_io.read_postings_part(idx, part)
        for row in terms.to_pylist():
            t = row["term"]
            ids, tfs = decode_postings(
                postings[row["post_off"]:row["post_off"] + row["post_len"]],
                skips[row["skip_off"]:row["skip_off"] + row["skip_len"]],
                row["df"], CFG.block_size)
            expected = truth[t]
            assert row["df"] == len(expected), t
            assert (np.diff(ids.astype(np.int64)) > 0).all() or len(ids) <= 1
            got = dict(zip(ids.astype(np.int64).tolist(),
                           tfs.astype(int).tolist()))
            assert got == expected, f"postings mismatch for term {t!r}"
            n_terms_seen += 1
    assert n_terms_seen == len(truth)


def test_merge_equivalence_parallelism(built, unit_webtext, tmp_path_factory):
    """Same corpus at different input blocking -> byte-identical segments
    (FIXTURES.md §5)."""
    _, idx_a, _ = built
    import hashlib

    def seg_hashes(idx):
        out = {}
        for part in range(CFG.num_parts):
            d = index_io.part_dir(idx, "postings", part)
            if not os.path.isdir(d):
                continue
            h = hashlib.sha256()
            for name in ("postings.bin", "skips.bin"):
                with open(os.path.join(d, name), "rb") as f:
                    h.update(f.read())
            terms = pq.read_table(os.path.join(d, "terms.parquet"))
            h.update(json.dumps(terms.to_pylist(), sort_keys=True).encode())
            out[part] = h.hexdigest()
        return out

    for blocks in (1, 13):
        idx_b = str(tmp_path_factory.mktemp("idx_eq") / f"blk{blocks}")
        ds = ray.data.read_parquet(unit_webtext,
                                   columns=["url", "warc_ts", "html"])
        ds = ds.repartition(blocks)
        build_index(ds, idx_b, CFG)
        assert seg_hashes(idx_b) == seg_hashes(idx_a), f"blocks={blocks}"


def test_dedup_kept_earliest(built):
    src, idx, _ = built
    exp = _expected_corpus(src)
    dm = index_io.read_docmeta(idx, CFG)
    # every url appears exactly once
    urls = dm["url"].to_pylist()
    assert len(urls) == len(set(urls)) == len(exp)


def test_duplicate_losers_distributed_branch(unit_webtext):
    """Force the distributed-groupby branch (driver_threshold=0) and
    assert it returns the same loser map as the driver-side branch —
    covers the datetime64[us] conversion path."""
    from engine.build import duplicate_losers
    keys = ray.data.read_parquet(unit_webtext, columns=["url", "warc_ts"])
    drv = duplicate_losers(keys, num_partitions=4)
    dist = duplicate_losers(keys, num_partitions=4, driver_threshold=0)
    assert drv and dist == drv


def test_join_dedup_equals_broadcast(e2e_webtext, tmp_path_factory):
    """The distributed left_semi-join dedup path produces a
    bit-identical index to the broadcast-filter path (same part
    checksums), so either strategy can run at any scale."""
    from engine import index_io

    base = tmp_path_factory.mktemp("dd")
    cfg_b = EngineConfig(num_parts=8, docmeta_parts=3,
                         dedup_strategy="broadcast")
    cfg_j = EngineConfig(num_parts=8, docmeta_parts=3,
                         dedup_strategy="join")
    m_b = build_index(e2e_webtext, str(base / "bcast"), cfg_b)
    m_j = build_index(e2e_webtext, str(base / "join"), cfg_j)
    assert m_b["stats"] == m_j["stats"]
    cks_b = {k: v["checksum"] for k, v in m_b["parts"].items()}
    cks_j = {k: v["checksum"] for k, v in m_j["parts"].items()}
    assert cks_b == cks_j


def test_build_with_filtered_empty_blocks(e2e_webtext, tmp_path_factory):
    """A pre-filtered input Dataset (sharding/selection upstream of the
    build) produces empty blocks; the join-dedup branch additionally
    emits schema-less empties.  Ray Data passes empty non-Mapping
    batches through map_batches UNCHANGED with the upstream schema,
    which used to poison the fused extract->tokenize rebatch concat
    (KeyError 'Column text does not exist in schema', reproduced at
    12.8M docs with a 1-in-4 shard filter).  The numpy-batch stages
    must build normally, and the union of shard builds must cover
    exactly the dedup survivors."""
    import pyarrow as pa

    base = tmp_path_factory.mktemp("shardfilter")
    cfg = EngineConfig(num_parts=8, docmeta_parts=3,
                       dedup_strategy="join")
    S = 4
    expected = _expected_corpus(e2e_webtext)
    n_total = 0
    for s in range(S):
        def shard_filter(t: pa.Table, s=s) -> pa.Table:
            ids = doc_ids_from_urls(
                np.asarray(t.column("url").to_pylist(), dtype=object))
            return t.filter(pa.array((ids % S) == s))
        ds = ray.data.read_parquet(e2e_webtext).map_batches(
            shard_filter, batch_format="pyarrow")
        m = build_index(ds, str(base / f"s{s}"), cfg)
        n_exp = sum(1 for (did, _) in expected.values() if did % S == s)
        assert m["stats"]["n_docs"] == n_exp
        n_total += m["stats"]["n_docs"]
    assert n_total == len(expected)


def test_doc_id_collision_fails_loudly(tmp_path_factory, monkeypatch):
    """Two distinct urls forced onto one doc_id must abort the docmeta
    part, not silently drop a document (63-bit id space guard)."""
    import pyarrow as pa
    from engine import build as B

    def colliding_ids(urls):
        return np.full(len(urls), 42, dtype=np.int64)

    monkeypatch.setattr(B, "doc_ids_from_urls", colliding_ids)
    t = pa.table({
        "url": pa.array(["http://a/1", "http://a/2"]),
        "warc_ts": pa.array(np.zeros(2, dtype="datetime64[us]")),
        "html": pa.array([b"<html><body><p>x y</p></body></html>"] * 2,
                         pa.binary()),
    })
    import ray.data
    idx = str(tmp_path_factory.mktemp("clash") / "idx")
    with pytest.raises(Exception, match="doc_id collision"):
        build_index(ray.data.from_arrow(t), idx,
                    EngineConfig(num_parts=2, docmeta_parts=1))


def test_doc_id_collision_resolved_wide_ids(tmp_path_factory, monkeypatch):
    """The same forced collision BUILDS under wide_doc_ids=True: the
    pre-pass detects the shared id, re-ids the lexicographically larger
    url via salted rehash, and both documents index and serve."""
    import pyarrow as pa
    import ray.data
    from engine import build as B
    from engine.query import InvertedIndex
    from engine.tokenize import stable_hash64

    real = B.doc_ids_from_urls

    def colliding_ids(urls):
        # only the two planted urls collide; remapped probes hash free
        out = real(urls)
        plant = np.isin(np.asarray(urls, dtype=object),
                        np.array(["http://a/1", "http://a/2"], dtype=object))
        out[plant] = 42
        return out

    monkeypatch.setattr(B, "doc_ids_from_urls", colliding_ids)
    t = pa.table({
        "url": pa.array(["http://a/1", "http://a/2"]),
        "warc_ts": pa.array(np.zeros(2, dtype="datetime64[us]")),
        "html": pa.array([b"<html><body><p>alpha beta</p></body></html>",
                          b"<html><body><p>gamma delta</p></body></html>"],
                         pa.binary()),
    })
    idx = str(tmp_path_factory.mktemp("wide") / "idx")
    m = B.build_index(ray.data.from_arrow(t), idx,
                      EngineConfig(num_parts=2, docmeta_parts=1,
                                   wide_doc_ids=True))
    assert m["stats"]["n_docs"] == 2
    assert m["lineage"]["id_collisions_resolved"] == 1
    ix = InvertedIndex(idx)
    # both docs present under DISTINCT ids; the kept url holds id 42
    assert set(ix._urls) == {"http://a/1", "http://a/2"}
    assert 42 in ix._doc_ids
    expect_new = int(stable_hash64(
        np.array(["http://a/2#wide1"], dtype=object))[0]
        & np.uint64(0x7FFFFFFFFFFFFFFF))
    assert expect_new in ix._doc_ids
    # each doc's terms retrieve exactly that doc
    (a_hit,) = ix.search("alpha", k=5)
    (g_hit,) = ix.search("gamma", k=5)
    assert a_hit[0] == 42 and g_hit[0] == expect_new


def test_extreme_stopword_skew_build(tmp_path_factory):
    """Every doc shares one hot term (df == corpus size): the salted
    partial aggregation + part shuffle must still produce a correct
    index (the north rule's stopword-skew requirement, stressed)."""
    import pandas as pd
    import ray.data
    from engine.query import InvertedIndex

    n = 4000
    rng = np.random.default_rng(11)
    texts = [f"hotterm filler{rng.integers(0, 500)} x{i % 97}"
             for i in range(n)]
    docs = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": texts})
    idx_dir = str(tmp_path_factory.mktemp("skew") / "idx")
    m = build_index(ray.data.from_pandas(docs).repartition(8), idx_dir,
                    EngineConfig(num_parts=4, docmeta_parts=2),
                    mode="docs")
    assert m["stats"]["n_docs"] == n
    idx = InvertedIndex(idx_dir)
    ent = idx.lookup("hotterm")
    assert ent is not None and ent[0] == n  # df == every doc
    hits = idx.search("hotterm", k=5)
    assert len(hits) == 5


def test_md5_routing_search_equivalence(unit_webtext, tmp_path_factory):
    """term_hash="md5" changes only WHICH part a term lives in: every
    query must return bit-identical (doc_id, score) lists vs the sip
    build, and the rolled-up totals must match exactly."""
    from engine.query import InvertedIndex
    sip_dir = str(tmp_path_factory.mktemp("idx") / "sip")
    md5_dir = str(tmp_path_factory.mktemp("idx") / "md5")
    m_sip = build_index(unit_webtext, sip_dir, CFG)
    m_md5 = build_index(unit_webtext, md5_dir,
                        EngineConfig(num_parts=8, docmeta_parts=3,
                                     term_hash="md5"))
    assert m_sip["stats"] == {**m_md5["stats"]}
    a, b = InvertedIndex(sip_dir), InvertedIndex(md5_dir)
    for q in ("the data", "merge sort join", "xyz unknown", "a"):
        for method in ("bmw", "daat"):
            assert a.search(q, k=10, method=method) == \
                b.search(q, k=10, method=method), (q, method)


def test_suggest_layout_rule():
    a = EngineConfig.suggest_layout(1_600_000, 32)
    assert a.num_parts == 128          # the measured A/B winner
    b = EngineConfig.suggest_layout(6_400_000, 32)
    assert b.num_parts > a.num_parts   # grows with corpus size
    assert b.num_parts & (b.num_parts - 1) == 0     # power of two
    assert EngineConfig.suggest_layout(1000, 8).num_parts >= 32  # cpu floor
