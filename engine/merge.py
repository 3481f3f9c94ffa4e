"""Index merging + compaction: segment rewrites over built indexes.

The classic segment-merge of a search engine (SPIMI's final phase; the
reference delegates all index structure to external vector DBs, so this
is engine-native capability beyond it).  Inputs must share the same
layout config (num_parts, docmeta_parts, block_size, tokenizer).  Merge
is embarrassingly parallel per partition: part p of every input merges
into part p of the output — expressed as a Ray Data pipeline over the
part list, one merge task per part.  ``compact_index`` is the same
rewrite over ONE index minus its tombstones (``index_io.delete_docs``
overlay), re-basing the stale statistics.

Per-posting doclens (needed to rebuild block-max min_doclen for the
re-blocked runs) come from the inputs' docmeta, broadcast once via
ray.put (two int64 arrays; fine to ~10^9 docs on a 128 GB node).  The
10^12-doc path shards the lookup: doc-range-partitioned docmeta and a
doc_id-sorted merge per range — same math, documented not built.

Byte-determinism: merged parts are bit-identical to a single build over
the union corpus (same term order, same docID-sorted runs, same codec)
— asserted by tests/test_merge.py via part checksums.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from engine import index_io
from engine.config import EngineConfig
from engine.metrics import PartMetrics, Timer, sha256_of
from engine.postings import (encode_postings, decode_postings, decode_skips,
                             decode_positions, encode_positions,
                             gather_slices)


def _check_compatible(manifests: list[dict]) -> EngineConfig:
    cfgs = [EngineConfig.from_dict(m["config"]) for m in manifests]
    for f in ("num_parts", "docmeta_parts", "block_size", "cjk_unigrams",
              "store_positions", "term_hash"):
        vals = {getattr(c, f) for c in cfgs}
        if len(vals) != 1:
            raise ValueError(f"incompatible indexes: {f} differs ({vals})")
    return cfgs[0]


def _doclen_lookup(index_dirs: list[str], cfg: EngineConfig):
    """-> (sorted doc_ids, doclens) across all inputs (dedup: first)."""
    ids_l, dls_l = [], []
    for d in index_dirs:
        dm = index_io.read_docmeta(d, cfg)
        ids_l.append(dm.column("doc_id").to_numpy())
        dls_l.append(dm.column("doclen").to_numpy())
    ids = np.concatenate(ids_l)
    dls = np.concatenate(dls_l)
    order = np.argsort(ids, kind="stable")
    ids, dls = ids[order], dls[order]
    keep = np.concatenate(([True], np.diff(ids) != 0))
    return ids[keep], dls[keep].astype(np.int64)


def merge_indexes(index_dirs: list[str], out_dir: str) -> dict:
    """Merge N compatible indexes into ``out_dir``; returns the manifest."""
    return _rewrite(list(index_dirs), out_dir,
                    drop_ids=np.empty(0, dtype=np.int64),
                    lineage_key="merged_from")


def compact_index(index_dir: str, out_dir: str) -> dict:
    """Rewrite an index WITHOUT its tombstoned documents (the segment
    merge that re-bases statistics after ``index_io.delete_docs``):
    every posting run drops the deleted docIDs and re-encodes, terms
    whose df reaches 0 vanish, docmeta parts are filtered, and the
    manifest's N/avgdl/df-bearing stats are recomputed — so post-compact
    scores equal a FRESH BUILD over the surviving corpus bit-for-bit
    (asserted by tests/test_deletes.py via part checksums).  Same
    per-part Ray pipeline as merge_indexes; the output carries no
    deletion overlay."""
    drop = index_io.load_deletes(index_dir)
    return _rewrite([index_dir], out_dir, drop_ids=drop,
                    lineage_key="compacted_from",
                    extra_lineage={"n_deleted": int(drop.size)})


def _rewrite(dirs: list[str], out_dir: str, drop_ids: np.ndarray,
             lineage_key: str, extra_lineage: dict | None = None) -> dict:
    manifests = [index_io.load_manifest(d) for d in dirs]
    cfg = _check_compatible(manifests)
    lookup_ref = ray.put(_doclen_lookup(dirs, cfg))
    drop_ref = ray.put(np.sort(np.asarray(drop_ids, dtype=np.int64)))

    def merge_one(batch: pa.Table) -> pa.Table:
        rows = []
        for kind, part in zip(batch.column("kind").to_pylist(),
                              batch.column("part").to_pylist()):
            with Timer() as t:
                if kind == "docmeta":
                    m = _merge_docmeta(dirs, out_dir, cfg, part, drop_ref)
                else:
                    m = _merge_postings(dirs, out_dir, cfg, part,
                                        lookup_ref, drop_ref)
            m.wall_s = t.wall_s
            rows.append({"kind": kind, "part": part,
                         "checksum": m.checksum})
        return pa.Table.from_pylist(rows)

    parts = ([{"kind": "postings", "part": p}
              for p in range(cfg.num_parts)] +
             [{"kind": "docmeta", "part": p}
              for p in range(cfg.docmeta_parts)])
    (ray.data.from_items(parts)
     .map_batches(merge_one, batch_format="pyarrow", batch_size=1)
     .take_all())
    lineage = {lineage_key: dirs, **(extra_lineage or {})}
    return index_io.finalize(out_dir, cfg, lineage)


def _drop_mask(ids: np.ndarray, drop: np.ndarray) -> np.ndarray:
    """Boolean keep-mask: True where ``ids`` is NOT in sorted ``drop``."""
    if drop.size == 0:
        return np.ones(ids.size, dtype=bool)
    p = np.searchsorted(drop, ids)
    p[p >= drop.size] = drop.size - 1
    return drop[p] != ids


def _merge_docmeta(dirs: list[str], out_dir: str, cfg: EngineConfig,
                   part: int, drop_ref=None) -> PartMetrics:
    import os
    import pyarrow.parquet as pq
    tabs = []
    for d in dirs:
        p = os.path.join(index_io.part_dir(d, "docmeta", part),
                         "docmeta.parquet")
        if os.path.exists(p):
            tabs.append(pq.read_table(p))
    tab = pa.concat_tables(tabs)
    ids = tab.column("doc_id").to_numpy()
    dls = tab.column("doclen").to_numpy()
    urls = np.asarray(tab.column("url").to_pylist(), dtype=object)
    if drop_ref is not None:
        live = _drop_mask(ids.astype(np.int64), ray.get(drop_ref))
        ids, dls, urls = ids[live], dls[live], urls[live]
    order = np.argsort(ids, kind="stable")
    ids, dls, urls = ids[order], dls[order], urls[order]
    keep = np.concatenate(([True], np.diff(ids) != 0))
    ids, dls, urls = ids[keep], dls[keep], urls[keep]
    out = pa.table({"doc_id": ids, "url": urls.tolist(),
                    "doclen": dls.astype(np.int32)})
    m = PartMetrics(part=part, kind="docmeta", n_docs=ids.size,
                    sum_doclen=int(dls.sum()),
                    checksum=sha256_of(ids.tobytes(),
                                       dls.astype(np.int32).tobytes()),
                    lineage={"merged_from": dirs})
    index_io.write_docmeta_part(out_dir, part, out, m)
    return m


def _merge_postings(dirs: list[str], out_dir: str, cfg: EngineConfig,
                    part: int, lookup_ref, drop_ref=None) -> PartMetrics:
    import os
    all_ids, all_dls = ray.get(lookup_ref)
    drop = ray.get(drop_ref) if drop_ref is not None else None
    with_pos = cfg.store_positions
    per_term: dict[str, list] = {}
    for d in dirs:
        pdir = index_io.part_dir(d, "postings", part)
        if not os.path.isdir(pdir):
            continue
        terms, postings, skips = index_io.read_postings_part(d, part)
        posblob = (index_io.read_positions_blob(d, part)
                   if with_pos else b"")
        cols = [terms.column(c).to_pylist()
                for c in ("term", "df", "post_off", "post_len",
                          "skip_off", "skip_len")]
        pcols = ([terms.column(c).to_pylist()
                  for c in ("pos_off", "pos_len")]
                 if with_pos else [[0] * terms.num_rows] * 2)
        for t, df, po, pl, so, sl, qo, ql in zip(*cols, *pcols):
            ids, tfs = decode_postings(
                postings[po:po + pl],
                skips[so:so + sl], df, cfg.block_size)
            tfs = tfs.astype(np.int64)
            occ = (decode_positions(posblob[qo:qo + ql], tfs)
                   if with_pos else None)
            per_term.setdefault(t, []).append(
                (ids.astype(np.int64), tfs, occ))

    terms_out, dfs, cfs = [], [], []
    offs, lens, soffs, slens = [], [], [], []
    qoffs, qlens = [], []
    post_blobs, skip_blobs, pos_blobs = [], [], []
    post_off = skip_off = qpos_off = 0
    n_postings = 0
    for term in sorted(per_term):
        runs = per_term[term]
        ids = np.concatenate([r[0] for r in runs])
        tfs = np.concatenate([r[1] for r in runs])
        occ = np.concatenate([r[2] for r in runs]) if with_pos else None
        order = np.argsort(ids, kind="stable")
        if with_pos:
            starts_e = np.concatenate(([0], np.cumsum(tfs)[:-1]))
            occ = gather_slices(occ, starts_e, tfs, order)
        ids, tfs = ids[order], tfs[order]
        # same doc in several inputs (rebuild overlap): sum tfs
        new = np.concatenate(([True], np.diff(ids) != 0))
        if not new.all():
            if with_pos:
                raise ValueError(
                    f"part {part}: doc indexed in several inputs — a "
                    "positional merge cannot reconcile its occurrence "
                    "streams (deduplicate the builds first)")
            starts = np.flatnonzero(new)
            tfs = np.add.reduceat(tfs, starts)
            ids = ids[starts]
        if drop is not None and drop.size:
            live = _drop_mask(ids, drop)
            if with_pos:
                occ = occ[np.repeat(live, tfs)]
            ids, tfs = ids[live], tfs[live]
            if ids.size == 0:
                continue  # term fully deleted: vanishes from the dict
        pos = np.searchsorted(all_ids, ids)
        dls = all_dls[pos]
        pb, sb = encode_postings(ids, tfs, dls, cfg.block_size)
        terms_out.append(term)
        dfs.append(ids.size)
        cfs.append(int(tfs.sum()))
        offs.append(post_off); lens.append(len(pb))
        soffs.append(skip_off); slens.append(len(sb))
        post_off += len(pb); skip_off += len(sb)
        post_blobs.append(pb); skip_blobs.append(sb)
        if with_pos:
            qb = encode_positions(occ, tfs)
            qoffs.append(qpos_off); qlens.append(len(qb))
            qpos_off += len(qb)
            pos_blobs.append(qb)
        n_postings += ids.size
    postings_blob = b"".join(post_blobs)
    skips_blob = b"".join(skip_blobs)
    tcols = {
        "term": pa.array(terms_out, pa.large_string()),
        "df": pa.array(dfs, pa.int64()),
        "cf": pa.array(cfs, pa.int64()),
        "post_off": pa.array(offs, pa.int64()),
        "post_len": pa.array(lens, pa.int64()),
        "skip_off": pa.array(soffs, pa.int64()),
        "skip_len": pa.array(slens, pa.int64()),
    }
    positions_blob = None
    if with_pos:
        positions_blob = b"".join(pos_blobs)
        tcols["pos_off"] = pa.array(qoffs, pa.int64())
        tcols["pos_len"] = pa.array(qlens, pa.int64())
    terms_table = pa.table(tcols)
    m = PartMetrics(part=part, kind="postings", n_terms=len(terms_out),
                    n_postings=n_postings,
                    postings_bytes=len(postings_blob),
                    skip_bytes=len(skips_blob),
                    positions_bytes=(len(positions_blob)
                                     if positions_blob else 0),
                    checksum=(sha256_of(postings_blob, skips_blob,
                                        positions_blob)
                              if positions_blob is not None else
                              sha256_of(postings_blob, skips_blob)),
                    lineage={"merged_from": dirs})
    index_io.write_postings_part(out_dir, part, terms_table,
                                 postings_blob, skips_blob, m,
                                 positions_blob=positions_blob)
    return m
