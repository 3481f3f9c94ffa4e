"""The index build pipeline — Ray-Data-first rebuild of the reference's
flagship ingest path ``embed_directory_stream``
(/root/reference/rust/src/lib.rs:815-971).

Reference shape: dir walk -> per-file extract+chunk -> mpsc channel ->
buffered embed -> adapter upsert.  Ours (SURVEY.md §3.1):

    read_parquet(url, warc_ts, html)         # prune at the read
      -> dedup-by-url filter                  # broadcast loser set
      -> map_batches(extract_batch)           # html -> text, html dropped
      -> map_batches(tokenize_partial)        # doc_id assign + per-batch
                                              #   partial posting lists +
                                              #   docmeta rows (one shuffle
                                              #   payload, schema.SHUFFLE)
      -> groupby("part").map_groups(writer)   # THE shuffle: merge partials,
                                              #   docID-sort, delta+varbyte
                                              #   encode, atomic part commit
      -> finalize manifest

Design notes for 100 TB / 10^12-doc scale:
  * ONE all-to-all exchange (groupby on the int ``part`` key).  Partial
    aggregation inside ``tokenize_partial`` (one row per distinct term
    per batch, posting entries packed as Arrow lists) is the combiner
    that keeps stopword skew bounded: a stopword contributes one
    list-row per input batch, spread over the part's many terms.
  * ``num_parts`` is fixed by config, not by input blocking, so segment
    bytes are identical at any parallelism (FIXTURES.md §5) and the
    part key doubles as the checkpoint unit.
  * Resume: committed parts are anti-joined out of the shuffle payload
    inside ``tokenize_partial`` (the reference's get_files_to_index
    anti-join, /root/reference/rust/src/file_loader.rs:118-126).
  * The dedup loser set (~2% of urls) is collected to the driver and
    broadcast into the filter closure.  At 10^12 docs the loser set no
    longer fits; the scale path is a hash-bucketed anti-join on url —
    same filter body, bucketed build of the loser sets.
"""

from __future__ import annotations

import time
from typing import Iterable

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Count, Min

from engine import index_io
from engine.config import EngineConfig, DEFAULT_CONFIG
from engine.extract import extract_batch
from engine.metrics import PartMetrics, Timer, sha256_of
from engine.postings import encode_postings
from engine.tokenize import count_terms, doc_ids_from_urls, stable_hash64
from engine.schema import SHUFFLE


# --------------------------------------------------------------------------
# dedup (D1: exact dedup by url, keep earliest warc_ts — FIXTURES.md §1)
# --------------------------------------------------------------------------

def duplicate_losers(keys_ds: "ray.data.Dataset") -> dict[str, int]:
    """Find urls with >1 row -> {url: winner warc_ts (us)}.

    Input: a Dataset of just (url, warc_ts) — tiny columns, so the
    groupby shuffles ~20 bytes/row, never the html payload.
    """
    import pyarrow.compute as pc
    agg = keys_ds.groupby("url").aggregate(
        Min("warc_ts", alias_name="min_ts"), Count(alias_name="n")
    )
    dup = agg.map_batches(lambda t: t.filter(pc.greater(t["n"], 1)),
                          batch_format="pyarrow")
    out: dict[str, int] = {}
    for row in dup.iter_rows():
        # normalize to integer microseconds to match the filter's cast
        out[row["url"]] = int(pd.Timestamp(row["min_ts"]).value // 1000)
    return out


def make_dedup_filter(losers: dict[str, int]):
    """Vectorized keep-filter: row survives unless a duplicate url with a
    non-winning warc_ts."""
    def dedup_filter(batch: pa.Table) -> pa.Table:
        if not losers:
            return batch
        urls = batch.column("url").to_pylist()
        ts = batch.column("warc_ts").cast(pa.int64()).to_numpy()
        keep = np.fromiter(
            (u not in losers or t == losers[u] for u, t in zip(urls, ts)),
            dtype=bool, count=len(urls),
        )
        return batch.filter(pa.array(keep))
    return dedup_filter


# --------------------------------------------------------------------------
# tokenize + per-batch partial aggregation (the combiner; SURVEY.md G3)
# --------------------------------------------------------------------------

def make_tokenize_partial(cfg: EngineConfig, done_postings: frozenset[int],
                          done_docmeta: frozenset[int], with_url: bool = True):
    """Build the map_batches UDF producing the single-shuffle payload."""
    P, D = cfg.num_parts, cfg.docmeta_parts

    def tokenize_partial(batch: pa.Table) -> pa.Table:
        if with_url:
            urls = np.asarray(batch.column("url").to_pylist(), dtype=object)
            doc_ids = doc_ids_from_urls(urls)
        else:
            doc_ids = batch.column("doc_id").to_numpy()
            urls = doc_ids.astype(str).astype(object)
        texts = batch.column("text").to_pylist()
        tf = count_terms(texts, doc_ids, cfg.cjk_unigrams)

        parts, terms, d_ids, tfs_l, dls_l, urls_l = [], [], [], [], [], []

        # postings partial rows: one per distinct term in the batch
        if len(tf):
            g = tf.groupby("term", sort=False)
            agg = g.agg(doc_ids=("doc_id", list), tfs=("tf", list),
                        doclens=("doclen", list))
            term_arr = agg.index.to_numpy(dtype=object)
            part_arr = (stable_hash64(term_arr) % np.uint64(P)).astype(np.int32)
            for t, p, di, tfv, dlv in zip(term_arr, part_arr,
                                          agg["doc_ids"], agg["tfs"], agg["doclens"]):
                if int(p) in done_postings:
                    continue  # resume: part already committed
                parts.append(int(p)); terms.append(t)
                d_ids.append(di); tfs_l.append(tfv); dls_l.append(dlv)
                urls_l.append(None)

        # docmeta rows: one per doc (doclen; empty docs get doclen 0)
        doclens = np.zeros(len(doc_ids), dtype=np.int64)
        if len(tf):
            per_doc = tf.groupby("doc_id", sort=False)["doclen"].first()
            idx = pd.Series(doclens, index=doc_ids)
            common = per_doc.reindex(idx.index).fillna(0).to_numpy()
            doclens = common.astype(np.int64)
        dparts = (doc_ids % D) + P
        for did, u, dl, dp in zip(doc_ids, urls, doclens, dparts):
            if int(dp) - P in done_docmeta:
                continue
            parts.append(int(dp)); terms.append(None)
            d_ids.append([int(did)]); tfs_l.append([0])
            dls_l.append([int(dl)]); urls_l.append(u)

        return pa.table({
            "part": pa.array(parts, pa.int32()),
            "term": pa.array(terms, pa.large_string()),
            "doc_ids": pa.array(d_ids, pa.large_list(pa.int64())),
            "tfs": pa.array([[int(x) for x in v] for v in tfs_l],
                            pa.large_list(pa.int32())),
            "doclens": pa.array([[int(x) for x in v] for v in dls_l],
                                pa.large_list(pa.int32())),
            "url": pa.array(urls_l, pa.large_string()),
        }, schema=SHUFFLE)

    return tokenize_partial


# --------------------------------------------------------------------------
# per-part merge + encode + atomic write (the reduce side of the shuffle)
# --------------------------------------------------------------------------

def make_part_writer(index_dir: str, cfg: EngineConfig,
                     lineage: dict | None = None,
                     fail_parts: frozenset[int] = frozenset()):
    """Group fn for groupby("part").map_groups: merge partial posting
    lists into docID-sorted runs, encode, commit the segment atomically,
    return one metrics row.  ``fail_parts`` is a test hook for the
    resume test (FIXTURES.md §5 injected failure)."""
    P = cfg.num_parts

    def write_part(g: pd.DataFrame) -> pd.DataFrame:
        part = int(g["part"].iloc[0])
        if part in fail_parts:
            raise RuntimeError(f"injected failure for part {part}")
        with Timer() as t:
            if part >= P:
                m = _write_docmeta(g, part - P)
            else:
                m = _write_postings(g, part)
        m.wall_s = t.wall_s
        return pd.DataFrame([{
            "part": part, "kind": m.kind, "n_terms": m.n_terms,
            "n_postings": m.n_postings, "n_docs": m.n_docs,
            "sum_doclen": m.sum_doclen, "checksum": m.checksum,
        }])

    def _write_docmeta(g: pd.DataFrame, dpart: int) -> PartMetrics:
        doc_ids = np.fromiter((v[0] for v in g["doc_ids"]), dtype=np.int64,
                              count=len(g))
        doclens = np.fromiter((v[0] for v in g["doclens"]), dtype=np.int32,
                              count=len(g))
        urls = g["url"].to_numpy(dtype=object)
        order = np.argsort(doc_ids, kind="stable")
        doc_ids, doclens, urls = doc_ids[order], doclens[order], urls[order]
        # a doc appears exactly once (dedup upstream); tolerate re-runs
        uniq = np.concatenate(([True], np.diff(doc_ids) != 0))
        doc_ids, doclens, urls = doc_ids[uniq], doclens[uniq], urls[uniq]
        table = pa.table({"doc_id": doc_ids, "url": urls.tolist(),
                          "doclen": doclens})
        m = PartMetrics(part=dpart, kind="docmeta", n_docs=len(doc_ids),
                        sum_doclen=int(doclens.sum()),
                        checksum=sha256_of(doc_ids.tobytes(), doclens.tobytes()),
                        lineage=lineage or {})
        index_io.write_docmeta_part(index_dir, dpart, table, m)
        return m

    def _write_postings(g: pd.DataFrame, part: int) -> PartMetrics:
        # merge: per term, concat partial lists -> docID-sort -> encode
        order = np.argsort(g["term"].to_numpy(dtype=object), kind="stable")
        g = g.iloc[order]
        terms_out, dfs, cfs = [], [], []
        offs, lens, soffs, slens = [], [], [], []
        post_blobs, skip_blobs = [], []
        post_off = skip_off = 0
        n_postings = 0
        for term, grp in g.groupby("term", sort=True):
            ids = np.concatenate([np.asarray(v, dtype=np.int64)
                                  for v in grp["doc_ids"]])
            tfs = np.concatenate([np.asarray(v, dtype=np.int64)
                                  for v in grp["tfs"]])
            dls = np.concatenate([np.asarray(v, dtype=np.int64)
                                  for v in grp["doclens"]])
            o = np.argsort(ids, kind="stable")
            ids, tfs, dls = ids[o], tfs[o], dls[o]
            if ids.size > 1 and (np.diff(ids) == 0).any():
                # same doc contributed twice (only possible on dirty
                # input); merge tfs, keep first doclen
                uniq_ids, inv = np.unique(ids, return_inverse=True)
                tfs = np.bincount(inv, weights=tfs).astype(np.int64)
                first = np.full(uniq_ids.size, ids.size, dtype=np.int64)
                np.minimum.at(first, inv, np.arange(ids.size))
                dls = dls[first]
                ids = uniq_ids
            pb, sb = encode_postings(ids, tfs, dls, cfg.block_size)
            terms_out.append(term)
            dfs.append(ids.size)
            cfs.append(int(tfs.sum()))
            offs.append(post_off); lens.append(len(pb))
            soffs.append(skip_off); slens.append(len(sb))
            post_off += len(pb); skip_off += len(sb)
            post_blobs.append(pb); skip_blobs.append(sb)
            n_postings += ids.size
        postings_blob = b"".join(post_blobs)
        skips_blob = b"".join(skip_blobs)
        terms_table = pa.table({
            "term": pa.array(terms_out, pa.large_string()),
            "df": pa.array(dfs, pa.int64()),
            "cf": pa.array(cfs, pa.int64()),
            "post_off": pa.array(offs, pa.int64()),
            "post_len": pa.array(lens, pa.int64()),
            "skip_off": pa.array(soffs, pa.int64()),
            "skip_len": pa.array(slens, pa.int64()),
        })
        m = PartMetrics(part=part, kind="postings", n_terms=len(terms_out),
                        n_postings=n_postings,
                        postings_bytes=len(postings_blob),
                        skip_bytes=len(skips_blob),
                        checksum=sha256_of(postings_blob, skips_blob),
                        lineage=lineage or {})
        index_io.write_postings_part(index_dir, part, terms_table,
                                     postings_blob, skips_blob, m)
        return m

    return write_part


# --------------------------------------------------------------------------
# pipeline assembly
# --------------------------------------------------------------------------

def build_index(
    source: "str | list[str] | ray.data.Dataset",
    index_dir: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
    *,
    mode: str = "webtext",
    resume: bool = True,
    fail_parts: Iterable[int] = (),
) -> dict:
    """Run the full build; returns the manifest dict.

    mode="webtext": source columns (url, warc_ts, html) — dedup + extract.
    mode="docs":    source columns (doc_id, text) — pre-extracted corpus
                    (e.g. /root/testdata documents), skips dedup/extract.
    """
    t0 = time.perf_counter()
    done = index_io.committed_parts(index_dir) if resume else {}
    done_postings = frozenset(p for (k, p) in done if k == "postings")
    done_docmeta = frozenset(p for (k, p) in done if k == "docmeta")
    all_done = (len(done_postings) >= cfg.num_parts
                and len(done_docmeta) >= cfg.docmeta_parts)

    lineage = {"source": str(source) if not isinstance(source, ray.data.Dataset)
               else "<dataset>", "mode": mode}

    if not all_done:
        if mode == "webtext":
            if isinstance(source, ray.data.Dataset):
                ds = source
                keys = source.select_columns(["url", "warc_ts"])
            else:
                ds = ray.data.read_parquet(source,
                                           columns=["url", "warc_ts", "html"])
                keys = ray.data.read_parquet(source, columns=["url", "warc_ts"])
            losers = duplicate_losers(keys)
            ds = ds.map_batches(make_dedup_filter(losers),
                                batch_format="pyarrow")
            ds = ds.map_batches(extract_batch, batch_format="pyarrow",
                                batch_size=cfg.extract_batch_size)
            with_url = True
        elif mode == "docs":
            if isinstance(source, ray.data.Dataset):
                ds = source
            else:
                ds = ray.data.read_parquet(source, columns=["doc_id", "text"])
            with_url = False
        else:
            raise ValueError(f"unknown mode {mode!r}")

        shuffle_payload = ds.map_batches(
            make_tokenize_partial(cfg, done_postings, done_docmeta, with_url),
            batch_format="pyarrow", batch_size=cfg.tokenize_batch_size,
        )
        writer = make_part_writer(index_dir, cfg, lineage,
                                  frozenset(fail_parts))
        metrics_rows = (
            shuffle_payload.groupby("part")
            .map_groups(writer, batch_format="pandas")
            .take_all()
        )
        lineage["n_parts_written"] = len(metrics_rows)

    lineage["wall_s"] = round(time.perf_counter() - t0, 3)
    return index_io.finalize(index_dir, cfg, lineage)
