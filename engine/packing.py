"""Sequence packing: assign documents to fixed-token-budget training
sequences by RUNNING token count — a distributed prefix scan.

A pretraining pipeline's last step packs curated documents into
fixed-length training sequences (budget B tokens).  The pinned rule
(SQL-stateable, order-deterministic): walk docs in doc_id order with a
running token total S; doc i starts at global offset S_i (the exclusive
prefix sum), belongs to sequence ``S_i // B``, at in-sequence offset
``S_i % B``.  A doc spanning a boundary belongs to the sequence where
it STARTS (readers pull the continuation from the next sequence — the
standard packed-corpus layout).

Prefix sums are the canonical "needs a scan, not a groupby" shape; the
distributed plan is the classic range-partitioned scan:

1. map_batches: project to (doc_id, bucket, n_tok) — tiny rows, the
   text never shuffles.  ``bucket = (doc_id - min_id) // span`` (RANGE
   buckets: scan order must follow doc_id order, so hash partitioning
   is exactly wrong here).
2. groupby(bucket).sum -> K bucket totals on the driver (K ~ thousands
   at any corpus size); exclusive prefix over them gives each bucket's
   global base offset — broadcast back via ``ray.put``.
3. groupby(bucket).map_groups: sort the group by doc_id, local cumsum
   + the bucket base = every doc's exact global offset.

Two shuffles of an 24-byte-per-doc projection; at 10^12 docs that is
~24 TB of scan metadata spread over the cluster, the same order as the
posting shuffle the build already does.  Every step is deterministic at
any parallelism (bucket spans derive from a min/max aggregate, not
from block boundaries).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from engine.tokenize import tokenize_batch

PACK_BUDGET = 2048        # tokens per training sequence
PACK_BUCKETS = 512        # scan partitions (range buckets over doc_id)


def pack_sequences(docs, budget: int = PACK_BUDGET,
                   n_buckets: int = PACK_BUCKETS) -> "ray.data.Dataset":
    """-> (doc_id, n_tokens, seq_id, off_in_seq) for every doc."""
    from ray.data.aggregate import Max, Min, Sum

    def counts(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        toks = tokenize_batch(batch.column("text").to_pylist())
        nt = np.fromiter((len(t) for t in toks), dtype=np.int64,
                         count=len(toks))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_tok": pa.array(nt)})

    proj = docs.map_batches(counts, batch_format="pyarrow")

    bounds = proj.aggregate(Min("doc_id"), Max("doc_id"))
    lo = int(bounds["min(doc_id)"])
    hi = int(bounds["max(doc_id)"])
    span = max(1, (hi - lo) // n_buckets + 1)

    def bucketize(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        b = (ids - lo) // span
        return batch.append_column("bucket", pa.array(b.astype(np.int64)))

    bucketed = proj.map_batches(bucketize, batch_format="pyarrow")

    totals = bucketed.groupby("bucket").aggregate(
        Sum("n_tok", alias_name="t")).to_pandas()
    totals = totals.sort_values("bucket").reset_index(drop=True)
    # exclusive prefix of bucket totals -> dense base-offset array
    # (buckets with no docs contribute 0 and stay at the running total)
    base = np.zeros(n_buckets + 1, dtype=np.int64)
    np.add.at(base, totals["bucket"].to_numpy(np.int64) + 1,
              totals["t"].to_numpy(np.int64))
    base = np.cumsum(base)
    base_ref = ray.put(base)

    def scan_group(g: pd.DataFrame) -> pd.DataFrame:
        bases = ray.get(base_ref)
        g = g.sort_values("doc_id")
        nt = g["n_tok"].to_numpy(np.int64)
        start = int(bases[int(g["bucket"].iloc[0])])
        offs = start + np.concatenate(([0], np.cumsum(nt)[:-1]))
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(np.int64),
            "n_tokens": nt,
            "seq_id": offs // budget,
            "off_in_seq": offs % budget,
        })

    return bucketed.groupby("bucket").map_groups(scan_group)
