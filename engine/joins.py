"""Temporal joins over the events stream: as-of join and range join.

Two of the classic "Ray Data lacks it natively" operators (alongside the
windowed aggregates in engine.docops): each is built from the same
co-partitioning primitives the rest of the repo uses — a coarse bucket
key added inside ``map_batches``, a union of the two sides, ONE
``groupby(bucket).map_groups`` with a single lexsort + vectorized merge
inside, and (for the range join) a small final ``groupby.aggregate`` over
pre-aggregated partials.

Scale notes (the partitioning assumptions each op relies on):

* ``asof_join`` buckets by HASH OF THE EQUALITY KEY (user), so one
  probe+build shuffle co-locates every row that can ever match; the
  per-bucket merge is O((n+m) log(n+m)) with no per-key Python.  Skewed
  keys share a bucket but never cross buckets — a hot user costs one
  bigger sort, not a broken join.
* ``range_join_agg`` buckets by TIME at a granularity >= the max
  interval length, so an interval overlaps at most
  ``len/granularity + 1`` buckets (bounded explosion, paid before the
  shuffle); events land in exactly one bucket, so per-bucket partial
  aggregates sum to the exact global answer.  Matches are never
  materialized row-by-row: each bucket contributes one (interval,
  count, sum) partial via two searchsorted probes into the bucket's
  time-sorted prefix sums.

Reference analog: the reference engine has no temporal joins at all
(SURVEY.md §2.9 — its only join is the incremental-indexing anti-join,
rust/src/file_loader.rs); these are part of the training-data-pipeline
extension surface, with DuckDB ``ASOF LEFT JOIN`` / inequality-join
oracles in __ray_entry__.py.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum

from engine.textstats import micro_units

N_BUCKETS = 64

# range-join contract parameters: 2h windows on a 2h time grid ->
# an interval overlaps at most 2 buckets
RANGE_WIN_S = 7200
RANGE_BUCKET_S = 7200
RANGE_EVERY = 97   # intervals anchored at events with event_id % 97 == 0
ASOF_EVERY = 10    # snapshots = events with event_id % 10 == 0


def _events(sf_dir: str, columns) -> "ray.data.Dataset":
    return ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                                 columns=list(columns))


# --------------------------------------------------------------------------
# as-of join
# --------------------------------------------------------------------------

def asof_join(probe: "ray.data.Dataset", build: "ray.data.Dataset",
              by: str, ts: str, probe_cols: list[str],
              build_col: str, default: int = -1,
              n_buckets: int = N_BUCKETS) -> "ray.data.Dataset":
    """For every probe row, attach ``build_col`` from the latest build row
    of the same ``by`` key with ``build.ts <= probe.ts`` (DuckDB
    ``ASOF LEFT JOIN`` semantics), ``default`` when no such row exists.

    ``ts`` must be int64 (epoch micros) on both sides; ``build`` rows must
    be unique per (by, ts) — dedupe upstream, or the latest-in-sort-order
    one wins nondeterministically.  Both sides are shuffled ONCE on
    ``hash(by) % n_buckets``; inside a bucket one lexsort puts build rows
    immediately before probe rows of the same (by, ts) and a running
    maximum of "index of last build row seen" resolves every probe in one
    vectorized pass (no per-key loop, no reset at key boundaries: a carry
    whose key differs from the probe's key means "no match").
    """
    def tag(side: int, keep: list[str]):
        def f(t: pa.Table) -> pa.Table:
            k = t.column(by).to_numpy()
            cols = {c: t.column(c) for c in keep}
            cols["___side"] = pa.array(
                np.full(len(k), side, dtype=np.int8))
            cols["___bucket"] = pa.array((k % n_buckets).astype(np.int32))
            # align schemas for union: the missing side's columns are
            # filled with the int64 SENTINEL, not nulls — a nullable
            # int64 turns float64 in pandas inside map_groups and
            # silently corrupts values above 2^53 (this repo's own
            # doc_ids are uniform 63-bit hashes), so the join must stay
            # integer end-to-end
            for c in probe_cols + [build_col]:
                if c not in cols:
                    fill = default if c == build_col else 0
                    cols[c] = pa.array(
                        np.full(len(k), fill, dtype=np.int64))
            # fixed column order on both sides (union is schema-strict)
            names = [by, ts] + probe_cols + [build_col,
                                            "___side", "___bucket"]
            return pa.table({c: cols[c] for c in names})
        return f

    tagged = (probe.map_batches(tag(1, [by, ts] + probe_cols),
                                batch_format="pyarrow")
              .union(build.map_batches(tag(0, [by, ts, build_col]),
                                       batch_format="pyarrow")))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        key = g[by].to_numpy(dtype=np.int64)
        t = g[ts].to_numpy(dtype=np.int64)
        side = g["___side"].to_numpy(dtype=np.int8)
        # sentinel-filled int64 on both sides (see tag()) — no float64
        # intermediate anywhere, so 63-bit values survive exactly
        bv = g[build_col].to_numpy(dtype=np.int64)
        # sort: (key, ts, side, build value) — build rows (side 0) land
        # immediately BEFORE probes of the same (key, ts) so `<=` ties
        # match; among duplicate (key, ts) build rows the LARGEST value
        # sorts last, so the running max below picks it deterministically
        # regardless of how batches split the duplicates
        order = np.lexsort((bv, side, t, key))
        key_s, side_s = key[order], side[order]
        n = key_s.size
        carry = np.where(side_s == 0, np.arange(n), -1)
        last = np.maximum.accumulate(carry)  # latest build row at-or-before
        pm = side_s == 1
        li = last[pm]
        ok = (li >= 0) & (key_s[li] == key_s[pm])
        bv_s = bv[order]
        matched = np.where(ok, bv_s[np.maximum(li, 0)],
                           np.int64(default))
        out = {c: g[c].to_numpy()[order][pm] for c in [by, ts] + probe_cols}
        out[build_col] = matched
        return pd.DataFrame(out)

    return tagged.groupby("___bucket").map_groups(
        merge, batch_format="pandas")


def q_asof_profile(sf_dir: str) -> pd.DataFrame:
    """Contract entry: attach to every event the id of the latest
    "profile snapshot" (events with event_id % 10 == 0, deduped to max
    event_id per (user, ts)) of the same user at-or-before its ts.
    All-integer output (epoch-micro ts, -1 sentinel for no-match)."""
    def prep_probe(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t.column("user_id"),
            "ts_us": pa.array(t.column("ts").to_numpy()
                              .astype("datetime64[us]").astype(np.int64)),
            "event_id": t.column("event_id"),
        })

    def prep_snap(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy()
        m = eid % ASOF_EVERY == 0
        df = pd.DataFrame({
            "user_id": t.column("user_id").to_numpy()[m],
            "ts_us": t.column("ts").to_numpy()
                      .astype("datetime64[us]").astype(np.int64)[m],
            "snap_event_id": eid[m],
        })
        # per-batch partial dedupe; exact dedupe happens in the merge
        # sort order (max event_id per (user, ts) sorts last and the
        # running-max carry picks it) — see below
        g = (df.groupby(["user_id", "ts_us"], sort=False)["snap_event_id"]
             .max().reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    ev = _events(sf_dir, ["event_id", "ts", "user_id"])
    probe = ev.map_batches(prep_probe, batch_format="pyarrow")
    build = ev.map_batches(prep_snap, batch_format="pyarrow")
    # cross-batch duplicate (user, ts) snapshots are resolved inside
    # asof_join's merge: the build value is a lexsort key, so the max
    # event_id wins no matter how batches split the duplicates — exactly
    # the oracle's max() dedupe
    out = asof_join(probe, build, by="user_id", ts="ts_us",
                    probe_cols=["event_id"], build_col="snap_event_id",
                    default=-1).to_pandas()
    out = out[["event_id", "user_id", "ts_us", "snap_event_id"]]
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("event_id").reset_index(drop=True)


# --------------------------------------------------------------------------
# range join (interval aggregate)
# --------------------------------------------------------------------------

def q_range_join_windows(sf_dir: str) -> pd.DataFrame:
    """Contract entry: per 2h interval anchored at every 97th event
    (interval_id = that event's id, [ts, ts+2h)), count and sum (in
    integer micro-units) the events falling in the interval.  Intervals
    with zero matches still emit a row (LEFT semantics).

    Shape: intervals explode to their overlapped time buckets (<= 2 at
    this granularity) inside map_batches; events map to exactly one
    bucket; one shuffle co-partitions both; per bucket, two vectorized
    searchsorted probes against the bucket's time-sorted value prefix
    sums produce one partial row per (interval, bucket); a final tiny
    groupby(interval_id) sums partials.  No match row is ever
    materialized — 10^12 events x windows would be quadratic otherwise.
    """
    win_us = RANGE_WIN_S * 1_000_000
    bucket_us = RANGE_BUCKET_S * 1_000_000

    ev = _events(sf_dir, ["event_id", "ts", "value"])

    def prep_intervals(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy()
        m = eid % RANGE_EVERY == 0
        start = (t.column("ts").to_numpy()
                 .astype("datetime64[us]").astype(np.int64)[m])
        end = start + win_us
        iid = eid[m]
        b0 = start // bucket_us
        b1 = (end - 1) // bucket_us  # inclusive last bucket touched
        k = (b1 - b0 + 1).astype(np.int64)
        rep = np.repeat(np.arange(iid.size), k)
        # bucket index per exploded row: b0[i] + offset within run
        off = np.arange(rep.size) - np.repeat(
            np.cumsum(k) - k, k)
        return pa.table({
            "___bucket": pa.array(b0[rep] + off),
            "interval_id": pa.array(iid[rep]),
            "start_us": pa.array(start[rep]),
            "end_us": pa.array(end[rep]),
            "ts_us": pa.nulls(rep.size, pa.int64()),
            "value_micro": pa.nulls(rep.size, pa.int64()),
            "___side": pa.array(np.zeros(rep.size, dtype=np.int8)),
        })

    def prep_events(t: pa.Table) -> pa.Table:
        ts = (t.column("ts").to_numpy()
              .astype("datetime64[us]").astype(np.int64))
        return pa.table({
            "___bucket": pa.array(ts // bucket_us),
            "interval_id": pa.nulls(ts.size, pa.int64()),
            "start_us": pa.nulls(ts.size, pa.int64()),
            "end_us": pa.nulls(ts.size, pa.int64()),
            "ts_us": pa.array(ts),
            "value_micro": pa.array(micro_units(
                t.column("value").to_numpy())),
            "___side": pa.array(np.ones(ts.size, dtype=np.int8)),
        })

    tagged = (ev.map_batches(prep_intervals, batch_format="pyarrow")
              .union(ev.map_batches(prep_events, batch_format="pyarrow")))

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        side = g["___side"].to_numpy(dtype=np.int8)
        em = side == 1
        ts = g["ts_us"].to_numpy()[em].astype(np.int64)
        val = g["value_micro"].to_numpy()[em].astype(np.int64)
        order = np.argsort(ts, kind="stable")
        ts, val = ts[order], val[order]
        pref = np.concatenate(([0], np.cumsum(val)))
        im = ~em
        iid = g["interval_id"].to_numpy()[im].astype(np.int64)
        lo = np.searchsorted(ts, g["start_us"].to_numpy()[im]
                             .astype(np.int64), side="left")
        hi = np.searchsorted(ts, g["end_us"].to_numpy()[im]
                             .astype(np.int64), side="left")
        return pd.DataFrame({
            "interval_id": iid,
            "n_events": (hi - lo).astype(np.int64),
            "sum_value_micro": (pref[hi] - pref[lo]).astype(np.int64),
        })

    agg = (tagged.groupby("___bucket").map_groups(
               partial, batch_format="pandas")
           .groupby("interval_id").aggregate(
               Sum("n_events", alias_name="n_events"),
               Sum("sum_value_micro", alias_name="sum_value_micro"))
           .to_pandas())
    for c in agg.columns:
        agg[c] = agg[c].astype(np.int64)
    return agg.sort_values("interval_id").reset_index(drop=True)
