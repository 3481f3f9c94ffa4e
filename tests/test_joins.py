"""Temporal joins (engine/joins.py): as-of join and range join vs
brute-force references, plus the histogram-quantile and bigram ops."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _synth_events(path: str, n: int, n_users: int, seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    base = 1_600_000_000_000_000  # epoch us
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime(
            base + rng.integers(0, 30 * 86400 * 10**6, n), unit="us"),
        "user_id": rng.integers(0, n_users, n).astype(np.int64),
        "event_type": rng.choice(["a", "b"], n),
        "value": rng.normal(size=n),
        "props": np.full(n, "{}", dtype=object),
    })
    df.to_parquet(f"{path}/events.parquet", index=False)
    return df


def _brute_asof(df: pd.DataFrame) -> pd.DataFrame:
    snap = (df[df.event_id % 10 == 0]
            .assign(ts_us=lambda d: d.ts.astype("datetime64[us]")
                    .astype(np.int64))
            .groupby(["user_id", "ts_us"])["event_id"].max()
            .reset_index().rename(columns={"event_id": "snap_event_id"}))
    rows = []
    for r in df.itertuples():
        ts_us = r.ts.value // 1000
        c = snap[(snap.user_id == r.user_id) & (snap.ts_us <= ts_us)]
        rows.append((r.event_id, r.user_id, ts_us,
                     int(c.loc[c.ts_us.idxmax(), "snap_event_id"])
                     if len(c) else -1))
    return (pd.DataFrame(rows, columns=["event_id", "user_id", "ts_us",
                                        "snap_event_id"])
            .sort_values("event_id").reset_index(drop=True))


@pytest.mark.parametrize("n,n_users,seed", [(300, 7, 1), (500, 50, 2)])
def test_asof_join_matches_brute_force(tmp_path, n, n_users, seed):
    from engine.joins import q_asof_profile
    df = _synth_events(str(tmp_path), n, n_users, seed)
    got = q_asof_profile(str(tmp_path))
    exp = _brute_asof(df)
    pd.testing.assert_frame_equal(got, exp)


def test_asof_duplicate_ts_max_id_wins(tmp_path):
    """Two snapshots of the same user at the identical ts: the larger
    event_id must win deterministically (the oracle's max() dedupe)."""
    from engine.joins import q_asof_profile
    ts = pd.to_datetime([10**15, 10**15, 10**15 + 5], unit="us")
    df = pd.DataFrame({
        "event_id": np.array([10, 20, 3], dtype=np.int64),
        "ts": ts,
        "user_id": np.array([1, 1, 1], dtype=np.int64),
        "event_type": ["a"] * 3,
        "value": [0.0] * 3,
        "props": ["{}"] * 3,
    })
    df.to_parquet(f"{tmp_path}/events.parquet", index=False)
    got = q_asof_profile(str(tmp_path))
    assert got.snap_event_id.tolist() == [20, 20, 20]


def test_range_join_matches_brute_force(tmp_path):
    from engine.joins import q_range_join_windows, RANGE_WIN_S, RANGE_EVERY
    from engine.textstats import micro_units
    df = _synth_events(str(tmp_path), 800, 13, 3)
    got = q_range_join_windows(str(tmp_path))
    ts_us = df.ts.astype("datetime64[us]").astype(np.int64).to_numpy()
    vm = micro_units(df.value.to_numpy())
    rows = []
    for r in df[df.event_id % RANGE_EVERY == 0].itertuples():
        s = r.ts.value // 1000
        m = (ts_us >= s) & (ts_us < s + RANGE_WIN_S * 10**6)
        rows.append((r.event_id, int(m.sum()), int(vm[m].sum())))
    exp = (pd.DataFrame(rows, columns=["interval_id", "n_events",
                                      "sum_value_micro"])
           .sort_values("interval_id").reset_index(drop=True)
           .astype(np.int64))
    pd.testing.assert_frame_equal(got, exp)


def test_range_join_zero_match_interval_emits_row(tmp_path):
    """An interval whose window contains no events still gets a row
    (LEFT semantics) with n_events=0."""
    from engine.joins import q_range_join_windows
    # event 0 anchors an interval; the only other events are far away
    ts = pd.to_datetime([10**15, 10**15 + 10**12], unit="us")
    df = pd.DataFrame({
        "event_id": np.array([97, 5], dtype=np.int64),
        "ts": ts, "user_id": np.zeros(2, dtype=np.int64),
        "event_type": ["a", "a"], "value": [1.5, 2.5],
        "props": ["{}"] * 2,
    })
    df.to_parquet(f"{tmp_path}/events.parquet", index=False)
    got = q_range_join_windows(str(tmp_path))
    # the anchor event itself falls inside its own window
    assert got.n_events.tolist() == [1]
    assert got.sum_value_micro.tolist() == [1_500_000]


def test_doclen_quantiles_match_numpy(tmp_path):
    import math
    from engine.docops import q_doclen_quantiles, QUANTILE_PPM
    from engine.tokenize import tokenize
    rng = np.random.default_rng(7)
    texts = [" ".join(f"w{rng.integers(0, 50)}"
                      for _ in range(rng.integers(1, 60)))
             for _ in range(211)]
    pd.DataFrame({"doc_id": np.arange(211, dtype=np.int64),
                  "text": texts}).to_parquet(
        f"{tmp_path}/documents.parquet", index=False)
    got = q_doclen_quantiles(str(tmp_path))
    dl = np.sort([len(tokenize(t)) for t in texts])
    for ppm, v in zip(got.q_ppm, got.doclen):
        rank = math.ceil(len(dl) * (ppm / 1e6))
        assert v == dl[rank - 1]


def test_bigram_counts_match_brute_force(tmp_path):
    from collections import Counter
    from engine.docops import q_bigram_cf_top100
    from engine.tokenize import tokenize
    texts = ["the quick fox the quick dog", "quick fox jumps", "", "one",
             "the quick fox"]
    pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                  "text": texts}).to_parquet(
        f"{tmp_path}/documents.parquet", index=False)
    got = q_bigram_cf_top100(str(tmp_path))
    c = Counter()
    for t in texts:
        tok = tokenize(t)
        c.update(" ".join(p) for p in zip(tok, tok[1:]))
    exp = (pd.DataFrame(sorted(c.items(),
                               key=lambda kv: (-kv[1], kv[0]))[:100],
                        columns=["bigram", "cf"]))
    exp["cf"] = exp["cf"].astype(np.int64)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)
