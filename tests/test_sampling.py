"""Deterministic hash-based sampling: parallelism invariance, stratum
fractions, edge fractions — the properties RNG sampling cannot give."""

import numpy as np
import pandas as pd
import ray.data

from engine.sampling import hash_sample, stratified_sample


def _docs(n=4000, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "lang": rng.choice(["en", "de", "es", "fr"], size=n,
                           p=[0.5, 0.2, 0.2, 0.1]),
    })


def test_hash_sample_deterministic_and_parallelism_invariant(ray_session):
    df = _docs()
    a = hash_sample(ray.data.from_pandas(df), 0.3, seed=5).to_pandas()
    b = hash_sample(ray.data.from_pandas(df).repartition(7), 0.3,
                    seed=5).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])
    # fraction within a loose binomial band
    assert 0.25 < len(a) / len(df) < 0.35
    # different seed -> different subset
    c = hash_sample(ray.data.from_pandas(df), 0.3, seed=6).to_pandas()
    assert sorted(c["doc_id"]) != sorted(a["doc_id"])


def test_hash_sample_edge_fractions(ray_session):
    df = _docs(500)
    assert len(hash_sample(ray.data.from_pandas(df), 0.0).to_pandas()) == 0
    assert len(hash_sample(ray.data.from_pandas(df), 1.0).to_pandas()) \
        == len(df)


def test_stratified_fractions_and_default(ray_session):
    df = _docs()
    out = stratified_sample(
        ray.data.from_pandas(df),
        fractions={"en": 0.9, "de": 0.3, "es": 1.0},
        strata_col="lang", seed=11, default_fraction=0.0).to_pandas()
    got = out.groupby("lang").size()
    tot = df.groupby("lang").size()
    assert 0.85 < got["en"] / tot["en"] < 0.95
    assert 0.24 < got["de"] / tot["de"] < 0.36
    assert got["es"] == tot["es"]          # fraction 1.0 keeps all
    assert "fr" not in got.index            # default 0.0 drops stratum


def test_stratified_parallelism_invariant(ray_session):
    df = _docs(1000)
    fr = {"en": 0.5, "de": 0.5}
    a = stratified_sample(ray.data.from_pandas(df), fr,
                          seed=2).to_pandas()
    b = stratified_sample(ray.data.from_pandas(df).repartition(9), fr,
                          seed=2).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])


def test_md5_mode_matches_duckdb(ray_session):
    """The oracle-parity property itself, at unit scale."""
    import duckdb
    df = _docs(800)
    out = stratified_sample(ray.data.from_pandas(df),
                            fractions={"en": 0.8, "de": 0.4, "es": 0.2},
                            seed=7, hash_fn="md5",
                            default_fraction=0.1).to_pandas()
    t = {k: int(f * float(1 << 64))
         for k, f in (("en", .8), ("de", .4), ("es", .2), ("_", .1))}
    con = duckdb.connect()
    con.register("documents", df)
    want = con.execute(f"""
        SELECT doc_id FROM documents
        WHERE CAST(md5_number_lower(CAST(doc_id AS VARCHAR) || '_s7')
                   AS HUGEINT) <
              CAST(CASE lang WHEN 'en' THEN '{t["en"]}'
                   WHEN 'de' THEN '{t["de"]}' WHEN 'es' THEN '{t["es"]}'
                   ELSE '{t["_"]}' END AS HUGEINT)""").fetchdf()
    assert sorted(out["doc_id"]) == sorted(want["doc_id"])
