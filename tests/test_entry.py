"""Driver-contract smoke: entry() shape, queries()/oracle_sql() keys, and
a fast oracle-parity spot check at sf0.001 (the full sweep lives in
tools/check_contract.py and the driver's own gate)."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_entry_runs_and_is_stable():
    df = entrymod.entry()
    assert isinstance(df, pd.DataFrame)
    assert list(df.columns) == ["query", "rank", "doc_id", "score"]
    assert len(df) > 0
    df2 = entrymod.entry()
    pd.testing.assert_frame_equal(df, df2)


def test_oracle_keys_subset_of_queries():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(os_) >= 14  # SQL-checkable coverage stays wide


@pytest.mark.parametrize("name", ["bm25_topk", "corpus_stats", "dedup_exact"])
def test_spot_oracle_parity(name):
    import ray.data
    fn = entrymod.queries()[name]
    got = fn(SF)
    if isinstance(got, ray.data.Dataset):
        got = got.to_pandas()
    con = duckdb.connect()
    for t in ("documents", "embeddings", "events"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    want = con.execute(entrymod.oracle_sql()[name]).fetchdf()
    got = got[sorted(got.columns)].sort_values(sorted(got.columns),
                                               ignore_index=True)
    want = want[sorted(want.columns)].sort_values(sorted(want.columns),
                                                  ignore_index=True)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        if pd.api.types.is_float_dtype(want[c]):
            assert np.allclose(got[c].astype(float), want[c].astype(float),
                               atol=1.1e-6)
        else:
            assert (got[c].to_numpy() == want[c].to_numpy()).all()
