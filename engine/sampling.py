"""Deterministic corpus sampling / mixing for training-data curation.

The reference caps rows with `.select(range(100))` (SURVEY.md §2.6 T5 —
a limit, not a sample); a 100-TB curation pipeline needs real weighted
sampling that is REPRODUCIBLE at any parallelism and resumable across
retries.  These operators therefore use NO RNG state: the keep decision
for a row is a pure function of (id, seed) via a stable hash —
`hash(id, seed) < fraction * 2^64` — so re-running any subset of blocks
keeps exactly the same rows (the property Ray's `random_sample` cannot
give across retries).  Integer threshold compare, no float boundary.

md5 mode is the oracle-parity configuration (DuckDB
`md5_number_lower`); the SipHash default is the production path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from engine.dedup import _splitmix64
from engine.tokenize import HASH_FNS


def _row_hashes(ids: np.ndarray, seed: int, hash_fn: str) -> np.ndarray:
    """Per-row uint64 hash of (id, seed), pure and order-free.

    sip (production) mode mixes the int64 ids DIRECTLY — splitmix64 of
    (id XOR splitmix64(seed)) — all-integer vectorized work; the earlier
    per-row ``f"{id}_s{seed}"`` key build paid a Python-level format for
    every row of the scan (measured ~50x slower on a 1M-row batch).
    md5 mode keeps the string keys: its whole purpose is bit-parity with
    the DuckDB oracle expression md5_number_lower(id || '_s{seed}')."""
    if hash_fn == "sip":
        seed_mix = _splitmix64(np.array([seed & ((1 << 64) - 1)],
                                        dtype=np.uint64))[0]
        return _splitmix64(ids.astype(np.int64).view(np.uint64) ^ seed_mix)
    keys = np.array([f"{int(i)}_s{seed}" for i in ids], dtype=object)
    return HASH_FNS[hash_fn](keys)


def _keep_mask(ids: np.ndarray, fraction: float, seed: int,
               hash_fn: str) -> np.ndarray:
    """Pure-function Bernoulli: hash(id, seed) < fraction * 2^64."""
    if fraction >= 1.0:
        return np.ones(ids.size, dtype=bool)
    if fraction <= 0.0:
        return np.zeros(ids.size, dtype=bool)
    thresh = np.uint64(int(fraction * float(1 << 64)))
    return _row_hashes(ids, seed, hash_fn) < thresh


def hash_sample(
    docs: "ray.data.Dataset",
    fraction: float,
    seed: int = 0,
    id_col: str = "doc_id",
    hash_fn: str = "sip",
) -> "ray.data.Dataset":
    """Uniform deterministic sample: keep ~fraction of rows, identical
    at any parallelism / after any retry."""

    def flt(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        return batch.filter(pa.array(_keep_mask(ids, fraction, seed,
                                                hash_fn)))

    return docs.map_batches(flt, batch_format="pyarrow")


def stratified_sample(
    docs: "ray.data.Dataset",
    fractions: dict[str, float],
    strata_col: str = "lang",
    seed: int = 0,
    id_col: str = "doc_id",
    hash_fn: str = "sip",
    default_fraction: float = 0.0,
) -> "ray.data.Dataset":
    """Per-stratum deterministic sampling — the data-MIXING primitive of
    a training corpus (e.g. keep 80% en, 40% de, drop the rest).  One
    stateless map_batches: the stratum fraction is looked up per row,
    the keep decision is the same pure hash — no shuffle, no RNG, no
    driver state, stable under retries and repartitioning.
    """
    frz = dict(fractions)

    def flt(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        strata = np.asarray(batch.column(strata_col).to_pylist(),
                            dtype=object)
        h = _row_hashes(ids, seed, hash_fn)
        # exact integer thresholds resolved once per DISTINCT stratum
        # in the batch, then broadcast by inverse index — no per-row
        # Python in the compare
        uniq, inv = np.unique(strata, return_inverse=True)
        t_int = [max(0, min(1 << 64,
                            int(frz.get(s, default_fraction)
                                * float(1 << 64)))) for s in uniq]
        full = np.array([t >= (1 << 64) for t in t_int],
                        dtype=bool)[inv]
        tu = np.array([t if t < (1 << 64) else 0 for t in t_int],
                      dtype=np.uint64)[inv]
        return batch.filter(pa.array(full | (h < tu)))

    return docs.map_batches(flt, batch_format="pyarrow")
