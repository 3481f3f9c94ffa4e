"""Serving-tier actor fault tolerance: on a real cluster workers die
(node loss, OOM, preemption).  Every serving actor runs with
max_restarts + max_task_retries, every serving method is read-only /
idempotent, and ALL revival state rides in the constructor — so a
killed worker is restarted by Ray, the in-flight call is retried
transparently, and post-revival answers stay bit-identical to the
local engine.

The doc-sharded tier is the load-bearing case: global corpus stats
used to arrive via a post-init set_global_stats call, which a restart
would silently drop — the revived shard would score with LOCAL stats
(wrong answers, no error).  Stats now ride in the ctor; the kill test
here pins score bit-identity after revival.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray

from engine.build import build_index
from engine.config import EngineConfig
from engine.query import InvertedIndex

CFG = EngineConfig(num_parts=8, docmeta_parts=3)
Q = "the of data"


@pytest.fixture(scope="module")
def ft_idx(ray_session, e2e_webtext, tmp_path_factory):
    base = tmp_path_factory.mktemp("ftserve")
    d = str(base / "global")
    build_index(e2e_webtext, d, CFG)
    return d, base


def _kill(actor):
    ray.kill(actor, no_restart=False)


def test_replica_tier_survives_worker_kill(ray_session, ft_idx):
    from engine.serve import QueryService
    d, _ = ft_idx
    local = InvertedIndex(d)
    want = local.search(Q, k=10, method="daat")
    svc = QueryService(d, replicas=2, num_cpus=0.5)
    try:
        assert svc.search(Q, k=10, method="daat") == want
        for w in svc.workers:
            _kill(w)
        # every replica was killed; retried calls hit revived actors
        assert svc.search(Q, k=10, method="daat") == want
        assert svc.search_weighted({"the": 2.0, "data": 1.25}, k=10) == \
            local.search_weighted({"the": 2.0, "data": 1.25}, k=10)
    finally:
        svc.shutdown()


def test_term_sharded_tier_survives_worker_kill(ray_session, ft_idx):
    from engine.serve import ShardedQueryService
    d, _ = ft_idx
    local = InvertedIndex(d)
    want = local.search(Q, k=10, method="daat")
    svc = ShardedQueryService(d, n_shards=2, num_cpus=0.25)
    try:
        assert svc.search(Q, k=10) == want
        _kill(svc.shards[0][0][0])
        assert svc.search(Q, k=10) == want
        # boolean gate path exercises term_doc_ids on the revived actor
        assert svc.search(Q, k=10, must="data") == \
            local.search(Q, k=10, method="daat", must="data")
    finally:
        svc.shutdown()


def test_doc_sharded_revival_keeps_global_stats(ray_session, e2e_webtext,
                                                ft_idx, tmp_path_factory):
    """THE regression this file exists for: a revived doc-shard worker
    must score with the ctor-supplied GLOBAL (n_docs, avgdl), not its
    local manifest stats — scores after the kill must stay bit-identical
    to one global index."""
    import ray.data
    from engine.serve import DocShardedQueryService
    from engine.tokenize import stable_hash64

    d, base = ft_idx
    n_shards = 2
    shard_dirs = []
    for si in range(n_shards):
        def keep(batch: pa.Table, _si=si) -> pa.Table:
            urls = np.asarray(batch.column("url").to_pylist(),
                              dtype=object)
            m = (stable_hash64(urls) % np.uint64(n_shards)
                 ) == np.uint64(_si)
            return batch.filter(pa.array(m))

        ds = (ray.data.read_parquet(e2e_webtext,
                                    columns=["url", "warc_ts", "html"])
              .map_batches(keep, batch_format="pyarrow"))
        sd = str(base / f"ftshard{si}")
        build_index(ds, sd, CFG)
        shard_dirs.append(sd)

    local = InvertedIndex(d)
    want = local.search(Q, k=10, method="daat")
    svc = DocShardedQueryService(shard_dirs, method="daat")
    try:
        assert svc.search(Q, k=10) == want
        for w in svc.workers:
            _kill(w)
        # revived shards must reapply global stats from ctor args:
        # with local stats the scores would differ (not just rank)
        assert svc.search(Q, k=10) == want
        assert svc.search_weighted({"the": 2.0, "data": 1.25}, k=10) == \
            local.search_weighted({"the": 2.0, "data": 1.25}, k=10)
    finally:
        svc.shutdown()
