"""Distributed query serving: Ray-actor replicas over the built index.

Reference analog: the actix-web embedding server (S9,
/root/reference/server/src/lib.rs:142-258) and the `Arc<Embedder>`
shared-state pattern (/root/reference/rust/src/lib.rs:839).  Here each
replica is a Ray actor holding a warm ``InvertedIndex`` (term dicts +
docmeta loaded once in ``__init__``); a thin round-robin front fans
query batches across replicas.  At 10^12-doc scale the natural sharding
is part-range per actor group with a scatter-gather front; this module
implements the replicated (index-fits-per-node) tier and documents the
sharded tier as the scale path.

The module creates actors only when ``QueryService`` is explicitly
instantiated — never at import (the driver owns the Ray session).
"""

from __future__ import annotations

import ray

from engine.query import InvertedIndex


@ray.remote
class QueryWorker:
    """One warm replica.  Heavy load in __init__, cheap calls after."""

    def __init__(self, index_dir: str):
        self.idx = InvertedIndex(index_dir)

    def search(self, query: str, k: int = 10, method: str = "bmw"):
        return self.idx.search(query, k=k, method=method)

    def search_many(self, queries: list[str], k: int = 10,
                    method: str = "bmw"):
        return [self.idx.search(q, k=k, method=method) for q in queries]

    def url_of(self, doc_ids):
        return self.idx.url_of(doc_ids)


class QueryService:
    """Round-robin front over N warm replicas."""

    def __init__(self, index_dir: str, replicas: int = 2,
                 num_cpus: float = 1.0):
        self.workers = [
            QueryWorker.options(num_cpus=num_cpus).remote(index_dir)
            for _ in range(replicas)
        ]
        # block until every replica is warm (index loaded)
        ray.get([w.search.remote("", 1) for w in self.workers])

    def search(self, query: str, k: int = 10, method: str = "bmw"):
        w = self.workers[hash(query) % len(self.workers)]
        return ray.get(w.search.remote(query, k, method))

    def search_many(self, queries: list[str], k: int = 10,
                    method: str = "bmw"):
        """Fan a query batch across replicas; results in input order."""
        n = len(self.workers)
        shards = [queries[i::n] for i in range(n)]
        parts = ray.get([w.search_many.remote(s, k, method)
                         for w, s in zip(self.workers, shards) if s])
        out = [None] * len(queries)
        for wi, res in enumerate(parts):
            for j, r in enumerate(res):
                out[wi + j * n] = r
        return out

    def shutdown(self):
        for w in self.workers:
            ray.kill(w)
        self.workers = []
