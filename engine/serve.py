"""Distributed query serving: Ray-actor replicas + part-range shards.

Reference analog: the actix-web embedding server (S9,
/root/reference/server/src/lib.rs:142-258) and the `Arc<Embedder>`
shared-state pattern (/root/reference/rust/src/lib.rs:839).  Two tiers:

* ``QueryService`` — N full replicas (index fits per node), round-robin
  front.  Throughput scales with replicas; memory does not shrink.
* ``ShardedQueryService`` — the scale tier: the term-partitioned
  segments are split part-range per shard actor; the front tokenizes,
  routes each query term to its owning shard (part = hash64(term) %
  num_parts; shard = part % n_shards), scatter-gathers per-term scored
  posting arrays and accumulates exactly like the exhaustive DAAT path
  — bit-identical results to a single-process index (pytest-asserted).
  Per-shard resident memory = its part range's working set (mmap blobs).
  With ``n_doc_ranges > 1`` each term shard becomes a GROUP of
  doc-range workers: every worker holds only its hash-range's docmeta
  slice (O(corpus / n_ranges) resident — doc ids are uniform 63-bit
  hashes so equal-width ranges balance with no scan) and decodes only
  the posting-block window intersecting its range; the front
  concatenates per-range fragments in range order, which reproduces
  the full docID-sorted decode bit-for-bit.
  Trade-off, stated honestly: term-sharding ships decoded postings of
  the query terms over the network (bounded by query df, large for
  stopwords); doc-sharded serving (per-shard top-k, merge k·S rows)
  is the classic web-search layout and falls out of building S doc-range
  indexes — the build already supports arbitrary input splits.  Term
  sharding is the natural fit for THIS index's on-disk layout.
  (``DocShardedQueryService`` below implements that third layout:
  per-shard top-k over a distributed-IDF exchange, exact merges.)

Per-tier query surface: all three tiers serve search (boolean /
where / where_range / exclude), facets + histogram facets, suggest,
and ``snippets_of`` top-k hydration.  ``search_phrase`` runs on
``QueryService`` (each replica holds the whole positional index,
query-hash routing for positions-LRU affinity) and
``DocShardedQueryService`` (phrase matching is a per-doc predicate, so
per-shard match + global-stats scores merge exactly) — never on the
term-sharded tier, which would have to ship position runs between
shards for every multi-term phrase.

The module creates actors only when a service is explicitly
instantiated — never at import (the driver owns the Ray session).
"""

from __future__ import annotations

import numpy as np

import ray

from engine import index_io
from engine.config import EngineConfig
from engine.query import InvertedIndex
from engine.tokenize import stable_hash64, tokenize


@ray.remote
class QueryWorker:
    """One warm replica.  Heavy load in __init__, cheap calls after."""

    def __init__(self, index_dir: str):
        self.idx = InvertedIndex(index_dir)

    def search(self, query: str, k: int = 10, method: str = "bmw",
               where: tuple | None = None, exclude: str | None = None,
               must: str | None = None, require_all: bool = False):
        return self.idx.search(query, k=k, method=method, where=where,
                               exclude=exclude, must=must,
                               require_all=require_all)

    def search_many(self, queries: list[str], k: int = 10,
                    method: str = "bmw", where: tuple | None = None,
                    exclude: str | None = None,
                    must: str | None = None, require_all: bool = False):
        return [self.idx.search(q, k=k, method=method, where=where,
                                exclude=exclude, must=must,
                                require_all=require_all)
                for q in queries]

    def facet_counts(self, query: str, col: str,
                     where: tuple | None = None,
                     require_all: bool = False,
                     must: str | None = None,
                     exclude: str | None = None):
        return self.idx.facet_counts(query, col, where=where,
                                     require_all=require_all,
                                     must=must, exclude=exclude)

    def facet_histogram(self, query: str, col: str, edges,
                        where: tuple | None = None,
                        require_all: bool = False,
                        must: str | None = None,
                        exclude: str | None = None):
        return self.idx.facet_histogram(query, col, edges, where=where,
                                        require_all=require_all,
                                        must=must, exclude=exclude)

    def suggest(self, prefix: str, k: int = 10):
        return self.idx.suggest(prefix, k=k)

    def match_count(self, query: str, where: tuple | None = None,
                    must: str | None = None,
                    exclude: str | None = None,
                    require_all: bool = False):
        return self.idx.match_count(query, where=where, must=must,
                                    exclude=exclude,
                                    require_all=require_all)

    def snippets_of(self, query: str, doc_ids, col: str = "text"):
        return self.idx.snippets_of(query, doc_ids, col)

    def search_phrase(self, query: str, k: int = 10, slop: int = 0,
                      where: tuple | None = None,
                      exclude: str | None = None):
        return self.idx.search_phrase(query, k=k, slop=slop,
                                      where=where, exclude=exclude)

    def search_weighted(self, term_weights: dict, k: int = 10,
                        where: tuple | None = None,
                        where_range: tuple | None = None):
        return self.idx.search_weighted(term_weights, k=k, where=where,
                                        where_range=where_range)

    def match_count_weighted(self, term_weights: dict,
                             where: tuple | None = None,
                             where_range: tuple | None = None):
        return self.idx.match_count_weighted(term_weights, where=where,
                                             where_range=where_range)

    def url_of(self, doc_ids):
        return self.idx.url_of(doc_ids)


class QueryService:
    """Round-robin front over N warm replicas."""

    def __init__(self, index_dir: str, replicas: int = 2,
                 num_cpus: float = 1.0):
        self.workers = [
            QueryWorker.options(num_cpus=num_cpus, max_restarts=4,
                                max_task_retries=2).remote(index_dir)
            for _ in range(replicas)
        ]
        # block until every replica is warm (index loaded)
        ray.get([w.search.remote("", 1) for w in self.workers])

    def search(self, query: str, k: int = 10, method: str = "bmw",
               where: tuple | None = None, exclude: str | None = None,
               must: str | None = None, require_all: bool = False):
        w = self.workers[hash(query) % len(self.workers)]
        return ray.get(w.search.remote(query, k, method, where, exclude,
                                       must, require_all))

    def facet_counts(self, query: str, col: str,
                     where: tuple | None = None,
                     require_all: bool = False,
                     must: str | None = None,
                     exclude: str | None = None):
        w = self.workers[hash(query) % len(self.workers)]
        return ray.get(w.facet_counts.remote(query, col, where,
                                             require_all, must, exclude))

    def facet_histogram(self, query: str, col: str, edges,
                        where: tuple | None = None,
                        require_all: bool = False,
                        must: str | None = None,
                        exclude: str | None = None):
        w = self.workers[hash(query) % len(self.workers)]
        return ray.get(w.facet_histogram.remote(query, col, edges,
                                                where, require_all,
                                                must, exclude))

    def suggest(self, prefix: str, k: int = 10):
        w = self.workers[hash(prefix) % len(self.workers)]
        return ray.get(w.suggest.remote(prefix, k))

    def match_count(self, query: str, where: tuple | None = None,
                    must: str | None = None,
                    exclude: str | None = None,
                    require_all: bool = False) -> int:
        """Total hits (hits.total) on one replica."""
        w = self.workers[hash(query) % len(self.workers)]
        return ray.get(w.match_count.remote(query, where, must,
                                            exclude, require_all))

    def snippets_of(self, query: str, doc_ids, col: str = "text"):
        """Top-k snippet hydration on a replica (every replica holds
        the whole index; the sidecar read is disk-side, part-pruned)."""
        w = self.workers[hash(query) % len(self.workers)]
        return ray.get(w.snippets_of.remote(query, list(doc_ids), col))

    def search_phrase(self, query: str, k: int = 10, slop: int = 0,
                      where: tuple | None = None,
                      exclude: str | None = None):
        """Phrase / proximity top-k on a replica (each replica holds
        the whole positional index).  Routed by query hash so repeated
        phrases hit the same replica's positions-blob LRU — phrase
        working sets are the largest cache class in the engine, and
        spraying one phrase across replicas would duplicate its blobs
        in every replica's budget."""
        w = self.workers[hash(query) % len(self.workers)]
        return ray.get(w.search_phrase.remote(
            query, k=k, slop=slop, where=where, exclude=exclude))

    def search_weighted(self, term_weights: dict, k: int = 10,
                        where: tuple | None = None,
                        where_range: tuple | None = None):
        """SPLADE-seam weighted-term top-k on a replica (each holds the
        whole index; engine/query.py search_weighted semantics,
        including the doc-values filters).  Routed by the weight
        VECTOR's hash so a repeated learned-sparse query reuses the
        same replica's decoded-score cache."""
        key = tuple(sorted(term_weights.items()))
        w = self.workers[hash(key) % len(self.workers)]
        return ray.get(w.search_weighted.remote(dict(term_weights), k,
                                                where, where_range))

    def match_count_weighted(self, term_weights: dict,
                             where: tuple | None = None,
                             where_range: tuple | None = None) -> int:
        """hits.total for a weighted query (same replica routing as
        search_weighted so the decoded postings stay cache-hot)."""
        key = tuple(sorted(term_weights.items()))
        w = self.workers[hash(key) % len(self.workers)]
        return ray.get(w.match_count_weighted.remote(
            dict(term_weights), where, where_range))

    def url_of(self, doc_ids):
        """Top-k url hydration on any replica (full docmeta each)."""
        ids = list(doc_ids)
        w = self.workers[hash(tuple(ids)) % len(self.workers)]
        return ray.get(w.url_of.remote(ids))

    def search_many(self, queries: list[str], k: int = 10,
                    method: str = "bmw", where: tuple | None = None,
                    exclude: str | None = None,
                    must: str | None = None, require_all: bool = False):
        """Fan a query batch across replicas; results in input order."""
        n = len(self.workers)
        shards = [queries[i::n] for i in range(n)]
        parts = ray.get([w.search_many.remote(s, k, method, where,
                                              exclude, must, require_all)
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


# ---------------------------------------------------------------------------
# sharded tier: part-range shards + scatter-gather front
# ---------------------------------------------------------------------------

@ray.remote
class ShardWorker:
    """Owns a part range of the term-partitioned index, optionally
    restricted to a DOC RANGE: with ``doc_range`` set the worker loads
    only that range's docmeta slice (O(corpus / n_ranges) resident, the
    round-2 docmeta-residency fix) and decodes only the posting blocks
    intersecting the range.  The wrapped InvertedIndex loads term parts
    lazily, so postings memory = the warmed part range (mmap)."""

    def __init__(self, index_dir: str,
                 doc_range: tuple[int, int] | None = None,
                 cache_budget_bytes: int = 1 << 30):
        self.idx = InvertedIndex(index_dir, doc_range=doc_range,
                                 cache_budget_bytes=cache_budget_bytes)

    def warm(self, parts: list[int]) -> bool:
        for p in parts:
            self.idx._load_part(p)
        return True

    def docmeta_rows(self) -> int:
        """Resident docmeta rows (the memory assertion hook)."""
        return int(self.idx._doc_ids.size)

    def score_terms(self, terms: list[str],
                    where: tuple | None = None,
                    where_range: tuple | None = None) -> dict:
        """term -> (doc_ids int64, bm25 scores float64) or None,
        restricted to this worker's doc range.  Decoding + scoring
        happen shard-side; only scored arrays move.  ``where`` /
        ``where_range`` filter each term's entries by the worker's OWN
        doc-values mask (each doc-range worker holds its range's
        sidecar slice) BEFORE shipping — per-doc masks commute with
        per-term accumulation, so the front's filtered result is
        bit-identical to local daat-with-mask, and selective filters
        also shrink the bytes on the wire."""
        out = {}
        mask = self.idx.where_mask(*where) if where is not None else None
        if where_range is not None:
            rm = self.idx.range_mask(*where_range)
            mask = rm if mask is None else (mask & rm)
        for t in terms:
            ent = self.idx.score_term_range(t)
            if ent is not None and mask is not None:
                ids, scores = ent
                pos = np.searchsorted(self.idx._doc_ids, ids)
                keep = mask[pos]
                ent = (ids[keep], scores[keep]) if keep.any() else None
            if ent is not None:
                # df rides along for the front's require_all path: the
                # conjunctive accumulation sums terms in ascending-df
                # order (query.py _search_all), and a term's one part
                # holds ALL its postings, so this df is the global df
                out[t] = (ent[0], ent[1], self.idx.df_of(t))
            else:
                out[t] = None
        return out

    def search(self, query: str, k: int, where: tuple | None = None):
        """Whole-query top-k on the shard (the single-shard routing
        fast path): when every query term lives on this shard, the
        exhaustive-daat accumulate runs HERE and only k rows cross the
        network instead of the terms' full decoded postings.  daat =
        the same decode order + float accumulation as the front's
        scatter-gather, so results stay bit-identical."""
        return self.idx.search(query, k=k, method="daat", where=where)

    def term_doc_ids(self, terms: list[str]) -> dict:
        """term -> int64 doc ids (this worker's doc range), an EMPTY
        int64 array when the term is in the dictionary but has no live
        postings in this range, or None only for true dictionary
        ABSENCE — the distinction matters at the front: an absent
        must-term empties the result globally, an empty fragment only
        says no match in this range.  (score_term_range conflates the
        two — it returns None for both — so absence is re-checked via
        lookup here rather than leaving the front to rely on non-None
        fragments overwriting a premature absent mark.)
        The boolean-gate exchange of the term-sharded tier: must /
        exclude terms live on their owning shard, so the front fetches
        their global doc-id sets from here (cost = df ids, the same
        wire class as an ordinary scored term)."""
        out = {}
        for t in terms:
            ent = self.idx.score_term_range(t)
            if ent is not None:
                out[t] = ent[0]
            elif self.idx.lookup(t) is None:
                out[t] = None                       # not in dictionary
            else:
                out[t] = np.empty(0, dtype=np.int64)  # empty in range
        return out

    def suggest(self, prefix: str, k: int = 10, parts=None):
        """Prefix suggestion over THIS shard's dictionary parts only
        (``parts`` must be the shard's part range: the loader is lazy,
        so an unrestricted call would page in — and answer for —
        every other shard's parts too)."""
        return self.idx.suggest(prefix, k=k, parts=parts)

    def snippets_of(self, query: str, doc_ids, col: str = "text"):
        """Top-k snippet hydration from ANY term-shard worker: the
        sidecar read is on-disk and part-pruned by doc_id % D — it
        neither loads term parts nor touches the worker's doc_range-
        restricted docmeta (snippets_of never decodes postings)."""
        return self.idx.snippets_of(query, doc_ids, col)

    def url_of(self, doc_ids):
        """urls for the ids whose docmeta range THIS worker holds
        (None otherwise — the front merges across range workers)."""
        return self.idx.url_of(doc_ids)


class _Front:
    """Stateless routing + accumulation logic shared by the local front
    and the FrontWorker actor pool.  ``shards[si][ri]`` is the replica
    list for term-shard si, doc-range ri: a query term is routed to its
    owning term shard and fanned across that shard's doc-range workers;
    the per-range scored fragments are concatenated in ascending-range
    order, which reproduces the full docID-sorted decode exactly."""

    # gate-set cache budget: sorted int64 id arrays of must/exclude
    # terms (8 B/id).  Gate terms repeat across queries (a tenant's
    # exclusion list, a stopword MUST_NOT) and the sets are immutable
    # for a served index, so caching front-side turns the per-query
    # df-sized exchange into a one-time cost — measured at 3.2M docs:
    # exclude-stopword warm p50 240 ms -> ~plain without the refetch.
    GATE_CACHE_BYTES = 256 << 20

    def __init__(self, cfg: EngineConfig, shards: list):
        self.cfg = cfg
        self.n_shards = len(shards)
        self.shards = shards
        self.n_ranges = len(shards[0]) if shards else 1
        self._rr = 0
        # term -> sorted global int64 ids, or None for absent terms
        # (absence is worth caching too: an absent must-term empties
        # every query that names it).  Plain LRU by insertion order.
        # The lock guards the pop/reinsert LRU touch and the eviction
        # loop: the LOCAL front is called concurrently by the threaded
        # HTTP server (FrontWorker actors are single-threaded, where
        # the lock is uncontended).  Mask building never needs it —
        # gather snapshots set references before any eviction.
        import threading
        self._gate_cache: dict[str, np.ndarray | None] = {}
        self._gate_cache_bytes = 0
        self._gate_lock = threading.Lock()

    def _terms_of(self, query: str) -> list[str]:
        seen, out = set(), []
        for t in tokenize(query, self.cfg.cjk_unigrams):
            if t not in seen:
                seen.add(t)
                out.append(t)
        return out

    def _shard_of(self, term: str) -> int:
        from engine.tokenize import HASH_FNS
        hasher = HASH_FNS[getattr(self.cfg, "term_hash", "sip")]
        part = int(hasher(np.array([term], dtype=object))[0]
                   % np.uint64(self.cfg.num_parts))
        return part % self.n_shards

    def _scatter(self, query: str, k: int, where: tuple | None = None,
                 must: str | None = None, exclude: str | None = None,
                 require_all: bool = False, no_fast: bool = False):
        """Submit score_terms futures for one query (no blocking) ->
        (terms, {(shard, range): future}, gate) or None for empty
        queries.  ``k`` is threaded explicitly — the HTTP front calls
        search() concurrently from server threads, so smuggling it
        through mutable front state would race two requests' k values.

        Boolean gates: ``must`` / ``exclude`` terms are routed to their
        OWNING shards for doc-id sets (term_doc_ids — fired together
        with the score futures, no extra round-trip of latency), and
        the front applies the gate masks before the top-k cut, exactly
        reproducing the local engine's mask-then-_topk order.
        ``require_all`` needs no extra exchange at all: the per-term
        fragments the front already holds say which terms cover each
        candidate."""
        terms = self._terms_of(query)
        if not terms:
            return None
        must_terms = self._terms_of(must) if must else []
        ex_terms = self._terms_of(exclude) if exclude else []
        gating = bool(must_terms or ex_terms or require_all)
        by_shard: dict[int, list[str]] = {}
        for t in terms:
            by_shard.setdefault(self._shard_of(t), []).append(t)
        self._rr += 1
        if (len(by_shard) == 1 and self.n_ranges == 1 and not gating
                and not no_fast):
            # single-shard fast path: ship the query, get k rows back
            # (O(k) network instead of the terms' decoded postings)
            (si, _ts), = by_shard.items()
            replicas = self.shards[si][0]
            return "local", (replicas[self._rr % len(replicas)]
                             .search.remote(query, k, where)), None
        futs = {}
        for si, ts in by_shard.items():
            for ri in range(self.n_ranges):
                replicas = self.shards[si][ri]
                futs[(si, ri)] = (replicas[self._rr % len(replicas)]
                                  .score_terms.remote(ts, where))
        gate = None
        if must_terms or ex_terms:
            gate_by_shard: dict[int, list[str]] = {}
            for t in dict.fromkeys(must_terms + ex_terms):
                with self._gate_lock:
                    if t in self._gate_cache:   # cached set: no fetch
                        self._gate_cache[t] = self._gate_cache.pop(t)
                        continue
                gate_by_shard.setdefault(self._shard_of(t), []).append(t)
            gfuts = []
            for si, ts in gate_by_shard.items():
                for ri in range(self.n_ranges):
                    replicas = self.shards[si][ri]
                    gfuts.append((ri, (replicas[self._rr % len(replicas)]
                                       .term_doc_ids.remote(ts))))
            gate = (must_terms, ex_terms, gfuts)
        return terms, futs, (gate, require_all)

    def _cache_gate(self, term: str, ids: "np.ndarray | None") -> None:
        """Insert one gate set under the byte budget (oldest-out LRU;
        absent terms cost a nominal 64 B — caching absence matters: an
        absent must-term empties every query naming it).  A single set
        larger than the whole budget is served but not cached."""
        nb = 64 if ids is None else ids.nbytes
        if nb > self.GATE_CACHE_BYTES:
            return
        with self._gate_lock:
            old = self._gate_cache.pop(term, False)
            if old is not False:
                self._gate_cache_bytes -= (64 if old is None
                                           else old.nbytes)
            while (self._gate_cache_bytes + nb > self.GATE_CACHE_BYTES
                   and self._gate_cache):
                old = self._gate_cache.pop(next(iter(self._gate_cache)))
                self._gate_cache_bytes -= (64 if old is None
                                           else old.nbytes)
            self._gate_cache[term] = ids
            self._gate_cache_bytes += nb

    def _gather(self, plan, k: int, count_only: bool = False):
        if plan is None:
            return 0 if count_only else []
        terms, futs, extras = plan
        if terms == "local":               # single-shard fast path
            return ray.get(futs)
        gate, require_all = extras if extras is not None else (None, False)
        # fragments per term in ascending doc-range order — concatenated
        # they equal the full docID-sorted decode, so float accumulation
        # is bit-identical to the local engine's daat path
        frags: dict[str, list] = {}
        if self.n_ranges == 1:             # fast path: no range merge
            for res in ray.get(list(futs.values())):
                for t, ent in res.items():
                    if ent is not None:
                        frags[t] = [ent]
        else:
            keys = sorted(futs.keys(), key=lambda sr: sr[1])
            for key, res in zip(keys, ray.get([futs[key] for key in keys])):
                for t, ent in res.items():
                    if ent is not None:
                        frags.setdefault(t, []).append(ent)
        all_ids, all_scores = [], []
        for t in terms:                    # original query-term order
            for ent in frags.get(t, ()):
                all_ids.append(ent[0])
                all_scores.append(ent[1])
        if not all_ids:
            return 0 if count_only else []
        if require_all and any(t not in frags for t in terms):
            return 0 if count_only else []  # a query term matched nowhere
        ids = np.concatenate(all_ids)
        scores = np.concatenate(all_scores)
        uniq, inv = np.unique(ids, return_inverse=True)
        # bincount does the same input-order per-bin accumulation as
        # np.add.at (bit-identical float sums) in buffered C — add.at
        # is unbuffered and costs seconds at multi-M stopword df
        acc = np.bincount(inv, weights=scores, minlength=uniq.size)
        keep = None
        if require_all:
            # each term contributes a doc at most once (ranges are
            # disjoint), so per-candidate fragment count == number of
            # query terms containing it; scores are re-accumulated in
            # ascending-df order below (_search_all's float order)
            keep = np.bincount(inv, minlength=uniq.size) == len(terms)
        if gate is not None:
            must_terms, ex_terms, gfuts = gate
            # start from the front's cache (scatter skipped fetching
            # cached terms), overlay freshly fetched sets
            _MISS = object()
            sets: dict[str, "np.ndarray | None"] = {}
            for t in must_terms + ex_terms:
                v = self._gate_cache.get(t, _MISS)
                if v is not _MISS:
                    sets[t] = v
            if gfuts:
                res = ray.get([f for _, f in gfuts])
                per_term: dict[str, list] = {}
                absent: set[str] = set()
                for i in sorted(range(len(gfuts)),
                                key=lambda j: gfuts[j][0]):  # range order
                    for t, tids in res[i].items():
                        if tids is None:
                            absent.add(t)
                        else:
                            per_term.setdefault(t, []).append(tids)
                for t in absent:
                    sets[t] = None
                    self._cache_gate(t, None)
                for t, frs in per_term.items():
                    full = frs[0] if len(frs) == 1 else np.concatenate(frs)
                    sets[t] = full
                    self._cache_gate(t, full)
            for t in dict.fromkeys(must_terms + ex_terms):
                if t not in sets:
                    # evicted between scatter's cache touch and here
                    # (concurrent fronts under a tiny budget — rare):
                    # one synchronous refetch; treating it as absent
                    # would wrongly EMPTY a must query
                    si = self._shard_of(t)
                    parts = ray.get(
                        [self.shards[si][ri][0].term_doc_ids.remote([t])
                         for ri in range(self.n_ranges)])
                    if all(p[t] is None for p in parts):
                        full = None
                    else:
                        frs = [p[t] for p in parts if p[t] is not None]
                        full = (frs[0] if len(frs) == 1
                                else np.concatenate(frs))
                    sets[t] = full
                    self._cache_gate(t, full)

            def member(sorted_ids: np.ndarray) -> np.ndarray:
                pos = np.searchsorted(sorted_ids, uniq)
                safe = np.minimum(pos, sorted_ids.size - 1)
                return ((pos < sorted_ids.size)
                        & (sorted_ids[safe] == uniq))

            for t in must_terms:
                tids = sets.get(t)
                if tids is None:           # absent must-term empties
                    return 0 if count_only else []
                m = (member(tids) if tids.size
                     else np.zeros(uniq.size, dtype=bool))
                keep = m if keep is None else (keep & m)
            for t in ex_terms:
                tids = sets.get(t)
                if tids is not None and tids.size:
                    m = ~member(tids)
                    keep = m if keep is None else (keep & m)
        if keep is not None:
            uniq, acc = uniq[keep], acc[keep]
            if uniq.size == 0:
                return 0 if count_only else []
        if count_only:
            return int(uniq.size)
        if require_all:
            # conjunctive scoring sums terms in ascending-df order
            # (stable: query order on equal dfs) — the exact float
            # order of query.py _search_all, so merged scores stay
            # bit-identical to the local AND path.  Every survivor is
            # in every term's (possibly filter-masked) fragment, so
            # the sorted gather is exact.
            order = sorted(range(len(terms)),
                           key=lambda i: frags[terms[i]][0][2])
            acc = np.zeros(uniq.size, dtype=np.float64)
            for i in order:
                ents = frags[terms[i]]
                t_ids = (ents[0][0] if len(ents) == 1
                         else np.concatenate([e[0] for e in ents]))
                t_s = (ents[0][1] if len(ents) == 1
                       else np.concatenate([e[1] for e in ents]))
                acc += t_s[np.searchsorted(t_ids, uniq)]
        return InvertedIndex._topk(uniq, acc, k)

    def search(self, query: str, k: int = 10,
               where: tuple | None = None, must: str | None = None,
               exclude: str | None = None, require_all: bool = False):
        if k <= 0:
            return []
        return self._gather(self._scatter(query, k, where, must,
                                          exclude, require_all), k)

    def match_count(self, query: str, where: tuple | None = None,
                    must: str | None = None,
                    exclude: str | None = None,
                    require_all: bool = False) -> int:
        """Total hits under the full clause set (hits.total): the
        same scatter the search path uses (fast path bypassed — a
        worker's k-row answer cannot yield a count), counting the gated
        candidate set instead of scoring it."""
        plan = self._scatter(query, 1, where, must, exclude,
                             require_all, no_fast=True)
        return self._gather(plan, 1, count_only=True)

    def search_many(self, queries: list[str], k: int = 10,
                    where: tuple | None = None,
                    must: str | None = None,
                    exclude: str | None = None,
                    require_all: bool = False):
        """Pipelined scatter-gather: every query's shard futures are in
        flight before the first gather, so shard work for query i+1
        overlaps the front's accumulate for query i."""
        if k <= 0:
            return [[] for _ in queries]
        plans = [self._scatter(q, k, where, must, exclude, require_all)
                 for q in queries]
        return [self._gather(p, k) for p in plans]

    def search_weighted(self, term_weights, k: int = 10,
                        where: tuple | None = None,
                        where_range: tuple | None = None):
        """Weighted-term (learned-sparse / SPLADE-seam) top-k over the
        term-sharded tier — the tier this retrieval shape is MADE for:
        a sparse learned query names many terms, and each term's whole
        posting list lives on exactly one shard, so scoring stays
        shard-side and only scored fragments cross the wire (the same
        cost class as an ordinary disjunctive query).

        Weight keys are routed VERBATIM to their owning shards (callers
        supply already-analyzed terms — no tokenize, the learned-sparse
        contract).  The front accumulates ``w * score`` per candidate
        walking matched entries in ascending (df, term) order with
        duplicate input terms kept as separate entries in input order —
        exactly ``InvertedIndex.search_weighted``'s float order (a
        term's one part holds ALL its postings, so the shard's df IS
        the global df), so the merged top-k is bit-identical to one
        local index.  ``where`` / ``where_range`` (doc-values filters)
        apply shard-side via score_terms' pre-masking — per-doc masks
        commute with per-term accumulation, so filtered results equal
        the local engine's accumulate-then-mask float-for-float."""
        if k <= 0:
            return []
        items = (term_weights.items()
                 if isinstance(term_weights, dict) else term_weights)
        wanted = []                       # (term, w), zero weights out
        for t, w in items:
            w = float(w)
            if w != 0.0:
                wanted.append((str(t), w))
        if not wanted:
            return []
        by_shard: dict[int, list[str]] = {}
        for t in dict.fromkeys(t for t, _ in wanted):
            by_shard.setdefault(self._shard_of(t), []).append(t)
        self._rr += 1
        futs = {}
        for si, ts in by_shard.items():
            for ri in range(self.n_ranges):
                replicas = self.shards[si][ri]
                futs[(si, ri)] = (replicas[self._rr % len(replicas)]
                                  .score_terms.remote(ts, where,
                                                      where_range))
        # per-term fragments in ascending doc-range order — concatenated
        # they equal the full docID-sorted decode (the _gather rule)
        frags: dict[str, list] = {}
        keys = sorted(futs.keys(), key=lambda sr: sr[1])
        for key, res in zip(keys, ray.get([futs[key] for key in keys])):
            for t, ent in res.items():
                if ent is not None:
                    frags.setdefault(t, []).append(ent)
        merged: dict[str, tuple] = {}
        for t, ents in frags.items():
            ids = (ents[0][0] if len(ents) == 1
                   else np.concatenate([e[0] for e in ents]))
            s = (ents[0][1] if len(ents) == 1
                 else np.concatenate([e[1] for e in ents]))
            merged[t] = (ids, s, ents[0][2])   # df rides from the shard
        entries = [(merged[t][2], t, w) + merged[t][:2]
                   for t, w in wanted if t in merged]
        if not entries:
            return []
        entries.sort(key=lambda e: (e[0], e[1]))   # df asc, term; stable
        uniq = np.unique(np.concatenate([e[3] for e in entries]))
        acc = np.zeros(uniq.size, dtype=np.float64)
        for df, t, w, ids, s in entries:
            # ids are unique within a term (disjoint ranges), so the
            # fancy-index add applies each contribution exactly once,
            # per doc in the same order the local dense walk does
            acc[np.searchsorted(uniq, ids)] += w * s
        return InvertedIndex._topk(uniq, acc, k)

    def match_count_weighted(self, term_weights,
                             where: tuple | None = None,
                             where_range: tuple | None = None) -> int:
        """hits.total for a weighted query on the term-sharded tier:
        the same shard-side (filter-pre-masked) fragment gather as
        search_weighted, counted instead of scored."""
        items = (term_weights.items()
                 if isinstance(term_weights, dict) else term_weights)
        terms = list(dict.fromkeys(
            str(t) for t, w in items if float(w) != 0.0))
        if not terms:
            return 0
        by_shard: dict[int, list[str]] = {}
        for t in terms:
            by_shard.setdefault(self._shard_of(t), []).append(t)
        self._rr += 1
        futs = []
        for si, ts in by_shard.items():
            for ri in range(self.n_ranges):
                replicas = self.shards[si][ri]
                futs.append(replicas[self._rr % len(replicas)]
                            .score_terms.remote(ts, where, where_range))
        ids = [ent[0] for res in ray.get(futs)
               for ent in res.values() if ent is not None]
        if not ids:
            return 0
        return int(np.unique(np.concatenate(ids)).size)


@ray.remote
class FrontWorker:
    """A front as an actor: tokenize + route + accumulate off the
    driver.  Fronts are stateless routers (only shard HANDLES are
    state), so throughput scales by adding fronts — the serial
    accumulate is otherwise the sharded tier's bottleneck."""

    def __init__(self, cfg_dict: dict, shards: list):
        self.front = _Front(EngineConfig.from_dict(cfg_dict), shards)

    def search_many(self, queries: list[str], k: int = 10,
                    where: tuple | None = None,
                    must: str | None = None,
                    exclude: str | None = None,
                    require_all: bool = False):
        return self.front.search_many(queries, k, where, must,
                                      exclude, require_all)


class ShardedQueryService:
    """Scatter-gather over part-range shards (optionally replicated per
    shard, optionally with an actor pool of fronts).  Results are
    bit-identical to a local ``InvertedIndex.search(..., method="daat")``
    — every front reproduces its exact accumulation order."""

    def __init__(self, index_dir: str, n_shards: int = 2,
                 replicas_per_shard: int = 1, n_fronts: int = 0,
                 num_cpus: float = 0.5, n_doc_ranges: int = 1,
                 cache_budget_bytes: int = 1 << 30):
        # num_cpus=0.5 per actor: shard/front actors alternate decode
        # and network waits, and a full-CPU reservation per actor can
        # STARVE small sessions (shards x replicas + fronts actors must
        # all be placed before warm() returns — a 1.0 reservation each
        # deadlocks a 4-cpu pytest session; round-1 aggregator-pool
        # lesson applied to serving)
        #
        # n_doc_ranges > 1 splits each term shard into a GROUP of
        # doc-range workers: doc ids are uniform 63-bit hashes, so
        # equal-width hash ranges are balanced with no docmeta scan.
        # Each worker holds only its range's docmeta (the residency
        # fix) and decodes only its range's posting-block window.
        # The per-worker decoded-term cache budget divides by the
        # total worker count so the tier's aggregate cache stays
        # within one budget.
        self.manifest = index_io.load_manifest(index_dir)
        self.cfg = EngineConfig.from_dict(self.manifest["config"])
        bounds = [(2 ** 63) * r // n_doc_ranges
                  for r in range(n_doc_ranges + 1)]
        per_worker_budget = max(
            1 << 20,
            cache_budget_bytes
            // (n_shards * n_doc_ranges * replicas_per_shard))
        self.shards = []
        self._shard_parts: list[list[int]] = []
        for si in range(n_shards):
            parts = [p for p in range(self.cfg.num_parts)
                     if p % n_shards == si]
            self._shard_parts.append(parts)
            ranges = []
            for ri in range(n_doc_ranges):
                doc_range = ((bounds[ri], bounds[ri + 1])
                             if n_doc_ranges > 1 else None)
                replicas = [ShardWorker.options(
                                num_cpus=num_cpus, max_restarts=4,
                                max_task_retries=2)
                            .remote(index_dir, doc_range=doc_range,
                                    cache_budget_bytes=per_worker_budget)
                            for _ in range(replicas_per_shard)]
                ray.get([r.warm.remote(parts) for r in replicas])
                ranges.append(replicas)
            self.shards.append(ranges)
        self._local = _Front(self.cfg, self.shards)
        self.fronts = [
            FrontWorker.options(num_cpus=num_cpus, max_restarts=4,
                                max_task_retries=2)
            .remote(self.cfg.to_dict(), self.shards)
            for _ in range(n_fronts)
        ]

    def search(self, query: str, k: int = 10,
               where: tuple | None = None, must: str | None = None,
               exclude: str | None = None, require_all: bool = False):
        """``where=(col, values)`` is applied SHARD-SIDE: each
        doc-range worker masks its scored fragments with its own
        sidecar slice before shipping, so filtered results stay
        bit-identical to local daat-with-mask and selective filters
        shrink the wire bytes.  ``must`` / ``exclude`` terms live on
        their OWNING shards, so the front fetches their doc-id sets
        from there (term_doc_ids, fired with the score futures) and
        gates candidates before the top-k cut; ``require_all`` gates
        from the fragments already in hand and re-accumulates in the
        local AND path's ascending-df float order — all three stay
        bit-identical to the local engine."""
        return self._local.search(query, k, where, must, exclude,
                                  require_all)

    def search_many(self, queries: list[str], k: int = 10,
                    where: tuple | None = None,
                    must: str | None = None,
                    exclude: str | None = None,
                    require_all: bool = False):
        """With fronts: interleave the batch across the front pool
        (results in input order); without: local pipelined front."""
        if not self.fronts:
            return self._local.search_many(queries, k, where, must,
                                           exclude, require_all)
        n = len(self.fronts)
        batches = [queries[i::n] for i in range(n)]
        parts = ray.get([f.search_many.remote(b, k, where, must,
                                              exclude, require_all)
                         for f, b in zip(self.fronts, batches) if b])
        out = [None] * len(queries)
        for fi, res in enumerate(parts):
            for j, r in enumerate(res):
                out[fi + j * n] = r
        return out

    def search_weighted(self, term_weights, k: int = 10,
                        where: tuple | None = None,
                        where_range: tuple | None = None):
        """Weighted-term (learned-sparse / SPLADE-seam) top-k: weight
        keys route verbatim to their owning term shards, scoring stays
        shard-side, the front's ascending-(df, term) accumulation is
        bit-identical to ``InvertedIndex.search_weighted`` on one
        global index (see _Front.search_weighted); doc-values filters
        pre-mask shard-side."""
        return self._local.search_weighted(term_weights, k, where,
                                           where_range)

    def match_count_weighted(self, term_weights,
                             where: tuple | None = None,
                             where_range: tuple | None = None) -> int:
        return self._local.match_count_weighted(term_weights, where,
                                                where_range)

    def suggest(self, prefix: str, k: int = 10):
        """Distributed prefix suggestion on the term-sharded tier.
        Unlike the doc-sharded tier (summed dfs -> threshold
        algorithm), term shards hold DISJOINT dictionary parts, so each
        shard's local top-k is already exact for its term subset and
        the front needs one concat + cut — O(S x k) wire rows, no
        exchange rounds.  Dictionaries are identical across a shard's
        doc-range workers; one replica per shard answers."""
        if k <= 0 or not prefix:
            return []
        futs = [ranges[0][0].suggest.remote(prefix, k,
                                            self._shard_parts[si])
                for si, ranges in enumerate(self.shards)]
        cand = [r for p in ray.get(futs) for r in p]
        cand.sort(key=lambda t: (-t[1], t[0]))
        return cand[:k]

    def match_count(self, query: str, where: tuple | None = None,
                    must: str | None = None,
                    exclude: str | None = None,
                    require_all: bool = False) -> int:
        """Total hits via the front's count-only gather (exact: the
        gated candidate set is the same one search() scores)."""
        return self._local.match_count(query, where, must, exclude,
                                       require_all)

    def snippets_of(self, query: str, doc_ids, col: str = "text"):
        """Top-k snippet hydration: routed to ONE worker (the sidecar
        read is disk-side and independent of the worker's term-part /
        doc-range residency), so only the k window strings move."""
        w = self.shards[0][0][0]
        return ray.get(w.snippets_of.remote(query, list(doc_ids), col))

    def url_of(self, doc_ids):
        """Top-k url hydration: shard 0's doc-range workers tile the id
        space, so scattering the ids to that ONE group and taking the
        first non-None per position is exact (with n_doc_ranges=1 it is
        a single call).  Only k urls move."""
        ids = list(doc_ids)
        group = [replicas[0] for replicas in self.shards[0]]
        parts = ray.get([w.url_of.remote(ids) for w in group])
        return [next((p[i] for p in parts if p[i] is not None), None)
                for i in range(len(ids))]

    def docmeta_rows_per_worker(self) -> list[int]:
        """Resident docmeta rows of every shard worker (memory probe)."""
        futs = [w.docmeta_rows.remote()
                for ranges in self.shards for reps in ranges for w in reps]
        return ray.get(futs)

    def shutdown(self):
        for ranges in self.shards:
            for replicas in ranges:
                for w in replicas:
                    ray.kill(w)
        for f in self.fronts:
            ray.kill(f)
        self.shards = []
        self.fronts = []


# ---------------------------------------------------------------------------
# doc-sharded tier: per-doc-range sub-indexes + distributed-IDF exchange
# ---------------------------------------------------------------------------

@ray.remote
class DocShardWorker:
    """One doc-range sub-index (its own postings + docmeta).

    Global corpus stats arrive in the CONSTRUCTOR, not a post-init
    call: with ``max_restarts`` set, Ray re-runs only ``__init__``
    after an actor death — stats applied via a separate method would
    silently vanish on restart and the revived shard would score with
    LOCAL stats (wrong answers, no error).  Ctor args replay on
    restart, so the revived actor is bit-identical to the original."""

    def __init__(self, index_dir: str, n_docs: int | None = None,
                 avgdl: float | None = None):
        self.idx = InvertedIndex(index_dir)
        if n_docs is not None:
            self.idx.set_global_stats(int(n_docs), float(avgdl))

    def local_stats(self) -> tuple[int, int]:
        st = self.idx.manifest["stats"]
        return int(st["n_docs"]), int(st["total_tokens"])

    def set_global_stats(self, n_docs: int, avgdl: float) -> bool:
        self.idx.set_global_stats(n_docs, avgdl)
        return True

    def term_dfs(self, terms: list[str]) -> dict[str, int]:
        return {t: self.idx.df_of(t) for t in terms}

    def search_topk(self, query: str, k: int, dfs: dict[str, int],
                    method: str = "bmw", where: tuple | None = None,
                    exclude: str | None = None,
                    must: str | None = None, require_all: bool = False):
        """must / exclude / require_all are per-doc predicates over
        postings THIS shard owns whole, so shard-local gating merges
        exactly; a must-term with no postings here empties only this
        shard's answer, which IS the correct per-doc semantics (none of
        its docs can contain the term)."""
        self.idx.add_df_overrides(dfs)
        return self.idx.search(query, k=k, method=method, where=where,
                               exclude=exclude, must=must,
                               require_all=require_all)

    def search_phrase_topk(self, query: str, k: int, dfs: dict[str, int],
                           slop: int = 0, where: tuple | None = None,
                           exclude: str | None = None):
        self.idx.add_df_overrides(dfs)
        return self.idx.search_phrase(query, k=k, slop=slop, where=where,
                                      exclude=exclude)

    def facet_counts(self, query: str, col: str, dfs: dict[str, int],
                     where: tuple | None = None,
                     require_all: bool = False,
                     must: str | None = None,
                     exclude: str | None = None):
        self.idx.add_df_overrides(dfs)
        return self.idx.facet_counts(query, col, where=where,
                                     require_all=require_all,
                                     must=must, exclude=exclude)

    def facet_histogram(self, query: str, col: str, edges,
                        dfs: dict[str, int],
                        where: tuple | None = None,
                        require_all: bool = False,
                        must: str | None = None,
                        exclude: str | None = None):
        self.idx.add_df_overrides(dfs)
        return self.idx.facet_histogram(query, col, edges, where=where,
                                        require_all=require_all,
                                        must=must, exclude=exclude)

    def search_weighted_topk(self, term_weights: dict, k: int,
                             dfs: dict[str, int],
                             where: tuple | None = None,
                             where_range: tuple | None = None):
        """Weighted-term top-k among THIS shard's docs under the global
        df overrides — search_weighted accumulates in ascending
        OVERRIDDEN-df order, so per-doc sums are bit-identical to one
        global index and the front's merge is exact.  The doc-values
        filters are per-doc predicates over the shard's own sidecars,
        so they commute with doc sharding."""
        self.idx.add_df_overrides(dfs)
        return self.idx.search_weighted(term_weights, k=k, where=where,
                                        where_range=where_range)

    def match_count_weighted(self, term_weights: dict,
                             where: tuple | None = None,
                             where_range: tuple | None = None):
        """Membership needs no df exchange at all — counts are summed
        across disjoint shards."""
        return self.idx.match_count_weighted(term_weights, where=where,
                                             where_range=where_range)

    def match_count(self, query: str, dfs: dict[str, int],
                    where: tuple | None = None,
                    must: str | None = None,
                    exclude: str | None = None,
                    require_all: bool = False):
        """Hits among THIS shard's docs (df overrides keep the decode
        cache's scores global-stats-consistent, same as facet_counts)."""
        self.idx.add_df_overrides(dfs)
        return self.idx.match_count(query, where=where, must=must,
                                    exclude=exclude,
                                    require_all=require_all)

    def snippets_of(self, query: str, doc_ids, col: str = "text"):
        """Windows for the docs THIS shard owns (others hydrate None —
        each doc lives whole on one shard, so the front's first-non-None
        merge is exact).  Only window strings leave the shard."""
        return self.idx.snippets_of(query, doc_ids, col)

    def url_of(self, doc_ids):
        """urls for the docs THIS shard owns (None otherwise)."""
        return self.idx.url_of(doc_ids)

    def suggest_all(self, prefix: str):
        """EVERY prefixed term with its local df (the exhaustive
        fallback merge; the front's default is the threshold algorithm
        below)."""
        return self.idx.suggest(prefix, k=1 << 62)

    def suggest_top(self, prefix: str, m: int):
        """Local top-m prefixed terms plus the REMAINDER BOUND: the
        (m+1)th df if more terms exist (every unreturned term's df is
        <= it — the list is df-desc sorted), else 0 with exhausted=True.
        The threshold-algorithm front needs exactly this triple."""
        rows = self.idx.suggest(prefix, k=m + 1)
        if len(rows) > m:
            return rows[:m], int(rows[m][1]), False
        return rows, 0, True


class DocShardedQueryService:
    """The QPS-optimal distributed layout (classic web-search design):
    each shard holds a COMPLETE index over a disjoint doc range, answers
    top-k locally, and the front merges S small top-k lists — network
    per query is O(S * k), independent of posting lengths (vs the
    term-sharded tier's O(sum df)).

    Exactness: naive per-shard BM25 would use local df/N/avgdl and
    drift from a single global index.  This front runs the classic
    distributed-statistics exchange instead: phase 1 sums each shard's
    df for the query terms and pushes global N/avgdl once at startup;
    phase 2 shards score with those GLOBAL stats, so the merged top-k
    is exact.  With ``method="daat"`` scores are BIT-identical to a
    single global index (same per-doc float addition order,
    pytest-asserted); with ``method="bmw"`` they agree to the last ulp
    only (block-max processes terms in upper-bound order — the same
    ulp-level difference local bmw-vs-daat shows), ranks identical up
    to genuinely tied floats.

    Requirement: the doc partitioner must be doc-consistent (e.g.
    hash64(url) % S) so a url's duplicates dedup within one shard.
    """

    def __init__(self, index_dirs: list[str], num_cpus: float = 0.5,
                 method: str = "bmw"):
        self.method = method
        # global stats from the manifests DRIVER-side (cheap JSON reads)
        # so they can ride in the worker CONSTRUCTOR — restart-safe
        # (see DocShardWorker docstring); max_task_retries replays a
        # read-only call on the revived actor transparently
        stats = [index_io.load_manifest(d)["stats"] for d in index_dirs]
        self.n_docs = sum(int(s["n_docs"]) for s in stats)
        tot = sum(int(s["total_tokens"]) for s in stats)
        # same float op as index_io.finalize -> bitwise-equal avgdl
        self.avgdl = (tot / self.n_docs) if self.n_docs else 0.0
        self.workers = [
            DocShardWorker.options(num_cpus=num_cpus, max_restarts=4,
                                   max_task_retries=2)
            .remote(d, self.n_docs, self.avgdl) for d in index_dirs]
        ray.get([w.local_stats.remote() for w in self.workers])  # warm
        self.cfg = EngineConfig.from_dict(
            index_io.load_manifest(index_dirs[0])["config"])
        # bounded LRU (dict insertion order): the front's global-df
        # memo otherwise grows with distinct query terms forever —
        # the same unbounded-cache class the byte-budget decoded-term
        # LRU fixed in engine/query.py
        self._df_cache: dict[str, int] = {}
        self.df_cache_max_terms = 1_000_000
        # ops probe: wire rows + rounds of the latest TA suggest call
        self.last_suggest_stats: dict = {}

    def _terms_of(self, query: str) -> list[str]:
        seen, out = set(), []
        for t in tokenize(query, self.cfg.cjk_unigrams):
            if t not in seen:
                seen.add(t)
                out.append(t)
        return out

    def _global_dfs(self, terms: list[str]) -> dict[str, int]:
        missing = [t for t in terms if t not in self._df_cache]
        if missing:
            per_shard = ray.get([w.term_dfs.remote(missing)
                                 for w in self.workers])
            for t in missing:
                self._df_cache[t] = sum(d[t] for d in per_shard)
        out = {}
        for t in terms:
            v = self._df_cache.pop(t)      # LRU touch: re-insert
            self._df_cache[t] = v
            out[t] = v
        # evict only AFTER the current query's terms are touched — an
        # eviction between insert and touch could pop one of THIS
        # query's terms (it may be the oldest entry) and the touch
        # would KeyError; post-touch, the query's terms are the newest
        # entries and eviction (oldest-first) can never reach them
        while len(self._df_cache) > self.df_cache_max_terms:
            self._df_cache.pop(next(iter(self._df_cache)))
        return out

    def _scatter(self, query: str, k: int, where: tuple | None = None,
                 exclude: str | None = None, must: str | None = None,
                 require_all: bool = False):
        terms = self._terms_of(query)
        if not terms:
            return None
        # exclusion/must terms need GLOBAL dfs too? No — both are
        # membership masks, df-independent; only scored terms exchange.
        dfs = self._global_dfs(terms)
        return [w.search_topk.remote(query, k, dfs, self.method, where,
                                     exclude, must, require_all)
                for w in self.workers]

    @staticmethod
    def _merge(parts, k: int):
        merged = [hit for p in parts for hit in p]
        # (score desc, doc_id asc) — same order the local engine uses
        merged.sort(key=lambda h: (-h[1], h[0]))
        return merged[:k]

    def search(self, query: str, k: int = 10,
               where: tuple | None = None, exclude: str | None = None,
               must: str | None = None, require_all: bool = False):
        """``where=(col, values)`` filters on each shard's doc-values
        sidecar (attach_doc_values must have run per SHARD index — the
        shards are independent indexes).  Per-doc filters compose
        exactly with doc sharding: every doc lives whole on one shard,
        so filtered per-shard top-k merges are exact, same as phrases.
        ``must`` / ``exclude`` / ``require_all`` are per-doc predicates
        gated shard-locally with the same exactness; conjunctive scores
        stay bit-identical to one global index because _search_all
        sums in overridden-(global-)df order under the stats
        exchange."""
        if k <= 0:
            return []
        futs = self._scatter(query, k, where, exclude, must, require_all)
        return [] if futs is None else self._merge(ray.get(futs), k)

    def search_weighted(self, term_weights: dict, k: int = 10,
                        where: tuple | None = None,
                        where_range: tuple | None = None):
        """Distributed weighted-term (SPLADE-seam) top-k: the scored
        terms are the weight keys VERBATIM (callers supply
        already-analyzed terms, the learned-sparse contract), so the
        global-df exchange runs over them directly — no tokenize.
        Per-shard scores are bit-identical to one global index (the
        ascending-overridden-df accumulation rule) and the doc-values
        filters are per-doc predicates, so the O(S x k) merge is
        exact."""
        if k <= 0:
            return []
        terms = sorted(term_weights)
        if not terms:
            return []
        dfs = self._global_dfs(terms)
        futs = [w.search_weighted_topk.remote(dict(term_weights), k, dfs,
                                              where, where_range)
                for w in self.workers]
        return self._merge(ray.get(futs), k)

    def match_count_weighted(self, term_weights: dict,
                             where: tuple | None = None,
                             where_range: tuple | None = None) -> int:
        """hits.total: per-shard membership counts sum exactly (doc
        spaces are disjoint; membership needs no df exchange)."""
        return sum(ray.get([w.match_count_weighted.remote(
            dict(term_weights), where, where_range)
            for w in self.workers]))

    def facet_counts(self, query: str, col: str,
                     where: tuple | None = None,
                     require_all: bool = False,
                     must: str | None = None,
                     exclude: str | None = None):
        """Distributed facet aggregation: shards count locally over
        their disjoint doc ranges, the front sums per value — exact
        (counts are additive over a doc partition; must/exclude are
        per-doc predicates gated shard-locally), O(S x n_values)
        network."""
        terms = self._terms_of(query)
        if not terms:
            return []
        dfs = self._global_dfs(terms)
        parts = ray.get([w.facet_counts.remote(query, col, dfs, where,
                                               require_all, must, exclude)
                         for w in self.workers])
        tot: dict = {}
        for p in parts:
            for v, n in p:
                tot[v] = tot.get(v, 0) + n
        return sorted(tot.items(), key=lambda t: (-t[1], t[0]))

    def facet_histogram(self, query: str, col: str, edges,
                        where: tuple | None = None,
                        require_all: bool = False,
                        must: str | None = None,
                        exclude: str | None = None):
        """Distributed histogram facet: per-shard bucket counts sum
        exactly (buckets are fixed, shards partition docs)."""
        terms = self._terms_of(query)
        if not terms:
            return []
        dfs = self._global_dfs(terms)
        parts = ray.get([w.facet_histogram.remote(query, col, list(edges),
                                                  dfs, where, require_all,
                                                  must, exclude)
                         for w in self.workers])
        if not parts or not parts[0]:
            return []
        out = [list(b) for b in parts[0]]
        for p in parts[1:]:
            for i, (_, _, n) in enumerate(p):
                out[i][2] += n
        return [tuple(b) for b in out]

    def snippets_of(self, query: str, doc_ids, col: str = "text"):
        """Distributed top-k snippet hydration: every shard windows the
        docs it owns (doc text never crosses the wire — only the k
        window strings return), the front takes the first non-None per
        position.  Exact because the doc partition is disjoint: at most
        one shard answers per doc."""
        ids = list(doc_ids)
        parts = ray.get([w.snippets_of.remote(query, ids, col)
                         for w in self.workers])
        return [next((p[i] for p in parts if p[i] is not None), None)
                for i in range(len(ids))]

    def match_count(self, query: str, where: tuple | None = None,
                    must: str | None = None,
                    exclude: str | None = None,
                    require_all: bool = False) -> int:
        """Distributed total hits: per-shard counts sum exactly over
        the disjoint doc partition (all clauses are per-doc masks)."""
        terms = self._terms_of(query)
        if not terms:
            return 0
        dfs = self._global_dfs(terms)
        return int(sum(ray.get(
            [w.match_count.remote(query, dfs, where, must, exclude,
                                  require_all)
             for w in self.workers])))

    def url_of(self, doc_ids):
        """Distributed top-k url hydration: every shard answers for the
        docs it owns, the front takes the first non-None per position
        (disjoint doc partition — at most one shard answers per doc)."""
        ids = list(doc_ids)
        parts = ray.get([w.url_of.remote(ids) for w in self.workers])
        return [next((p[i] for p in parts if p[i] is not None), None)
                for i in range(len(ids))]

    def suggest(self, prefix: str, k: int = 10):
        """Distributed prefix suggestion by THRESHOLD ALGORITHM (Fagin
        TA shape) — a term outside one shard's local top-k can still
        win on the SUMMED df, but full per-shard enumeration ships
        ~every prefixed (term, df) pair per keystroke.  Instead:

        phase 1: each shard returns its local top-m (m = 2k + 8,
        doubling per round) plus a REMAINDER BOUND (the (m+1)th df —
        an upper bound on any term it didn't return).  theta = the kth
        largest PARTIAL sum over seen terms (a lower bound of the true
        kth summed df); rounds deepen until no UNSEEN term's upper
        bound (sum of all remainder bounds) can reach theta, or every
        shard is exhausted.

        phase 2: exact dfs are fetched ONLY for seen terms whose upper
        bound (partial + non-reporting shards' remainder bounds) can
        still reach theta, and only from the shards that didn't report
        them.  Terms pruned by either phase have exact sum strictly
        below the kth exact sum (partial <= exact, bounds are upper
        bounds), so the cut is BIT-IDENTICAL to the exhaustive merge —
        pytest pins this against suggest_full on the fixture set.

        ``last_suggest_stats`` records wire rows + rounds (the test's
        exchange-size assertion and an ops probe)."""
        if k <= 0 or not prefix:
            return []
        n_shards = len(self.workers)
        seen: list[dict[str, int]] = [dict() for _ in range(n_shards)]
        bounds = [0] * n_shards
        exhausted = [False] * n_shards
        wire_rows = 0
        m = 2 * k + 8
        rounds = 0
        while True:
            rounds += 1
            live = [si for si in range(n_shards) if not exhausted[si]]
            parts = ray.get([self.workers[si].suggest_top.remote(prefix, m)
                             for si in live])
            for si, (rows, bound, done) in zip(live, parts):
                wire_rows += len(rows)
                seen[si] = dict(rows)     # refetch supersedes (superset)
                bounds[si] = 0 if done else bound
                exhausted[si] = done
            partial: dict[str, int] = {}
            for s in seen:
                for t, df in s.items():
                    partial[t] = partial.get(t, 0) + df
            if all(exhausted):
                # every (term, shard) df is known — partials are exact
                out = sorted(partial.items(), key=lambda x: (-x[1], x[0]))
                self.last_suggest_stats = {"wire_rows": wire_rows,
                                           "rounds": rounds, "exact_fetch": 0}
                return out[:k]
            unseen_upper = sum(bounds)
            if len(partial) >= k:
                theta = sorted(partial.values(), reverse=True)[k - 1]
                if unseen_upper < theta:
                    break
            m *= 2
        # phase 2: exact sums for candidates whose upper bound reaches
        # theta, fetched only from the shards that didn't report them
        need: list[list[str]] = [[] for _ in range(n_shards)]
        cand = []
        for t, p in partial.items():
            upper = p + sum(bounds[si] for si in range(n_shards)
                            if t not in seen[si])
            if upper >= theta:
                cand.append(t)
                for si in range(n_shards):
                    if t not in seen[si] and not exhausted[si]:
                        need[si].append(t)
        fetch = [(si, ts) for si, ts in enumerate(need) if ts]
        extra = ray.get([self.workers[si].term_dfs.remote(ts)
                         for si, ts in fetch])
        exact_fetch = sum(len(ts) for _, ts in fetch)
        for (si, _ts), dfs in zip(fetch, extra):
            for t, df in dfs.items():
                seen[si][t] = df
        tot = {t: sum(s.get(t, 0) for s in seen) for t in cand}
        out = sorted(tot.items(), key=lambda x: (-x[1], x[0]))
        self.last_suggest_stats = {"wire_rows": wire_rows + exact_fetch,
                                   "rounds": rounds,
                                   "exact_fetch": exact_fetch}
        return out[:k]

    def suggest_full(self, prefix: str, k: int = 10):
        """Exhaustive-merge reference path (every shard ships its whole
        prefixed range): the oracle the TA path is pinned against."""
        if k <= 0 or not prefix:
            return []
        parts = ray.get([w.suggest_all.remote(prefix)
                         for w in self.workers])
        tot: dict[str, int] = {}
        for p in parts:
            for t, df in p:
                tot[t] = tot.get(t, 0) + df
        out = sorted(tot.items(), key=lambda x: (-x[1], x[0]))
        return out[:k]

    def search_phrase(self, query: str, k: int = 10, slop: int = 0,
                      where: tuple | None = None,
                      exclude: str | None = None):
        """Distributed phrase / proximity top-k (positional shard
        indexes only).  Phrase matching is a PER-DOCUMENT predicate and
        every doc lives whole on one shard, so scattering the phrase
        and merging per-shard top-k is exact — the reason real engines
        shard by document, not by term: a term-sharded layout would
        have to ship position runs between shards for every multi-term
        phrase.  ``where`` / ``exclude`` are per-doc predicates too
        (each shard owns its docs' sidecar and the excluded term's
        local postings), so they compose shard-locally with the same
        exactness.  Scores use the same global-stats exchange as
        search(), so results are bit-identical to one global
        positional index."""
        if k <= 0:
            return []
        terms = self._terms_of(query)
        if not terms:
            return []
        dfs = self._global_dfs(terms)
        futs = [w.search_phrase_topk.remote(query, k, dfs, slop,
                                            where, exclude)
                for w in self.workers]
        return self._merge(ray.get(futs), k)

    def search_many(self, queries: list[str], k: int = 10,
                    where: tuple | None = None,
                    exclude: str | None = None,
                    must: str | None = None, require_all: bool = False):
        """Pipelined: all queries' per-shard top-k futures are in flight
        before the first merge (merges touch only shards x k rows)."""
        if k <= 0:
            return [[] for _ in queries]
        plans = [self._scatter(q, k, where, exclude, must, require_all)
                 for q in queries]
        return [[] if p is None else self._merge(ray.get(p), k)
                for p in plans]

    def shutdown(self):
        for w in self.workers:
            ray.kill(w)
        self.workers = []
