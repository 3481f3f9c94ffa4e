"""BM25 top-k query engine over the built index.

Reference analog: query-side embed + external vector-DB search
(/root/reference/rust/src/lib.rs:195-210 embed_query;
/root/reference/examples/SearchAgent/SearchR1/lance_retrieval.py:103-147
table.search().limit(num)).  Here retrieval is in-engine: tokenize the
query with the SAME analyzer, fetch postings for the query terms from
the term-partitioned segments (a broadcast join of the tiny query-term
set against the term dictionary, SURVEY.md J3), score with Okapi BM25
and merge a top-k heap.

Scoring (BASELINE.md §2; float64 throughout, ties broken doc_id asc):

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    s(t, d) = idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
    score(q, d) = sum over DISTINCT query terms of s(t, d)

Two execution strategies, rank-identical by construction/tests:
  * ``method="daat"`` — exhaustive document-at-a-time, fully vectorized
    (decode all postings for the query terms, dense per-position
    accumulate).  The correctness oracle path.
  * ``method="bmw"`` — block-max WAND: per-block upper bounds
    score(max_tf, min_dl) prune blocks that cannot reach the running
    top-k threshold; only surviving blocks are decoded.

Beyond ranked OR: ``require_all`` (AND), ``must`` (+term gate),
``exclude`` (MUST_NOT), ``where``/``where_range`` (doc-values filters,
engine/docvalues.py), ``search_phrase`` (positional, slop), ``suggest``
(prefix autocomplete), ``facet_counts`` / ``facet_histogram`` (match-set
aggregations), ``values_of`` (stored-field hydration).

The loaded state (term dictionaries, docmeta arrays) is the per-worker
state the reference keeps in ``Arc<Embedder>``
(/root/reference/rust/src/lib.rs:839); serve it inside a Ray actor for
distributed query serving (one `QueryActor` per replica).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq

from engine import index_io
from engine.config import EngineConfig
from engine.postings import (decode_postings, decode_skips, decode_block,
                             decode_positions, gather_slices)
from engine.tokenize import tokenize, stable_hash64


class InvertedIndex:
    """Loads the manifest + docmeta eagerly, term dictionaries lazily;
    posting/skip blobs are mmapped by default (a term lookup touches
    only its byte range — resident memory tracks the query working set,
    not the segment size).  At 10^12-doc scale the part-range sharding
    lives in engine.serve.ShardedQueryService (scatter-gather over this
    same loader); docmeta sharding per actor group is the remaining
    documented step.
    """

    def __init__(self, index_dir: str, use_mmap: bool = True,
                 cache_budget_bytes: int = 1 << 30,
                 doc_range: tuple[int, int] | None = None,
                 deleted=None):
        self.index_dir = index_dir
        self.use_mmap = use_mmap  # serving default: page-cache-backed blobs
        # decoded-term cache budget in BYTES, not term count: one
        # stopword list at 10^6+ df decodes to tens of MB, so a count
        # cap either thrashes (every query re-decodes its stopwords —
        # measured 1.02 s p95 at 1.6M docs with a 64-term cap) or
        # overruns memory.  LRU by bytes holds the query working set.
        self.cache_budget_bytes = cache_budget_bytes
        self._cache_bytes = 0
        self.manifest = index_io.load_manifest(index_dir)
        self.cfg = EngineConfig.from_dict(self.manifest["config"])
        st = self.manifest["stats"]
        self.n_docs = int(st["n_docs"])
        self.avgdl = float(st["avgdl"]) or 1.0
        # doc_range=[lo, hi): this loader holds ONLY that range's docmeta
        # (O(corpus / n_ranges) resident) and decodes only posting blocks
        # intersecting the range — the term-sharded serving tier's
        # docmeta-residency fix.  N/avgdl stay GLOBAL (from the
        # manifest), so per-range scores equal the full index's.
        self.doc_range = doc_range
        dm = index_io.read_docmeta(index_dir, self.cfg, doc_range=doc_range)
        ids = dm.column("doc_id").to_numpy()
        order = np.argsort(ids, kind="stable")
        self._doc_ids = ids[order]                       # sorted for searchsorted
        self._doclens = dm.column("doclen").to_numpy()[order].astype(np.float64)
        self._urls = np.asarray(dm.column("url").to_pylist(), dtype=object)[order]
        # Deletion overlay (Lucene-style tombstones): deleted docs are
        # masked out of every decoded run BEFORE caching, so they never
        # score — but N/avgdl/df stay the STALE stored values until
        # engine.merge.compact_index rewrites the segments (documented
        # semantics; a fresh build over the survivors re-bases stats).
        # ``deleted`` overrides the on-disk ``_deletes.parquet`` (lets a
        # caller query "as if deleted" without mutating a shared dir).
        if deleted is None:
            deleted = index_io.load_deletes(index_dir)
        deleted = np.asarray(deleted, dtype=np.int64)
        self._del_mask = None
        if deleted.size and self._doc_ids.size:
            p = np.searchsorted(self._doc_ids, deleted)
            ok = p < self._doc_ids.size
            p = p[ok]
            p = p[self._doc_ids[p] == deleted[ok]]
            if p.size:
                self._del_mask = np.zeros(self._doc_ids.size, dtype=bool)
                self._del_mask[p] = True
        self._term_cache: dict[int, dict] = {}
        self._blob_cache: dict[int, tuple[bytes, bytes]] = {}
        self._posblob_cache: dict[int, bytes] = {}  # positional indexes
        self._positions_cache: dict[str, tuple] = {}  # phrase-term state
        self._pos_cache_sizes: dict[str, int] = {}
        self._pos_cache_bytes = 0
        self._postings_cache: dict[tuple, tuple] = {}  # hot decoded terms
        # doc-values sidecars (engine/docvalues.py): per column, the
        # factorized value codes aligned to _doc_ids (-1 = no sidecar
        # row) + the unique value array; masks cached per (col, values)
        self._dv_cache: dict[str, tuple] = {}
        # mask cache is byte-budget LRU like the decoded-term cache:
        # each mask is 1 byte/doc and every DISTINCT (col, values) or
        # (col, lo, hi) tuple is its own key — per-tenant filters or
        # sliding range windows would otherwise grow it without bound
        self._dv_mask_cache: dict[tuple, np.ndarray] = {}
        self._dv_mask_bytes = 0
        self.dv_mask_budget_bytes = max(1 << 20, cache_budget_bytes // 8)
        # distributed-serving hooks: a doc-range shard scores with GLOBAL
        # statistics so per-shard top-k merges are exact (classic
        # distributed-IDF exchange).  df overrides are per-term corpus
        # dfs; n_docs/avgdl are overridden via set_global_stats.
        self._df_overrides: dict[str, int] = {}

    def set_global_stats(self, n_docs: int, avgdl: float,
                         dfs: dict[str, int] | None = None) -> None:
        """Override corpus statistics (doc-sharded serving: every shard
        must score with the GLOBAL N/avgdl/df for exact merged top-k).
        Clears the decoded-term cache — cached scores embed the old idf."""
        self.n_docs = int(n_docs)
        self.avgdl = float(avgdl) or 1.0
        if dfs:
            self._df_overrides.update(dfs)
        self._postings_cache.clear()
        self._cache_bytes = 0

    def add_df_overrides(self, dfs: dict[str, int]) -> None:
        """Merge per-term global dfs (stable per term, so previously
        cached scores for OTHER terms stay valid; a term present here
        before its first decode is scored with the global idf)."""
        for t, df in dfs.items():
            old = self._df_overrides.get(t)
            if old != df:
                self._df_overrides[t] = df
                stale = self._postings_cache.pop(t, None)
                if stale is not None:
                    self._cache_bytes -= sum(a.nbytes for a in stale)

    # -- doc-values filters ---------------------------------------------------
    def _load_doc_values(self, col: str):
        """Sidecar column -> (codes aligned to ``_doc_ids``, uniques).
        Values are FACTORIZED once at load so every later mask is pure
        integer work (an object-dtype isin over multi-M docs would be a
        per-query Python-level scan); docs without a sidecar row get
        code -1.  Respects ``doc_range`` (per-part filter before concat,
        like docmeta itself)."""
        hit = self._dv_cache.get(col)
        if hit is not None:
            return hit
        import pandas as pd
        from engine.docvalues import read_doc_values
        t = read_doc_values(self.index_dir, self.cfg, col,
                            doc_range=self.doc_range)
        ids = t.column("doc_id").to_numpy()
        vals = np.asarray(t.column(col).to_pylist(), dtype=object)
        codes, uniq = pd.factorize(vals)
        # int32 codes: 4 B/doc resident per column (a 100M-doc shard's
        # column costs 400 MB at int64 — half that matters; cardinality
        # beyond 2^31 values would overflow doc memory long before this)
        aligned = np.full(self._doc_ids.size, -1, dtype=np.int32)
        p = np.searchsorted(self._doc_ids, ids)
        ok = p < self._doc_ids.size
        ok[ok] &= self._doc_ids[p[ok]] == ids[ok]
        aligned[p[ok]] = codes[ok]
        out = (aligned, np.asarray(uniq, dtype=object))
        self._dv_cache[col] = out
        return out

    def _dv_mask_get(self, key: tuple):
        hit = self._dv_mask_cache.get(key)
        if hit is not None:
            self._dv_mask_cache.pop(key)   # LRU touch: re-insert
            self._dv_mask_cache[key] = hit
        return hit

    def _dv_mask_put(self, key: tuple, mask: np.ndarray) -> None:
        size = mask.nbytes
        if size > self.dv_mask_budget_bytes:
            return
        while (self._dv_mask_bytes + size > self.dv_mask_budget_bytes
               and self._dv_mask_cache):
            oldest = next(iter(self._dv_mask_cache))
            self._dv_mask_bytes -= self._dv_mask_cache.pop(oldest).nbytes
        self._dv_mask_cache[key] = mask
        self._dv_mask_bytes += size

    def range_mask(self, col: str, lo, hi) -> np.ndarray:
        """Boolean keep-mask for ``lo <= col <= hi`` (inclusive both
        ends, the BETWEEN rule) over a NUMERIC doc-values column.  The
        compare runs over the column's UNIQUE values (the factorized
        dictionary), then one lut gather — O(distinct) compares even
        when n_docs is huge; missing docs never match."""
        key = (col, "__range__", lo, hi)
        hit = self._dv_mask_get(key)
        if hit is not None:
            return hit
        aligned, uniq = self._load_doc_values(col)
        try:
            # exact for ints up to 2^53 (epoch-us timestamps included)
            u = uniq.astype(np.float64)
            want = (u >= lo) & (u <= hi)
        except (TypeError, ValueError):
            # non-castable values: exact Python compare, still only
            # O(distinct) — never O(n_docs)
            want = np.array([v is not None and lo <= v <= hi
                             for v in uniq.tolist()], dtype=bool)
        lut = np.concatenate((want, [False]))
        mask = lut[aligned]
        self._dv_mask_put(key, mask)
        return mask

    def where_mask(self, col: str, values) -> np.ndarray:
        """Boolean keep-mask over ``_doc_ids`` positions for
        ``col IN values`` (``values`` may be a scalar).  A doc with no
        sidecar row never matches.  Cached per (col, values)."""
        if isinstance(values, (str, bytes)):
            values = (values,)
        else:
            try:
                values = tuple(values)
            except TypeError:      # scalar (int/float/np number)
                values = (values,)
        key = (col, values)
        hit = self._dv_mask_get(key)
        if hit is not None:
            return hit
        aligned, uniq = self._load_doc_values(col)
        want = np.isin(uniq, np.asarray(list(values), dtype=object))
        # lut[-1] stays False -> code -1 (missing) never matches
        lut = np.concatenate((want, [False]))
        mask = lut[aligned]
        self._dv_mask_put(key, mask)
        return mask

    # -- segment access -----------------------------------------------------
    def _part_of(self, term: str) -> int:
        from engine.tokenize import HASH_FNS
        hasher = HASH_FNS[getattr(self.cfg, "term_hash", "sip")]
        return int(hasher(np.array([term], dtype=object))[0]
                   % np.uint64(self.cfg.num_parts))

    _TERM_COLS = ("df", "cf", "post_off", "post_len", "skip_off",
                  "skip_len")

    def _load_part(self, part: int):
        """Part term dictionary as (sorted term array, numeric column
        arrays).  The segment writer emits terms SORTED (factorize
        sort=True in build, sorted k-way merge in merge_indexes), so
        lookups are a binary search over the Arrow-loaded array — no
        per-term Python dict build, which would cost seconds per part
        at real web vocabularies (10^5-10^6 terms/part).  Sortedness is
        verified with one vectorized Arrow compare at load (fail-loud
        on a corrupt segment rather than silently missing terms)."""
        if part not in self._term_cache:
            d = index_io.part_dir(self.index_dir, "postings", part)
            if not os.path.isdir(d):
                self._term_cache[part] = None
                self._blob_cache[part] = (b"", b"")
            else:
                terms, postings, skips = index_io.read_postings_part(
                    self.index_dir, part, use_mmap=self.use_mmap)
                ca = terms.column("term").combine_chunks()
                if len(ca) > 1:
                    import pyarrow.compute as pc
                    ok = pc.all(pc.less_equal(
                        ca.slice(0, len(ca) - 1), ca.slice(1))).as_py()
                    if not ok:
                        raise ValueError(
                            f"part {part}: term dictionary not sorted")
                term_arr = ca.to_numpy(zero_copy_only=False)
                cols = list(self._TERM_COLS)
                if "pos_off" in terms.column_names:  # positional segment
                    cols += ["pos_off", "pos_len"]
                nums = tuple(terms.column(c).to_numpy() for c in cols)
                self._term_cache[part] = (term_arr, nums)
                self._blob_cache[part] = (postings, skips)
        return self._term_cache[part], *self._blob_cache[part]

    def _term_row(self, part_entry, term: str):
        """Binary-search probe -> (df, cf, po, pl, so, sl) or None."""
        if part_entry is None:
            return None
        term_arr, nums = part_entry
        i = int(np.searchsorted(term_arr, term))
        if i >= term_arr.size or term_arr[i] != term:
            return None
        return tuple(int(col[i]) for col in nums)

    def lookup(self, term: str):
        """term -> (df, postings bytes, skips ndarray) or None."""
        entry, postings, skips = self._load_part(self._part_of(term))
        ent = self._term_row(entry, term)
        if ent is None:
            return None
        df, cf, po, pl, so, sl = ent[:6]
        return df, postings[po:po + pl], decode_skips(skips[so:so + sl])

    def _decode_term_positions(self, term: str):
        """Phrase-match state for one term -> (docID-run positions,
        tfs, raw varbyte positions blob, per-entry byte offsets, eidx),
        cached in a byte-budget LRU of its own.

        The position VALUES are NOT decoded here: one boundary scan
        over the blob (the varbyte terminator bitmap) yields each
        posting entry's byte range, and ``_phrase_verify`` decodes only
        the candidate entries it actually inspects.  A stopword's cold
        cost drops from the full O(cf) value decode (~10 s at 20M+
        occurrences) to the boundary scan, and the cached footprint is
        the ~1.2 B/occurrence blob instead of 4 B/occurrence int32
        positions — more phrase terms stay resident in the same budget.
        ``eidx`` maps kept entries to original entry indices when a
        tombstone overlay dropped some (None otherwise)."""
        hit = self._positions_cache.get(term)
        if hit is not None:
            self._positions_cache.pop(term)
            self._positions_cache[term] = hit   # LRU touch
            return hit
        ent = self.lookup_positions(term)
        if ent is None:
            return None
        df, pbytes, skips, pblob = ent
        ids, tfs = decode_postings(pbytes, skips.tobytes(), df,
                                   self.cfg.block_size)
        pos = np.searchsorted(self._doc_ids, ids.astype(np.int64))
        tfs = tfs.astype(np.int64)
        # entry byte boundaries: value v ends at the v-th clear
        # continuation bit; entry i spans values [vc[i], vc[i+1])
        blob = np.frombuffer(pblob, dtype=np.uint8)
        ends = np.flatnonzero((blob & 0x80) == 0)
        vc = np.concatenate(([0], np.cumsum(tfs)))
        offs = np.empty(tfs.size + 1, dtype=np.int64)
        offs[0] = 0
        offs[1:] = ends[vc[1:] - 1] + 1
        eidx = None
        if self._del_mask is not None:
            keep = ~self._del_mask[pos]
            if not keep.all():
                eidx = np.flatnonzero(keep)
                pos, tfs = pos[keep], tfs[keep]
        if self._doc_ids.size < (1 << 31):
            pos = pos.astype(np.int32)
        out = (pos, tfs.astype(np.int32), blob, offs, eidx)
        size = (pos.nbytes + tfs.nbytes * 2 + blob.nbytes + offs.nbytes
                + (0 if eidx is None else eidx.nbytes))
        if size <= self.cache_budget_bytes:
            while (self._pos_cache_bytes + size > self.cache_budget_bytes
                   and self._positions_cache):
                oldest = next(iter(self._positions_cache))
                self._positions_cache.pop(oldest)
                self._pos_cache_bytes -= self._pos_cache_sizes.pop(oldest)
            self._positions_cache[term] = out
            self._pos_cache_sizes[term] = size
            self._pos_cache_bytes += size
        return out

    def _positions_blob(self, part: int):
        """Lazy per-part positions.bin (phrase path only — BM25 serving
        never touches it, so non-phrase memory cost is zero)."""
        if part not in self._posblob_cache:
            self._posblob_cache[part] = index_io.read_positions_blob(
                self.index_dir, part, use_mmap=self.use_mmap)
        return self._posblob_cache[part]

    def lookup_positions(self, term: str):
        """term -> (df, postings bytes, skips, positions bytes) or None.
        Raises on an index built without ``store_positions=True``."""
        part = self._part_of(term)
        entry, postings, skips = self._load_part(part)
        ent = self._term_row(entry, term)
        if ent is None:
            return None
        if len(ent) < 8:
            raise ValueError(
                "phrase search needs a positional index — rebuild with "
                "EngineConfig(store_positions=True)")
        df, cf, po, pl, so, sl, qo, ql = ent
        return (df, postings[po:po + pl], decode_skips(skips[so:so + sl]),
                self._positions_blob(part)[qo:qo + ql])

    def df_of(self, term: str) -> int:
        """Local document frequency (0 if absent) — the term-dictionary
        probe of the distributed-stats exchange; no posting decode."""
        entry, _, _ = self._load_part(self._part_of(term))
        ent = self._term_row(entry, term)
        return 0 if ent is None else int(ent[0])

    # -- scoring ------------------------------------------------------------
    def idf(self, df: int) -> float:
        return float(np.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5)))

    def _doclen_of(self, doc_ids: np.ndarray) -> np.ndarray:
        pos = np.searchsorted(self._doc_ids, doc_ids.astype(np.int64))
        return self._doclens[pos]

    def url_of(self, doc_ids: np.ndarray) -> list:
        """Resident-docmeta url per doc_id; None for ids this loader
        does not hold.  The equality check (not bare searchsorted)
        makes the method safe on doc_range-restricted loaders, where a
        foreign id would otherwise map to a neighbour's slot — the
        serving tiers rely on the None to merge per-worker answers
        (each doc's url is resident on exactly one range worker)."""
        ids = np.asarray(doc_ids, np.int64)
        if self._doc_ids.size == 0 or ids.size == 0:
            return [None] * ids.size
        pos = np.searchsorted(self._doc_ids, ids)
        safe = np.minimum(pos, self._doc_ids.size - 1)
        ok = (pos < self._doc_ids.size) & (self._doc_ids[safe] == ids)
        return [self._urls[p] if o else None
                for p, o in zip(safe.tolist(), ok.tolist())]

    def query_terms(self, query: str) -> list[str]:
        # distinct terms, first-occurrence order (qtf ignored — BASELINE.md)
        seen, out = set(), []
        for t in tokenize(query, self.cfg.cjk_unigrams):
            if t not in seen:
                seen.add(t); out.append(t)
        return out

    def values_of(self, doc_ids, col: str) -> list:
        """Per-hit stored-field hydration (Lucene stored-fields read):
        sidecar column values for a FEW doc_ids (top-k results), read
        lazily with parquet predicate pushdown — sidecars are written
        sorted by doc_id, so row-group stats prune the scan; nothing is
        held resident (unlike the filter path's factorized codes, which
        are per-column O(n_docs) and only justified for filtering).
        Docs without a sidecar row hydrate as None."""
        from engine.docvalues import get_doc_values
        return get_doc_values(self.index_dir, self.cfg, doc_ids, col)

    def snippets_of(self, query: str, doc_ids,
                    col: str = "text") -> list:
        """Best query-term window per (top-k) doc — the
        ``/v1/search?snippets=true`` rule (docops.best_snippet_window)
        over ``values_of``-hydrated text.  None for docs without a
        sidecar row or without a qualifying window; fail-loud when the
        sidecar/column was never attached (a silent all-None response
        would read as 'no hits had windows').  Safe on doc_range-
        restricted loaders: touches only the query tokenizer and the
        on-disk sidecars (part-pruned by doc_id % D), never postings."""
        from engine.docops import best_snippet_window
        from engine.docvalues import has_doc_values
        if not has_doc_values(self.index_dir, self.cfg, col):
            raise FileNotFoundError(
                f"doc-values sidecar column {col!r} not attached "
                "(attach_doc_values)")
        terms = frozenset(self.query_terms(query))
        out = []
        for t in self.values_of(doc_ids, col):
            win = (best_snippet_window(
                tokenize(t, self.cfg.cjk_unigrams), terms)
                if t is not None else None)
            out.append(None if win is None else win[2])
        return out

    def suggest(self, prefix: str, k: int = 10,
                parts=None) -> list[tuple[str, int]]:
        """Prefix term suggestion (the autocomplete / did-you-mean
        base): -> [(term, df)] of the top-k index terms starting with
        ``prefix``, ranked (df desc, term asc).

        Each part's term dictionary is SORTED (build factorize
        sort=True, merge keeps order), so a prefix is one binary-search
        range per part: [prefix, prefix + U+10FFFF).  U+10FFFF is a
        Unicode noncharacter (category Cn) the tokenizer can never emit
        — terms are word-segmented \\w runs — so the upper bound is
        exact.  Within a part the range is pruned to its own top-k by
        df (keeping ALL ties at the kth value, so the global cut with
        the term-asc tie-break stays exact); the merge sees at most
        parts x (k + ties) rows.  df is the STORED value — stale under
        a tombstone overlay until compaction, like idf (documented
        deletion semantics)."""
        if k <= 0 or not prefix:
            return []
        prefix = prefix.lower()   # dictionary terms are lowercased
        hi_key = prefix + "\U0010FFFF"
        cand: list[tuple[int, str]] = []
        # ``parts``: restrict to a part subset (term-sharded serving —
        # a ShardWorker owns a part range and must neither load nor
        # answer for other shards' dictionary parts; parts partition
        # the term space, so per-shard top-k merges exactly)
        for part in (range(self.cfg.num_parts) if parts is None
                     else parts):
            entry, _, _ = self._load_part(part)
            if entry is None:
                continue
            term_arr, nums = entry
            lo = int(np.searchsorted(term_arr, prefix))
            hi = int(np.searchsorted(term_arr, hi_key))
            if hi <= lo:
                continue
            dfs = nums[0][lo:hi]
            terms = term_arr[lo:hi]
            if dfs.size > k:
                kth = np.partition(dfs, dfs.size - k)[dfs.size - k]
                sel = dfs >= kth
                terms, dfs = terms[sel], dfs[sel]
            cand.extend(zip(dfs.tolist(), terms.tolist()))
        cand.sort(key=lambda t: (-t[0], t[1]))
        return [(t, int(df)) for df, t in cand[:k]]

    def facet_counts(self, query: str, col: str,
                     where: tuple | None = None,
                     require_all: bool = False,
                     must: str | None = None,
                     exclude: str | None = None) -> list[tuple]:
        """Facet aggregation over the query's match set: -> [(value,
        n_docs)] sorted (count desc, value asc) for the doc-values
        column ``col``, counting documents that contain >=1 query term
        (the standard disjunctive facet base; ``require_all=True``
        switches to the AND match set).  Docs without a sidecar row are
        not counted under any facet value.  Deletes are already masked
        out of decoded runs; ``where`` / ``must`` / ``exclude`` compose
        (facet within the same gated set the hits come from).  Pure
        integer work: the match mask indexes the factorized code array
        once, then one bincount."""
        matched = self._match_mask(query, require_all)
        if matched is None:
            return []
        if must:
            mm = self._must_mask(must)
            if mm is None:                 # absent must-term: empty set
                return []
            matched = matched & mm
        if exclude:
            matched = matched & self._exclude_mask(exclude)
        if where is not None:
            matched = matched & self.where_mask(*where)
        codes, uniq = self._load_doc_values(col)
        c = codes[matched]
        c = c[c >= 0]
        if c.size == 0:
            return []
        cnt = np.bincount(c, minlength=uniq.size)
        nz = np.flatnonzero(cnt)
        # nz is one entry per distinct facet value — tiny; Python sort
        # avoids np.lexsort's lack of object-dtype (string) support
        order = sorted(nz.tolist(), key=lambda i: (-int(cnt[i]), uniq[i]))
        return [(uniq[i], int(cnt[i])) for i in order]

    def match_count(self, query: str, where: tuple | None = None,
                    where_range: tuple | None = None,
                    must: str | None = None,
                    exclude: str | None = None,
                    require_all: bool = False) -> int:
        """Total hits of a query under the full clause set (the
        ``hits.total`` every search UI shows next to top-k): documents
        containing >=1 query term (every term with ``require_all``),
        gated by must/exclude and the doc-values filters.  Pure mask
        work over the same decoded runs search() uses — no scoring, no
        top-k cut; an absent must-term gives 0 (matching search's
        empty result)."""
        matched = self._match_mask(query, require_all)
        if matched is None:
            return 0
        if must:
            mm = self._must_mask(must)
            if mm is None:
                return 0
            matched = matched & mm
        if exclude:
            matched = matched & self._exclude_mask(exclude)
        if where is not None:
            matched = matched & self.where_mask(*where)
        if where_range is not None:
            matched = matched & self.range_mask(*where_range)
        return int(matched.sum())

    def _match_mask(self, query: str,
                    require_all: bool = False) -> np.ndarray | None:
        """Boolean match set of a query (>=1 term by default, every
        term under ``require_all``) over ``_doc_ids`` positions; None
        when nothing can match.  A fresh array — callers may mutate."""
        terms = self.query_terms(query)
        matched = np.zeros(self._doc_ids.size, dtype=bool)
        first = True
        for t in terms:
            e = self.lookup(t)
            if e is None:
                if require_all:
                    return None
                continue
            df, pbytes, skips = e
            # same idf rule as search(): the mask ignores scores, but
            # the decode CACHES them — using the local df here would
            # poison the cache for scored searches on a doc-range shard
            pos, _ = self._decode_term(
                t, df, pbytes, skips,
                self.idf(self._df_overrides.get(t, df)))
            if require_all:
                tm = np.zeros(self._doc_ids.size, dtype=bool)
                tm[pos] = True
                matched = tm if first else (matched & tm)
                first = False
            else:
                matched[pos] = True
                first = False
        return None if first else matched

    def facet_histogram(self, query: str, col: str, edges,
                        where: tuple | None = None,
                        require_all: bool = False,
                        must: str | None = None,
                        exclude: str | None = None) -> list[tuple]:
        """Histogram facet over a NUMERIC doc-values column (the
        date-histogram analog): -> [(lo, hi, n_docs)] per half-open
        bucket ``[edges[i], edges[i+1])`` counting matched documents,
        empty buckets included (the UI contract).  Values outside
        [edges[0], edges[-1]) and docs without a sidecar row are not
        counted.  Same match set as facet_counts; the binning runs on
        the column's UNIQUE values (np.digitize over the factorized
        dictionary), then one lut gather + bincount — O(distinct)
        compares, never O(n_docs)."""
        edges = np.asarray(list(edges), dtype=np.float64)
        if edges.size < 2:
            return []
        matched = self._match_mask(query, require_all)
        if matched is not None and must:
            mm = self._must_mask(must)
            matched = None if mm is None else (matched & mm)
        if matched is None:
            counts = np.zeros(edges.size - 1, dtype=np.int64)
        else:
            if exclude:
                matched &= self._exclude_mask(exclude)
            if where is not None:
                matched &= self.where_mask(*where)
            codes, uniq = self._load_doc_values(col)
            c = codes[matched]
            c = c[c >= 0]
            per_val = np.bincount(c, minlength=uniq.size)
            try:
                u = uniq.astype(np.float64)
            except (TypeError, ValueError) as e:
                raise TypeError(
                    f"facet_histogram needs a numeric doc-values "
                    f"column; {col!r} holds e.g. {uniq[:1].tolist()}"
                ) from e
            bucket = np.digitize(u, edges) - 1
            ok = (bucket >= 0) & (bucket < edges.size - 1)
            counts = np.bincount(bucket[ok], weights=per_val[ok],
                                 minlength=edges.size - 1).astype(np.int64)
        return [(float(edges[i]), float(edges[i + 1]), int(counts[i]))
                for i in range(counts.size)]

    def search(self, query: str, k: int = 10, method: str = "bmw",
               require_all: bool = False, where: tuple | None = None,
               exclude: str | None = None,
               where_range: tuple | None = None,
               must: str | None = None):
        """-> list of (doc_id, score) sorted score desc, doc_id asc.

        ``require_all=True`` switches to conjunctive (AND) semantics:
        only documents containing EVERY query term are candidates (a
        term absent from the index empties the result, the classic
        boolean-AND rule); scores stay full BM25 sums.  Conjunctive
        queries route to the intersection scorer regardless of
        ``method`` — block-max upper bounds prune by score, while AND
        prunes by membership, and the rarest-first intersection is the
        stronger cut.

        ``where=(col, values)`` restricts candidates to documents whose
        doc-values sidecar column (engine/docvalues.py) matches (scalar
        or IN-list).  Corpus statistics stay GLOBAL — a filter narrows
        the candidate set without re-weighting idf/avgdl, the standard
        Lucene filter-query semantics, so a doc's score is identical
        with and without the filter.  Filtered disjunctive routing is
        density-split: at or below ``filtered_dense_cutoff`` the
        selective candidate-block scorer runs (decode only blocks
        containing a candidate — the win case for per-tenant filters);
        above it, ``method="bmw"`` runs MASKED block-max MaxScore —
        a block's unfiltered upper bound is still a valid upper bound
        for its masked subset, and θ (the running kth-best) is taken
        over masked candidates only, so pruning stays exact and a
        90%-density filter costs ~one mask gather per term over the
        unfiltered block-max query instead of an exhaustive decode.
        ``method="daat"`` forces the exhaustive scorer (the
        bit-identity reference for the serving tiers).

        ``where_range=(col, lo, hi)`` is the numeric-range filter
        (``lo <= col <= hi``, BETWEEN-inclusive) over a doc-values
        column — crawl-date windows, length bands.  Same global-stats
        semantics as ``where``; the two compose (AND).

        ``exclude`` is the boolean MUST_NOT clause (Lucene BooleanQuery
        third connective): documents containing ANY excluded term are
        dropped from the candidate set; excluded terms contribute
        nothing to scores (survivors keep their exact unexcluded
        scores).  An excluded term absent from the index excludes
        nothing.  Internally it is one more candidate mask, so it
        composes with ``where`` and ``require_all`` and shares the
        daat routing rationale.

        ``must`` is the mixed boolean MUST clause (Lucene ``+term``):
        candidates must contain EVERY must-term, but scoring still
        sums ALL of ``query``'s matching terms (the
        required-plus-optional query shape — ``require_all=True`` is
        the special case where every query term is required).  A
        must-term absent from the index empties the result.
        """
        if k <= 0:
            return []
        ex_mask = None
        if exclude:
            ex_mask = self._exclude_mask(exclude)
        must_mask = None
        if must:
            must_mask = self._must_mask(must)
            if must_mask is None:
                return []
        terms = self.query_terms(query)
        entries = []
        for t in terms:
            e = self.lookup(t)
            if e is None:
                if require_all:
                    return []
                continue
            df, pbytes, skips = e
            # idf from the GLOBAL df when serving a doc-range shard;
            # df itself stays local (it is the posting count to decode)
            idf = self.idf(self._df_overrides.get(t, df))
            entries.append((t, df, idf, pbytes, skips))
        if not entries:
            return []
        if where is not None or ex_mask is not None \
                or where_range is not None or must_mask is not None:
            mask = None
            for m in ((self.where_mask(*where)
                       if where is not None else None),
                      (self.range_mask(*where_range)
                       if where_range is not None else None),
                      ex_mask, must_mask):
                if m is not None:
                    mask = m if mask is None else (mask & m)
            if require_all:
                return self._search_all(entries, k, mask)
            if (int(mask.sum())
                    <= self.filtered_dense_cutoff * self._doc_ids.size):
                return self._search_filtered(entries, k, mask)
            if method == "bmw":
                return self._search_bmw(entries, k, mask)
            return self._search_daat(entries, k, mask)
        if require_all:
            return self._search_all(entries, k)
        if method == "daat":
            return self._search_daat(entries, k)
        if method == "dense":
            return self._search_dense(entries, k)
        return self._search_bmw(entries, k)

    def search_weighted(self, term_weights, k: int = 10,
                        where: tuple | None = None,
                        where_range: tuple | None = None):
        """Learned-sparse (SPLADE-style) retrieval seam: top-k by
        ``sum over matching terms of w_q(term) * score_d(term)`` where
        ``w_q`` is a caller-supplied per-term weight (a sparse learned
        query vector) and ``score_d`` is the engine's cached per-term
        BM25 contribution.  This is the retrieval shape of the
        reference's learned-sparse embedders (EmbedAnything scores
        sparse query/document term-weight dot products,
        rust/src/embeddings/local/bert.rs:379-396, examples/splade.py:
        37-48); with weights all 1.0 it degrades to ``search(...,
        method="daat")`` exactly.

        ``term_weights``: dict term -> weight, or iterable of
        (term, weight).  Terms are looked up verbatim (callers supply
        already-analyzed terms, the learned-sparse contract); unknown
        terms contribute nothing; weight 0 terms are skipped.
        Accumulation walks terms in ascending (overridden) df order —
        the same order rule as ``_search_all`` — so doc-range shards
        with global-stats overrides stay bit-identical to one global
        index.

        ``where=(col, values)`` / ``where_range=(col, lo, hi)`` are the
        doc-values filters (tenant-filtered sparse retrieval): the mask
        drops non-candidates AFTER accumulation, so corpus stats stay
        global and a survivor's score is identical with and without the
        filter (the search() Lucene filter-query semantics; the two
        compose with AND)."""
        if k <= 0:
            return []
        items = (term_weights.items()
                 if isinstance(term_weights, dict) else term_weights)
        entries = []
        for term, w in items:
            w = float(w)
            if w == 0.0:
                continue
            e = self.lookup(term)
            if e is None:
                continue
            df, pbytes, skips = e
            entries.append(
                (term, self._df_overrides.get(term, df), df, w,
                 pbytes, skips))
        if not entries:
            return []
        entries.sort(key=lambda e: (e[1], e[0]))  # global df asc, term
        acc = np.zeros(self._doc_ids.size, dtype=np.float64)
        touched = np.zeros(self._doc_ids.size, dtype=bool)
        for term, gdf, df, w, pbytes, skips in entries:
            pos, s = self._decode_term(
                term, df, pbytes, skips, self.idf(gdf))
            acc[pos] += w * s
            touched[pos] = True
        if where is not None:
            touched &= self.where_mask(*where)
        if where_range is not None:
            touched &= self.range_mask(*where_range)
        nz = np.flatnonzero(touched)
        return self._topk(self._doc_ids[nz], acc[nz], k)

    def match_count_weighted(self, term_weights,
                             where: tuple | None = None,
                             where_range: tuple | None = None) -> int:
        """hits.total for a weighted query: membership is
        weight-INDEPENDENT (a doc matches iff it contains any term with
        a nonzero weight), so this counts the union of those terms'
        postings under the doc-values filters — the with_total dual of
        ``search_weighted``, same decode/tombstone path."""
        items = (term_weights.items()
                 if isinstance(term_weights, dict) else term_weights)
        seen = np.zeros(self._doc_ids.size, dtype=bool)
        for term, w in items:
            if float(w) == 0.0:
                continue
            e = self.lookup(term)
            if e is None:
                continue
            df, pbytes, skips = e
            pos, _ = self._decode_term(
                term, df, pbytes, skips,
                self.idf(self._df_overrides.get(term, df)))
            seen[pos] = True
        if where is not None:
            seen &= self.where_mask(*where)
        if where_range is not None:
            seen &= self.range_mask(*where_range)
        return int(seen.sum())

    def _must_mask(self, must: str) -> np.ndarray | None:
        """Keep-mask that is True only for documents containing EVERY
        must-term; None when a must-term is absent from the index (the
        boolean-AND empty rule)."""
        mask = None
        for t in self.query_terms(must):
            e = self.lookup(t)
            if e is None:
                return None
            df, pbytes, skips = e
            pos, _ = self._decode_term(
                t, df, pbytes, skips,
                self.idf(self._df_overrides.get(t, df)))
            tm = np.zeros(self._doc_ids.size, dtype=bool)
            tm[pos] = True
            mask = tm if mask is None else (mask & tm)
        return (np.ones(self._doc_ids.size, dtype=bool)
                if mask is None else mask)

    def _exclude_mask(self, exclude: str) -> np.ndarray:
        """Keep-mask that is False for documents containing ANY of the
        excluded query's terms (decoded through the same score cache —
        positions are what the mask needs; scores along for the ride)."""
        keep = np.ones(self._doc_ids.size, dtype=bool)
        for t in self.query_terms(exclude):
            e = self.lookup(t)
            if e is None:
                continue
            df, pbytes, skips = e
            pos, _ = self._decode_term(
                t, df, pbytes, skips,
                self.idf(self._df_overrides.get(t, df)))
            keep[pos] = False
        return keep

    def search_phrase(self, query: str, k: int = 10, slop: int = 0,
                      where: tuple | None = None,
                      exclude: str | None = None):
        """Exact-phrase / proximity top-k: documents containing the
        query's tokens in order with at most ``slop`` interleaving
        non-query tokens in total (``slop=0`` = consecutive, the exact
        phrase), ranked by BM25 over the phrase's distinct terms (the
        classic phrase-filter + BM25-score rule).  Needs an index built
        with ``EngineConfig(store_positions=True)``.

        An ordered occurrence ``p_1 < ... < p_n`` has total gap
        ``p_n - p_1 - (n-1)`` regardless of the interior choices, and
        picking the EARLIEST valid next position minimizes ``p_n`` for
        a fixed start — so greedy matching decides existence exactly.

        Execution: candidate docs are pre-narrowed by the rarest-first
        sorted intersection the AND path uses (plus the optional
        ``where`` doc-values filter), every candidate is BM25-scored
        from the byte-budget score cache, and the positional predicate
        (``_phrase_verify`` — vectorized composite-key matching) runs
        over candidates in (score desc, doc asc) rank order in
        exponentially growing chunks with EXACT early termination at k
        verified hits: verification only filters, so the first k
        survivors in rank order are the global top-k.  A stopword in
        the phrase costs its one O(cf) position decode (amortized by
        the positions LRU) but occurrence keys are gathered only for
        the verified prefix of the candidate ranking.
        """
        if k <= 0:
            return []
        toks = tokenize(query, self.cfg.cjk_unigrams)
        if not toks:
            return []
        uniq = list(dict.fromkeys(toks))
        runs: dict[str, tuple] = {}
        for t in uniq:
            dec = self._decode_term_positions(t)
            if dec is None:
                return []
            runs[t] = dec                       # (pos run, tfs, tokpos)
        inter = None
        for t in sorted(uniq, key=lambda t: runs[t][0].size):
            p = runs[t][0]
            if inter is None:
                # doc-values filter / MUST_NOT exclusion (same
                # semantics as search): applied to the rarest run so
                # the candidate set only shrinks
                inter = p
                if where is not None:
                    inter = inter[self.where_mask(*where)[inter]]
                if exclude:
                    inter = inter[self._exclude_mask(exclude)[inter]]
            else:
                inter = np.intersect1d(inter, p, assume_unique=True)
            if inter.size == 0:
                return []

        # rank-ordered early termination (exact): score EVERY candidate
        # first (cheap — decoded scores are byte-budget-cached), walk
        # candidates in (score desc, doc asc) order — the same total
        # order _topk uses — and verify the positional predicate in
        # exponentially growing chunks, stopping at k verified hits.
        # Verification only FILTERS, so the first k survivors in rank
        # order ARE the global top-k.  A stopword x stopword phrase at
        # multi-M df goes from gathering every candidate's occurrences
        # (seconds) to a few chunks; a never-matching phrase degrades
        # to <=2x the all-at-once gather (geometric chunk sum).
        cscores = np.zeros(inter.size, dtype=np.float64)
        for t in uniq:
            df, pbytes, skips = self.lookup(t)
            idf = self.idf(self._df_overrides.get(t, df))
            pos, s = self._decode_term(t, df, pbytes, skips, idf)
            cscores += s[np.searchsorted(pos, inter)]
        order = np.lexsort((inter, -cscores))
        out: list[tuple[int, float]] = []
        lo, chunk = 0, max(1024, 4 * k)
        while lo < order.size and len(out) < k:
            sel = order[lo:lo + chunk]
            lo += sel.size
            chunk *= 2
            cand_idx = np.sort(sel)          # ascending candidate rows
            ok = self._phrase_verify(runs, toks, uniq,
                                     inter[cand_idx], slop)
            if ok.any():
                vi = cand_idx[ok]
                o = np.lexsort((inter[vi], -cscores[vi]))  # rank order
                for j in o:
                    out.append((int(self._doc_ids[inter[vi[j]]]),
                                float(cscores[vi[j]])))
        return out[:k]

    def _phrase_verify(self, runs: dict, toks: list[str],
                       uniq: list[str], cand: np.ndarray,
                       slop: int) -> np.ndarray:
        """Positional predicate for a candidate-doc batch -> bool mask
        over ``cand`` (ascending docmeta positions, each present in
        every phrase term's run).  Composite occurrence keys
        ``doc_slot << 32 | token_position`` are gathered ONLY for the
        batch (variable-slice gather out of the cached position
        streams); slop=0 tests ``key + i`` membership per phrase token,
        slop>0 runs the greedy earliest-successor advance with the gap
        budget applied once at the end."""
        keyruns: dict[str, np.ndarray] = {}
        for t in uniq:
            pos, tfs, blob, offs, eidx = runs[t]
            e = np.searchsorted(pos, cand)
            counts = tfs[e].astype(np.int64)
            oe = e if eidx is None else eidx[e]
            # gather ONLY the candidate entries' byte slices out of the
            # raw varbyte stream, then decode just those values
            bb = gather_slices(blob, offs[oe],
                               offs[oe + 1] - offs[oe],
                               np.arange(oe.size))
            occ = decode_positions(bb, counts)
            keyruns[t] = ((cand.astype(np.int64) << np.int64(32))
                          .repeat(counts) | occ.astype(np.int64))

        def _member(sorted_arr: np.ndarray, vals: np.ndarray) -> np.ndarray:
            j = np.searchsorted(sorted_arr, vals)
            ok = j < sorted_arr.size
            ok[ok] &= sorted_arr[j[ok]] == vals[ok]
            return ok

        starts = keyruns[toks[0]]
        empty = np.zeros(cand.size, dtype=bool)
        if slop == 0:
            for i, t in enumerate(toks[1:], start=1):
                if starts.size == 0:
                    return empty
                starts = starts[_member(keyruns[t],
                                        starts + np.int64(i))]
        else:
            # greedy: advance each start's cursor to the earliest
            # same-doc successor in the next term's run; the total-gap
            # budget is checked once at the end (it depends only on
            # the first and last positions)
            cur = starts
            for t in toks[1:]:
                if starts.size == 0:
                    return empty
                kt = keyruns[t]
                if kt.size == 0:
                    return empty
                j = np.searchsorted(kt, cur + np.int64(1))
                ok = j < kt.size
                nxt = kt[np.minimum(j, max(kt.size - 1, 0))]
                ok &= (nxt >> np.int64(32)) == (cur >> np.int64(32))
                starts, cur = starts[ok], nxt[ok]
            n = np.int64(len(toks))
            ok = ((cur & np.int64(0xFFFFFFFF))
                  - (starts & np.int64(0xFFFFFFFF))
                  - (n - 1)) <= np.int64(slop)
            starts = starts[ok]
        if starts.size == 0:
            return empty
        matched = np.unique(starts >> np.int64(32))
        mask = np.zeros(cand.size, dtype=bool)
        mask[np.searchsorted(cand, matched)] = True
        return mask

    def _search_all(self, entries, k: int, mask: np.ndarray | None = None):
        """Conjunctive (AND) top-k: decode rarest term first and
        intersect the docID-sorted position runs progressively (each
        run is sorted-unique, so ``np.intersect1d(assume_unique=True)``
        is a linear merge bounded by the RAREST term's df — the
        candidate set only shrinks, with an early exit on empty).
        Per-term scores for the survivors are gathered by searchsorted
        into each term's own run, then summed in ascending-df order.
        ``mask`` (doc-values filter) is applied to the rarest run before
        the merge, so it only ever shrinks the candidate set.

        The sum order sorts by the OVERRIDDEN df when global-stats
        overrides are active (doc-sharded serving): every shard then
        adds per-doc scores in the same global-df order as one global
        index would, keeping merged conjunctive results bit-identical.
        Without overrides the key is the local df — unchanged."""
        entries = sorted(
            entries,
            key=lambda e: self._df_overrides.get(e[0], e[1]))  # df asc
        decoded = []
        inter = None
        for term, df, idf, pbytes, skips in entries:
            pos, s = self._decode_term(term, df, pbytes, skips, idf)
            decoded.append((pos, s))
            if inter is None:
                inter = pos if mask is None else pos[mask[pos]]
            else:
                inter = np.intersect1d(inter, pos, assume_unique=True)
            if inter.size == 0:
                return []
        acc = np.zeros(inter.size, dtype=np.float64)
        for pos, s in decoded:
            acc += s[np.searchsorted(pos, inter)]
        return self._topk(self._doc_ids[inter], acc, k)

    def _search_dense(self, entries, k: int):
        """Exhaustive scoring into a dense per-position array (Lucene
        score-array shape); rank-identical with the sparse paths (same
        per-doc float addition order).  Measured: ~5 ms lower p95 on
        stopword-heavy query sets but ~2 ms higher p50 than the sparse
        block-max path at 200k docs, so it is an explicit method rather
        than an auto route (p50 is the headline metric); the dense array
        is per-shard n_docs once serving shards doc ranges."""
        acc = np.zeros(self._doc_ids.size, dtype=np.float64)
        for term, df, idf, pbytes, skips in entries:
            pos, s = self._decode_term(term, df, pbytes, skips, idf)
            acc[pos] += s  # pos unique within a term: safe fancy add
        nz = np.flatnonzero(acc)
        return self._topk(self._doc_ids[nz], acc[nz], k)

    def _term_score(self, tfs: np.ndarray, dls: np.ndarray, idf: float) -> np.ndarray:
        k1, b = self.cfg.k1, self.cfg.b
        tfs = tfs.astype(np.float64)
        return idf * tfs * (k1 + 1.0) / (tfs + k1 * (1.0 - b + b * dls / self.avgdl))

    @staticmethod
    def _topk(doc_ids: np.ndarray, scores: np.ndarray, k: int):
        if doc_ids.size == 0:
            return []
        k = min(k, doc_ids.size)
        if doc_ids.size > 4 * k + 1024:
            # prune to the candidates that can place: everything >= the
            # kth-largest score (keeps ALL ties at the threshold, so
            # the doc_id tie-break below stays exact); O(n) partition
            # instead of an O(n log n) lexsort over millions
            kth = np.partition(scores, scores.size - k)[scores.size - k]
            sel = np.flatnonzero(scores >= kth)
            doc_ids, scores = doc_ids[sel], scores[sel]
        # rank by (score desc, doc_id asc): lexsort keys last = primary
        order = np.lexsort((doc_ids, -scores))[:k]
        return [(int(doc_ids[i]), float(scores[i])) for i in order]

    def _search_daat(self, entries, k: int, mask: np.ndarray | None = None):
        """Exhaustive: decode every posting of every query term,
        accumulate into a DENSE per-position score array.  Positions are
        unique within a term (docID-sorted postings), so buffered fancy
        ``acc[pos] += s`` is exact — the earlier sparse np.unique +
        np.add.at merge cost seconds per stopword term at multi-M df
        (np.add.at is unbuffered); the dense array is O(n_docs) = 8
        bytes/doc, bounded per doc-range shard when serving sharded.
        ``mask`` (doc-values filter) drops non-matching candidates
        before the top-k cut; scores are unchanged (global stats)."""
        acc = np.zeros(self._doc_ids.size, dtype=np.float64)
        touched = np.zeros(self._doc_ids.size, dtype=bool)
        for term, df, idf, pbytes, skips in entries:
            pos, s = self._decode_term(term, df, pbytes, skips, idf)
            acc[pos] += s
            touched[pos] = True
        if mask is not None:
            touched &= mask
        nz = np.flatnonzero(touched)
        return self._topk(self._doc_ids[nz], acc[nz], k)

    # selective-filter routing: when the filter keeps at most this
    # fraction of docs, score only the posting BLOCKS containing a
    # candidate instead of full daat (exhaustive decode + full-width
    # accumulate).  Public knob; tests pin both routes bit-identical.
    filtered_dense_cutoff = 0.25

    def _search_filtered(self, entries, k: int, mask: np.ndarray):
        """Filtered top-k over a candidate mask with PER-TERM routing:

        * term already in the decoded-score cache -> gather + mask (one
          vectorized index, no decode);
        * uncached term whose candidate block window is much smaller
          than its df -> decode ONLY the blocks containing a candidate
          (binary search of candidate ids against the skip table's
          last_doc column — the bmw phase-B machinery applied to
          filter candidates instead of score survivors);
        * otherwise -> full decode through the cache (the term stays
          warm for later queries).

        Accumulation is a dense array over the CANDIDATES (O(matches)
        per term), in the same term order and with the same unique-
        position buffered adds as `_search_daat`, so sums, scores and
        tie-breaks are BIT-identical to daat-with-mask (pytest pins
        this on random clause compositions at both cutoff extremes).
        The win case is the selective filter on a large tier — a
        per-tenant `where` at 10^-3 density decodes a few blocks per
        stopword instead of the term's whole multi-MB run."""
        if self._del_mask is not None:
            # daat never touches deleted docs (dropped at decode); make
            # them non-candidates so the block branch agrees
            mask = mask & ~self._del_mask
        cand_pos = np.flatnonzero(mask)
        if cand_pos.size == 0:
            return []
        cand_ids = self._doc_ids[cand_pos]      # sorted (slice of sorted)
        acc = np.zeros(cand_pos.size, dtype=np.float64)
        touched = np.zeros(cand_pos.size, dtype=bool)
        for term, df, idf, pbytes, skips in entries:
            hit = self._postings_cache.get(term)
            use_blocks = (hit is None
                          and min(cand_pos.size, skips.shape[0])
                          * self.cfg.block_size * 4 < df)
            if use_blocks:
                last = skips[:, 0]
                bi = np.unique(np.searchsorted(last, cand_ids,
                                               side="left"))
                bi = bi[bi < last.size]
                if bi.size == 0:
                    continue
                parts = [decode_block(pbytes, skips, int(b), df,
                                      self.cfg.block_size) for b in bi]
                ids = np.concatenate([p[0] for p in parts]).astype(np.int64)
                tfs = np.concatenate([p[1] for p in parts])
                p = np.searchsorted(cand_ids, ids)
                ok = p < cand_ids.size
                ok[ok] &= cand_ids[p[ok]] == ids[ok]
                if not ok.any():
                    continue
                cpos = p[ok]
                s = self._term_score(tfs[ok],
                                     self._doclens[cand_pos[cpos]], idf)
            else:
                pos, s_all = (hit if hit is not None else
                              self._decode_term(term, df, pbytes, skips,
                                                idf))
                if hit is not None:             # LRU touch
                    self._postings_cache.pop(term)
                    self._postings_cache[term] = hit
                keep = mask[pos]
                if not keep.any():
                    continue
                # positions of this term's masked postings within the
                # candidate list (every kept pos is a candidate slot)
                cpos = np.searchsorted(cand_pos, pos[keep])
                s = s_all[keep]
            acc[cpos] += s          # unique per term: buffered, exact
            touched[cpos] = True
        nz = np.flatnonzero(touched)
        return self._topk(cand_ids[nz], acc[nz], k)

    def _decode_term(self, term: str, df: int, pbytes: bytes,
                     skips: np.ndarray, idf: float | None = None):
        """Full decode + per-posting BM25 scores -> (pos, scores),
        where ``pos`` indexes into the loader's sorted ``_doc_ids``
        (``self._doc_ids[pos]`` reconstructs the docID run).  Cached in
        a byte-budget LRU (production engines cache decoded stopword
        lists; scores are a pure function of (tf, doclen, df) so they
        cache too)."""
        hit = self._postings_cache.get(term)
        if hit is not None:
            # LRU touch: dicts iterate in insertion order, so re-insert
            self._postings_cache.pop(term)
            self._postings_cache[term] = hit
            return hit
        ids, tfs = decode_postings(pbytes, skips.tobytes(), df,
                                   self.cfg.block_size)
        ids = ids.astype(np.int64)
        if self.doc_range is not None:
            # a doc-range loader holds only its range's docmeta slice:
            # out-of-range posting ids would searchsorted to WRONG slots
            # (scores attributed to other docs) or index past the end.
            # Filter to the range first — same [lo, hi) semantics as
            # score_term_range, so public search/facet on a restricted
            # loader returns exactly its range's hits.
            lo, hi = self.doc_range
            hi_in = min(hi, (1 << 63)) - 1  # inclusive upper (int64-safe)
            in_range = (ids >= lo) & (ids <= hi_in)
            if not in_range.all():
                ids, tfs = ids[in_range], tfs[in_range]
        pos = np.searchsorted(self._doc_ids, ids)
        if self._del_mask is not None:
            keep = ~self._del_mask[pos]
            if not keep.all():
                pos, tfs = pos[keep], tfs[keep]
        scores = self._term_score(tfs, self._doclens[pos],
                                  self.idf(df) if idf is None else idf)
        # cache the SLIM form: (position, score) is all scoring needs
        # (ids reconstruct as self._doc_ids[pos]); int32 positions
        # whenever the per-loader doc count allows -> 12 bytes/posting
        # vs 32 for (ids, tfs, scores, pos), ~2.7x more hot terms in
        # the same byte budget
        if self._doc_ids.size < (1 << 31):
            pos = pos.astype(np.int32)
        out = (pos, scores)
        size = pos.nbytes + scores.nbytes
        if size <= self.cache_budget_bytes:
            while (self._cache_bytes + size > self.cache_budget_bytes
                   and self._postings_cache):
                oldest = next(iter(self._postings_cache))
                evicted = self._postings_cache.pop(oldest)
                self._cache_bytes -= sum(a.nbytes for a in evicted)
            self._postings_cache[term] = out
            self._cache_bytes += size
        return out

    def score_term_range(self, term: str):
        """-> (doc_ids, bm25 scores) restricted to this loader's
        ``doc_range`` (full postings when no range is set), decoding
        ONLY the posting blocks whose docID window intersects the range
        — postings are docID-sorted, so a range is a contiguous block
        window found by binary search on the skip table's last_doc
        column.  Concatenating every range's output in ascending-range
        order reproduces the full decode bit-for-bit (same ids order,
        same per-element score arithmetic), which is what keeps the
        doc-range-sharded scatter-gather identical to local daat."""
        ent = self.lookup(term)
        if ent is None:
            return None
        df, pbytes, skips = ent
        idf = self.idf(self._df_overrides.get(term, df))
        if self.doc_range is None:
            pos, s = self._decode_term(term, df, pbytes, skips, idf)
            return self._doc_ids[pos], s
        lo, hi = self.doc_range
        hi_in = min(hi, (1 << 63)) - 1      # inclusive upper (int64-safe)
        hit = self._postings_cache.get(term)
        if hit is not None:
            self._postings_cache.pop(term)
            self._postings_cache[term] = hit
            rpos, rs = hit
            return self._doc_ids[rpos], rs
        last = skips[:, 0]
        if last.size == 0:
            return None
        b0 = int(np.searchsorted(last, lo, side="left"))
        b1 = int(np.searchsorted(last, hi_in, side="left"))
        b1 = min(b1, last.size - 1)
        if b0 > b1:
            return None
        parts = [decode_block(pbytes, skips, bi, df, self.cfg.block_size)
                 for bi in range(b0, b1 + 1)]
        ids = np.concatenate([p[0] for p in parts]).astype(np.int64)
        tfs = np.concatenate([p[1] for p in parts])
        keep = (ids >= lo) & (ids <= hi_in)
        ids, tfs = ids[keep], tfs[keep]
        if ids.size == 0:
            return None
        pos = np.searchsorted(self._doc_ids, ids)
        if self._del_mask is not None:
            live = ~self._del_mask[pos]
            if not live.all():
                pos, ids, tfs = pos[live], ids[live], tfs[live]
                if ids.size == 0:
                    return None
        scores = self._term_score(tfs, self._doclens[pos], idf)
        if self._doc_ids.size < (1 << 31):
            pos = pos.astype(np.int32)
        out = (pos, scores)
        size = pos.nbytes + scores.nbytes
        if size <= self.cache_budget_bytes:
            while (self._cache_bytes + size > self.cache_budget_bytes
                   and self._postings_cache):
                oldest = next(iter(self._postings_cache))
                evicted = self._postings_cache.pop(oldest)
                self._cache_bytes -= sum(a.nbytes for a in evicted)
            self._postings_cache[term] = out
            self._cache_bytes += size
        return ids, scores

    def _search_bmw(self, entries, k: int, mask: np.ndarray | None = None):
        """Block-max top-k: two-phase MaxScore (Turtle & Flood 1995 /
        PISA shape) driven by the per-block (max_tf, min_doclen) skip
        bounds — exact scores, rank-identical with ``daat`` and the
        brute-force oracle, fully vectorized.

        Phase A (essential terms, descending upper bound): decode +
        score exhaustively, maintaining the running kth-best partial
        score θ (a valid lower bound of the true kth-best).  Once the
        remaining terms' summed upper bounds fall strictly below θ, no
        unseen doc can enter the top-k — the remaining terms are
        non-essential.

        Phase B (non-essential terms): existing candidates still need
        their exact contributions, but only blocks that CONTAIN a
        candidate are decoded (binary search of candidate ids against
        the skip table's last_doc boundaries); candidates whose partial
        score + remaining upper bounds fall strictly below θ are dropped
        before each term, shrinking stopword-list decode to a few
        blocks.  Strict inequalities keep doc_id-asc tie-breaks exact.

        ``mask`` (dense doc-values filter route): non-candidates are
        dropped from every term's postings right after decode, so θ is
        the kth-best over FILTER CANDIDATES and phase B never touches a
        non-candidate.  A block's unfiltered upper bound bounds every
        doc in the block, hence also its masked subset — pruning
        decisions stay exact for any mask.  Ranks match
        ``_search_daat(entries, k, mask)`` exactly; per-doc sums agree
        to float addition order (UB-descending here vs query order
        there), the same contract as the unfiltered bmw/daat pair.
        """
        k1, b = self.cfg.k1, self.cfg.b
        terms = []
        for term, df, idf, pbytes, skips in entries:
            max_tf = skips[:, 2].astype(np.float64)
            min_dl = skips[:, 3].astype(np.float64)
            block_ub = idf * max_tf * (k1 + 1.0) / (
                max_tf + k1 * (1.0 - b + b * min_dl / self.avgdl))
            ub = float(block_ub.max()) if block_ub.size else 0.0
            terms.append((ub, term, df, idf, pbytes, skips, block_ub))
        terms.sort(key=lambda t: (-t[0], t[1]))
        ubs = np.array([t[0] for t in terms])
        # suffix_ub[i] = sum of ubs of terms[i:]
        suffix_ub = np.concatenate([np.cumsum(ubs[::-1])[::-1], [0.0]])
        # prefix_ub[i] = sum of ubs of terms[:i] — an upper bound on any
        # partial score after i terms, hence on θ itself.  While
        # prefix_ub[i+1] <= suffix_ub[i+1], the phase-A break can
        # provably never fire at the next step, so θ maintenance (an
        # O(n_docs) gather + partition per term — the dominant warm cost
        # on stopword-heavy queries whose near-equal bounds never let
        # phase A break) is skipped; θ stays a valid (smaller) lower
        # bound, pruning only ever weakens, results are unchanged.  The
        # final iteration always refreshes θ (prefix=total > suffix=0),
        # so phase B starts from a fresh bound.
        prefix_ub = np.concatenate([[0.0], np.cumsum(ubs)])

        # Phase A accumulates into a DENSE per-position array: postings
        # are docID-sorted so positions are unique within a term and
        # buffered fancy ``acc[pos] += s`` is exact.  The earlier
        # sparse np.unique + np.add.at merge re-sorted ~n_docs-sized
        # candidate arrays per term — seconds per stopword term at
        # multi-M df (all-stopword queries keep every term essential,
        # their near-equal upper bounds never fall below θ).
        acc = np.zeros(self._doc_ids.size, dtype=np.float64)
        touched = np.zeros(self._doc_ids.size, dtype=bool)
        n_touched = 0
        theta = -np.inf
        n_ess = len(terms)
        for i, (ub, term, df, idf, pbytes, skips, block_ub) in enumerate(terms):
            if suffix_ub[i] < theta:
                n_ess = i
                break
            pos, s = self._decode_term(term, df, pbytes, skips, idf)
            if mask is not None:
                keep = mask[pos]
                pos, s = pos[keep], s[keep]
            acc[pos] += s
            touched[pos] = True
            if prefix_ub[i + 1] > suffix_ub[i + 1]:
                n_touched = int(np.count_nonzero(touched))
                if n_touched >= k:
                    part = acc[touched]
                    theta = float(np.partition(part, -k)[-k])
        nz = np.flatnonzero(touched)
        cand_pos = nz                               # positions (sorted)
        cand_ids = self._doc_ids[nz]                # sorted unique
        cand_scores = acc[nz]

        for j, (ub, term, df, idf, pbytes, skips, block_ub) in enumerate(
                terms[n_ess:], start=n_ess):
            # drop candidates that can no longer reach θ (strict);
            # suffix_ub[j] = this term + all remaining ones
            keep = cand_scores + suffix_ub[j] >= theta
            cand_pos, cand_ids, cand_scores = (cand_pos[keep],
                                               cand_ids[keep],
                                               cand_scores[keep])
            if cand_ids.size == 0:
                break
            # blocks whose docID range contains a candidate
            need = np.unique(np.searchsorted(skips[:, 0], cand_ids))
            need = need[need < skips.shape[0]]
            if need.size == 0:
                continue
            if need.size * 4 >= skips.shape[0]:
                # candidates touch most blocks: one vectorized full
                # decode (cached, pre-scored) beats per-block access.
                # Membership via a position->candidate-slot map — two
                # O(n)/O(df) gathers instead of an O(df log c)
                # searchsorted over a multi-M posting run.  The decoded
                # run is docID-ascending, so the buffered adds land in
                # the same per-candidate order as the searchsorted form.
                dpos, s_all = self._decode_term(term, df, pbytes,
                                                skips, idf)
                slot = np.full(self._doc_ids.size, -1, np.int32)
                slot[cand_pos] = np.arange(cand_pos.size, dtype=np.int32)
                sl = slot[dpos]
                hitmask = sl >= 0
                if hitmask.any():
                    # dpos unique within a term -> slots unique:
                    # buffered fancy add is exact
                    cand_scores[sl[hitmask]] += s_all[hitmask]
            else:
                blk_parts = [decode_block(pbytes, skips, int(bi), df,
                                          self.cfg.block_size) for bi in need]
                ids = np.concatenate([p[0] for p in blk_parts]).astype(np.int64)
                tfs = np.concatenate([p[1] for p in blk_parts])
                pos = np.searchsorted(cand_ids, ids)
                pos[pos >= cand_ids.size] = cand_ids.size - 1
                hitmask = cand_ids[pos] == ids
                if hitmask.any():
                    s = self._term_score(tfs[hitmask],
                                         self._doclen_of(ids[hitmask]), idf)
                    # ids unique within a term -> hit positions unique:
                    # buffered fancy add is exact (and fast, unlike add.at)
                    cand_scores[pos[hitmask]] += s
            if cand_scores.size >= k:
                theta = float(np.partition(cand_scores, -k)[-k])
        return self._topk(cand_ids, cand_scores, k)


# --------------------------------------------------------------------------
# brute-force oracle (tests): BM25 over raw token counts, no index
# --------------------------------------------------------------------------

def bm25_oracle(texts: list[str], doc_ids: list[int], queries: list[str],
                cfg: EngineConfig = EngineConfig(), k: int = 10):
    """Independent in-memory BM25 (FIXTURES.md §4): same formula, computed
    from scratch with dict counting — no engine code paths shared beyond
    the tokenizer spec."""
    from collections import Counter
    toks = [tokenize(t, cfg.cjk_unigrams) for t in texts]
    tfs = [Counter(t) for t in toks]
    dls = np.array([len(t) for t in toks], dtype=np.float64)
    n = len(texts)
    avgdl = dls.mean() if n else 1.0
    df = Counter()
    for c in tfs:
        df.update(c.keys())
    out = {}
    for q in queries:
        seen = set()
        qterms = [t for t in tokenize(q, cfg.cjk_unigrams)
                  if not (t in seen or seen.add(t))]
        scores = np.zeros(n)
        for t in qterms:
            if df[t] == 0:
                continue
            idf = np.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            for i, c in enumerate(tfs):
                if t in c:
                    tf = c[t]
                    scores[i] += idf * tf * (cfg.k1 + 1) / (
                        tf + cfg.k1 * (1 - cfg.b + cfg.b * dls[i] / avgdl))
        ids = np.asarray(doc_ids, dtype=np.int64)
        nz = scores > 0
        order = np.lexsort((ids[nz], -scores[nz]))[:k]
        out[q] = [(int(ids[nz][i]), float(scores[nz][i])) for i in order]
    return out
