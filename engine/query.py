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
    (decode all postings for the query terms, np.add.at accumulate).
    The correctness oracle path.
  * ``method="bmw"`` — block-max WAND: per-block upper bounds
    score(max_tf, min_dl) prune blocks that cannot reach the running
    top-k threshold; only surviving blocks are decoded.

The loaded state (term dictionaries, docmeta arrays) is the per-worker
state the reference keeps in ``Arc<Embedder>``
(/root/reference/rust/src/lib.rs:839); serve it inside a Ray actor for
distributed query serving (one `QueryActor` per replica).
"""

from __future__ import annotations

import heapq
import os

import numpy as np
import pyarrow.parquet as pq

from engine import index_io
from engine.config import EngineConfig
from engine.postings import decode_postings, decode_skips, decode_block
from engine.tokenize import tokenize, stable_hash64


class InvertedIndex:
    """Loads the manifest + docmeta eagerly, term dictionaries lazily.

    At 10^12-doc scale docmeta/postings are sharded across serving
    actors (one part-range per actor) and postings are read via mmap;
    this single-process loader holds the same structures in memory.
    """

    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        self.manifest = index_io.load_manifest(index_dir)
        self.cfg = EngineConfig.from_dict(self.manifest["config"])
        st = self.manifest["stats"]
        self.n_docs = int(st["n_docs"])
        self.avgdl = float(st["avgdl"]) or 1.0
        dm = index_io.read_docmeta(index_dir, self.cfg)
        ids = dm.column("doc_id").to_numpy()
        order = np.argsort(ids, kind="stable")
        self._doc_ids = ids[order]                       # sorted for searchsorted
        self._doclens = dm.column("doclen").to_numpy()[order].astype(np.float64)
        self._urls = np.asarray(dm.column("url").to_pylist(), dtype=object)[order]
        self._term_cache: dict[int, dict] = {}
        self._blob_cache: dict[int, tuple[bytes, bytes]] = {}

    # -- segment access -----------------------------------------------------
    def _part_of(self, term: str) -> int:
        return int(stable_hash64(np.array([term], dtype=object))[0]
                   % np.uint64(self.cfg.num_parts))

    def _load_part(self, part: int) -> tuple[dict, bytes, bytes]:
        if part not in self._term_cache:
            d = index_io.part_dir(self.index_dir, "postings", part)
            if not os.path.isdir(d):
                self._term_cache[part] = {}
                self._blob_cache[part] = (b"", b"")
            else:
                terms, postings, skips = index_io.read_postings_part(
                    self.index_dir, part)
                tdict = {}
                cols = [terms.column(c).to_pylist()
                        for c in ("term", "df", "cf", "post_off", "post_len",
                                  "skip_off", "skip_len")]
                for t, df, cf, po, pl, so, sl in zip(*cols):
                    tdict[t] = (df, cf, po, pl, so, sl)
                self._term_cache[part] = tdict
                self._blob_cache[part] = (postings, skips)
        return self._term_cache[part], *self._blob_cache[part]

    def lookup(self, term: str):
        """term -> (df, postings bytes, skips ndarray) or None."""
        tdict, postings, skips = self._load_part(self._part_of(term))
        ent = tdict.get(term)
        if ent is None:
            return None
        df, cf, po, pl, so, sl = ent
        return df, postings[po:po + pl], decode_skips(skips[so:so + sl])

    # -- scoring ------------------------------------------------------------
    def idf(self, df: int) -> float:
        return float(np.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5)))

    def _doclen_of(self, doc_ids: np.ndarray) -> np.ndarray:
        pos = np.searchsorted(self._doc_ids, doc_ids.astype(np.int64))
        return self._doclens[pos]

    def url_of(self, doc_ids: np.ndarray) -> list[str]:
        pos = np.searchsorted(self._doc_ids, np.asarray(doc_ids, np.int64))
        return self._urls[pos].tolist()

    def query_terms(self, query: str) -> list[str]:
        # distinct terms, first-occurrence order (qtf ignored — BASELINE.md)
        seen, out = set(), []
        for t in tokenize(query, self.cfg.cjk_unigrams):
            if t not in seen:
                seen.add(t); out.append(t)
        return out

    def search(self, query: str, k: int = 10, method: str = "bmw"):
        """-> list of (doc_id, score) sorted score desc, doc_id asc."""
        if k <= 0:
            return []
        terms = self.query_terms(query)
        entries = [(t, self.lookup(t)) for t in terms]
        entries = [(t, e) for t, e in entries if e is not None]
        if not entries:
            return []
        if method == "daat":
            return self._search_daat(entries, k)
        return self._search_bmw(entries, k)

    def _term_score(self, tfs: np.ndarray, dls: np.ndarray, idf: float) -> np.ndarray:
        k1, b = self.cfg.k1, self.cfg.b
        tfs = tfs.astype(np.float64)
        return idf * tfs * (k1 + 1.0) / (tfs + k1 * (1.0 - b + b * dls / self.avgdl))

    @staticmethod
    def _topk(doc_ids: np.ndarray, scores: np.ndarray, k: int):
        if doc_ids.size == 0:
            return []
        k = min(k, doc_ids.size)
        # rank by (score desc, doc_id asc): lexsort keys last = primary
        order = np.lexsort((doc_ids, -scores))[:k]
        return [(int(doc_ids[i]), float(scores[i])) for i in order]

    def _search_daat(self, entries, k: int):
        """Exhaustive: decode every posting of every query term, then one
        vectorized accumulate.  O(total postings) but all in numpy."""
        all_ids, all_scores = [], []
        for term, (df, pbytes, skips) in entries:
            n = df
            ids, tfs = decode_postings(pbytes, skips.tobytes(), n,
                                       self.cfg.block_size)
            ids = ids.astype(np.int64)
            dls = self._doclen_of(ids)
            all_ids.append(ids)
            all_scores.append(self._term_score(tfs, dls, self.idf(df)))
        ids = np.concatenate(all_ids)
        scores = np.concatenate(all_scores)
        uniq, inv = np.unique(ids, return_inverse=True)
        acc = np.zeros(uniq.size, dtype=np.float64)
        np.add.at(acc, inv, scores)
        return self._topk(uniq, acc, k)

    def _search_bmw(self, entries, k: int):
        """Block-max WAND (Ding & Suel 2011 shape): maintain a top-k
        threshold; a block of term t is decoded only if the sum of the
        still-possible per-term block upper bounds reaches the threshold.

        Implemented block-at-a-time over the per-term skip tables: we
        compute each block's safe upper bound score(max_tf, min_dl),
        globally order candidate blocks by their docID ranges, and skip
        any block whose own bound + the other terms' remaining global
        max bound can't beat the threshold.  Safe (never drops a true
        top-k doc) because bounds are monotone upper bounds.
        """
        k1, b = self.cfg.k1, self.cfg.b
        term_data = []
        for term, (df, pbytes, skips) in entries:
            idf = self.idf(df)
            max_tf = skips[:, 2].astype(np.float64)
            min_dl = skips[:, 3].astype(np.float64)
            ub = idf * max_tf * (k1 + 1.0) / (
                max_tf + k1 * (1.0 - b + b * min_dl / self.avgdl))
            term_data.append({
                "df": df, "idf": idf, "pbytes": pbytes, "skips": skips,
                "block_ub": ub, "term_ub": float(ub.max()) if ub.size else 0.0,
            })
        # accumulate scores sparsely; prune decode at block level
        scores: dict[int, float] = {}
        heap: list[float] = []  # top-k running scores (min-heap)

        # Order terms by descending term upper bound: high-impact terms
        # first so the threshold rises quickly.
        term_data.sort(key=lambda d: -d["term_ub"])
        n_terms = len(term_data)
        # suffix max-bound: what the remaining terms could still add
        suffix_ub = np.zeros(n_terms + 1)
        for i in range(n_terms - 1, -1, -1):
            suffix_ub[i] = suffix_ub[i + 1] + term_data[i]["term_ub"]

        for ti, td in enumerate(term_data):
            skips = td["skips"]
            n_blocks = skips.shape[0]
            others = suffix_ub[ti + 1]
            threshold = heap[0] if len(heap) >= k else -np.inf
            for bi in range(n_blocks):
                # prune: this block's best + future terms + best already-
                # accumulated partial in this block's range
                if td["block_ub"][bi] + others < threshold and not scores:
                    continue
                ids, tfs = decode_block(td["pbytes"], skips, bi, td["df"],
                                        self.cfg.block_size)
                ids64 = ids.astype(np.int64)
                # if no accumulated doc falls in this block and the bound
                # can't beat the threshold, skip scoring entirely
                if td["block_ub"][bi] + others < threshold:
                    if not any(int(i) in scores for i in ids64):
                        continue
                dls = self._doclen_of(ids64)
                s = self._term_score(tfs, dls, td["idf"])
                for d, sc in zip(ids64.tolist(), s.tolist()):
                    scores[d] = scores.get(d, 0.0) + sc
                # update running threshold
                if len(scores) >= k:
                    top = heapq.nlargest(k, scores.values())
                    threshold = top[-1] if len(top) == k else -np.inf
                    heap = top[::-1]
        if not scores:
            return []
        ids = np.fromiter(scores.keys(), dtype=np.int64, count=len(scores))
        vals = np.fromiter(scores.values(), dtype=np.float64, count=len(scores))
        return self._topk(ids, vals, k)


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
