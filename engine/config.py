"""Engine configuration.

Reference analog: ``TextEmbedConfig`` builder defaults
(/root/reference/rust/src/config.rs:64-78 — chunk_size 1000, batch_size 32,
buffer_size 100).  Ours governs the Ray Data pipeline instead: BM25
parameters, partition counts for the single build shuffle, codec block
size, and per-stage batch sizing.  A plain frozen dataclass so it pickles
cheaply into every Ray task closure.
"""

from __future__ import annotations

from dataclasses import dataclass, field, asdict


@dataclass(frozen=True)
class EngineConfig:
    # --- BM25 scoring (BASELINE.json north_star: k1=1.2, b=0.75) ---
    k1: float = 1.2
    b: float = 0.75

    # --- index layout ---
    # Number of term partitions (segments).  Part assignment is
    # hash64(term) % num_parts — fixed by config, NOT by input blocking,
    # so segment bytes are identical at any parallelism (FIXTURES.md §5).
    # At 10^12-doc scale this is thousands; tests use small values.
    # SIZING RULE (measured, BASELINE.md round 3): the post-shuffle
    # writer tail is bounded by the LARGEST part's single merge+encode,
    # and term skew makes parts uneven (15x byte spread on the bench
    # fixture) — size num_parts so the largest part stays ~<=50 MB and
    # parts >= 4x total CPUs; 64 -> 128 parts at 1.6M docs cut build
    # wall ~20%, 256 added nothing.
    num_parts: int = 16
    # Number of docmeta partitions (doc_id -> url, doclen), keyed by
    # hash(doc_id) % docmeta_parts and carried through the SAME shuffle
    # as the postings (part ids num_parts..num_parts+docmeta_parts-1).
    docmeta_parts: int = 4
    # Posting-list block size for delta+varbyte blocks and block-max
    # skip metadata (block-max WAND granularity).
    block_size: int = 128
    # term -> part routing hash: "sip" (production; pandas SipHash,
    # vectorized) or "md5" (oracle-parity mode: equals DuckDB
    # md5_number_lower, so per-part lineage metrics are SQL-checkable).
    # Stored in the manifest; the query loader routes with the same fn.
    term_hash: str = "sip"

    # Partitions for the small dedup-key groupby (url, warc_ts only).
    dedup_partitions: int = 32
    # Dedup execution strategy:
    #   "broadcast" — loser set collected to the driver, broadcast into
    #                 a vectorized filter (html never shuffles; needs
    #                 the dup-key dict to fit driver memory)
    #   "join"      — fully distributed: winners = groupby(url).min(ts)
    #                 dataset, then a left_semi hash join on
    #                 (url, warc_ts) (no driver state; shuffles rows)
    #   "auto"      — broadcast below ~2M keys, join above
    dedup_strategy: str = "auto"

    # --- build-stage knobs ---
    # Rows per map_batches batch in the extract/tokenize stages.  html
    # payloads can be MBs, so this is a row cap; Ray's block sizing
    # (DataContext.target_max_block_size) caps bytes.
    extract_batch_size: int = 256
    # Larger tokenize batches shrink the shuffle payload (one partial
    # row per distinct term per batch — vocab saturates); measured on
    # the 200k bench fixture: 2048 beats 1024 by ~11% build wall
    # (interleaved best-of-3) and 4096 regresses (worse pipelining).
    # ~8 MB text per batch; wide-record outliers stay bounded by Ray
    # block sizing.  Batching never changes segment BYTES (the merge
    # collapses partials; merge-equivalence is test-asserted).
    tokenize_batch_size: int = 2048
    # Dedup policy for duplicate urls: keep the row with the earliest
    # warc_ts (FIXTURES.md §1, explicit stable rule).
    dedup_keep: str = "earliest"

    # --- positional postings (phrase queries) ---
    # True: the build also records every term OCCURRENCE position
    # (token index within the document) — per posting, tf positions
    # delta+varbyte encoded in a third segment blob (positions.bin),
    # enabling exact phrase search (InvertedIndex.search_phrase).
    # Additive: False-mode segments are bit-identical to pre-positions
    # builds (no format version bump); positional indexes carry two
    # extra term-dictionary columns (pos_off/pos_len) and the blob.
    # Cost: the shuffle ships ~1 int32 per token instead of ~1 per
    # distinct (doc, term), and the index grows by roughly the token
    # count x ~1.1 bytes — the classic positional-index trade
    # (Lucene's freqs-vs-positions distinction).
    store_positions: bool = False

    # --- doc-id width ---
    # False: doc_id = hash64(url) & 2^63-1; a collision between two
    # DISTINCT urls aborts the build loudly (expected ~2.7% chance of
    # >=1 collision somewhere at 10^12 docs).  True: the build runs a
    # collision-resolution pre-pass — detect ids shared by >=2 distinct
    # urls with a (doc_id -> min/max url) aggregate (the 128-bit
    # identity (h1, h2) exists only to DETECT; at 10^12 docs the
    # expected collision count is ~54 pairs), then deterministically
    # re-id all but the lexicographically-smallest url of each group
    # via salted rehash, broadcast as a tiny {url: new_id} dict into
    # the tokenize stage.  This keeps the posting format at int64
    # (a true 128-bit posting id would double posting bytes corpus-wide
    # to serve ~100 documents); the docmeta fail-loud check remains the
    # backstop for the ~1e-5 residual probability.
    wide_doc_ids: bool = False

    # --- chunking (reference TextEmbedConfig parity,
    # /root/reference/rust/src/config.rs:52-59: ``splitting_strategy:
    # Sentence`` and ``late_chunking``) ---
    # "sentence" packs sentence units, "markdown" packs the structural
    # hierarchy, "fixed" is fixed char windows, "semantic" routes to the
    # encoder-driven statistical chunker (engine/semantic_chunk.py).
    splitting_strategy: str = "sentence"
    chunk_size: int = 1000
    chunk_overlap: int = 0
    # late_chunking=True embeds the WHOLE document's token sequence once
    # and mean-pools each chunk's span from prefix sums (Jina late
    # chunking shape) instead of embedding each chunk separately.
    late_chunking: bool = False

    # --- tokenizer ---
    # Lowercase + Unicode letter/digit runs, CJK chars as unigrams
    # (FIXTURES.md §3).  cjk_unigrams=False gives the SQL-parity simple
    # mode used by the DuckDB oracles (testdata is ASCII so both modes
    # agree there).
    cjk_unigrams: bool = True

    @staticmethod
    def suggest_layout(n_docs: int, n_cpus: int = 32,
                       avg_doc_tokens: int = 220) -> "EngineConfig":
        """Executable form of the num_parts sizing rule (measured,
        BASELINE.md round 3): size term partitions so the LARGEST
        part's merge+encode stays short — postings bytes / parts
        ~<= 50 MB with ~4x headroom for term skew — and never below
        4x the CPU count (so the writer tail packs the session).
        docmeta parts follow at ~1/4 the term parts.

        Postings bytes estimate: ~2.5 encoded bytes per token.

        The size-driven count is CAPPED at 8x the session CPUs:
        Ray's hash-shuffle aggregator pool plus the join-dedup stage
        reserve CPU proportional to the partition count, and an
        oversubscribed pool STALLS a small session outright (reproduced
        at 1280 partitions on 32 cpus — join tasks held 16 CPUs while
        the aggregator pool held 8 and neither could finish).  On a
        real cluster n_cpus is the fleet total, so the byte rule
        dominates and partitions reach the thousands the 10^12-doc
        layout needs; on one node the cap trades a longer writer tail
        for a build that terminates."""
        est_bytes = n_docs * avg_doc_tokens * 2.5
        skew_headroom = 4
        by_size = int(est_bytes * skew_headroom // (50 << 20)) + 1
        parts = max(4 * n_cpus, min(by_size, 8 * n_cpus), 16)
        parts = 1 << (parts - 1).bit_length()          # round up to 2^k
        return EngineConfig(num_parts=parts,
                            docmeta_parts=max(4, parts // 4))

    def to_dict(self) -> dict:
        return asdict(self)

    @staticmethod
    def from_dict(d: dict) -> "EngineConfig":
        return EngineConfig(**d)


DEFAULT_CONFIG = EngineConfig()


def pool_size(frac: float = 0.25, lo: int = 4,
              hi: int | None = None) -> tuple[int, int]:
    """Actor-pool ``concurrency=(min, max)`` sized from the CLUSTER,
    not a constant: ``max = max(lo, total_cpus * frac)``.  A hard-coded
    ``concurrency=(1, 4)`` caps a broadcast-scoring stage at 4 actors
    on a 256-node fleet (the round-4 lm_perplexity/dsir bottleneck);
    deriving from ``ray.cluster_resources()`` lets the same code use
    the whole fleet while the 4-cpu test session keeps the old floor
    (autoscaling pools only spawn actors the backlog demands, so a
    high max costs nothing on small inputs).  Library rule: never
    initialises Ray — falls back to the ``lo`` floor when no session
    exists yet (map_batches will have one by execution time anyway)."""
    import ray
    cpus = 0.0
    if ray.is_initialized():
        cpus = float(ray.cluster_resources().get("CPU", 0.0))
    n = max(lo, int(cpus * frac))
    if hi is not None:
        n = min(n, hi)
    return (1, n)
