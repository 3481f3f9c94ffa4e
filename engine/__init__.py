"""engine — a Ray-Data-native inverted-index build + BM25 query engine.

A from-scratch rebuild of the data-processing capabilities of
StarlightSearch/EmbedAnything (reference at /root/reference, read-only),
re-expressed Ray-Data-first: ``ray.data.Dataset`` pipelines of
``map_batches`` over zero-copy Arrow batches, a single ``groupby(part)``
shuffle for the posting-list merge, per-partition atomic commits for
checkpoint/resume, and a pure-Python/numpy BM25 (k1=1.2, b=0.75) query
path with block-max WAND.

Module map (SURVEY.md §7.1):
  config      EngineConfig (reference: rust/src/config.rs:37-78)
  schema      pyarrow schemas for every table boundary
  tokenize    Unicode analyzer + tf counting (reference analog:
              rust/src/embeddings/utils.rs:6-33 tokenizer encode)
  extract     HTML -> text (reference: processors/src/html_processor.rs:30-42)
  fixtures    deterministic webtext generator (FIXTURES.md)
  postings    delta + varbyte codec, block-max skip metadata
  index_io    segment writer/reader, manifest, checkpoint/resume
              (reference analog: rust/src/file_loader.rs:118-126 anti-join)
  build       the build pipeline (reference: rust/src/lib.rs:815-971
              embed_directory_stream, re-expressed as Dataset stages)
  query       BM25 top-k: exhaustive DAAT + block-max WAND
  metrics     per-partition lineage + counters
  dedup       exact / MinHash-LSH / SimHash / n-gram Jaccard / end-to-end
              near-dup (verify + components + canonical map)
  similarity  brute-force + LSH-bucketed + IVF cosine top-k over embeddings
  embed       hashing + loadable-weights embedder actors, reranker, RRF
  textstats   language-ID, quality scoring, token counts, fingerprints
  filtering   Gopher repetition metrics, CCNet unigram-LM perplexity,
              benchmark n-gram decontamination, DSIR importance weights
  packing     training-sequence packing (distributed prefix scan)
  joins       temporal joins: as-of + range (bucketed co-partition)
  sampling    deterministic hash sampling (uniform + stratified mixing)
  multimodal  binary-column decode/feature plumbing (image/video stubbed,
              audio REAL via stdlib wave; md5-payload oracle twins)
  pdf, docx   pure-Python format extractors (pinned subsets) + writers
  sources     file-corpus walk + extension dispatch (pdf/docx/html/txt)
  urlfetch    HTTP GET ingest stage (reference's pinned header set)
  sink        IndexSink adapter protocol (per-partition commit sink)
  serve       query serving: replicas, term shards + front pool,
              doc shards with distributed-IDF exchange
  http_serve  /health_check + OpenAI-compatible /v1/embeddings + /v1/search
  merge       N indexes -> 1, bit-identical to a union build
  docvalues   sidecar metadata columns: attach (one narrow keyed
              shuffle, no join), carry through merge/compact, point
              hydration; powers search(where=/where_range=), facets,
              histogram facets

No module in this package calls ``ray.init`` / ``ray.shutdown``; sessions
are owned by the caller (driver, bench.py, or the pytest fixture).
"""

from engine.config import EngineConfig

__all__ = ["EngineConfig"]
__version__ = "0.1.0"
