"""pyarrow schemas for every table boundary in the engine.

A deliberate upgrade over the reference's stringly-typed metadata map
(/root/reference/rust/src/embeddings/embed/types.rs:43-48): every stage
boundary has a fixed, explicit Arrow schema (SURVEY.md §1.2).
"""

from __future__ import annotations

import pyarrow as pa

# BASELINE.json input_hint: the Common-Crawl-style webtext table
WEBTEXT = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),      # ground-truth extraction (fixtures only)
    ("lang", pa.string()),
])

# after dedup + extract + doc_id assignment
DOCS = pa.schema([
    ("doc_id", pa.int64()),     # hash64(url) & INT64_MAX, deterministic
    ("url", pa.string()),
    ("text", pa.large_string()),
])

# tokenize output: the shuffle payload.  Two row kinds share the schema
# (union-free single-shuffle design, SURVEY.md §3.1 translation):
#   postings partial rows: part in [0, num_parts), term set,
#       doc_ids/tfs/doclens = per-batch partial posting lists
#   docmeta rows: part in [num_parts, num_parts+docmeta_parts),
#       term NULL, lists are length-1 (doc_id, doclen), url set
SHUFFLE = pa.schema([
    ("part", pa.int32()),
    ("term", pa.large_string()),
    ("doc_ids", pa.large_list(pa.int64())),
    ("tfs", pa.large_list(pa.int32())),
    ("doclens", pa.large_list(pa.int32())),
    ("url", pa.large_string()),
])

# positional variant (EngineConfig.store_positions): postings partial
# rows additionally carry the flat token positions of every occurrence,
# doc-major (per-doc counts == tfs, so no nested offsets are needed)
SHUFFLE_POS = SHUFFLE.append(
    pa.field("positions", pa.large_list(pa.int32())))


def shuffle_schema(store_positions: bool) -> pa.Schema:
    return SHUFFLE_POS if store_positions else SHUFFLE

# per-part term dictionary (segment side table)
TERMS = pa.schema([
    ("term", pa.large_string()),
    ("df", pa.int64()),          # document frequency
    ("cf", pa.int64()),          # collection frequency (sum tf)
    ("post_off", pa.int64()),    # byte offset into postings.bin
    ("post_len", pa.int64()),
    ("skip_off", pa.int64()),    # byte offset into skips.bin
    ("skip_len", pa.int64()),
])

DOCMETA = pa.schema([
    ("doc_id", pa.int64()),
    ("url", pa.large_string()),
    ("doclen", pa.int32()),
])
