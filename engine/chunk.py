"""Text chunking operators (reference M2/M3).

Reference semantics: ``MarkdownProcessor::process_document`` splits text
with ``text_splitter::MarkdownSplitter`` under
``ChunkConfig::new(chunk_size).with_overlap(overlap)`` and a Characters
sizer (/root/reference/processors/src/markdown_processor.rs:10-26); the
txt processor delegates to the same splitter
(/root/reference/processors/src/txt_processor.rs:17-21).  Defaults come
from ``TextEmbedConfig``: chunk_size 1000 chars, overlap 0
(/root/reference/rust/src/config.rs:64-78).

We cannot run the Rust crate, so this module pins a precise spec with the
same SHAPE (structure-aware greedy packing under a character budget) and
tests it against an independent naive oracle:

``split_markdown(text, chunk_size, overlap)``:
  * Split hierarchy (coarse -> fine): paragraphs (``\\n\\n``), lines
    (``\\n``), sentence pieces (after ``". "``), words (``" "``),
    characters.
  * Greedy packing: walk units at the coarsest level; append a unit (with
    its separator) to the current chunk while the chunk stays within
    ``chunk_size`` characters; otherwise flush.  A single unit longer
    than ``chunk_size`` is recursively split at the next finer level.
  * Every chunk is non-empty; concatenating chunks with their separators
    restores the original text when ``overlap == 0`` (lossless property,
    tested).
  * ``overlap > 0`` prefixes each chunk (except the first) with the last
    ``overlap`` characters of the previous chunk (the reference's
    ChunkConfig::with_overlap character semantics).

``split_fixed`` is the SQL-expressible variant (fixed windows with
stride ``chunk_size - overlap``) used for the DuckDB oracle parity check;
the markdown splitter is pytest-verified.

Both run as stateless ``map_batches`` UDFs that EXPLODE rows — one
output row per chunk, ``(doc_id, chunk_id, chunk, n_chars)`` — the Ray
Data shape of the reference's ``Document { chunks }``
(/root/reference/processors/src/processor.rs:58-60).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_LEVELS = ["\n\n", "\n", ". ", " "]
# the reference's ``SplittingStrategy::Sentence``
# (/root/reference/rust/src/config.rs:52-59): pack SENTENCE units,
# falling back to words/chars only for oversize sentences — same greedy
# packer, a truncated level hierarchy
_SENTENCE_LEVELS = [". ", " "]


def _split_units(text: str, sep: str) -> list[str]:
    """Split keeping the separator attached to the LEFT unit, so that
    ``"".join(units) == text``."""
    if sep == ". ":
        # split after each ". " occurrence
        parts = text.split(". ")
        if len(parts) == 1:
            return [text]
        return [p + ". " for p in parts[:-1]] + [parts[-1]]
    parts = text.split(sep)
    if len(parts) == 1:
        return [text]
    return [p + sep for p in parts[:-1]] + [parts[-1]]


def _pack(text: str, chunk_size: int, level: int = 0,
          levels: list[str] = _LEVELS) -> list[str]:
    """Greedy packing at ``levels[level]``; oversize units recurse."""
    if len(text) <= chunk_size:
        return [text] if text else []
    if level >= len(levels):
        # character fallback: hard slices
        return [text[i:i + chunk_size] for i in range(0, len(text), chunk_size)]
    units = _split_units(text, levels[level])
    if len(units) == 1:
        return _pack(text, chunk_size, level + 1, levels)
    out: list[str] = []
    cur = ""
    for u in units:
        if len(cur) + len(u) <= chunk_size:
            cur += u
        else:
            if cur:
                out.append(cur)
            if len(u) <= chunk_size:
                cur = u
            else:
                pieces = _pack(u, chunk_size, level + 1, levels)
                out.extend(pieces[:-1])
                cur = pieces[-1] if pieces else ""
    if cur:
        out.append(cur)
    return out


def split_markdown(text: str, chunk_size: int = 1000,
                   overlap: int = 0) -> list[str]:
    """Structure-aware greedy chunker (pinned spec above)."""
    if chunk_size <= 0:
        raise ValueError("chunk_size must be positive")
    if overlap >= chunk_size:
        raise ValueError("overlap must be smaller than chunk_size")
    chunks = _pack(text, chunk_size)
    if overlap > 0 and len(chunks) > 1:
        out = [chunks[0]]
        for prev, cur in zip(chunks, chunks[1:]):
            out.append(prev[-overlap:] + cur)
        return out
    return chunks


def split_sentence(text: str, chunk_size: int = 1000,
                   overlap: int = 0) -> list[str]:
    """Sentence splitting strategy (reference config.rs:52-59
    ``SplittingStrategy::Sentence``): greedy-pack sentence units to the
    character budget; only an oversize single sentence falls back to
    word/char splits.  Same lossless/overlap semantics as
    ``split_markdown``."""
    if chunk_size <= 0:
        raise ValueError("chunk_size must be positive")
    if overlap >= chunk_size:
        raise ValueError("overlap must be smaller than chunk_size")
    chunks = _pack(text, chunk_size, levels=_SENTENCE_LEVELS)
    if overlap > 0 and len(chunks) > 1:
        out = [chunks[0]]
        for prev, cur in zip(chunks, chunks[1:]):
            out.append(prev[-overlap:] + cur)
        return out
    return chunks


SPLITTERS = {"markdown": split_markdown, "sentence": split_sentence}


def sentence_sql_guard(chunk_size: int = 1000, forbid: tuple = (". ",)):
    """map_batches pre-filter keeping exactly the docs whose chunking
    is reproducible by the DuckDB recursive-CTE oracle: none of the
    coarser ``forbid`` separators present (so the packer runs at the
    word level) and every word unit within the budget (so the
    char-fallback never fires).  The greedy walk over word units is
    then a pure boundary-jump process the oracle replays with a
    recursive CTE; docs outside the guard (coarser-level packing,
    oversize units) stay covered by the pytest lossless/budget
    properties instead.  For the markdown hierarchy pass
    ``forbid=(". ", "\\n")`` — with no newline and no ". " the whole
    paragraphs->lines->sentences cascade collapses to the same word
    walk."""
    def f(batch: pa.Table) -> pa.Table:
        keep = []
        for t in batch.column("text").to_pylist():
            if not t or any(s in t for s in forbid):
                keep.append(False)
                continue
            parts = t.split(" ")
            keep.append(all(len(p) + 1 <= chunk_size
                            for p in parts[:-1])
                        and len(parts[-1]) <= chunk_size)
        return batch.filter(pa.array(keep))
    return f


def split_fixed(text: str, chunk_size: int = 1000,
                overlap: int = 0) -> list[str]:
    """Fixed character windows, stride = chunk_size - overlap.  The
    SQL-expressible variant (DuckDB: substr + generate_series)."""
    if chunk_size <= 0:
        raise ValueError("chunk_size must be positive")
    stride = chunk_size - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_size")
    if not text:
        return []
    return [text[i:i + chunk_size] for i in range(0, len(text), stride)
            if text[i:i + chunk_size]]


def make_chunk_batch(chunk_size: int = 1000, overlap: int = 0,
                     mode: str = "markdown", id_col: str = "doc_id",
                     text_col: str = "text"):
    """map_batches UDF factory: explode docs into chunk rows."""
    split = SPLITTERS.get(mode, split_fixed)

    def chunk_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        texts = batch.column(text_col).to_pylist()
        out_id, out_cid, out_chunk = [], [], []
        for did, t in zip(ids, texts):
            cs = split(t, chunk_size, overlap)
            out_id.extend([int(did)] * len(cs))
            out_cid.extend(range(len(cs)))
            out_chunk.extend(cs)
        lens = np.fromiter((len(c) for c in out_chunk), dtype=np.int64,
                           count=len(out_chunk))
        return pa.table({
            id_col: pa.array(out_id, pa.int64()),
            "chunk_id": pa.array(out_cid, pa.int64()),
            "chunk": pa.array(out_chunk, pa.large_string()),
            "n_chars": pa.array(lens),
        })

    return chunk_batch


def chunk_documents(docs, chunk_size: int = 1000, overlap: int = 0,
                    mode: str = "markdown", id_col: str = "doc_id",
                    text_col: str = "text"):
    """Dataset -> exploded chunk Dataset (one row per chunk)."""
    return docs.map_batches(
        make_chunk_batch(chunk_size, overlap, mode, id_col, text_col),
        batch_format="pyarrow")


def chunk_by_config(docs, cfg, id_col: str = "doc_id",
                    text_col: str = "text"):
    """Config-routed chunking — the reference's ``splitting_strategy``
    switch (/root/reference/rust/src/config.rs:52-59) over the engine's
    chunkers: sentence/markdown/fixed are stateless exploding
    map_batches UDFs; "semantic" routes to the encoder actor pool."""
    s = cfg.splitting_strategy
    if s == "semantic":
        from engine.semantic_chunk import semantic_chunk_documents
        return semantic_chunk_documents(docs, id_col=id_col,
                                        text_col=text_col)
    if s not in ("sentence", "markdown", "fixed"):
        raise ValueError(f"unknown splitting_strategy {s!r}")
    return chunk_documents(docs, cfg.chunk_size, cfg.chunk_overlap,
                           mode=s, id_col=id_col, text_col=text_col)
