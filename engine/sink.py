"""User-pluggable index sink protocol (reference S8).

Reference: the ``Adapter`` ABC — create_index / delete_index / convert /
upsert — that users implement to stream embedding batches into their
vector DB (/root/reference/python/python/embed_anything/vectordb.py:9-28,
called per buffered batch via /root/reference/python/src/lib.rs:499-517;
7 worked adapters under examples/adapters/).

Our analog receives per-PARTITION index segments instead of row batches
(the unit of atomic commit + resume), so a custom sink keeps the
engine's checkpoint semantics for free:

    create_index()            once, before any part is written
    committed_parts()         resume input: {(kind, part): PartMetrics}
    write_postings_part(...)  one term partition's segment (atomic)
    write_docmeta_part(...)   one docmeta partition (atomic)
    finalize(cfg, lineage)    roll metrics into a manifest, return it

``LocalIndexSink`` is the default (the Parquet+binary layout under
``index_dir`` that the query engine reads).  A custom sink must be
picklable — it is shipped into the ``map_groups`` writer tasks.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

import pyarrow as pa

from engine import index_io
from engine.config import EngineConfig
from engine.metrics import PartMetrics


class IndexSink(ABC):
    """Adapter protocol for index output (see module docstring)."""

    @abstractmethod
    def create_index(self) -> None: ...

    @abstractmethod
    def committed_parts(self) -> dict[tuple[str, int], PartMetrics]: ...

    @abstractmethod
    def write_postings_part(self, part: int, terms: pa.Table,
                            postings_blob: bytes, skips_blob: bytes,
                            metrics: PartMetrics,
                            positions_blob: bytes | None = None) -> None: ...

    @abstractmethod
    def write_docmeta_part(self, part: int, docmeta: pa.Table,
                           metrics: PartMetrics) -> None: ...

    @abstractmethod
    def finalize(self, cfg: EngineConfig, lineage: dict) -> dict: ...


class LocalIndexSink(IndexSink):
    """Default sink: the on-disk segment layout engine.query reads."""

    def __init__(self, index_dir: str):
        self.index_dir = index_dir

    def create_index(self) -> None:
        import os
        os.makedirs(self.index_dir, exist_ok=True)

    def committed_parts(self):
        return index_io.committed_parts(self.index_dir)

    def write_postings_part(self, part, terms, postings_blob, skips_blob,
                            metrics, positions_blob=None):
        index_io.write_postings_part(self.index_dir, part, terms,
                                     postings_blob, skips_blob, metrics,
                                     positions_blob=positions_blob)

    def write_docmeta_part(self, part, docmeta, metrics):
        index_io.write_docmeta_part(self.index_dir, part, docmeta, metrics)

    def finalize(self, cfg, lineage):
        return index_io.finalize(self.index_dir, cfg, lineage)
