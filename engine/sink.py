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


class VectorAdapter(ABC):
    """The reference's row-batch adapter surface, verbatim shape:
    ``create_index / delete_index / convert / upsert``
    (/root/reference/python/python/embed_anything/vectordb.py:9-28; the
    engine calls ``upsert`` once per buffered embedding batch,
    /root/reference/python/src/lib.rs:499-517).  ``convert`` maps an
    Arrow embedding batch to the store's row dicts; ``upsert`` ships
    them.  All entry points return None (the reference contract).

    Distribution rule: adapters are constructed INSIDE the writer tasks
    (one per actor, via a picklable factory — connection setup is
    per-worker state, never driver state); see upsert_embeddings."""

    @abstractmethod
    def create_index(self, dimension: int, metric: str,
                     index_name: str, **kwargs) -> None: ...

    @abstractmethod
    def delete_index(self, index_name: str) -> None: ...

    @abstractmethod
    def convert(self, batch: pa.Table) -> list[dict]: ...

    @abstractmethod
    def upsert(self, batch: pa.Table) -> None: ...


class HttpVectorAdapter(VectorAdapter):
    """Worked adapter example: a JSON-over-HTTP vector store with the
    bulk-upsert shape of the reference's elasticsearch adapter
    (/root/reference/examples/adapters/elastic.py — create with
    dimension+metric, convert rows to {id, embedding, text, metadata},
    bulk POST).  Endpoints (a dummy loopback store in tests; any store
    speaking this shape in production):

        PUT    {base}/indexes/{name}        {"dimension": d, "metric": m}
        DELETE {base}/indexes/{name}
        POST   {base}/indexes/{name}/bulk   {"rows": [...]}

    Stdlib urllib only (sandbox-complete, the engine.urlfetch pattern);
    the api_key rides an Authorization header like hosted stores."""

    def __init__(self, base_url: str, index_name: str = "anything",
                 api_key: str = "", id_col: str = "doc_id",
                 text_col: str = "text", vec_col: str = "embedding",
                 timeout: float = 10.0):
        self.base_url = base_url.rstrip("/")
        self.index_name = index_name
        self.api_key = api_key
        self.id_col, self.text_col, self.vec_col = id_col, text_col, vec_col
        self.timeout = timeout

    def _request(self, method: str, path: str, payload: dict | None) -> None:
        import json
        import urllib.request
        body = None if payload is None else json.dumps(payload).encode()
        req = urllib.request.Request(
            self.base_url + path, data=body, method=method,
            headers={"Content-Type": "application/json",
                     "Authorization": f"Bearer {self.api_key}"})
        with urllib.request.urlopen(req, timeout=self.timeout) as r:
            r.read()
        # entry points return None (reference Adapter contract)

    def create_index(self, dimension: int, metric: str = "cosine",
                     index_name: str | None = None, **kwargs) -> None:
        if index_name is not None:
            self.index_name = index_name
        self._request("PUT", f"/indexes/{self.index_name}",
                      {"dimension": int(dimension), "metric": metric,
                       **kwargs})

    def delete_index(self, index_name: str | None = None) -> None:
        self._request("DELETE",
                      f"/indexes/{index_name or self.index_name}", None)

    def convert(self, batch: pa.Table) -> list[dict]:
        ids = batch.column(self.id_col).to_pylist()
        vecs = batch.column(self.vec_col).to_pylist()
        texts = (batch.column(self.text_col).to_pylist()
                 if self.text_col in batch.column_names
                 else [None] * len(ids))
        meta_cols = [c for c in batch.column_names
                     if c not in (self.id_col, self.text_col, self.vec_col)]
        metas = ({c: batch.column(c).to_pylist() for c in meta_cols}
                 if meta_cols else {})
        return [{"id": ids[i],
                 "embedding": [float(v) for v in vecs[i]],
                 "text": texts[i],
                 "metadata": {c: metas[c][i] for c in meta_cols}}
                for i in range(len(ids))]

    def upsert(self, batch: pa.Table) -> None:
        self._request("POST", f"/indexes/{self.index_name}/bulk",
                      {"rows": self.convert(batch)})


class ParquetVectorAdapter(VectorAdapter):
    """Worked adapter example #2: a columnar on-disk vector store with
    the table-per-index data model of the reference's lancedb adapter
    (/root/reference/examples/adapters/lancedb_adapter.py — connect to
    a root path, create a table per index, add converted row batches).
    Each ``upsert`` appends one uniquely-named Parquet file under
    ``root/index_name/`` — append-only and rename-atomic, so ANY number
    of writer actors upsert concurrently with no coordination, and a
    resumable pipeline never corrupts the store (half-written files
    carry a ``.tmp`` suffix readers skip).  ``create_index`` records
    {dimension, metric} in ``_meta.json``; ``as_dataset`` reads the
    store back as a ``ray.data.Dataset`` for downstream ANN
    (engine/similarity.knn_cosine and friends)."""

    def __init__(self, root: str, index_name: str = "anything",
                 id_col: str = "doc_id", text_col: str = "text",
                 vec_col: str = "embedding"):
        self.root = root
        self.index_name = index_name
        self.id_col, self.text_col, self.vec_col = id_col, text_col, vec_col

    def _dir(self, name: str | None = None) -> str:
        import os
        return os.path.join(self.root, name or self.index_name)

    def create_index(self, dimension: int, metric: str = "cosine",
                     index_name: str | None = None, **kwargs) -> None:
        import json
        import os
        if index_name is not None:
            self.index_name = index_name
        os.makedirs(self._dir(), exist_ok=True)
        meta = {"dimension": int(dimension), "metric": metric, **kwargs}
        tmp = os.path.join(self._dir(), "_meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(self._dir(), "_meta.json"))

    def delete_index(self, index_name: str | None = None) -> None:
        import shutil
        shutil.rmtree(self._dir(index_name), ignore_errors=True)

    def convert(self, batch: pa.Table) -> list[dict]:
        # same row dict shape as HttpVectorAdapter (the reference's
        # convert contract) — the storage below keeps columns instead
        return HttpVectorAdapter.convert(self, batch)

    def upsert(self, batch: pa.Table) -> None:
        import os
        import uuid
        import pyarrow.parquet as pq
        path = os.path.join(self._dir(), f"rows-{uuid.uuid4().hex}.parquet")
        pq.write_table(batch, path + ".tmp", compression="zstd")
        os.replace(path + ".tmp", path)

    def as_dataset(self):
        """Read the store back (files-only glob skips _meta.json)."""
        import glob
        import os
        import ray.data
        files = sorted(glob.glob(os.path.join(self._dir(), "*.parquet")))
        return ray.data.read_parquet(files)


class JsonlVectorAdapter(VectorAdapter):
    """Worked adapter example #3: a line-delimited-JSON payload log —
    one ``convert`` row dict per line, exactly the request bodies the
    reference's hosted-store adapters ship (pinecone_db.py upserts
    {id, values, metadata} dicts; qdrant.py PointStruct dicts).  Useful
    as a dead-letter/debug sink and as the fixture for asserting
    payload-shape parity across adapters.  Each writer actor appends to
    its OWN file (``{stem}-{pid}.jsonl``) — no cross-worker write
    contention, the per-worker-connection rule of upsert_embeddings."""

    def __init__(self, stem: str, index_name: str = "anything",
                 id_col: str = "doc_id", text_col: str = "text",
                 vec_col: str = "embedding"):
        self.stem = stem
        self.index_name = index_name
        self.id_col, self.text_col, self.vec_col = id_col, text_col, vec_col

    def create_index(self, dimension: int, metric: str = "cosine",
                     index_name: str | None = None, **kwargs) -> None:
        import os
        if index_name is not None:
            self.index_name = index_name
        os.makedirs(os.path.dirname(self.stem) or ".", exist_ok=True)

    def delete_index(self, index_name: str | None = None) -> None:
        import glob
        import os
        for p in glob.glob(f"{self.stem}-*.jsonl"):
            os.unlink(p)

    def convert(self, batch: pa.Table) -> list[dict]:
        return HttpVectorAdapter.convert(self, batch)

    def upsert(self, batch: pa.Table) -> None:
        import json
        import os
        with open(f"{self.stem}-{os.getpid()}.jsonl", "a") as f:
            for row in self.convert(batch):
                f.write(json.dumps(row, sort_keys=True) + "\n")


def upsert_embeddings(embedded, make_adapter, batch_size: int = 256,
                      concurrency=None) -> int:
    """Stream an embedded Dataset into a vector store through a
    VectorAdapter: the adapter is built ONCE per writer actor
    (``make_adapter`` must be a picklable zero-arg factory — connection
    state lives in the worker, the reference's Arc<Adapter> analog) and
    ``upsert`` runs once per Arrow batch, exactly the reference's
    buffered-batch callback cadence.  Returns total rows upserted; the
    returned per-batch counts are the only thing that crosses back to
    the driver.  ``concurrency=None`` sizes the writer pool from the
    cluster (engine.config.pool_size)."""
    if concurrency is None:
        from engine.config import pool_size
        concurrency = pool_size()

    class Writer:
        def __init__(self):
            self.adapter = make_adapter()

        def __call__(self, batch: pa.Table) -> pa.Table:
            self.adapter.upsert(batch)
            return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

    counts = embedded.map_batches(
        Writer, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)
    return int(sum(r["n"] for r in counts.take_all()))


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
