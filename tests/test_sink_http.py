"""IndexSink adapter contract (reference S8 Adapter/test_adapter.py) and
the OpenAI-compatible HTTP surface (reference S9 server contract)."""

import json
import os
import urllib.request

import numpy as np
import pytest

from engine.build import build_index
from engine.config import EngineConfig
from engine.sink import IndexSink, LocalIndexSink
from engine.metrics import PartMetrics

CFG = EngineConfig(num_parts=4, docmeta_parts=2)


def _make_recording_sink(idx: str, log: str):
    """Adapter-contract double: records every call via file side effects
    (the writer runs in remote tasks, so in-memory lists won't do),
    while delegating storage to the local layout.  Defined inside a
    function so cloudpickle ships it by VALUE — exactly what a user's
    custom sink class experiences."""
    class RecordingSink(IndexSink):
        def __init__(self, index_dir, log_dir):
            self.inner = LocalIndexSink(index_dir)
            self.log_dir = log_dir

        def _log(self, name):
            os.makedirs(self.log_dir, exist_ok=True)
            with open(os.path.join(self.log_dir, name), "w") as f:
                f.write("1")

        def create_index(self):
            self._log("create_index")
            self.inner.create_index()

        def committed_parts(self):
            return self.inner.committed_parts()

        def write_postings_part(self, part, terms, postings_blob,
                                skips_blob, metrics):
            assert isinstance(metrics, PartMetrics) and metrics.checksum
            self._log(f"postings-{part}")
            self.inner.write_postings_part(part, terms, postings_blob,
                                           skips_blob, metrics)

        def write_docmeta_part(self, part, docmeta, metrics):
            self._log(f"docmeta-{part}")
            self.inner.write_docmeta_part(part, docmeta, metrics)

        def finalize(self, cfg, lineage):
            self._log("finalize")
            return self.inner.finalize(cfg, lineage)

    return RecordingSink(idx, log)


def test_custom_sink_receives_every_part(ray_session, unit_webtext,
                                         tmp_path_factory):
    base = tmp_path_factory.mktemp("sink")
    idx, log = str(base / "idx"), str(base / "log")
    manifest = build_index(unit_webtext, idx, CFG,
                           sink=_make_recording_sink(idx, log))
    calls = set(os.listdir(log))
    assert "create_index" in calls and "finalize" in calls
    for p in range(CFG.num_parts):
        assert f"postings-{p}" in calls
    for p in range(CFG.docmeta_parts):
        assert f"docmeta-{p}" in calls
    # and the sink-built index is a working index
    from engine.query import InvertedIndex
    assert manifest["stats"]["n_docs"] > 0
    assert InvertedIndex(idx).search("the", k=3)


def _post(url: str, payload: dict):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture(scope="module")
def http_engine(ray_session, e2e_webtext, tmp_path_factory):
    from engine.http_serve import EngineHttpServer
    idx_dir = str(tmp_path_factory.mktemp("hidx") / "index")
    build_index(e2e_webtext, idx_dir, EngineConfig(num_parts=8,
                                                   docmeta_parts=3))
    srv = EngineHttpServer(index_dir=idx_dir, dim=64)
    srv.start()
    yield srv, f"http://127.0.0.1:{srv.port}"
    srv.stop()


def test_health_check(http_engine):
    _, base = http_engine
    with urllib.request.urlopen(f"{base}/health_check") as r:
        assert r.status == 200


def test_openai_embeddings_shape(http_engine):
    srv, base = http_engine
    status, resp = _post(f"{base}/v1/embeddings",
                         {"input": ["hello world", "second doc"],
                          "model": "hashing-64"})
    assert status == 200
    assert resp["object"] == "list" and resp["model"] == "hashing-64"
    assert [d["index"] for d in resp["data"]] == [0, 1]
    assert all(d["object"] == "embedding" and len(d["embedding"]) == 64
               for d in resp["data"])
    assert resp["usage"]["prompt_tokens"] == 4
    # values match the engine's embedder exactly
    want = srv.embedder.embed_texts(["hello world"])[0]
    assert np.allclose(resp["data"][0]["embedding"], want)


def test_openai_embeddings_errors(http_engine):
    _, base = http_engine
    status, resp = _post(f"{base}/v1/embeddings", {"input": []})
    assert status == 400
    assert resp["error"]["code"] == "empty_input"
    assert resp["error"]["type"] == "invalid_request_error"


def test_search_filter_and_facets(http_engine, e2e_webtext):
    """/v1/search with {"filter": ..., "facet": ...}: missing sidecar ->
    400 no_doc_values; after attach_doc_values, filtered hits + facet
    counts match the local engine exactly."""
    import ray.data
    import pandas as pd
    import pyarrow.parquet as pq
    srv, base = http_engine
    payload = {"query": "the house", "k": 5,
               "filter": {"col": "lang", "values": ["en", "de"]},
               "facet": "lang"}
    status, resp = _post(f"{base}/v1/search", payload)
    assert status == 400 and resp["error"]["code"] == "no_doc_values"

    from engine.docvalues import attach_doc_values
    files = sorted(os.path.join(e2e_webtext, f)
                   for f in os.listdir(e2e_webtext) if f.endswith(".parquet"))
    df = (pd.concat([pq.read_table(f).to_pandas() for f in files])
          .sort_values(["url", "warc_ts"], kind="stable")
          .drop_duplicates(subset="url", keep="first"))
    attach_doc_values(srv.index.index_dir,
                      ray.data.from_pandas(
                          df[["url", "lang"]].reset_index(drop=True)),
                      ["lang"])
    status, resp = _post(f"{base}/v1/search", payload)
    assert status == 200
    want = srv.index.search("the house", k=5,
                            where=("lang", ("en", "de")))
    assert [(h["doc_id"], h["score"]) for h in resp["hits"]] == \
        [(d, s) for d, s in want]
    wantf = srv.index.facet_counts("the house", "lang",
                                   where=("lang", ("en", "de")))
    assert [(f["value"], f["n_docs"]) for f in resp["facets"]] == wantf

    status, resp = _post(f"{base}/v1/search",
                         {"query": "the house", "k": 5, "exclude": "of"})
    assert status == 200
    wantx = srv.index.search("the house", k=5, exclude="of")
    assert [(h["doc_id"], h["score"]) for h in resp["hits"]] == \
        [(d, s) for d, s in wantx]

    status, resp = _post(f"{base}/v1/suggest", {"prefix": "th", "k": 5})
    assert status == 200
    assert [(r["term"], r["df"]) for r in resp["suggestions"]] == \
        srv.index.suggest("th", k=5)

    # histogram facet over doc lengths (lang sidecar carries only lang
    # here, so bucket on a fresh attach below is out of scope — use the
    # lang facet payload shape): attach added only lang, so histogram
    # over lang would fail; assert the no-column error maps to 400
    status, resp = _post(f"{base}/v1/search",
                         {"query": "the house", "k": 2,
                          "facet_histogram": {"col": "nope",
                                              "edges": [0, 1]}})
    assert status == 400


def test_search_endpoint_matches_local(http_engine):
    srv, base = http_engine
    status, resp = _post(f"{base}/v1/search", {"query": "the house", "k": 5})
    assert status == 200
    want = srv.index.search("the house", k=5)
    got = [(h["doc_id"], h["score"]) for h in resp["hits"]]
    assert [d for d, _ in got] == [d for d, _ in want]
    assert np.allclose([s for _, s in got], [s for _, s in want])
    assert all(h["url"] for h in resp["hits"])


def test_base64_image_routing(http_engine):
    """M11 classifier + F9 decode: all-image -> unsupported_model,
    mixed -> mixed_input_types (reference server routing semantics)."""
    import base64
    from engine.http_serve import is_base64_image
    _, base = http_engine
    fake_png = base64.b64encode(
        b"\x89PNG\r\n\x1a\n" + bytes(range(256)) * 2).decode()
    assert is_base64_image(fake_png)
    assert is_base64_image("data:image/png;base64,AAAA")
    assert not is_base64_image("plain text body")
    assert not is_base64_image(base64.b64encode(b"x" * 200).decode())

    status, resp = _post(f"{base}/v1/embeddings", {"input": [fake_png]})
    assert status == 400 and resp["error"]["code"] == "unsupported_model"
    status, resp = _post(f"{base}/v1/embeddings",
                         {"input": [fake_png, "some text"]})
    assert status == 400 and resp["error"]["code"] == "mixed_input_types"


def test_http_service_backend(tmp_path, unit_webtext):
    """EngineHttpServer with an actor-tier service backend: /v1/search
    routes through QueryService.search and matches the local index."""
    import json as _json
    import urllib.request
    from engine.build import build_index
    from engine.config import EngineConfig
    from engine.query import InvertedIndex
    from engine.serve import QueryService
    from engine.http_serve import EngineHttpServer

    idx_dir = str(tmp_path / "httpsvc_idx")
    build_index(unit_webtext, idx_dir, EngineConfig(num_parts=4,
                                                    docmeta_parts=2))
    svc = QueryService(idx_dir, replicas=1)
    server = EngineHttpServer(index_dir=None, service=svc)
    port = server.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/search",
            data=_json.dumps({"query": "the data", "k": 5}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=30) as r:
            hits = _json.loads(r.read())["hits"]
        local = InvertedIndex(idx_dir).search("the data", k=5)
        assert [(h["doc_id"], round(h["score"], 9)) for h in hits] == \
            [(d, round(s, 9)) for d, s in local]
    finally:
        server.stop()
