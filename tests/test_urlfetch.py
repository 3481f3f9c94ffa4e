"""URL ingest (reference S6) against a loopback http.server fixture —
offline test of the production-shaped fetch stage."""

import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from engine.urlfetch import PINNED_HEADERS, fetch_urls, fetch_url


class _Handler(BaseHTTPRequestHandler):
    seen_headers: list[dict] = []

    def do_GET(self):
        type(self).seen_headers.append(dict(self.headers))
        if self.path == "/missing":
            self.send_error(404)
            return
        body = f"<html><body><h1>page {self.path}</h1></body></html>".encode()
        self.send_response(200)
        self.send_header("Content-Type", "text/html")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture(scope="module")
def http_fixture():
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_fetch_sends_pinned_headers(http_fixture):
    _Handler.seen_headers.clear()
    body, status, err = fetch_url(f"{http_fixture}/one")
    assert status == 200 and err == "" and b"page /one" in body
    hdrs = _Handler.seen_headers[-1]
    for k, v in PINNED_HEADERS.items():
        assert hdrs.get(k) == v, k


def test_fetch_urls_stage(http_fixture):
    urls = [f"{http_fixture}/p{i}" for i in range(6)] + \
           [f"{http_fixture}/missing", "http://127.0.0.1:1/refused"]
    out = fetch_urls(urls, concurrency=2, batch_size=3).to_pandas()
    assert len(out) == 8
    by_url = {r["url"]: r for _, r in out.iterrows()}
    for i in range(6):
        r = by_url[f"{http_fixture}/p{i}"]
        assert r["status"] == 200 and r["error"] == ""
        assert f"page /p{i}".encode() in bytes(r["html"])
    assert by_url[f"{http_fixture}/missing"]["status"] == 404
    assert "HTTPError" in by_url[f"{http_fixture}/missing"]["error"]
    refused = by_url["http://127.0.0.1:1/refused"]
    assert refused["status"] == 0 and refused["error"]


def test_fetched_pages_feed_build_pipeline(http_fixture, tmp_path):
    """fetch -> extract -> build: the reference's embed_webpage flow
    (/root/reference/rust/src/lib.rs:332-364) end to end."""
    import numpy as np
    from engine.build import build_index
    from engine.config import EngineConfig
    from engine.query import InvertedIndex

    urls = [f"{http_fixture}/doc{i}" for i in range(4)]
    ds = fetch_urls(urls, concurrency=2)

    def add_ts(batch):
        import pyarrow as pa
        n = len(batch)
        return batch.append_column(
            "warc_ts", pa.array(np.zeros(n, dtype="datetime64[us]")))

    src = ds.map_batches(add_ts, batch_format="pyarrow") \
            .select_columns(["url", "warc_ts", "html"])
    idx_dir = str(tmp_path / "urlidx")
    cfg = EngineConfig(num_parts=4, docmeta_parts=2)
    manifest = build_index(src, idx_dir, cfg)
    assert manifest["stats"]["n_docs"] == 4
    idx = InvertedIndex(idx_dir)
    hits = idx.search("page doc1", k=2)
    assert hits  # fetched content is searchable
