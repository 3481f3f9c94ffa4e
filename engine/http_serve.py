"""HTTP serving surface (reference S9): OpenAI-compatible embeddings +
health check, plus the engine's own BM25 search endpoint.

Reference: the actix-web server exposes ``GET /health_check`` and
``POST /v1/embeddings`` with the OpenAI response shape
{object, data: [{object, index, embedding}], model, usage} and typed
error bodies {error: {message, type, code}}
(/root/reference/server/src/lib.rs:142-330).  This module mirrors that
contract over stdlib ``http.server`` (no web framework in the sandbox):

    GET  /health_check   -> 200 empty
    POST /v1/embeddings  -> OpenAI embedding response (hashing embedder
                            stands in for model weights, same slot)
    POST /v1/search      -> {"hits": [{doc_id, score, url}]} over the
                            built index (the capability the reference
                            delegates to external vector DBs)

Production path: the same handlers behind a real ASGI server or
``ray serve``; this threaded server is the sandbox-complete tier and
the test surface.  Mixed base64-image input handling (M11) is out of
scope — text-only, like the engine.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from engine.embed import HashingEmbedder
from engine.tokenize import tokenize


def _error(message: str, etype: str, code: str) -> dict:
    # reference error shape, server/src/lib.rs ErrorResponse/ErrorDetail
    return {"error": {"message": message, "type": etype, "code": code}}


# known magic prefixes for the classifier's decode-and-sniff step
_IMAGE_MAGICS = (b"\xff\xd8\xff", b"\x89PNG\r\n\x1a\n", b"GIF8",
                 b"BM", b"RIFF")


def is_base64_image(s: str) -> bool:
    """Input classifier (reference M11, server/src/lib.rs:624-656):
    data:image/ URLs are images; otherwise a >=100-char pure-base64
    string that decodes (F9) to bytes with a known image magic."""
    if s.startswith("data:image/"):
        return True
    data = s.strip()
    if len(data) < 100:
        return False
    if not all(c.isalnum() or c in "+/=" for c in data):
        return False
    import base64 as b64
    import binascii
    try:
        raw = b64.b64decode(data, validate=True)
    except (binascii.Error, ValueError):
        return False
    return raw.startswith(_IMAGE_MAGICS)


class EngineHttpServer:
    """Threaded HTTP front over a warm embedder (+ optional index)."""

    def __init__(self, index_dir: str | None = None, dim: int = 64,
                 host: str = "127.0.0.1", port: int = 0, service=None):
        self.embedder = HashingEmbedder(dim=dim)
        self.model_name = f"hashing-{dim}"
        self.index = None
        # optional actor-tier backend (engine.serve QueryService /
        # ShardedQueryService / DocShardedQueryService): /v1/search
        # routes to service.search(query, k) instead of the in-process
        # index — the cluster-serving front (tools/serve_job.py)
        self.service = service
        # ThreadingHTTPServer handles requests concurrently and the
        # InvertedIndex decoded-term LRU is not thread-safe (pop +
        # reinsert + byte accounting), so searches serialize on a lock;
        # for parallel query serving use engine.serve's actor tiers
        self._search_lock = threading.Lock()
        if index_dir is not None:
            from engine.query import InvertedIndex
            self.index = InvertedIndex(index_dir)
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, status: int, payload: dict | None):
                body = b"" if payload is None else json.dumps(payload).encode()
                self.send_response(status)
                if body:
                    self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                if body:
                    self.wfile.write(body)

            def do_GET(self):
                if self.path == "/health_check":
                    self._send(200, None)
                else:
                    self._send(404, _error("not found", "invalid_request_error",
                                           "unknown_route"))

            def do_POST(self):
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(n) or b"{}")
                except (ValueError, json.JSONDecodeError):
                    self._send(400, _error("invalid JSON body",
                                           "invalid_request_error",
                                           "bad_json"))
                    return
                if self.path == "/v1/embeddings":
                    self._send(*outer._embeddings(req))
                elif self.path == "/v1/search":
                    self._send(*outer._search(req))
                elif self.path == "/v1/suggest":
                    self._send(*outer._suggest(req))
                else:
                    self._send(404, _error("not found", "invalid_request_error",
                                           "unknown_route"))

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self._httpd.server_port
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)

    # -- handlers (pure functions of the request dict; unit-testable) -----
    def _embeddings(self, req: dict) -> tuple[int, dict]:
        inputs = req.get("input")
        if isinstance(inputs, str):
            inputs = [inputs]
        if not inputs:
            # reference: empty input -> invalid_request_error/empty_input
            return 400, _error("Input cannot be empty",
                               "invalid_request_error", "empty_input")
        if not all(isinstance(x, str) for x in inputs):
            return 400, _error("Inputs must be strings",
                               "invalid_request_error", "bad_input_type")
        # input-type routing (reference server/src/lib.rs:161-173):
        # mixed text/image -> error; all-image -> unsupported here (the
        # hashing embedder is text-only, like a non-vision model)
        img = [is_base64_image(x) for x in inputs]
        if any(img) and not all(img):
            return 400, _error(
                "Mixed input types detected. Please provide either all "
                "text inputs or all base64 image inputs.",
                "invalid_request_error", "mixed_input_types")
        if all(img):
            return 400, _error(
                f"Model '{req.get('model', self.model_name)}' does not "
                "support image embeddings. Please use a vision model.",
                "invalid_request_error", "unsupported_model")
        vecs = self.embedder.embed_texts(inputs)
        n_tokens = sum(len(tokenize(t)) for t in inputs)
        return 200, {
            "object": "list",
            "data": [{"object": "embedding", "index": i,
                      "embedding": [float(v) for v in vecs[i]]}
                     for i in range(len(inputs))],
            "model": req.get("model", self.model_name),
            "usage": {"prompt_tokens": n_tokens, "total_tokens": n_tokens},
        }

    def _search(self, req: dict) -> tuple[int, dict]:
        if self.index is None and self.service is None:
            return 400, _error("no index mounted", "invalid_request_error",
                               "no_index")
        query = req.get("query", "")
        k = int(req.get("k", 10))
        # doc-values filter/facets: {"filter": {"col": ..., "values":
        # [...]}, "facet": "col"} — engine/docvalues.py semantics
        where = None
        flt = req.get("filter")
        if flt:
            vals = flt.get("values", flt.get("value"))
            if not isinstance(vals, (list, tuple)):
                vals = [vals]
            where = (flt["col"], tuple(vals))
        facet_col = req.get("facet")
        hist = req.get("facet_histogram")  # {"col": ..., "edges": [...]}
        exclude = req.get("exclude")
        kwargs = {"where": where} if where is not None else {}
        if exclude:
            kwargs["exclude"] = str(exclude)
        try:
            if self.service is not None:
                hits = self.service.search(query, k=k, **kwargs)
                out = {"hits": [
                    {"doc_id": int(d), "score": float(s)}
                    for d, s in hits]}
                if facet_col:
                    out["facets"] = [
                        {"value": v, "n_docs": int(n)} for v, n in
                        self.service.facet_counts(query, facet_col,
                                                  where=where)]
                if hist:
                    out["histogram"] = [
                        {"lo": lo, "hi": hi, "n_docs": int(n)}
                        for lo, hi, n in self.service.facet_histogram(
                            query, hist["col"], hist["edges"],
                            where=where)]
                return 200, out
            with self._search_lock:
                hits = self.index.search(query, k=k, **kwargs)
                urls = (self.index.url_of([d for d, _ in hits])
                        if hits else [])
                facets = (self.index.facet_counts(query, facet_col,
                                                  where=where)
                          if facet_col else None)
                hrows = (self.index.facet_histogram(
                    query, hist["col"], hist["edges"], where=where)
                    if hist else None)
        except (FileNotFoundError, KeyError) as e:  # missing sidecar/col
            return 400, _error(str(e), "invalid_request_error",
                               "no_doc_values")
        except AttributeError:
            # serving tier without filter/facet support (term-sharded
            # fronts hold no per-doc data)
            return 400, _error(
                "filter/facet not supported by this serving tier",
                "invalid_request_error", "unsupported_filter")
        except TypeError as e:
            # deliberate engine-side type errors (e.g. facet_histogram
            # over a non-numeric doc-values column) keep their message;
            # a blanket catch here used to mask them as
            # unsupported_filter
            return 400, _error(str(e), "invalid_request_error",
                               "bad_column_type")
        out = {"hits": [
            {"doc_id": int(d), "score": float(s), "url": u}
            for (d, s), u in zip(hits, urls)]}
        if facets is not None:
            out["facets"] = [{"value": v, "n_docs": int(n)}
                             for v, n in facets]
        if hrows is not None:
            out["histogram"] = [{"lo": lo, "hi": hi, "n_docs": int(n)}
                                for lo, hi, n in hrows]
        return 200, out

    def _suggest(self, req: dict) -> tuple[int, dict]:
        """Prefix autocomplete: {"prefix": ..., "k": 10} ->
        {"suggestions": [{"term", "df"}]} (engine/query.py suggest)."""
        backend = self.service if self.service is not None else self.index
        if backend is None:
            return 400, _error("no index mounted", "invalid_request_error",
                               "no_index")
        prefix = str(req.get("prefix", ""))
        k = int(req.get("k", 10))
        try:
            if self.service is not None:
                rows = self.service.suggest(prefix, k=k)
            else:
                with self._search_lock:
                    rows = self.index.suggest(prefix, k=k)
        except AttributeError:
            return 400, _error(
                "suggest not supported by this serving tier",
                "invalid_request_error", "unsupported_suggest")
        return 200, {"suggestions": [
            {"term": t, "df": int(df)} for t, df in rows]}

    # -- lifecycle --------------------------------------------------------
    def start(self) -> int:
        self._thread.start()
        return self.port

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
