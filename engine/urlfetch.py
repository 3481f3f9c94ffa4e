"""URL ingest stage (reference S6): HTTP GET with the reference's pinned
browser-like header set, as a Ray Data ``map_batches`` stage.

Reference: the blanket ``UrlProcessor::process_url`` builds a reqwest
client with a fixed UA + Accept/Accept-Language/Accept-Encoding/
Connection/Upgrade-Insecure-Requests header set, GETs, and feeds the body
to the format processor (/root/reference/processors/src/processor.rs:23-56).

Ray-Data-first shape: a batch of urls fans out as ``map_batches(fetch,
concurrency=N)`` tasks; each row carries (url, html:binary, status,
error) so failures surface as columns, never task crashes (the reference
silently drops failed fetches).  The output table feeds the same build
pipeline as the webtext table.  This sandbox has no network, so tests
run against a loopback ``http.server`` fixture — the stage itself is
production-shaped (stdlib urllib, per-request timeout, bounded body).
"""

from __future__ import annotations

import urllib.request

import numpy as np
import pyarrow as pa

import ray.data

# the reference's header set, processor.rs:25-51.  Two pinned
# deviations: Accept-Encoding is identity (urllib does not
# auto-decompress gzip/br; identity keeps byte-identity simple and
# correct), and Connection is omitted (hop-by-hop — http.client owns it
# and sends 'close'; reqwest's keep-alive is a transport detail, not
# request semantics).
PINNED_HEADERS = {
    "User-Agent": ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) "
                   "AppleWebKit/537.36 (KHTML, like Gecko) "
                   "Chrome/120.0.0.0 Safari/537.36"),
    "Accept": ("text/html,application/xhtml+xml,application/xml;q=0.9,"
               "image/webp,*/*;q=0.8"),
    "Accept-Language": "en-US,en;q=0.9",
    "Accept-Encoding": "identity",
    "Upgrade-Insecure-Requests": "1",
}

MAX_BODY_BYTES = 32 * 1024 * 1024  # cap one page at 32 MiB


def fetch_url(url: str, timeout_s: float = 30.0) -> tuple[bytes, int, str]:
    """-> (body, status, error).  Never raises."""
    req = urllib.request.Request(url, headers=dict(PINNED_HEADERS))
    try:
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            body = resp.read(MAX_BODY_BYTES)
            return body, int(resp.status), ""
    except urllib.error.HTTPError as e:
        return b"", int(e.code), f"HTTPError: {e.code}"
    except Exception as e:
        return b"", 0, f"{type(e).__name__}: {e}"


def make_fetch_batch(timeout_s: float = 30.0, url_col: str = "url"):
    """map_batches UDF: (url) -> (url, html:binary, status, error)."""
    def fetch_batch(batch: pa.Table) -> pa.Table:
        urls = batch.column(url_col).to_pylist()
        bodies, statuses, errors = [], [], []
        for u in urls:
            b, s, e = fetch_url(u, timeout_s)
            bodies.append(b)
            statuses.append(s)
            errors.append(e)
        return pa.table({
            url_col: pa.array(urls, pa.large_string()),
            "html": pa.array(bodies, pa.large_binary()),
            "status": pa.array(np.asarray(statuses, dtype=np.int32)),
            "error": pa.array(errors, pa.large_string()),
        })
    return fetch_batch


def fetch_urls(urls: "list[str] | ray.data.Dataset",
               concurrency: int = 8,
               batch_size: int = 16,
               timeout_s: float = 30.0) -> "ray.data.Dataset":
    """urls -> Dataset(url, html, status, error).

    ``concurrency`` bounds simultaneous fetch tasks (politeness + socket
    budget); small ``batch_size`` keeps per-task latency even — a batch
    is sequential inside one task, so batch_size x concurrency is the
    effective request parallelism ceiling."""
    ds = (ray.data.from_items([{"url": u} for u in urls])
          if not isinstance(urls, ray.data.Dataset) else urls)
    return ds.map_batches(make_fetch_batch(timeout_s),
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)
