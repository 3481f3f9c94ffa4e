"""HTML -> text extraction (the reference's critical map, M1).

Reference semantics: HTML -> Markdown via htmd 0.1.6 defaults, then strip
markdown links ``\\[([^\\]]+)\\]\\([^\\)]+\\)`` -> ``$1``
(/root/reference/processors/src/html_processor.rs:30-42).  We implement
the pinned FIXTURES.md §2 spec (htmd-compatible on the generated HTML
subset) as a stateless ``map_batches`` UDF over the ``html:binary``
column; the per-url output must be byte-identical to the fixture's
``text`` column (input_hint invariant).

Spec (total on the generated subset):
  <h1..h6>x  -> '#'*n + ' ' + x          <p>x -> x
  <li>x      -> '- x'                    <strong>x -> **x**   <em>x -> *x*
  <a href=u>x -> [x](u) then link-strip  -> x
  <script>/<style>/comments/<head>       -> dropped
  blocks joined by '\\n\\n'; entities &amp; &lt; &gt; &quot; decoded;
  intra-block whitespace runs collapsed to single spaces; block stripped.
"""

from __future__ import annotations

import re
from collections.abc import Mapping

import numpy as np
import pyarrow as pa

_HEAD_RE = re.compile(r"<head>.*?</head>", re.S | re.I)
_SCRIPT_RE = re.compile(r"<script[^>]*>.*?</script>", re.S | re.I)
_STYLE_RE = re.compile(r"<style[^>]*>.*?</style>", re.S | re.I)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
# one alternation pass strips all four non-content regions (order of
# alternatives irrelevant: regions cannot nest in the supported subset)
_STRIP_RE = re.compile(
    r"<head>.*?</head>|<script[^>]*>.*?</script>"
    r"|<style[^>]*>.*?</style>|<!--.*?-->", re.S | re.I)
_BLOCK_RE = re.compile(r"<(h[1-6]|p|ul)>(.*?)</\1>", re.S | re.I)
_LI_RE = re.compile(r"<li>(.*?)</li>", re.S | re.I)
_STRONG_RE = re.compile(r"<strong>(.*?)</strong>", re.S | re.I)
_EM_RE = re.compile(r"<em>(.*?)</em>", re.S | re.I)
_A_RE = re.compile(r"""<a\s+href=["']([^"']*)["']\s*>(.*?)</a>""", re.S | re.I)
# the reference's link-strip regex, applied to the markdown form
# (processors/src/html_processor.rs:36-37)
_LINK_STRIP_RE = re.compile(r"\[([^\]]+)\]\([^\)]+\)")
_WS_RE = re.compile(r"\s+")

_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&amp;", "&")]


def _inline(content: str) -> str:
    content = _STRONG_RE.sub(lambda m: f"**{m.group(1)}**", content)
    content = _EM_RE.sub(lambda m: f"*{m.group(1)}*", content)
    content = _A_RE.sub(lambda m: f"[{m.group(2)}]({m.group(1)})", content)
    content = _LINK_STRIP_RE.sub(r"\1", content)
    # &amp; decoded last so '&amp;lt;' doesn't double-decode
    for ent, ch in _ENTITIES:
        content = content.replace(ent, ch)
    return _WS_RE.sub(" ", content).strip()


def extract_text(html: bytes | str) -> str:
    """One document: html bytes -> extracted text per the pinned spec."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")  # lossy decode,
        # reference: processors/src/processor.rs:18
    html = _STRIP_RE.sub("", html)
    blocks: list[str] = []
    for m in _BLOCK_RE.finditer(html):
        tag = m.group(1).lower()
        if tag == "ul":
            # one block: its <li> items as '- x' lines joined by '\n'
            items = ["- " + _inline(li) for li in _LI_RE.findall(m.group(2))]
            if items:
                blocks.append("\n".join(items))
        elif tag.startswith("h"):
            blocks.append("#" * int(tag[1]) + " " + _inline(m.group(2)))
        else:
            blocks.append(_inline(m.group(2)))
    return "\n\n".join(blocks)


# Pinned output schema of the extract stage: identical for EVERY batch,
# including empty ones, so downstream rebatch buffers always concatenate
# like schemas.
EXTRACTED = pa.schema([("url", pa.large_string()),
                       ("text", pa.large_string())])


def extract_batch(batch) -> pa.Table:
    """Stateless map_batches UDF: html:binary -> text:string, html dropped.

    Projects the heavy binary column away immediately after extraction so
    downstream blocks stay narrow (SURVEY.md §7.5 "very wide records").

    Accepts a pyarrow Table or a numpy-dict batch.  The build runs this
    stage with ``batch_format="numpy"`` deliberately: dict batches are
    Mappings, which Ray Data always hands to the UDF, whereas EMPTY
    pyarrow/pandas batches are passed through UNCHANGED with their
    upstream schema (ray/data/_internal/planner/plan_udf_map_op.py:456,
    a workaround for all-to-all operators emitting schema-less empty
    blocks).  A left_semi join upstream emits exactly those, and the
    fused extract->tokenize rebatch buffer then concatenates a
    {url,warc_ts,html} passthrough with {url,text} outputs ->
    KeyError 'Column text does not exist in schema' (reproduced at
    12.8M docs with a 1-in-4 shard filter; tests/test_build_e2e.py::
    test_build_with_filtered_empty_blocks).
    """
    if isinstance(batch, Mapping):  # numpy-dict batch ({} when empty)
        urls = list(batch.get("url", ()))
        htmls = list(batch.get("html", ()))
    else:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
    return pa.table({
        "url": pa.array(urls, type=pa.large_string()),
        "text": pa.array([extract_text(h) for h in htmls],
                         type=pa.large_string()),
    }, schema=EXTRACTED)
