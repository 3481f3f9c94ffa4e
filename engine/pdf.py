"""Pure-Python PDF text extraction for a pinned PDF subset (reference M4).

Reference path: ``PdfProcessor::process_file`` -> ``pdf_extract::extract_text``
(LoPdf backend) -> markdown chunking
(/root/reference/processors/src/pdf/pdf_processor.rs:43-58; golden test
asserting 4,271 chunks from test.pdf at :104-123).  No PDF library exists
in this container, so this module pins a precise, deterministic spec for
the subset our fixtures (and most text-first PDFs) use — the same
"pinned spec + independent oracle" strategy as the HTML extractor
(SURVEY.md §7.5):

Supported subset
  * objects scanned in document byte order (no xref needed)
  * content streams: uncompressed, or /FlateDecode (zlib)
  * text operators inside BT..ET blocks:
      (s) Tj       show literal string (escapes \\n \\r \\t \\b \\f
                   \\( \\) \\\\ and octal \\ooo)
      <hex> Tj     show hex string (latin-1 bytes)
      [..] TJ      show array: string elements concatenated, numeric
                   kerning ignored
      (s) '        next line + show
      Td / TD / T* line transitions -> newline
  * literal/hex string bytes decode latin-1 (PDFDocEncoding's printable
    range); no CID/Type0 composite fonts (skipped streams stay skipped)
  * streams with other filters, or with no BT block, contribute nothing

``write_simple_pdf`` emits deterministic single-/multi-page PDFs (with
Flate-compressed streams) used by tests and the ``pdf_extract`` contract
entry; round-tripping through it is the in-sandbox analog of the
reference's golden-count test.
"""

from __future__ import annotations

import re
import zlib

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n(.*?)endstream", re.S)
_BT_RE = re.compile(rb"BT(.*?)ET", re.S)
# one regex pass over a BT block: strings-with-op, arrays, line ops
_OP_RE = re.compile(
    rb"(\((?:\\.|[^\\()])*\))\s*(Tj|')"      # literal string + Tj or '
    rb"|(<[0-9A-Fa-f\s]*>)\s*Tj"             # hex string + Tj
    rb"|(\[.*?\])\s*TJ"                       # array + TJ
    rb"|(T\*|Td|TD)",                         # line transitions
    re.S)
_ARRAY_ITEM_RE = re.compile(rb"\((?:\\.|[^\\()])*\)|<[0-9A-Fa-f\s]*>")
_ESCAPE_RE = re.compile(rb"\\([0-7]{1,3}|.)", re.S)

_ESC = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
        b"(": b"(", b")": b")", b"\\": b"\\"}


def _unescape_literal(raw: bytes) -> bytes:
    """(..) literal string body -> bytes (PDF escape rules)."""
    def sub(m: re.Match) -> bytes:
        g = m.group(1)
        if g[:1].isdigit():
            return bytes([int(g, 8) & 0xFF])
        return _ESC.get(g, g)
    return _ESCAPE_RE.sub(sub, raw)


def _decode_string_token(tok: bytes) -> str:
    if tok.startswith(b"("):
        return _unescape_literal(tok[1:-1]).decode("latin-1")
    hexdigits = re.sub(rb"\s", b"", tok[1:-1])
    if len(hexdigits) % 2:
        hexdigits += b"0"  # PDF spec: odd final digit implies trailing 0
    return bytes.fromhex(hexdigits.decode("ascii")).decode("latin-1")


def _stream_text(content: bytes) -> list[str]:
    """Text lines shown by one decoded content stream."""
    lines: list[str] = []
    cur: list[str] = []

    def flush():
        if cur:
            lines.append("".join(cur))
            cur.clear()

    for block in _BT_RE.findall(content):
        for m in _OP_RE.finditer(block):
            lit, lit_op, hexs, arr, line_op = m.groups()
            if lit is not None:
                if lit_op == b"'":
                    flush()
                cur.append(_decode_string_token(lit))
            elif hexs is not None:
                cur.append(_decode_string_token(hexs))
            elif arr is not None:
                for item in _ARRAY_ITEM_RE.findall(arr):
                    cur.append(_decode_string_token(item))
            else:  # Td / TD / T*
                flush()
        flush()
    return lines


def extract_pdf_text(data: bytes) -> str:
    """PDF bytes -> text (pinned subset above).  Streams are processed
    in document byte order; lines joined with '\\n', like the
    reference backend's line-oriented output.  Raises ValueError on
    input without a PDF header (dispatcher surfaces it as an error
    column, never a task failure)."""
    if not data.startswith(b"%PDF-"):
        raise ValueError("not a PDF (missing %PDF- header)")
    lines: list[str] = []
    for dict_bytes, body in _STREAM_RE.findall(data):
        if b"/FlateDecode" in dict_bytes:
            try:
                content = zlib.decompress(body)
            except zlib.error:
                continue  # unsupported/corrupt stream: contributes nothing
        elif b"/Filter" in dict_bytes:
            continue      # unsupported filter (DCT, LZW, ...)
        else:
            content = body
        if b"BT" in content:
            lines.extend(_stream_text(content))
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# deterministic PDF writer (test/fixture side)
# ---------------------------------------------------------------------------

def _escape_literal(s: str) -> bytes:
    out = s.encode("latin-1", errors="replace")
    return out.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def write_simple_pdf(pages: list[list[str]], compress: bool = True) -> bytes:
    """pages = list of pages, each a list of text lines -> valid PDF
    bytes (xref + trailer included; readable by any conforming viewer).
    Deterministic: same input, same bytes."""
    objs: list[bytes] = []
    n_pages = len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>"
                .encode())
    for i, lines in enumerate(pages):
        page_num, content_num = 3 + 2 * i, 4 + 2 * i
        objs.append(
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Contents {content_num} 0 R /Resources << /Font "
            f"<< /F1 {3 + 2 * n_pages} 0 R >> >> >>".encode())
        body = [b"BT /F1 12 Tf 72 720 Td"]
        for j, line in enumerate(lines):
            if j:
                body.append(b"0 -14 Td")
            body.append(b"(" + _escape_literal(line) + b") Tj")
        body.append(b"ET")
        content = b"\n".join(body)
        if compress:
            content = zlib.compress(content, 9)
            objs.append(b"<< /Length " + str(len(content)).encode()
                        + b" /Filter /FlateDecode >>\nstream\n"
                        + content + b"\nendstream")
        else:
            objs.append(b"<< /Length " + str(len(content)).encode()
                        + b" >>\nstream\n" + content + b"\nendstream")
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, obj in enumerate(objs, 1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + obj + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n0000000000 65535 f \n".encode()
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    return bytes(out)
