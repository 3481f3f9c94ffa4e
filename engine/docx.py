"""Minimal DOCX text extraction (reference M6) — stdlib only.

Reference: ``DocxProcessor::process_file`` converts docx -> markdown via
the ``docx_parser`` crate inside a panic-catching wrapper
(/root/reference/processors/src/docx_processor.rs:19-40).  A .docx is a
zip archive whose main document is ``word/document.xml``; this pinned
spec covers the text-bearing subset:

  * paragraphs (``<w:p>``) -> one output line each, joined with '\\n\\n'
    (markdown paragraph separation, matching the docx->markdown shape)
  * runs ``<w:t>`` concatenated (xml:space preserved via the parser)
  * ``<w:tab/>`` -> tab, ``<w:br/>`` / ``<w:cr/>`` -> newline
  * heading styles ``<w:pStyle w:val="HeadingN"/>`` -> '#'*N prefix
    (markdown heading, like the reference's markdown output)
  * empty paragraphs dropped

Anything else (tables, images, footnotes) is ignored — documented
subset, mirrored by the deterministic writer used in tests.
"""

from __future__ import annotations

import io
import re
import zipfile
import xml.etree.ElementTree as ET

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_HEADING_RE = re.compile(r"Heading(\d)$")


def extract_docx_text(data: bytes) -> str:
    """DOCX bytes -> markdown-ish text (pinned subset above).
    Raises ValueError on a non-zip or a zip without word/document.xml."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(data))
    except zipfile.BadZipFile as e:
        raise ValueError(f"not a docx: {e}") from None
    try:
        xml_bytes = zf.read("word/document.xml")
    except KeyError:
        raise ValueError("not a docx: missing word/document.xml") from None
    root = ET.fromstring(xml_bytes)
    paras: list[str] = []
    for p in root.iter(f"{_W}p"):
        level = 0
        style = p.find(f"{_W}pPr/{_W}pStyle")
        if style is not None:
            m = _HEADING_RE.match(style.get(f"{_W}val", ""))
            if m:
                level = int(m.group(1))
        parts: list[str] = []
        for node in p.iter():
            if node.tag == f"{_W}t":
                parts.append(node.text or "")
            elif node.tag == f"{_W}tab":
                parts.append("\t")
            elif node.tag in (f"{_W}br", f"{_W}cr"):
                parts.append("\n")
        text = "".join(parts)
        if not text.strip():
            continue
        paras.append(("#" * level + " " + text) if level else text)
    return "\n\n".join(paras)


# ---------------------------------------------------------------------------
# deterministic DOCX writer (test/fixture side)
# ---------------------------------------------------------------------------

def write_simple_docx(paragraphs: list[str | tuple[int, str]]) -> bytes:
    """paragraphs: str for body text, (level, text) for a heading ->
    minimal valid .docx bytes.  Deterministic (fixed zip metadata)."""
    body: list[str] = []
    for para in paragraphs:
        if isinstance(para, tuple):
            level, text = para
            style = f'<w:pPr><w:pStyle w:val="Heading{level}"/></w:pPr>'
        else:
            style, text = "", para
        text_xml = (text.replace("&", "&amp;").replace("<", "&lt;")
                    .replace(">", "&gt;"))
        body.append(f'<w:p>{style}<w:r><w:t xml:space="preserve">'
                    f"{text_xml}</w:t></w:r></w:p>")
    doc = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/'
        'wordprocessingml/2006/main"><w:body>'
        + "".join(body) + "</w:body></w:document>")
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types"><Default Extension="xml" ContentType="application/'
        'xml"/><Override PartName="/word/document.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.wordprocessingml.'
        'document.main+xml"/></Types>')
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships"><Relationship Id="rId1" Type="http://schemas.'
        'openxmlformats.org/officeDocument/2006/relationships/'
        'officeDocument" Target="word/document.xml"/></Relationships>')
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, content in (("[Content_Types].xml", content_types),
                              ("_rels/.rels", rels),
                              ("word/document.xml", doc)):
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(zi, content)
    return buf.getvalue()
