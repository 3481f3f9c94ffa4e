"""PDF + DOCX extraction (reference M4/M6): round-trip golden tests in
the style of the reference's pdf_processor golden chunk count
(/root/reference/processors/src/pdf/pdf_processor.rs:104-123) — but
stronger: the fixture writers are independent of the extractors, so the
expected TEXT is known exactly, not just a count."""

import numpy as np
import pytest

from engine.pdf import extract_pdf_text, write_simple_pdf
from engine.docx import extract_docx_text, write_simple_docx
from engine.chunk import split_markdown


def _pdf_pages(n_pages=5, lines_per_page=40):
    rng = np.random.default_rng(99)
    vocab = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
             "golf", "hotel", "india", "juliet"]
    return [[" ".join(rng.choice(vocab, 6)) for _ in range(lines_per_page)]
            for _ in range(n_pages)]


def test_pdf_roundtrip_exact_text():
    pages = _pdf_pages()
    data = write_simple_pdf(pages, compress=True)
    want = "\n".join("\n".join(p) for p in pages)
    assert extract_pdf_text(data) == want


def test_pdf_uncompressed_and_escapes():
    pages = [["parens (nested) and \\ backslash", "tabs\tand stuff"]]
    data = write_simple_pdf(pages, compress=False)
    assert extract_pdf_text(data) == "\n".join(pages[0])


def test_pdf_hex_and_tj_array():
    # hand-built content stream: hex string + TJ array with kerning
    content = (b"BT /F1 12 Tf 72 720 Td <48656c6c6f> Tj "
               b"[( wor) -120 (ld)] TJ 0 -14 Td (next line) Tj ET")
    pdf = (b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(content)).encode()
           + b" >>\nstream\n" + content + b"\nendstream\nendobj\n")
    assert extract_pdf_text(pdf) == "Hello world\nnext line"


def test_pdf_golden_chunk_count():
    """Reference-style golden: fixed fixture -> exact chunk count at
    chunk_size=128 (pdf_processor.rs golden is 4271 @ 128 for its
    fixture; ours is pinned to this writer's output)."""
    text = extract_pdf_text(write_simple_pdf(_pdf_pages(10, 60)))
    chunks = split_markdown(text, chunk_size=128)
    assert len(chunks) == 200
    assert "".join(chunks) == text  # lossless at overlap=0


def test_pdf_rejects_non_pdf():
    with pytest.raises(ValueError):
        extract_pdf_text(b"GIF89a not a pdf")


def test_docx_roundtrip():
    paras = [(1, "Title"), "First paragraph with text.",
             (2, "Section"), "Second\tparagraph.", "Third one."]
    data = write_simple_docx(paras)
    want = ("# Title\n\nFirst paragraph with text.\n\n## Section\n\n"
            "Second\tparagraph.\n\nThird one.")
    assert extract_docx_text(data) == want


def test_docx_rejects_garbage():
    with pytest.raises(ValueError):
        extract_docx_text(b"not a zip at all")
    import io, zipfile
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("other.xml", "<x/>")
    with pytest.raises(ValueError):
        extract_docx_text(buf.getvalue())


def test_dispatch_pdf_docx_flow(tmp_path):
    """.pdf/.docx files flow through read_text_corpus into docs rows."""
    from engine.sources import read_text_corpus
    (tmp_path / "a.pdf").write_bytes(write_simple_pdf([["pdf body text"]]))
    (tmp_path / "b.docx").write_bytes(write_simple_docx(["docx body text"]))
    (tmp_path / "c.txt").write_text("plain text")
    (tmp_path / "d.xyz").write_text("ignored")
    out = read_text_corpus(str(tmp_path)).to_pandas()
    got = {r["url"].rsplit("/", 1)[-1]: (r["text"], r["error"])
           for _, r in out.iterrows()}
    assert got["a.pdf"] == ("pdf body text", "")
    assert got["b.docx"] == ("docx body text", "")
    assert got["c.txt"] == ("plain text", "")
    assert "d.xyz" not in got  # extension filter drops it at the read


def test_corrupt_pdf_surfaces_error_column(tmp_path):
    from engine.sources import read_text_corpus
    (tmp_path / "bad.pdf").write_bytes(b"junk bytes, no header")
    out = read_text_corpus(str(tmp_path)).to_pandas()
    assert len(out) == 1
    assert out["text"][0] == ""
    assert "ValueError" in out["error"][0]


def test_pdf_roundtrip_property():
    """Escape-rule fuzz: any latin-1 lines (incl. parens, backslashes,
    tabs, embedded newline chars) survive writer -> extractor exactly."""
    from hypothesis import given, settings, strategies as st
    line = st.text(alphabet=st.sampled_from(list("ab()\\ éÿ\t\n.")),
                   max_size=24)
    pages = st.lists(st.lists(line, min_size=1, max_size=5),
                     min_size=1, max_size=3)

    @settings(max_examples=150, deadline=None)
    @given(pages, st.booleans())
    def run(pp, compress):
        data = write_simple_pdf(pp, compress=compress)
        want = "\n".join("\n".join(p) for p in pp)
        assert extract_pdf_text(data) == want

    run()
