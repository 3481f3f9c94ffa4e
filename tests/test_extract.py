"""Extraction byte-identity (FIXTURES.md §2).

The engine UDF (regex state machine, engine/extract.py) and an
INDEPENDENT naive oracle built on stdlib html.parser must agree
byte-for-byte with the generator's ground-truth ``text`` column on every
fixture url — the input_hint per-row invariant.
"""

from html.parser import HTMLParser

import pyarrow.parquet as pq
import pytest

from engine.extract import extract_text, extract_batch
from engine.fixtures import gen_webtext


class _OracleParser(HTMLParser):
    """Naive event-driven implementation of the FIXTURES.md §2 spec."""

    BLOCK = {"h1", "h2", "h3", "h4", "h5", "h6", "p", "li"}
    DROP = {"script", "style", "head", "title"}

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks = []
        self.cur = None
        self.cur_tag = None
        self.drop_depth = 0
        self.href = None
        self.in_ul = False
        self.ul_items = None

    def handle_starttag(self, tag, attrs):
        if tag in self.DROP:
            self.drop_depth += 1
        elif tag == "ul":
            self.in_ul = True
            self.ul_items = []
        elif tag in self.BLOCK:
            self.cur = []
            self.cur_tag = tag
        elif tag == "strong" and self.cur is not None:
            self.cur.append("**")
        elif tag == "em" and self.cur is not None:
            self.cur.append("*")
        elif tag == "a" and self.cur is not None:
            self.href = dict(attrs).get("href", "")

    def handle_endtag(self, tag):
        if tag in self.DROP:
            self.drop_depth = max(0, self.drop_depth - 1)
        elif tag == "ul":
            if self.ul_items:
                self.blocks.append("\n".join("- " + it for it in self.ul_items))
            self.in_ul = False
            self.ul_items = None
        elif tag in self.BLOCK and self.cur is not None:
            body = " ".join("".join(self.cur).split())
            if tag.startswith("h"):
                self.blocks.append("#" * int(tag[1]) + " " + body)
            elif tag == "li":
                self.ul_items.append(body)
            else:
                self.blocks.append(body)
            self.cur = None
        elif tag == "strong" and self.cur is not None:
            self.cur.append("**")
        elif tag == "em" and self.cur is not None:
            self.cur.append("*")
        elif tag == "a":
            self.href = None  # link-strip: anchor text only

    def handle_data(self, data):
        if self.drop_depth == 0 and self.cur is not None:
            self.cur.append(data)

    def text(self):
        return "\n\n".join(self.blocks)


def oracle_extract(html: bytes) -> str:
    p = _OracleParser()
    p.feed(html.decode("utf-8", errors="replace"))
    return p.text()


@pytest.fixture(scope="module")
def table():
    return gen_webtext(200)


def test_engine_matches_ground_truth(table):
    for url, html, text in zip(table["url"].to_pylist(),
                               table["html"].to_pylist(),
                               table["text"].to_pylist()):
        got = extract_text(html)
        assert got == text, f"engine mismatch for {url}"


def test_oracle_matches_ground_truth(table):
    for url, html, text in zip(table["url"].to_pylist(),
                               table["html"].to_pylist(),
                               table["text"].to_pylist()):
        got = oracle_extract(html)
        assert got == text, f"oracle mismatch for {url}"


def test_extract_batch_drops_html(table):
    out = extract_batch(table.slice(0, 50).drop_columns(["text"]))
    assert "html" not in out.column_names
    assert out.column("text").to_pylist() == table["text"].to_pylist()[:50]


def test_extract_handles_junk():
    assert extract_text(b"") == ""
    assert extract_text(b"<p>ok</p>garbage<notatag>") == "ok"
    assert extract_text("<p>a &amp; b &lt;c&gt; &quot;d&quot;</p>") == 'a & b <c> "d"'
    # lossy utf-8 decode (reference: processors/src/processor.rs:18)
    assert extract_text(b"<p>a\xff b</p>") == "a� b"


def test_fixture_determinism():
    a = gen_webtext(50)
    b = gen_webtext(50)
    assert a.equals(b)


def test_fixture_duplicates(table):
    urls = table["url"].to_pylist()
    assert len(urls) > len(set(urls))  # ~2% dup urls present
    ts = table["warc_ts"].to_pylist()
    seen = {}
    for u, t in zip(urls, ts):
        seen.setdefault(u, []).append(t)
    dups = {u: v for u, v in seen.items() if len(v) > 1}
    assert dups
    for u, v in dups.items():
        assert len(set(v)) == len(v)  # distinct ts -> earliest is unique
