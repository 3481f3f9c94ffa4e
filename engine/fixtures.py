"""Deterministic Common-Crawl-style webtext generator (FIXTURES.md §1-2).

Produces the BASELINE.json ``input_hint`` table:
  url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string

``text`` is generated FIRST (the ground truth), then ``html`` is rendered
from the same intermediate representation so that
``extract.extract_text(html) == text`` byte-for-byte per url — the
per-row invariant the driver's north rule checks.

Determinism: every row is generated from ``np.random.default_rng([seed,
row_index])`` so output is independent of generation order/parallelism
and stable across processes (no wall clock, no builtin hash).

Reference precedent for fixture style: /root/reference/test_files/ tiny
per-format corpora and the non-ASCII test in
/root/reference/tests/model_tests/test_bert.py:95-100.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
TIERS = {"unit": 200, "e2e": 2000, "bench": 200_000}

STOPWORDS = ["the", "of", "and", "to", "a", "in", "is", "it", "that", "for"]

_BASE_TS = 1_760_000_000_000_000  # 2025-10-09 in microseconds, fixed


def _make_vocab() -> dict[str, list[str]]:
    """~5000-term synthetic vocabulary with Zipf(s=1.1) weights per lang."""
    rng = np.random.default_rng(7)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    en = ["".join(rng.choice(letters, size=rng.integers(3, 11)))
          for _ in range(4600)]
    diacritic = np.array(list("àâäéèêëîïöûüçñß"))
    defr = ["".join(rng.choice(letters, size=rng.integers(2, 7)))
            + "".join(rng.choice(diacritic, size=rng.integers(1, 3)))
            + "".join(rng.choice(letters, size=rng.integers(1, 5)))
            for _ in range(300)]
    cjk_pool = np.array(list(
        "日本語の文書検索転置索引構築分散処理大規模高速化評価実験結果"
        "こんにちは世界データ処理システム設計情報取得"
    ))
    ja = ["".join(rng.choice(cjk_pool, size=rng.integers(2, 6)))
          for _ in range(100)]
    return {"en": en, "defr": defr, "ja": ja}


_VOCAB = _make_vocab()


def _zipf_probs(n: int, s: float = 1.1) -> np.ndarray:
    p = 1.0 / np.arange(1, n + 1) ** s
    return p / p.sum()


_EN_PROBS = _zipf_probs(len(_VOCAB["en"]))
_DEFR_PROBS = _zipf_probs(len(_VOCAB["defr"]))
_JA_PROBS = _zipf_probs(len(_VOCAB["ja"]))


def _sample_words(rng: np.random.Generator, lang: str, n: int) -> list[str]:
    if lang == "ja":
        base = list(rng.choice(_VOCAB["ja"], size=n, p=_JA_PROBS))
        # mix in some ascii terms so ja docs hit mixed-script tokenization
        mask = rng.random(n) < 0.15
        asc = rng.choice(_VOCAB["en"], size=int(mask.sum()), p=_EN_PROBS[: len(_VOCAB["en"])])
        j = 0
        for i in np.flatnonzero(mask):
            base[i] = asc[j]; j += 1
        return base
    words = list(rng.choice(_VOCAB["en"], size=n, p=_EN_PROBS))
    if lang in ("de", "fr"):
        mask = rng.random(n) < 0.3
        dia = rng.choice(_VOCAB["defr"], size=int(mask.sum()), p=_DEFR_PROBS)
        j = 0
        for i in np.flatnonzero(mask):
            words[i] = dia[j]; j += 1
    return words


def _doc_blocks(rng: np.random.Generator, lang: str, n_tokens: int):
    """Build the doc IR: list of (kind, payload).

    kind 'h' -> (level, words-str); 'p' -> inline-decorated str;
    'ul' -> list of item strs.  The payload strings are the TEXT form
    (markdown markers included); html rendering maps them back.
    """
    stopword_doc = rng.random() < 0.65
    words = _sample_words(rng, lang, n_tokens)
    if stopword_doc and lang != "ja":
        mask = rng.random(len(words)) < 0.25
        stops = rng.choice(STOPWORDS, size=int(mask.sum()))
        j = 0
        for i in np.flatnonzero(mask):
            words[i] = stops[j]; j += 1
    blocks = []
    pos = 0
    # leading h1
    h1n = min(int(rng.integers(2, 6)), max(1, len(words)))
    blocks.append(("h", 1, " ".join(words[pos:pos + h1n]).capitalize()))
    pos += h1n
    while pos < len(words):
        r = rng.random()
        if r < 0.08:
            lvl = int(rng.integers(2, 4))
            n = min(int(rng.integers(2, 6)), len(words) - pos)
            blocks.append(("h", lvl, " ".join(words[pos:pos + n]).capitalize()))
            pos += n
        elif r < 0.16:
            items = []
            for _ in range(int(rng.integers(2, 6))):
                n = min(int(rng.integers(2, 7)), len(words) - pos)
                if n <= 0:
                    break
                items.append(" ".join(words[pos:pos + n]))
                pos += n
            if items:
                blocks.append(("ul", 0, items))
        else:
            # paragraph: 3-7 sentences of 5-15 words, '. '-ish joined
            sents = []
            for _ in range(int(rng.integers(3, 8))):
                n = min(int(rng.integers(5, 16)), len(words) - pos)
                if n <= 0:
                    break
                toks = words[pos:pos + n]
                pos += n
                # inline decorations on the text form
                if len(toks) > 2 and rng.random() < 0.3:
                    i = int(rng.integers(0, len(toks)))
                    toks[i] = f"**{toks[i]}**"
                if len(toks) > 2 and rng.random() < 0.2:
                    i = int(rng.integers(0, len(toks)))
                    if not toks[i].startswith("*"):
                        toks[i] = f"*{toks[i]}*"
                sent = " ".join(toks).capitalize()
                if rng.random() < 0.06:
                    sent += ' & <spice> "quoted"'
                sents.append(sent + ".")
            if sents:
                blocks.append(("p", 0, " ".join(sents)))
    return blocks


_ESC = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"), ('"', "&quot;")]


def _html_inline(text: str, rng: np.random.Generator) -> str:
    """TEXT form -> HTML inline form (inverse of extract._inline)."""
    for ch, ent in _ESC:
        text = text.replace(ch, ent)
    import re
    text = re.sub(r"\*\*([^*]+)\*\*", r"<strong>\1</strong>", text)
    text = re.sub(r"\*([^*]+)\*", r"<em>\1</em>", text)
    # turn some plain words into links: anchor text survives link-strip
    toks = text.split(" ")
    if len(toks) > 4 and rng.random() < 0.4:
        i = int(rng.integers(1, len(toks) - 1))
        if toks[i].isalnum():
            toks[i] = (f'<a href="https://link.example.com/'
                       f'{rng.integers(0, 10**6)}">{toks[i]}</a>')
    out = " ".join(toks)
    # sprinkle collapsible whitespace (text has single spaces)
    if rng.random() < 0.3:
        sp = out.split(" ")
        if len(sp) > 3:
            i = int(rng.integers(1, len(sp) - 1))
            sp[i] = sp[i] + " "  # double space once rejoined
            out = " ".join(sp)
    return out


def _render(blocks, rng: np.random.Generator, title: str) -> tuple[str, str]:
    """IR -> (text, html)."""
    text_blocks, html_parts = [], []
    html_parts.append("<!DOCTYPE html><html><head><title>"
                      + title.replace("&", "&amp;") + "</title></head><body>")
    for blk in blocks:
        kind, lvl, payload = blk
        if kind == "h":
            text_blocks.append("#" * lvl + " " + payload)
            html_parts.append(f"<h{lvl}>{_html_inline(payload, rng)}</h{lvl}>")
        elif kind == "ul":
            text_blocks.append("\n".join("- " + it for it in payload))
            lis = "".join(f"<li>{_html_inline(it, rng)}</li>" for it in payload)
            html_parts.append(f"<ul>{lis}</ul>")
        else:
            text_blocks.append(payload)
            html_parts.append(f"<p>{_html_inline(payload, rng)}</p>")
        if rng.random() < 0.1:
            html_parts.append("<script>var x = 1 < 2 && 3 > 2;</script>")
        if rng.random() < 0.1:
            html_parts.append("<!-- generator comment, must be dropped -->")
    html_parts.append("</body></html>")
    return "\n\n".join(text_blocks), "\n".join(html_parts)


def _doc_length(rng: np.random.Generator, row_idx: int) -> int:
    if row_idx % 1499 == 0 and row_idx > 0:
        return 50_000  # wide-record outlier (FIXTURES.md §1)
    n = int(np.exp(rng.normal(4.7, 0.9)))
    return int(np.clip(n, 20, 2000))


def _lang_for(rng: np.random.Generator) -> str:
    r = rng.random()
    if r < 0.90:
        return "en"
    if r < 0.94:
        return "de"
    if r < 0.97:
        return "fr"
    return "ja"


def gen_row(row_idx: int, seed: int = SEED, dup_of: int | None = None,
            dup_nonce: int = 0) -> dict:
    """Generate one row. ``dup_of`` set -> same url as that row, later
    warc_ts, regenerated (mutated) body — the dedup loser."""
    rng = np.random.default_rng([seed, row_idx, dup_nonce])
    base_idx = dup_of if dup_of is not None else row_idx
    lang = _lang_for(np.random.default_rng([seed, base_idx, 0]))
    url = f"https://{lang}.example.org/doc/{base_idx:08d}"
    n_tokens = _doc_length(rng, row_idx)
    blocks = _doc_blocks(rng, lang, n_tokens)
    title = blocks[0][2]
    text, html = _render(blocks, rng, title)
    ts = _BASE_TS + base_idx * 1_000_003
    if dup_of is not None:
        ts += int(rng.integers(1, 10**7))  # strictly later -> dedup loser
    return {"url": url, "warc_ts": ts, "html": html.encode("utf-8"),
            "text": text, "lang": lang}


def _rows_to_table(rows: list[dict]) -> pa.Table:
    return pa.table({
        "url": pa.array([r["url"] for r in rows], pa.string()),
        "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
        "html": pa.array([r["html"] for r in rows], pa.binary()),
        "text": pa.array([r["text"] for r in rows], pa.string()),
        "lang": pa.array([r["lang"] for r in rows], pa.string()),
    })


def _dup_targets(n_rows: int, seed: int, dup_rate: float) -> list[int]:
    dup_rng = np.random.default_rng([seed, 999_999_937])
    n_dups = int(round(n_rows * dup_rate))
    return sorted(int(x) for x in
                  dup_rng.choice(n_rows, size=n_dups, replace=False))


def gen_webtext(n_rows: int, seed: int = SEED, dup_rate: float = 0.02) -> pa.Table:
    """Deterministic webtext table, ~2% duplicate urls appended + shuffled."""
    rows = [gen_row(i, seed) for i in range(n_rows)]
    for k, t in enumerate(_dup_targets(n_rows, seed, dup_rate)):
        rows.append(gen_row(n_rows + k, seed, dup_of=t, dup_nonce=1))
    order = np.random.default_rng([seed, 999_999_893]).permutation(len(rows))
    rows = [rows[i] for i in order]
    return _rows_to_table(rows)


def write_webtext_ray(out_dir: str, n_rows: int, seed: int = SEED,
                      dup_rate: float = 0.02,
                      rows_per_file: int = 5000) -> str:
    """Bench-scale deterministic webtext writer, parallelized with Ray.

    Every row is a pure function of (seed, row_index) — shard generation
    is embarrassingly parallel and the on-disk bytes are independent of
    parallelism.  Rows stay in index order within shards (the permutation
    step of ``gen_webtext`` only exists to exercise out-of-order dedup in
    tiny unit fixtures; dedup correctness is order-free by construction).
    Idempotent via a content-stamped _DONE marker.
    """
    import ray

    marker = f"ray n={n_rows} seed={seed} dup={dup_rate} per={rows_per_file}"
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        with open(done) as f:
            if f.read().strip() == marker:
                return out_dir
        import shutil
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    dup_targets = _dup_targets(n_rows, seed, dup_rate)
    n_files = max(1, (n_rows + rows_per_file - 1) // rows_per_file)

    @ray.remote
    def write_shard(shard: int, lo: int, hi: int,
                    dups: list[tuple[int, int]]) -> int:
        rows = [gen_row(i, seed) for i in range(lo, hi)]
        rows += [gen_row(n_rows + k, seed, dup_of=t, dup_nonce=1)
                 for k, t in dups]
        pq.write_table(_rows_to_table(rows),
                       os.path.join(out_dir, f"part-{shard:05d}.parquet"))
        return len(rows)

    refs = []
    for s in range(n_files):
        lo, hi = s * rows_per_file, min((s + 1) * rows_per_file, n_rows)
        dups = [(k, t) for k, t in enumerate(dup_targets) if k % n_files == s]
        refs.append(write_shard.remote(s, lo, hi, dups))
    ray.get(refs)
    with open(done, "w") as f:
        f.write(marker + "\n")
    return out_dir


def write_webtext(out_dir: str, tier: str = "unit", seed: int = SEED,
                  n_files: int = 8) -> str:
    """Write the tier's table as a directory of parquet shards.

    Multiple files so ``ray.data.read_parquet`` parallelizes the read;
    at production scale these are the Common-Crawl WARC-derived shards.
    Idempotent: skips if the directory already has a _DONE marker.
    """
    n_rows = TIERS[tier]
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    table = gen_webtext(n_rows, seed)
    per = (table.num_rows + n_files - 1) // n_files
    for i in range(n_files):
        chunk = table.slice(i * per, per)
        if chunk.num_rows:
            pq.write_table(chunk, os.path.join(out_dir, f"part-{i:04d}.parquet"))
    with open(done, "w") as f:
        f.write(f"{tier} {n_rows} seed={seed}\n")
    return out_dir
