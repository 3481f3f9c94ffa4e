"""Text-analysis stages: langid on the webtext fixture langs, quality
ratios, token counts, fingerprint determinism."""

import numpy as np
import pyarrow as pa
import pytest

from engine.fixtures import gen_webtext
from engine.textstats import (langid_batch, quality_batch, token_count_batch,
                              fingerprint_batch)


def _tbl(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_langid_markers():
    out = langid_batch(_tbl([
        "the cat of the house is here for now",
        "der hund ist nicht mit der katze",
        "le chat est dans la maison pour les amis",
        "el perro es un animal para la casa",
        "こんにちは世界 データ",
        "xyzzy plugh",
    ])).column("pred_lang").to_pylist()
    assert out == ["en", "de", "fr", "es", "ja", "unknown"]


def test_langid_on_fixture_ja():
    t = gen_webtext(100)
    out = langid_batch(t.select(["url", "text", "lang"]))
    langs = t["lang"].to_pylist()
    preds = out.column("pred_lang").to_pylist()
    ja = [p for l, p in zip(langs, preds) if l == "ja"]
    assert ja and all(p == "ja" for p in ja)  # CJK unigrams vote ja
    en = [p for l, p in zip(langs, preds) if l == "en"]
    # stopword-forced en docs detected; others fall back to unknown
    assert en.count("en") > len(en) * 0.5


def test_quality_ratios():
    out = quality_batch(_tbl(["the cat. THE dog!", ""])).to_pylist()
    r = out[0]
    assert r["n_tokens"] == 4
    assert r["stopword_ratio_ppm"] == 500000
    alnum = sum(ch.isalnum() for ch in "the cat. THE dog!")
    assert r["alnum_ratio_ppm"] == int(round(alnum / 17 * 1e6))
    assert out[1]["n_tokens"] == 0 and out[1]["stopword_ratio_ppm"] == 0


def test_micro_units_half_away_ties():
    from engine.textstats import micro_units
    # 105/128 = 0.8203125 -> 820312.5: half-away gives ...313 (DuckDB),
    # np.round's half-even gave ...312 (the round-1 hash flake)
    assert micro_units(np.array([105 / 128]))[0] == 820313
    assert micro_units(np.array([1 / 128]))[0] == 7813
    assert micro_units(np.array([-105 / 128]))[0] == -820313
    assert micro_units(np.array([0.0]))[0] == 0


def test_token_counts():
    out = token_count_batch(_tbl(["a b  c", "don't stop-me", ""])).to_pylist()
    assert out[0]["ws_tokens"] == 3
    assert out[1]["ws_tokens"] == 2
    assert out[1]["bpeish_tokens"] == 6  # don ' t stop - me
    assert out[2]["ws_tokens"] == 0


def test_fingerprint_deterministic_and_shift_invariant():
    texts = ["alpha beta gamma delta epsilon zeta eta theta iota kappa"] * 2
    a = fingerprint_batch(_tbl(texts)).column("fingerprint").to_pylist()
    assert a[0] == a[1] != 0
    b = fingerprint_batch(_tbl([texts[0]])).column("fingerprint").to_pylist()
    assert b[0] == a[0]
    # different text -> different fingerprint (overwhelming probability)
    c = fingerprint_batch(_tbl(["totally different words here my friend "
                                "with many more tokens involved"]))
    assert c.column("fingerprint").to_pylist()[0] != a[0]


def test_snippets_best_window():
    """Best-window rule: max hits, ties to the earliest start; short or
    hitless docs dropped."""
    import pyarrow as pa
    import ray
    from engine.docops import SNIPPET_WINDOW

    texts = [
        # hits at positions 2,3 and 9,10,11 -> best window starts at 4
        # (covers 9,10,11 from start<=4+7)... compute naively below
        "x x hash join x x x x x hash join table y y y y",
        "no terms here at all in this document text",
        "hash join",                              # shorter than window
    ]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(texts, pa.string())}))
    import sys
    from engine import docops

    def naive(text, w=SNIPPET_WINDOW, terms=("hash", "join", "table")):
        toks = text.split()
        if len(toks) < w:
            return None
        hits = [1 if t in terms else 0 for t in toks]
        wins = [sum(hits[i:i + w]) for i in range(len(toks) - w + 1)]
        best = max(range(len(wins)), key=lambda i: (wins[i], -i))
        if wins[best] == 0:
            return None
        return best, wins[best], " ".join(toks[best:best + w])

    import tempfile, os
    import pyarrow.parquet as pq
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * 3), "source": pa.array(["t"] * 3),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }), os.path.join(d, "documents.parquet"))
        out = docops.q_snippets(d).to_pandas().sort_values(
            "doc_id").reset_index(drop=True)
    want0 = naive(texts[0])
    assert len(out) == 1 and out["doc_id"].iloc[0] == 0
    assert (out["best_start"].iloc[0], out["hits"].iloc[0],
            out["snippet"].iloc[0]) == want0
