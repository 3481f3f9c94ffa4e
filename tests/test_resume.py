"""Checkpoint/resume (FIXTURES.md §5): inject a failure after some
partitions commit; the rerun must produce an index identical to an
uninterrupted build.  North-rule "resumable from checkpoint"."""

import hashlib
import json
import os

import pyarrow.parquet as pq
import pytest

from engine import index_io
from engine.build import build_index
from engine.config import EngineConfig

CFG = EngineConfig(num_parts=6, docmeta_parts=2)


def _index_fingerprint(idx):
    out = {}
    for kind, n in (("postings", CFG.num_parts), ("docmeta", CFG.docmeta_parts)):
        for p in range(n):
            d = index_io.part_dir(idx, kind, p)
            if not os.path.isdir(d):
                continue
            h = hashlib.sha256()
            for name in sorted(os.listdir(d)):
                if name == index_io.COMMIT:
                    continue  # commit contains wall_s timing
                path = os.path.join(d, name)
                if name.endswith(".parquet"):
                    h.update(json.dumps(pq.read_table(path).to_pylist(),
                                        sort_keys=True, default=str).encode())
                else:
                    with open(path, "rb") as f:
                        h.update(f.read())
            out[(kind, p)] = h.hexdigest()
    return out


def test_resume_after_partial_failure(unit_webtext, tmp_path_factory):
    clean = str(tmp_path_factory.mktemp("resume") / "clean")
    build_index(unit_webtext, clean, CFG)
    want = _index_fingerprint(clean)
    stats_want = index_io.load_manifest(clean)["stats"]

    crashed = str(tmp_path_factory.mktemp("resume") / "crashed")
    with pytest.raises(Exception):
        build_index(unit_webtext, crashed, CFG, fail_parts=[1, 4])
    done = index_io.committed_parts(crashed)
    assert 0 < len(done) < CFG.num_parts + CFG.docmeta_parts
    assert ("postings", 1) not in done and ("postings", 4) not in done

    # rerun without the injected failure -> completes, identical output
    build_index(unit_webtext, crashed, CFG)
    assert _index_fingerprint(crashed) == want
    assert index_io.load_manifest(crashed)["stats"] == stats_want


def test_resume_noop_when_complete(unit_webtext, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("resume2") / "idx")
    build_index(unit_webtext, idx, CFG)
    m1 = index_io.load_manifest(idx)
    # second run must skip all work and leave the index unchanged
    fp1 = _index_fingerprint(idx)
    m2 = build_index(unit_webtext, idx, CFG)
    assert _index_fingerprint(idx) == fp1
    assert m2["stats"] == m1["stats"]
