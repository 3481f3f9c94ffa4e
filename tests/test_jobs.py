"""Smoke tests for the cluster job entrypoints (the north-rule
deployment shape: ``ray job submit -- python tools/build_job.py`` /
``serve_job.py``).  Each CLI owns its OWN Ray session, so the tests
run them as fresh subprocesses with ``--local-cpus`` — independent of
the pytest fixture session — and check the documented JSON contract:
build stats line, resume on resubmit, serve + one search round-trip.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=420):
    return subprocess.run([sys.executable] + args, capture_output=True,
                          text=True, cwd=REPO, timeout=timeout)


def _json_lines(stdout: str) -> list[dict]:
    out = []
    for line in stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            out.append(json.loads(line))
    return out


def test_build_job_cli(unit_webtext, tmp_path):
    out_dir = str(tmp_path / "jobidx")
    argv = ["tools/build_job.py", "--input", unit_webtext,
            "--output", out_dir, "--num-parts", "4",
            "--docmeta-parts", "2", "--local-cpus", "4",
            "--smoke-query", "the data"]
    r = _run(argv)
    assert r.returncode == 0, r.stderr[-2000:]
    stats, smoke = _json_lines(r.stdout)[-2:]
    assert stats["n_docs"] > 0 and stats["n_postings"] > 0
    assert stats["num_parts"] == 4
    assert smoke["topk"], smoke

    # resubmitting the same job must resume (manifest anti-join skips
    # committed parts) and report the SAME corpus stats
    r2 = _run(argv)
    assert r2.returncode == 0, r2.stderr[-2000:]
    stats2 = _json_lines(r2.stdout)[-2]
    assert stats2["n_docs"] == stats["n_docs"]
    assert stats2["n_postings"] == stats["n_postings"]


def test_serve_job_cli(unit_webtext, tmp_path):
    out_dir = str(tmp_path / "srvidx")
    r = _run(["tools/build_job.py", "--input", unit_webtext,
              "--output", out_dir, "--num-parts", "4",
              "--docmeta-parts", "2", "--local-cpus", "4"])
    assert r.returncode == 0, r.stderr[-2000:]

    for tier, extra in (("replicas", ["--replicas", "1"]),
                        ("term-shards", ["--shards", "2",
                                         "--fronts", "1"])):
        r = _run(["tools/serve_job.py", "--index", out_dir,
                  "--tier", tier, "--local-cpus", "4", "--smoke"]
                 + extra)
        assert r.returncode == 0, (tier, r.stderr[-2000:])
        lines = _json_lines(r.stdout)
        assert lines[0]["status"] == "serving" and \
            lines[0]["tier"] == tier
        hits = lines[1]["smoke_search"]["hits"]
        assert hits and all("doc_id" in h and "score" in h
                            for h in hits), tier
