"""Cluster job entrypoint: build (and optionally query-smoke) an index.

Submit to a running Ray cluster (the north-rule deployment shape):

    ray job submit --working-dir . -- \
        python tools/build_job.py --input 's3://bucket/webtext/*.parquet' \
            --output /shared/index --num-parts 4096 --docmeta-parts 1024

or run locally (`--local-cpus N` starts a local session instead of
connecting).  The build is resumable: resubmitting the same job skips
committed partitions via the manifest anti-join, so a preempted job
continues where it stopped.  On a cluster, `--output` must be shared
storage (NFS / fuse mount); S3 output goes through a custom IndexSink.

Layout defaults follow EngineConfig.suggest_layout when --num-parts is
omitted (requires --approx-docs to estimate).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# runnable as `python tools/build_job.py` from the repo root or via
# `ray job submit --working-dir .` (the repo root is the working dir)
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True,
                   help="parquet glob/dir/uri of (url, warc_ts, html) rows")
    p.add_argument("--output", required=True, help="index directory")
    p.add_argument("--mode", default="webtext",
                   choices=("webtext", "docs"))
    p.add_argument("--num-parts", type=int, default=0)
    p.add_argument("--docmeta-parts", type=int, default=0)
    p.add_argument("--approx-docs", type=int, default=0,
                   help="estimated corpus size for layout sizing")
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--local-cpus", type=int, default=0,
                   help="start a local session with N cpus instead of "
                        "connecting to the cluster")
    p.add_argument("--smoke-query", default="",
                   help="after the build, run this query and print top-10")
    args = p.parse_args(argv)

    import ray
    if not ray.is_initialized():
        if args.local_cpus:
            ray.init(address="local", num_cpus=args.local_cpus,
                     include_dashboard=False)
        else:
            # under `ray job submit` this attaches to the cluster
            ray.init(address="auto")

    from engine.config import EngineConfig
    from engine.build import build_index

    if args.num_parts:
        cfg = EngineConfig(
            num_parts=args.num_parts,
            docmeta_parts=args.docmeta_parts or max(4, args.num_parts // 4))
    elif args.approx_docs:
        n_cpus = int(ray.cluster_resources().get("CPU", 8))
        cfg = EngineConfig.suggest_layout(args.approx_docs, n_cpus)
    else:
        cfg = EngineConfig()

    t0 = time.perf_counter()
    manifest = build_index(args.input, args.output, cfg, mode=args.mode,
                           resume=not args.no_resume)
    wall = time.perf_counter() - t0
    st = manifest["stats"]
    print(json.dumps({
        "n_docs": st["n_docs"], "total_tokens": st["total_tokens"],
        "n_terms": st["n_terms"], "n_postings": st["n_postings"],
        "num_parts": cfg.num_parts, "wall_s": round(wall, 1),
        "docs_per_sec": round(st["n_docs"] / wall, 1) if wall else None,
    }))

    if args.smoke_query:
        from engine.query import InvertedIndex
        idx = InvertedIndex(args.output)
        q = args.smoke_query
        topk = idx.search(q, k=10)
        if not topk:
            # query terms absent from this corpus: probe a real indexed
            # term so the smoke still exercises the read path
            entry, _, _ = idx._load_part(0)
            if entry is not None and entry[0].size:
                q = str(entry[0][0])
                topk = idx.search(q, k=10)
        print(json.dumps({"query": q, "topk": topk}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
