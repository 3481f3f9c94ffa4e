"""Cluster job entrypoint: serve a built index over HTTP.

    ray job submit --working-dir . --no-wait -- \
        python tools/serve_job.py --index /shared/index --port 8080 \
            --tier replicas --replicas 4

Tiers map to engine/serve.py layouts:
  replicas     N warm full-index actor replicas (lowest latency)
  term-shards  part-range shards + front pool (lowest per-node memory)
  doc-shards   doc-range shards + distributed-IDF exchange (highest QPS;
               expects --index given N times, one per range)

The HTTP surface is engine/http_serve.py: GET /health_check,
POST /v1/embeddings (OpenAI shape), POST /v1/search (accepts
``filter``/``facet``/``facet_histogram``/``exclude``/``snippets`` —
doc-values sidecars must be attached per served index — and
``phrase``/``slop`` on the replicas and doc-shards tiers over
positional indexes), POST /v1/suggest.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--index", action="append", required=True,
                   help="index dir; repeat for doc-shards (one per range)")
    p.add_argument("--tier", default="replicas",
                   choices=("replicas", "term-shards", "doc-shards"))
    p.add_argument("--replicas", type=int, default=4)
    p.add_argument("--shards", type=int, default=2)
    p.add_argument("--fronts", type=int, default=2)
    p.add_argument("--port", type=int, default=0)
    p.add_argument("--local-cpus", type=int, default=0)
    p.add_argument("--smoke", action="store_true",
                   help="serve, answer one smoke request, exit (tests)")
    args = p.parse_args(argv)

    import ray
    if not ray.is_initialized():
        if args.local_cpus:
            ray.init(address="local", num_cpus=args.local_cpus,
                     include_dashboard=False)
        else:
            ray.init(address="auto")

    from engine.serve import (DocShardedQueryService, QueryService,
                              ShardedQueryService)
    if args.tier == "replicas":
        svc = QueryService(args.index[0], replicas=args.replicas)
    elif args.tier == "term-shards":
        svc = ShardedQueryService(args.index[0], n_shards=args.shards,
                                  replicas_per_shard=max(
                                      1, args.replicas // args.shards),
                                  n_fronts=args.fronts)
    else:
        svc = DocShardedQueryService(args.index)

    from engine.http_serve import EngineHttpServer
    server = EngineHttpServer(index_dir=None, service=svc, port=args.port)
    port = server.start()
    print(json.dumps({"status": "serving", "tier": args.tier,
                      "port": port}), flush=True)

    if args.smoke:
        import urllib.request
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/search",
            data=json.dumps({"query": "the data", "k": 3}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=30) as r:
            print(json.dumps({"smoke_search": json.loads(r.read())}))
        server.stop()
        ray.shutdown()
        return 0

    stop = []
    signal.signal(signal.SIGTERM, lambda *_: stop.append(1))
    signal.signal(signal.SIGINT, lambda *_: stop.append(1))
    import time
    while not stop:
        time.sleep(1)
    server.stop()
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
