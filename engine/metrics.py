"""Per-partition lineage + metrics (north_rule: "every partition emits
lineage + token/posting metrics").

The reference tracks only a distinct-file progress count
(/root/reference/rust/src/lib.rs:850-879) and silently drops failed files
(/root/reference/rust/src/lib.rs:938-941); we record explicit per-part
counters in each partition's commit record and roll them up into the
index manifest.
"""

from __future__ import annotations

import hashlib
import json
import time
from dataclasses import dataclass, asdict, field


@dataclass
class PartMetrics:
    part: int
    kind: str                   # "postings" | "docmeta"
    n_terms: int = 0
    n_postings: int = 0         # total (doc,term) entries in the part
    n_docs: int = 0             # docmeta parts only
    sum_doclen: int = 0         # docmeta parts only
    postings_bytes: int = 0
    skip_bytes: int = 0
    positions_bytes: int = 0    # positional builds only (store_positions)
    checksum: str = ""          # sha256 of segment payload
    wall_s: float = 0.0
    lineage: dict = field(default_factory=dict)  # input desc, row counts

    def to_json(self) -> str:
        return json.dumps(asdict(self), sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "PartMetrics":
        return PartMetrics(**json.loads(s))


def sha256_of(*payloads: bytes) -> str:
    h = hashlib.sha256()
    for p in payloads:
        h.update(p)
    return h.hexdigest()


class Timer:
    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.wall_s = time.perf_counter() - self.t0
        return False
