"""Interleaved N->4N scaling study over the flagship extract.

Reproduces the protocol behind BENCH/scaling_r3*.json (two full
interleaved rounds over the parallelism ladder, best-of per config,
tmpfs store, steady state with pre-forked workers + one untimed warm
pass per session), so the evidence can be re-measured on the final
shipped code with one command:

    SPARK_GRAFT_NDOCS=100000 python scaling_study.py BENCH/out.json

The interleaving (2, 8, 32, 2, 8, 32 — not 2, 2, 8, 8, ...) makes
host-level noise hit every configuration, not one; best-of per config
is reported alongside the raw runs.
"""

from __future__ import annotations

import json
import os
import sys

os.environ.setdefault("SPARK_GRAFT_SCALING_TMPFS", "1")

import bench  # noqa: E402  (reuses _run_extract_throughput/_tmpfs_media)

LADDER = (2, 8, 32)
ROUNDS = 2


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH/scaling.json"
    n_docs = bench.NDOCS or 100_000
    runs: dict[str, list[float]] = {str(c): [] for c in LADDER}
    for r in range(ROUNDS):
        for cores in LADDER:
            tp = round(bench._run_extract_throughput(cores, n_docs), 1)
            runs[str(cores)].append(tp)
            print(f"round {r} local[{cores}]: {tp} docs/s", flush=True)
    best = {c: max(v) for c, v in runs.items()}
    result = {
        "n_docs": n_docs,
        "store": "tmpfs",
        "runs": runs,
        "best_docs_per_sec": best,
        "efficiency_2_to_8": round(best["8"] / best["2"] / 4, 3),
        "efficiency_8_to_32": round(best["32"] / best["8"] / 4, 3),
    }
    with open(out_path, "w") as f:
        json.dump(result, f)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
