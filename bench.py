#!/usr/bin/env python
"""Benchmark entry point for the driver.

Runs the flagship single-chip configuration (BASELINE.md config 2:
N=16384, 500 steps, tiled Pallas kernel) on the default accelerator and
prints ONE JSON line:
    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

The metric is sustained GFLOP/s under the reference's own FLOP model
(29 N^2 + 19 N per step, ver0/GSimulation.cpp:122), averaged over sample
blocks excluding the first two — exactly the statistic the reference's
footer reports.  vs_baseline compares against the reference's published
ver0 number (4.0513 GFlop/s, README.md:56; see BASELINE.md).
"""

from __future__ import annotations

import json
import sys

REFERENCE_GFLOPS = 4.0513  # ver0 published average (BASELINE.md)


def main() -> int:
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=16384)
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--kernel", default="auto")
    p.add_argument("--shards", type=int, default=1)
    p.add_argument("--comm", default="allgather")
    args = p.parse_args()

    from nbody_tpu.config import SimConfig
    from nbody_tpu.simulation import run
    from nbody_tpu.utils.flops import pairs_per_step

    cfg = SimConfig(
        n=args.n, nsteps=args.steps, kernel=args.kernel,
        shards=args.shards, comm=args.comm,
    )
    result = run(cfg, quiet=True)

    value = result.av
    block_secs = [b for (_, _, _, b, _) in result.samples[2:]]
    pair_rate = (
        pairs_per_step(args.n) * 50 * len(block_secs) / sum(block_secs)
        if block_secs else float("nan")
    )
    print(
        json.dumps(
            {
                "metric": "sustained GFLOP/s (reference flop model, N=%d)"
                % args.n,
                "value": round(value, 2),
                "unit": "GFLOP/s",
                "vs_baseline": round(value / REFERENCE_GFLOPS, 2),
                "pair_interactions_per_sec": f"{pair_rate:.4g}",
                "config": {
                    "n": args.n,
                    "nsteps": args.steps,
                    "kernel": args.kernel,
                    "shards": args.shards,
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
