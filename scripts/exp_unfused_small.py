#!/usr/bin/env python
"""Difference-time the UNFUSED block (auto kernel) at small N.
Run: python scripts/exp_unfused_small.py [N ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main(sizes):
    from nbody_tpu.__main__ import _enable_compilation_cache
    from nbody_tpu.init import make_state
    from nbody_tpu.models.gravity import make_accel_fn, make_block_fn

    _enable_compilation_cache()
    for n in sizes:
        state = make_state(n, pad_multiple=512)
        np_ = state.n_padded
        accel = make_accel_fn("auto")

        def timed(steps):
            blk = make_block_fn(accel, 0.1, steps)
            _, ke = blk(state)
            float(ke)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                _, ke = blk(state)
                float(ke)
                best = min(best, time.perf_counter() - t0)
            return best

        L = max(50, int(2e9 // (np_ * np_)))
        t1, t2 = timed(L), timed(2 * L)
        per_step = max(t2 - t1, 1e-9) / L
        rate = np_ * np_ / per_step / 1e9
        print(
            f"N={n} (padded {np_}) unfused-auto: {per_step*1e6:.1f} us/step"
            f" = {rate:.1f} Gpairs/s model",
            flush=True,
        )


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [2000, 4096, 8192])
