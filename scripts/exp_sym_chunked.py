#!/usr/bin/env python
"""Measure the pair-symmetric host-chunked sweep (huge-N regime) vs the
streaming chunked sweep on the attached chip.

Run: python scripts/exp_sym_chunked.py [N ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def timed_block(blk, state, reps=2):
    out, ke = blk(state)
    t0 = time.perf_counter()
    float(ke)  # warm compile + run
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out, ke = blk(state)
        float(ke)
        best = min(best, time.perf_counter() - t0)
    return best


def sweep_rate(n, per, block):
    """Difference-time the sym chunked sweep itself (per/block choice)."""
    import jax
    import jax.numpy as jnp

    from nbody_tpu.init import make_state
    from nbody_tpu.models.gravity import _make_sym_chunked_sweep

    state = make_state(n, pad_multiple=512)
    sweep = _make_sym_chunked_sweep(state.n_padded, per, interpret=False,
                                    block=block)

    def run(loops):
        pos = state.pos
        for _ in range(loops):
            acc = sweep(pos, state.mass)
            pos = pos + jnp.float32(1e-12) * acc
        t0 = time.perf_counter()
        float(pos[0, 0])
        return time.perf_counter() - t0

    run(1)  # compile
    t1, t2 = run(1), run(2)
    per_step = max(t2 - t1, 1e-9)
    return n * n / per_step / 1e9, per_step


def main(sizes):
    from nbody_tpu.__main__ import _enable_compilation_cache
    from nbody_tpu.init import make_state
    from nbody_tpu.models.gravity import _sym_chunking

    _enable_compilation_cache()
    for n in sizes:
        state = make_state(n, pad_multiple=512)
        auto = _sym_chunking(state.n_padded, 1 << 40)
        auto_per, auto_block = auto if auto else (None, None)
        print(f"N={n}: auto per={auto_per} block={auto_block}", flush=True)
        for per, block in ((524288, 1024), (262144, 1024), (524288, 512)):
            if state.n_padded % per:
                continue
            try:
                rate, per_step = sweep_rate(n, per, block)
            except Exception as e:
                print(f"N={n} per={per} b={block}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)
                continue
            print(
                f"N={n} per={per} b={block}: {per_step:.2f} s/step = "
                f"{rate:.1f} Gpairs/s (model N^2)",
                flush=True,
            )


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [2097152])
