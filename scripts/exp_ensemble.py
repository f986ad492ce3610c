#!/usr/bin/env python
"""Hardware A/B of the ensemble tier (round-3 VERDICT item 8): E
independent small systems advanced as ONE vmap'd sample block vs E
sequential single-run blocks.

The claim being measured: at small N the per-run cost is dominated by
dispatch + the ~38 ms tunnel fetch constant, so batching E runs into
one executable amortizes it E-fold (models/ensemble.py).  The
sequential arm reuses ONE compiled block across members (best case for
the baseline — recompiling per member would only flatter the ensemble).

Run: python scripts/exp_ensemble.py [--e 64] [--n 2048] [--steps 50]
     [--kernel pallas_sym] [--cpu]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--e", type=int, default=64)
    p.add_argument("--n", type=int, default=2048)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--kernel", default="pallas_sym")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        from nbody_tpu.utils.platform import force_cpu

        force_cpu(1)
    import jax

    from nbody_tpu.__main__ import _enable_compilation_cache

    _enable_compilation_cache()
    from nbody_tpu.init import make_state
    from nbody_tpu.models.ensemble import make_ensemble_block_fn, stack_states
    from nbody_tpu.models.gravity import make_accel_fn, make_block_fn

    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {dev.device_kind}; "
          f"E={args.e} N={args.n} steps={args.steps} kernel={args.kernel}")
    states = [make_state(args.n, pad_multiple=512, seed=100 + i)
              for i in range(args.e)]
    batch = stack_states(states)

    def time_best3(fn):
        fn()  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    eblk = make_ensemble_block_fn(make_accel_fn(args.kernel), 0.1,
                                  args.steps)

    def run_ensemble():
        out, ke = eblk(batch)
        float(ke[0])  # ONE fetch syncs the whole batch

    sblk = make_block_fn(make_accel_fn(args.kernel), 0.1, args.steps)

    def run_sequential():
        kes = [sblk(s)[1] for s in states]
        float(kes[-1])  # same sync discipline: fetch after the last

    t_e = time_best3(run_ensemble)
    t_s = time_best3(run_sequential)
    print(f"ensemble (1 vmap'd block) : {t_e*1e3:9.1f} ms")
    print(f"sequential (E blocks)     : {t_s*1e3:9.1f} ms")
    print(f"speedup                   : {t_s/t_e:9.2f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
