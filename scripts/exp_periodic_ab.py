#!/usr/bin/env python
"""Round-5: the periodic-P3M performance question (VERDICT r4 item 2).

Round 4 measured periodic p3m at N=1M 2.6x SLOWER than open p3m
(1066 vs 411 ms/step) against its own cost model (ng^3 FFTs vs
(2ng)^3, "no per-step kernel transforms").  Root cause found by
inspection: the periodic dispatch in accelerations_between returned
BEFORE the mesh_env handling, so the frozen env was silently ignored
and _periodic_p3m_spectra (3 ng^3 fftns + ng^3 min-image kernel
sampling + phi spectrum) re-ran EVERY step.  Round 5 wires the env
through (_make_periodic_env); this script measures the before/after
and the remaining open-vs-periodic split:

  row 1: open p3m, frozen env        (the round-4 reference point)
  row 2: periodic p3m, NO env        (the round-4 broken behavior)
  row 3: periodic p3m, frozen env    (round-5 production)
  row 4: periodic plain pm, frozen env vs no env (same fix, smaller)

Run: python scripts/exp_periodic_ab.py [--n 1048576] [--steps 4] [--cpu]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _per_step(make_blk, state, steps):
    def run(k):
        b = make_blk(k)
        out, ke = b(state)
        float(ke)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out, ke = b(state)
            float(ke)
            best = min(best, time.perf_counter() - t0)
        return best

    half = max(1, steps // 2)
    return max(run(2 * half) - run(half), 1e-9) / half


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1048576)
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        from nbody_tpu.utils.platform import force_cpu

        force_cpu(1)
    import jax

    from nbody_tpu.__main__ import _enable_compilation_cache

    _enable_compilation_cache()
    from nbody_tpu.init import make_state
    from nbody_tpu.models.gravity import make_accel_fn, make_block_fn
    from nbody_tpu.ops import pm

    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {dev.device_kind}; N={args.n}")
    # The reference's U(0,1)^3 ICs boxed at L=1 (the bench.py periodic
    # row's configuration).
    state = make_state(args.n, pad_multiple=1024,
                       distribution="reference", seed=42)
    cutoff = pm.DEFAULT_CUTOFF_CELLS

    plan_open = pm.suggest_sr_plan(state.pos, state.mass)
    plan_per = pm.suggest_sr_plan(state.pos, state.mass,
                                  boundary="periodic", box_size=1.0)
    print(f"# open plan: {plan_open}\n# periodic plan: {plan_per}",
          flush=True)

    per_kw = dict(boundary="periodic", box_size=1.0)
    rows = (
        ("open p3m + env", make_accel_fn("p3m", **plan_open),
         lambda p_, m_: pm.make_mesh_env(p_, m_, cutoff_cells=cutoff)),
        ("periodic p3m no-env", make_accel_fn("p3m", **plan_per,
                                              **per_kw), None),
        ("periodic p3m + env", make_accel_fn("p3m", **plan_per,
                                             **per_kw),
         lambda p_, m_: pm.make_mesh_env(p_, m_, cutoff_cells=cutoff,
                                         **per_kw)),
        ("periodic pm no-env", make_accel_fn("pm", **per_kw), None),
        ("periodic pm + env", make_accel_fn("pm", **per_kw),
         lambda p_, m_: pm.make_mesh_env(p_, m_, **per_kw)),
        ("open pm + env", make_accel_fn("pm"),
         lambda p_, m_: pm.make_mesh_env(p_, m_)),
    )
    for name, fn, env_fn in rows:
        t = _per_step(lambda k: make_block_fn(fn, 0.1, k, env_fn=env_fn),
                      state, args.steps)
        print(f"{name:>22}: {t*1e3:9.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
