#!/usr/bin/env python
"""Round-3 P3M evidence run (VERDICT r2 item 1 done-criteria):

1. crossover table — exact vs pm vs p3m ms/step + relative force error
   on uniform AND Plummer ICs (the clustered case is where round-2 PM
   kept 0.18 error);
2. collapse stress test — N=65536 cold-sphere, leapfrog, dt=0.001,
   1000 steps: relative total-energy (KE+PE) drift for exact / pm / p3m,
   with wall time.  Round-2 baseline: 4.2e-7 exact vs 4.7e-2 pm; the
   P3M bar is >=10x better than pm.

Run: python scripts/exp_p3m_stress.py [--quick] [--skip-collapse]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

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


def crossover(args):

    from nbody_tpu.init import make_state
    from nbody_tpu.models.gravity import make_accel_fn, make_block_fn
    from nbody_tpu.ops import pm

    if args.sizes:
        sizes = [int(s) for s in args.sizes.split(",")]
    else:
        sizes = [65536] if args.quick else [65536, 262144, 1048576]
    print(f"{'dist':>11} {'N':>8} {'tier':>6} {'ms/step':>9} "
          f"{'vs exact':>9} {'rel err':>9} {'cap':>5}")
    for dist in ("reference", "plummer"):
        for n in sizes:
            state = make_state(n, pad_multiple=1024, distribution=dist,
                               seed=42 if dist == "reference" else 7)
            plan = pm.suggest_sr_plan(state.pos, state.mass)
            cap = plan["capacity"]
            # env_fn mirrors the engine's wiring (simulation._mesh_env_fn):
            # the mesh tiers freeze box+spectra per sample block.
            tiers = {
                "exact": (make_accel_fn("auto"), None),
                "pm": (make_accel_fn("pm"),
                       lambda p, m: pm.make_mesh_env(p, m)),
                "p3m": (make_accel_fn("p3m", **plan),
                        lambda p, m: pm.make_mesh_env(
                            p, m, cutoff_cells=pm.DEFAULT_CUTOFF_CELLS)),
            }
            if args.tiers:
                # e.g. --tiers pm,p3m at N=4M: the exact baseline is
                # ~51 s/step there (16x its 1M time) — measured to
                # minutes of wall for a column we already know.
                tiers = {k: tiers[k] for k in args.tiers.split(",")}
            t_exact = None
            for name, (fn, env_fn) in tiers.items():
                # adaptive step count ~0.5 s of work per timed run
                b = make_block_fn(fn, 0.1, 1, env_fn=env_fn)
                out, ke = b(state)
                float(ke)
                t0 = time.perf_counter()
                out, ke = b(state)
                float(ke)
                t1 = max(time.perf_counter() - t0, 1e-4)
                # >=4 steps and ~2 s of work per timed run: at N=1M the
                # old 0.5 s budget degenerated to 2-step blocks whose
                # 1-step difference read ~30% high vs the 4-step
                # protocol (448 vs 336 ms for the same open-p3m config,
                # p3m_stress_r5.log vs periodic_ab_r5.log).
                steps = max(4, min(500, int(2.0 / t1)))
                t = _per_step(lambda k: make_block_fn(fn, 0.1, k,
                                                      env_fn=env_fn),
                              state, steps)
                if name == "exact":
                    t_exact, err = t, 0.0
                    sp = "1.0x"
                else:
                    sp = (f"{t_exact/t:.1f}x" if t_exact is not None
                          else "-")
                    if n <= 131072:
                        err = float(pm.force_error_vs_exact(
                            state.pos, state.mass,
                            cutoff_cells=(pm.DEFAULT_CUTOFF_CELLS
                                          if name == "p3m" else 0),
                            capacity=cap if name == "p3m" else 0,
                        ))
                    else:
                        err = float("nan")
                print(f"{dist:>11} {n:>8} {name:>6} {t*1e3:>9.2f} "
                      f"{sp:>9} {err:>9.1e} {cap:>5}", flush=True)


def collapse(args):
    import jax

    from nbody_tpu.init import make_state
    from nbody_tpu.models.gravity import (
        kinetic_energy,
        make_accel_fn,
        make_block_fn,
        potential_energy,
    )
    from nbody_tpu.ops import pm

    n = 16384 if args.quick else 65536
    steps = 200 if args.quick else 1000
    state0 = make_state(n, pad_multiple=1024, distribution="cold_sphere",
                        seed=5)
    pe_fn = jax.jit(potential_energy)
    e0 = float(kinetic_energy(state0)) + float(pe_fn(state0))
    plan = pm.suggest_sr_plan(state0.pos, state0.mass)
    # collapse concentrates mass hard; give the static plan the same
    # growth headroom the engine's per-block re-suggestion would.
    plan = {k: (v * 4 if k != "capacity" else v) for k, v in plan.items()}
    print(f"\ncollapse: N={n}, leapfrog dt=0.001, {steps} steps, "
          f"E0={e0:.6e}, p3m plan={plan}")
    sub = 100  # sub-blocks keep each executable under the ~1 min watchdog
    for name, fn, env_fn in (
        ("exact", make_accel_fn("auto"), None),
        ("pm", make_accel_fn("pm"),
         lambda p, m: pm.make_mesh_env(p, m)),
        ("p3m", make_accel_fn("p3m", **plan),
         lambda p, m: pm.make_mesh_env(
             p, m, cutoff_cells=pm.DEFAULT_CUTOFF_CELLS)),
    ):
        blk = make_block_fn(fn, 0.001, sub, integrator="leapfrog",
                            env_fn=env_fn)
        out, ke = blk(state0)  # warm-up (state0 immutable)
        float(ke)
        t0 = time.perf_counter()
        out = state0
        for _ in range(steps // sub):
            out, ke = blk(out)
        float(ke)
        dt_wall = time.perf_counter() - t0
        e1 = float(kinetic_energy(out)) + float(pe_fn(out))
        print(f"  {name:>6}: |dE/E0| = {abs(e1-e0)/abs(e0):.2e}   "
              f"wall {dt_wall:.1f}s", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--sizes", default="",
                   help="comma list of N overriding the default ladder")
    p.add_argument("--tiers", default="",
                   help="comma subset of exact,pm,p3m (default: all)")
    p.add_argument("--skip-collapse", action="store_true")
    p.add_argument("--skip-crossover", action="store_true")
    p.add_argument("--cpu", action="store_true",
                   help="rehearse on the host backend (no tunnel)")
    args = p.parse_args()
    if args.cpu:
        from nbody_tpu.utils.platform import force_cpu

        force_cpu(1)
    import jax

    from nbody_tpu.__main__ import _enable_compilation_cache

    _enable_compilation_cache()  # remote compiles are 1-300 s; reuse them

    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {dev.device_kind}")
    if not args.skip_crossover:
        crossover(args)
    if not args.skip_collapse:
        collapse(args)


if __name__ == "__main__":
    main()
