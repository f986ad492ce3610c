#!/usr/bin/env python
"""A/B the P3M short-range sweep implementations on hardware.

Measures, per (distribution, N):
1. the ISOLATED sweep — XLA-composed `_sr_sweep` vs the Pallas
   CSR-worklist kernel `_sr_sweep_pallas` (same packed tables, same
   worklist), in-jit repeat loops + difference timing (tunnel fetches
   cost ~38 ms flat, see docs/DESIGN.md methodology);
2. the FULL p3m solve with each sweep (pm.SR_SWEEP_IMPL knob);
3. a SLAB=128 probe: (64,64) pair blocks are lane-padded 64->128 on the
   VPU (half the lanes idle); SLAB=128 fills them at the cost of 4x
   coarser worklist entries (more beyond-cutoff zero-taper pairs).

Run: python scripts/exp_sr_pallas.py [--quick] [--sizes N1,N2] [--skip-slab]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _pack(pos, mass, ng, cutoff, symmetric=False, paired=False):
    """Short-range packing via the solver's own recipe
    (pm.sr_pack_inputs), sized by the measured plan."""
    import jax

    from nbody_tpu.ops import pm

    if pm.SLAB == 64:
        # This script A/Bs several (symmetric, paired) layouts under
        # ONE plan — size for the full worklist so none starve.
        plan = pm.suggest_sr_plan(pos, mass, ng, cutoff, layout="full")
    else:
        # suggest_sr_plan's jitted counts cache does not key on the
        # monkeypatched pm.SLAB — build a FRESH jit so the SLAB=128
        # probe gets correctly sized (not 2x/4x oversized) tables.
        cap0 = pm.suggest_capacity(pos, mass, ng, cutoff)
        counts = jax.jit(pm._sr_plan_counts.__wrapped__,
                         static_argnums=(2, 3, 4, 5, 6))
        s_c, e4_c, _ = counts(pos, mass, ng, cutoff, cap0)

        def pow2(x):
            v = 64
            while v < x:
                v *= 2
            return v

        plan = {"capacity": cap0, "sr_slabs": pow2(int(s_c) * 1.5),
                "sr_entries": pow2(int(e4_c[0]) * 1.5)}
    pk = pm.sr_pack_inputs(pos, mass, grid=ng, cutoff_cells=cutoff,
                           symmetric=symmetric, paired=paired, **plan)
    pk["e_lim"] = int(pk["n_e"])
    pk["plan"] = plan
    return pk


def _time_loop(make_run, base_reps):
    """min-of-3 difference timing of a jitted k-repeat loop."""
    def t(k):
        run = make_run(k)
        float(run())  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run())
            best = min(best, time.perf_counter() - t0)
        return best

    L = max(1, base_reps)
    return max(t(2 * L) - t(L), 1e-9) / L


def _interp():
    import jax

    return jax.default_backend() != "tpu"


def time_isolated(pk, impl, base_reps, symmetric=False,
                  flush_runs=True, paired=False):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from nbody_tpu.ops import pm

    def make_run(k):
        if impl == "pallas":
            def one(p):
                return pm._sr_sweep_pallas(p, pk["mtab"], pk["wl_t"],
                                           pk["wl_s"], (0, pk["e_lim"]),
                                           pk["rc2"], interpret=_interp(),
                                           symmetric=symmetric,
                                           flush_runs=flush_runs,
                                           paired=paired)
        else:
            def one(p):
                return pm._sr_sweep(p, pk["mtab"], pk["wl_t"], pk["wl_s"],
                                    pk["n_e"], pk["rc2"])

        @jax.jit
        def run():
            def body(i, carry):
                atab = one(pk["ptab"] + carry * 0)  # keep the data dep
                return atab[0, 0]

            return lax.fori_loop(0, k, body, jnp.float32(0))

        return run

    return _time_loop(make_run, base_reps)


def time_full(pos, mass, ng, plan, impl, base_reps, paired=False):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from nbody_tpu.ops import pm

    pm.SR_SWEEP_IMPL = impl
    pm.SR_PAIRED_ROWS = paired
    try:
        def make_run(k):
            @jax.jit
            def run():
                def body(i, carry):
                    a = pm.accelerations(pos + carry * 0, mass, grid=ng,
                                         cutoff_cells=pm.DEFAULT_CUTOFF_CELLS,
                                         **plan)
                    return a[0, 0]

                return lax.fori_loop(0, k, body, jnp.float32(0))

            return run

        return _time_loop(make_run, base_reps)
    finally:
        pm.SR_SWEEP_IMPL = "auto"
        pm.SR_PAIRED_ROWS = False


def sweep_correct(pk):
    import jax
    import jax.numpy as jnp

    from nbody_tpu.ops import pm

    # On-device scalar comparison: fetching two full slot tables is
    # ~25 MB each at N=1M — minutes-slow over the tunnel (CLAUDE.md).
    @jax.jit
    def agree():
        a_x = pm._sr_sweep(pk["ptab"], pk["mtab"], pk["wl_t"],
                           pk["wl_s"], pk["n_e"], pk["rc2"])
        a_p = pm._sr_sweep_pallas(pk["ptab"], pk["mtab"],
                                  pk["wl_t"], pk["wl_s"],
                                  (0, pk["e_lim"]), pk["rc2"],
                                  interpret=_interp())
        return (jnp.abs(a_p - a_x).max()
                / jnp.maximum(jnp.abs(a_x).max(), 1e-30))

    return float(agree())


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--sizes", default="")
    p.add_argument("--ng", type=int, default=128)
    p.add_argument("--skip-slab", action="store_true")
    p.add_argument("--skip-full", action="store_true")
    p.add_argument("--cpu", action="store_true",
                   help="rehearse on the host backend (no tunnel)")
    args = p.parse_args()
    if args.cpu:
        from nbody_tpu.utils.platform import force_cpu

        force_cpu(1)
    import jax

    from nbody_tpu.__main__ import _enable_compilation_cache

    _enable_compilation_cache()  # remote compiles are 1-300 s; reuse them
    from nbody_tpu.init import make_state
    from nbody_tpu.ops import pm

    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {dev.device_kind}")
    if args.sizes:
        sizes = [int(s) for s in args.sizes.split(",")]
    else:
        sizes = [65536] if args.quick else [65536, 262144, 1048576]
    cutoff = pm.DEFAULT_CUTOFF_CELLS

    print(f"{'dist':>10} {'N':>8} {'what':>17} {'ms':>9}  note")
    for dist in ("reference", "plummer"):
        for n in sizes:
            state = make_state(n, pad_multiple=1024, distribution=dist,
                               seed=42 if dist == "reference" else 7)
            pk = _pack(state.pos, state.mass, args.ng, cutoff)
            err = sweep_correct(pk)
            e_meas = int(pk["n_e"])
            gp = e_meas * pm.SLAB * pm.SLAB  # pairs per sweep
            reps = 2 if args.quick else 4
            for impl in ("xla", "pallas"):
                t = time_isolated(pk, impl, reps)
                print(f"{dist:>10} {n:>8} {'sweep/'+impl:>17} "
                      f"{t*1e3:>9.2f}  {gp/t/1e9:.1f} Gpairs/s"
                      + (f", agree {err:.1e}" if impl == "pallas" else ""),
                      flush=True)
            if not args.skip_full:
                for impl in ("xla", "pallas"):
                    t = time_full(state.pos, state.mass, args.ng,
                                  pk["plan"], impl, reps)
                    print(f"{dist:>10} {n:>8} {'p3m/'+impl:>17} "
                          f"{t*1e3:>9.2f}", flush=True)
            t = time_isolated(pk, "pallas", reps, flush_runs=False)
            print(f"{dist:>10} {n:>8} {'sweep/pl-noflu':>17} "
                  f"{t*1e3:>9.2f}  {gp/t/1e9:.1f} Gpairs/s", flush=True)
            # Pair-symmetric worklist (s >= t) + per-entry reaction.
            pks = _pack(state.pos, state.mass, args.ng, cutoff,
                        symmetric=True)
            t = time_isolated(pks, "pallas", reps, symmetric=True)
            gps = int(pks["n_e"]) * pm.SLAB * pm.SLAB
            print(f"{dist:>10} {n:>8} {'sweep/pl-sym':>17} "
                  f"{t*1e3:>9.2f}  {gps/t/1e9:.1f} Gpairs/s "
                  f"(entries {int(pks['n_e'])} vs {e_meas})", flush=True)
            # Paired rows: two slabs per 128-lane row — full lane
            # utilization, half the table VMEM, ~half the entries.
            pkp = _pack(state.pos, state.mass, args.ng, cutoff,
                        paired=True)
            t = time_isolated(pkp, "pallas", reps, paired=True)
            gpp = int(pkp["n_e"]) * pm.SLAB * (2 * pm.SLAB)
            print(f"{dist:>10} {n:>8} {'sweep/pl-paired':>17} "
                  f"{t*1e3:>9.2f}  {gpp/t/1e9:.1f} Gpairs/s "
                  f"(entries {int(pkp['n_e'])} vs {e_meas})", flush=True)
            # Paired + symmetric: ~27% of the plain entries at full
            # lane fill, per-lane slab masks + per-entry reaction.
            pkb = _pack(state.pos, state.mass, args.ng, cutoff,
                        symmetric=True, paired=True)
            t = time_isolated(pkb, "pallas", reps, symmetric=True,
                              paired=True)
            gpb = int(pkb["n_e"]) * pm.SLAB * (2 * pm.SLAB)
            print(f"{dist:>10} {n:>8} {'sweep/pl-pair-sym':>17} "
                  f"{t*1e3:>9.2f}  {gpb/t/1e9:.1f} Gpairs/s "
                  f"(entries {int(pkb['n_e'])} vs {e_meas})", flush=True)
            if not args.skip_full:
                t = time_full(state.pos, state.mass, args.ng,
                              pk["plan"], "pallas", reps, paired=True)
                print(f"{dist:>10} {n:>8} {'p3m/pl-paired':>17} "
                      f"{t*1e3:>9.2f}", flush=True)
            if not args.skip_slab:
                old = pm.SLAB
                try:
                    pm.SLAB = 128
                    pk2 = _pack(state.pos, state.mass, args.ng, cutoff)
                    gp2 = int(pk2["n_e"]) * pm.SLAB * pm.SLAB
                    t = time_isolated(pk2, "pallas", reps)
                    print(f"{dist:>10} {n:>8} {'sweep/pl-128':>17} "
                          f"{t*1e3:>9.2f}  {gp2/t/1e9:.1f} Gpairs/s "
                          f"(entries {int(pk2['n_e'])} vs {e_meas})",
                          flush=True)
                finally:
                    pm.SLAB = old


if __name__ == "__main__":
    main()
