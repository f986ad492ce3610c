#!/usr/bin/env python
"""Hardware roofline evidence for the force kernels (docs/DESIGN.md).

Measures, on the attached TPU chip:

1. the empirical VPU fp32 elementwise ceiling — a VMEM-resident Pallas
   kernel chaining multiply-adds over a (512, 2048) tile (pure VPU work,
   zero memory traffic after load; element-level parallelism keeps the
   pipeline full, so this is a throughput measurement, not latency);
2. the rsqrt throughput the same way (the kernel's one transcendental);
3. the production pair-kernel rates (streaming + pair-symmetric), with
   repeat spread;
4. derived utilization: kernel VPU-ops/s vs the measured ceiling, plus
   the implied per-pair op budget check.

All timings are in-loop difference-method (see docs/DESIGN.md
methodology).  Run: python scripts/roofline.py [--quick]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _diff_time(run, loops):
    t1, t2 = run(loops), run(2 * loops)
    return max(t2 - t1, 1e-9) / loops


def measure_vpu_ceiling(op: str, reps: int = 3):
    """Seconds per (512,2048)-tile op chain iteration; returns ops/s for
    fp32 elementwise `op` ('fma' = mul+add counted as 2 flops,
    'rsqrt' = one transcendental)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    shape = (512, 2048)
    elems = shape[0] * shape[1]

    def kernel(x_ref, o_ref, *, iters):
        x = x_ref[...]

        def body(_, acc):
            if op == "fma":
                return acc * x + x
            return lax.rsqrt(acc) + x  # rsqrt + add per element

        o_ref[...] = lax.fori_loop(0, iters, body, x)

    def run_iters(iters):
        f = jax.jit(
            lambda x: pl.pallas_call(
                functools.partial(kernel, iters=iters),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=64 * 1024 * 1024,
                ),
            )(x)
        )
        out = f(x)
        float(out[0, 0])
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f(x)
            float(out[0, 0])
            best = min(best, time.perf_counter() - t0)
        return best

    x = jax.numpy.full(shape, 0.5, jax.numpy.float32)
    base = 2000
    sec_per_iter = _diff_time(run_iters, base)
    per_elem_ops = 2 if op == "fma" else 1  # fma = mul+add
    return elems * per_elem_ops / sec_per_iter


def measure_kernel(kind: str, n: int, loops: int, reps: int = 3, **opts):
    import jax

    from nbody_tpu.ops import pallas_kernel, pallas_sym

    fn = {
        "pallas": pallas_kernel.accelerations,
        "sym": functools.partial(pallas_sym.accelerations, fold_mass=False),
        "sym-fold": pallas_sym.accelerations,  # fold_mass=True default
    }[kind]

    rng = np.random.default_rng(0)
    pos = jax.numpy.asarray(rng.random((3, n)), jax.numpy.float32)
    mass = jax.numpy.asarray(rng.random(n), jax.numpy.float32)

    def body(_, p):
        return p + np.float32(1e-30) * fn(p, mass, **opts)

    def run(k):
        f = jax.jit(lambda p: jax.lax.fori_loop(0, k, body, p))
        out = f(pos)
        float(out[0, 0])
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f(pos)
            float(out[0, 0])
            best = min(best, time.perf_counter() - t0)
        return best

    return n * n / _diff_time(run, loops)  # pairs/s


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--trials", type=int, default=3,
                   help="independent difference-timing trials (spread)")
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

    # Context probes: synthetic register/loop-carried op chains.  These
    # UNDERSHOOT the true issue ceiling (loop carries round-trip VMEM;
    # dependent chains are latency-bound) — they demonstrate that the
    # production kernels out-issue any naive probe, not the ceiling
    # itself.  docs/DESIGN.md "Roofline evidence" explains the
    # methodology that does establish the ceiling: the two kernels'
    # effective-issue-rate consistency.
    fma_chain = measure_vpu_ceiling("fma")
    rsq_chain = measure_vpu_ceiling("rsqrt")
    print(f"chain probe, fma   : {fma_chain/1e12:.3f} Tops/s "
          "(loop-carried; lower bound only)")
    print(f"chain probe, rsqrt : {rsq_chain/2/1e12:.3f} G rsqrt/s*1e3 "
          "(ditto)")

    # Instruction budgets counted from the kernel bodies (element-ops per
    # pair-interaction; sub/mul/add/fma = 1 slot, rsqrt = R slots):
    #   pallas: 3 deltas + 4 (d2) + 2 (inv^3) + 1 (gm*u) + 3 (w*d)
    #           + 3 reduce-adds               = 16 + 1.0 rsqrt / interaction
    #   sym (per unordered pair = 2 interactions): 3 + 4 + 2 + 3 (u*d)
    #           + 6 (two mass scalings) + 6 (two reductions)
    #                                         = 12 + 0.5 rsqrt / interaction
    #   sym-fold (mass-folded, production default): 3 + 4 + 4 (w) + 3
    #           + 6 (two reductions)          = 10 + 0.5 rsqrt / interaction
    BUDGET = {"pallas": (16.0, 1.0), "sym": (12.0, 0.5),
              "sym-fold": (10.0, 0.5)}

    sizes = [(16384, 30), (131072, 3)] if args.quick else [
        (16384, 30), (65536, 6), (131072, 3), (262144, 2)]
    meas = {}
    for n, loops in sizes:
        for kind, opts in (("pallas", {}), ("sym", dict(block=1024)),
                           ("sym-fold", dict(block=1024))):
            rates = [measure_kernel(kind, n, loops, **opts)
                     for _ in range(args.trials)]
            med = float(np.median(rates))
            spread = (max(rates) - min(rates)) / med * 100
            meas.setdefault(kind, []).append(med)
            print(f"{kind:7s} N={n:7d}: {med/1e9:7.1f} Gpairs/s "
                  f"(spread {spread:4.1f}%)")

    # The roofline argument: solve for the rsqrt slot cost R that makes
    # the pallas/sym pair's effective issue rates equal (same reduction
    # structure share); if both sit on the hardware ceiling, R comes out
    # a plausible small constant and the shared rate IS the measured
    # ceiling.  The mass-folded production kernel is then scored against
    # that ceiling (op-count model uncertainty is ~±1 op ≈ ±8%).
    p = float(np.median(meas["pallas"]))
    s = float(np.median(meas["sym"]))
    (pa, pr), (sa, sr) = BUDGET["pallas"], BUDGET["sym"]
    denom = s * sr - p * pr
    if abs(denom) > 1e-9:
        R = (p * pa - s * sa) / denom
        ceiling = p * (pa + pr * R)
        print(f"\nimplied rsqrt cost R = {R:.2f} slots (plausible if ~1-4); "
              f"shared effective issue rate = {ceiling/1e12:.2f} Tslots/s")
        fa, fr = BUDGET["sym-fold"]
        f = float(np.median(meas["sym-fold"]))
        print(f"  sym-fold (production): {f*(fa + fr*R)/1e12:.2f} Tslots/s "
              f"= {f*(fa + fr*R)/ceiling*100:.0f}% of that ceiling")
        for kind in BUDGET:
            r = np.array(meas[kind])
            print(f"  {kind:8s} rate flatness across N: "
                  f"{(r.max()-r.min())/r.min()*100:.1f}% "
                  "(flat = compute-bound, no HBM knee)")


if __name__ == "__main__":
    main()
