#!/usr/bin/env python
"""Round-5 experiment (VERDICT r4 'make bf16 earn its keep or demote
it'): can 2x-lane-packed bf16 pair arithmetic beat the fp32
pair-symmetric kernel?

Two measurements:

1. VPU dtype throughput probe — the same loop-carried elementwise op
   chain (mul+add / rsqrt ladders, scripts/roofline.py pattern) run in
   fp32 AND bf16 over identical logical element counts.  bf16 pair
   arithmetic can only win if the VPU issues ~2x bf16 elements per
   cycle (two 16-bit values per 32-bit lane).  If the measured bf16
   rate is ~= fp32 (elements/s), the packing premise is dead on this
   chip for this op mix — especially since rsqrt (the pair kernel's
   anchor op) has no bf16 variant and must round-trip through f32
   anyway.

2. An in-kernel A/B — a copy of the pair-symmetric sweep with dx/dy/dz,
   d2, w and the p products held in bf16 (f32 rsqrt + f32 reductions,
   the only viable split) vs the production fp32 kernel, pairs/s at
   N=131072/262144.

Run: python scripts/exp_bf16_pack.py [--sizes 131072,262144] [--cpu]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from nbody_tpu.ops.pallas_kernel import pack_particles  # noqa: E402
from nbody_tpu.types import SOFTENING_SQUARED  # noqa: E402


def _diff_time(run, loops):
    t1, t2 = run(loops), run(2 * loops)
    return max(t2 - t1, 1e-9) / loops


def measure_dtype_ceiling(op: str, dtype, reps: int = 3,
                          interpret: bool = False):
    """Elements/s of a loop-carried elementwise `op` chain in `dtype`
    on a VMEM-resident (512, 2048) tile (the roofline.py probe,
    dtype-parameterized)."""
    shape = (512, 2048)
    elems = shape[0] * shape[1]
    f32 = jnp.float32

    def kernel(x_ref, o_ref, *, iters):
        x = x_ref[...]

        def body(_, acc):
            if op == "fma":
                return acc * x + x
            # rsqrt has no bf16 HW path: f32 round-trip is the honest
            # cost a bf16 pair kernel would pay.
            if acc.dtype == jnp.bfloat16:
                return lax.rsqrt(acc.astype(f32)).astype(jnp.bfloat16) + x
            return lax.rsqrt(acc) + x

        o_ref[...] = lax.fori_loop(0, iters, body, x)

    def run_iters(iters):
        f = jax.jit(
            lambda x: pl.pallas_call(
                functools.partial(kernel, iters=iters),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(shape, dtype),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=64 * 1024 * 1024,
                ),
                interpret=interpret,
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

    x = jnp.full(shape, 0.5, dtype)
    sec_per_iter = _diff_time(run_iters, 20 if interpret else 2000)
    return elems / sec_per_iter


def _sym_kernel_bf16(ps_rows, out_ref, itile_s, *, block, nblocks):
    """The pair-symmetric sweep with every PAIR-TERM intermediate in
    bf16 (the 2x-packing candidate): dx/dy/dz, d2, u^3 scaling and the
    p products are bf16; rsqrt and both reductions stay f32 (rsqrt has
    no bf16 path; bf16 accumulation would destroy the sums).  Values
    are NOT production-accurate (bf16 d2 loses ~3 decimal digits) —
    this kernel exists to measure the RATE ceiling of the packed mix.
    Structure mirrors ops/pallas_sym.py (unroll2)."""
    f32, bf = jnp.float32, jnp.bfloat16
    eps2 = bf(SOFTENING_SQUARED)
    B = block

    out_ref[...] = jnp.zeros_like(out_ref)

    def it_body(it, _):
        i0 = it * B
        itile_s[...] = jnp.transpose(ps_rows[:, pl.ds(i0, B)])
        xi = itile_s[:, 0:1].astype(bf)
        yi = itile_s[:, 1:2].astype(bf)
        zi = itile_s[:, 2:3].astype(bf)
        gmi = itile_s[:, 3:4].astype(bf)

        def pair_terms(j0):
            xj = ps_rows[0:1, pl.ds(j0, B)].astype(bf)
            yj = ps_rows[1:2, pl.ds(j0, B)].astype(bf)
            zj = ps_rows[2:3, pl.ds(j0, B)].astype(bf)
            gmj = ps_rows[3:4, pl.ds(j0, B)].astype(bf)
            dx = xj - xi  # (B, B) bf16
            dy = yj - yi
            dz = zj - zi
            d2 = dx * dx + dy * dy + dz * dz + eps2
            inv = lax.rsqrt(d2.astype(f32))  # f32 transcendental
            u = (inv * inv * inv).astype(bf)
            w = (gmi * gmj) * u
            return w * dx, w * dy, w * dz

        def red_lanes(p):  # f32 accumulate
            return jnp.sum(p.astype(f32), axis=1, keepdims=True)

        def red_subl(p):
            return jnp.sum(p.astype(f32), axis=0, keepdims=True)

        px, py, pz = pair_terms(i0)
        ax, ay, az = red_lanes(px), red_lanes(py), red_lanes(pz)

        def jt_body(jt, acc):
            ax, ay, az = acc
            j0 = jt * B
            px, py, pz = pair_terms(j0)
            ax += red_lanes(px)
            ay += red_lanes(py)
            az += red_lanes(pz)
            js = pl.ds(j0, B)
            out_ref[0:1, js] -= red_subl(px)
            out_ref[1:2, js] -= red_subl(py)
            out_ref[2:3, js] -= red_subl(pz)
            return (ax, ay, az)

        nfull = (nblocks - it - 1) // 2

        def jt_two(k, acc):
            j = it + 1 + 2 * k
            return jt_body(j + 1, jt_body(j, acc))

        acc = lax.fori_loop(0, nfull, jt_two, (ax, ay, az))
        ax, ay, az = lax.fori_loop(it + 1 + 2 * nfull, nblocks, jt_body,
                                   acc)
        isl = pl.ds(i0, B)
        out_ref[0:1, isl] += jnp.transpose(ax)
        out_ref[1:2, isl] += jnp.transpose(ay)
        out_ref[2:3, isl] += jnp.transpose(az)
        return _

    lax.fori_loop(0, nblocks, it_body, 0)
    gm = ps_rows[3:4, :]
    safe = jnp.where(gm > f32(0), gm, f32(1))
    out_ref[0:3, :] = jnp.where(gm > f32(0), out_ref[0:3, :] / safe,
                                f32(0))


def bf16_pack_accelerations(pos, mass, block=1024, interpret=False):
    n = pos.shape[1]
    ps_rows = pack_particles(pos, mass)
    out = pl.pallas_call(
        functools.partial(_sym_kernel_bf16, block=block,
                          nblocks=n // block),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block, 8), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=14 * n * n, bytes_accessed=n * 64,
            transcendentals=n * n // 2,
        ),
        interpret=interpret,
    )(ps_rows)
    return out[0:3, :]


def measure_pairs(fn, n, loops, reps=3):
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.random((3, n)), jnp.float32)
    mass = jnp.asarray(rng.random(n), jnp.float32)

    def body(_, p):
        return p + np.float32(1e-30) * fn(p, mass)

    def run(k):
        f = jax.jit(lambda p: lax.fori_loop(0, k, body, p))
        out = f(pos)
        float(out[0, 0])
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f(pos)
            float(out[0, 0])
            best = min(best, time.perf_counter() - t0)
        return best

    return n * n / _diff_time(run, loops)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", default="131072,262144")
    p.add_argument("--trials", type=int, default=3)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        from nbody_tpu.utils.platform import force_cpu

        force_cpu(1)
    from nbody_tpu.__main__ import _enable_compilation_cache

    _enable_compilation_cache()
    from nbody_tpu.ops import pallas_sym

    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {dev.device_kind}")
    interp = dev.platform != "tpu"

    # sanity: the bf16 kernel's values are bf16-grade but finite/close
    rng = np.random.default_rng(1)
    pos = jnp.asarray(rng.random((3, 2048)), jnp.float32)
    mass = jnp.asarray(rng.random(2048), jnp.float32)
    a_bf = np.asarray(bf16_pack_accelerations(pos, mass, block=256,
                                              interpret=interp))
    a_f32 = np.asarray(pallas_sym.accelerations(pos, mass, block=256,
                                                interpret=interp))
    err = np.linalg.norm(a_bf - a_f32) / np.linalg.norm(a_f32)
    print(f"# bf16-pack kernel rel-L2 vs f32: {err:.2e} "
          "(bf16-grade expected; rate is the question)")

    print("\n# 1) VPU dtype throughput probe (elements/s)")
    for op in ("fma", "rsqrt"):
        r32 = measure_dtype_ceiling(op, jnp.float32, interpret=interp)
        rbf = measure_dtype_ceiling(op, jnp.bfloat16, interpret=interp)
        print(f"  {op:>6}: f32 {r32/1e12:6.2f} Telem/s   "
              f"bf16 {rbf/1e12:6.2f} Telem/s   ratio {rbf/r32:4.2f}x",
              flush=True)

    print("\n# 2) pair-kernel A/B (pairs/s)")
    for n in (int(s) for s in args.sizes.split(",")):
        loops = max(1, (131072 * 131072 * 3) // (n * n))
        for name, fn in (
            ("f32-sym", functools.partial(pallas_sym.accelerations,
                                          interpret=interp)),
            ("bf16-pack", functools.partial(bf16_pack_accelerations,
                                            interpret=interp)),
        ):
            rates = [measure_pairs(fn, n, loops)
                     for _ in range(args.trials)]
            med = float(np.median(rates))
            spread = (max(rates) - min(rates)) / med * 100
            print(f"  N={n:7d} {name:>9}: {med/1e9:7.1f} Gpairs/s "
                  f"(spread {spread:4.1f}%)", flush=True)


if __name__ == "__main__":
    main()
