#!/usr/bin/env python
"""Round-3 experiment: attack the last ~1.3x of pair-symmetric kernel
headroom (VERDICT r2 item 4).

The production kernel (ops/pallas_sym.py) sustains ~68% of the implied
issue ceiling; the named costs are the per-j-tile i-side LANE reduction
and loop bookkeeping.  A lane reduction of a (B,B) block costs ~1.75
slots/element on the VPU (7 cross-register adds + 7 intra-register
shuffle-adds per (8,1024) row-group of 8192 elements -> 14/8), while a
plain elementwise add costs 1.0.  Variants measured here:

* base      — production kernel (fold_mass), block=1024
* acc       — defer the i-side reduction: carry a (B,B) elementwise
              accumulator per i-row (1.0/elem) and lane-reduce ONCE at
              the end of the row (1.75/elem amortized over the row
              length), instead of reducing every j-tile
* jbatch2   — process two adjacent j-tiles per loop iteration as one
              (B,2B) block: halves fori_loop bookkeeping, one (1,2B)
              j-side RMW instead of two
* acc+jb2   — both

Run: python scripts/exp_sym_headroom.py [--sizes 65536,131072]
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

from nbody_tpu.types import SOFTENING_SQUARED  # noqa: E402
from nbody_tpu.ops.pallas_kernel import pack_particles  # noqa: E402


def _kernel(ps_rows, out_ref, itile_s, *scratch, block, nblocks, variant):
    f32 = jnp.float32
    eps2 = f32(SOFTENING_SQUARED)
    B = block
    defer = variant in ("acc", "acc+jb2")
    jb2 = variant in ("jbatch2", "acc+jb2")
    accs = variant == "accs"  # scratch-resident deferred i-side
    jstack = variant == "jstack"  # single (8,B) j-side RMW
    unroll = {"unroll2": 2, "unroll4": 4}.get(variant, 1)
    rsqrt6 = variant == "rsqrt6"  # u = rsqrt(d2^3): squarings overlap
    # the previous tile's rsqrt instead of serializing after it
    # pipe2: 2-tile SOFTWARE pipeline — both tiles' pair terms are
    # produced before either tile's reductions run, widening the
    # independent-op window past unroll2's jt_one;jt_one order (the
    # reduction ORDER is unchanged, so sums stay bit-identical).
    pipe2 = variant == "pipe2"
    # dbuf: double-buffered i-tile relayout (ROADMAP "per-i-tile
    # relayout elimination") — tile it+1's (8,B)->(B,8) transpose is
    # issued right after tile it's diagonal block, independent of the
    # j sweep, so it hides in the sweep's issue bubbles instead of
    # serializing at the next tile's head.  Scratch is (2B, 8); tile
    # parity picks the half.
    dbuf = variant == "dbuf"

    out_ref[...] = jnp.zeros_like(out_ref)

    if dbuf:
        # Prologue: tile 0 into buffer half 0.
        itile_s[pl.ds(0, B), :] = jnp.transpose(ps_rows[:, pl.ds(0, B)])

    def it_body(it, _):
        i0 = it * B
        if dbuf:
            half = (it % 2) * B
            xi = itile_s[pl.ds(half, B), 0:1]
            yi = itile_s[pl.ds(half, B), 1:2]
            zi = itile_s[pl.ds(half, B), 2:3]
            gmi = itile_s[pl.ds(half, B), 3:4]
        else:
            itile_s[...] = jnp.transpose(ps_rows[:, pl.ds(i0, B)])
            xi = itile_s[:, 0:1]
            yi = itile_s[:, 1:2]
            zi = itile_s[:, 2:3]
            gmi = itile_s[:, 3:4]

        def pair_terms(j0, w_lanes):
            xj = ps_rows[0:1, pl.ds(j0, w_lanes)]
            yj = ps_rows[1:2, pl.ds(j0, w_lanes)]
            zj = ps_rows[2:3, pl.ds(j0, w_lanes)]
            gmj = ps_rows[3:4, pl.ds(j0, w_lanes)]
            dx = xj - xi
            dy = yj - yi
            dz = zj - zi
            d2 = dx * dx + dy * dy + dz * dz + eps2
            if rsqrt6:
                u = lax.rsqrt(d2 * d2 * d2)
            else:
                inv = lax.rsqrt(d2)
                u = inv * inv * inv
            w = (gmi * gmj) * u
            return w * dx, w * dy, w * dz

        px, py, pz = pair_terms(i0, B)  # diagonal tile

        if dbuf:
            # Next tile's relayout NOW — independent of the j sweep
            # below, so the scheduler can sink it into sweep bubbles.
            nxt = jnp.minimum(it + 1, nblocks - 1)
            itile_s[pl.ds(((it + 1) % 2) * B, B), :] = jnp.transpose(
                ps_rows[:, pl.ds(nxt * B, B)])

        if accs:
            acc_ref = scratch[0]  # (3, B, B) VMEM scratch
            acc_ref[0] = px
            acc_ref[1] = py
            acc_ref[2] = pz
            accx = accy = accz = jnp.float32(0)  # unused carry
        elif defer:
            accx, accy, accz = px, py, pz  # (B, B) elementwise carries
        else:
            accx = jnp.sum(px, axis=1, keepdims=True)
            accy = jnp.sum(py, axis=1, keepdims=True)
            accz = jnp.sum(pz, axis=1, keepdims=True)

        def jside_write(j0, w_lanes, px, py, pz):
            js = pl.ds(j0, w_lanes)
            if jstack:
                upd = jnp.concatenate(
                    [jnp.sum(px, axis=0, keepdims=True),
                     jnp.sum(py, axis=0, keepdims=True),
                     jnp.sum(pz, axis=0, keepdims=True),
                     jnp.zeros((5, w_lanes), jnp.float32)], axis=0,
                )
                out_ref[:, js] -= upd
            else:
                out_ref[0:1, js] -= jnp.sum(px, axis=0, keepdims=True)
                out_ref[1:2, js] -= jnp.sum(py, axis=0, keepdims=True)
                out_ref[2:3, js] -= jnp.sum(pz, axis=0, keepdims=True)

        def jt_one(j0, acc):
            ax, ay, az = acc
            px, py, pz = pair_terms(j0, B)
            if accs:
                acc_ref = scratch[0]
                acc_ref[0] += px
                acc_ref[1] += py
                acc_ref[2] += pz
            elif defer:
                ax += px
                ay += py
                az += pz
            else:
                ax += jnp.sum(px, axis=1, keepdims=True)
                ay += jnp.sum(py, axis=1, keepdims=True)
                az += jnp.sum(pz, axis=1, keepdims=True)
            jside_write(j0, B, px, py, pz)
            return (ax, ay, az)

        if jb2:
            npairs = (nblocks - it - 1) // 2

            def jt_two(k, acc):
                ax, ay, az = acc
                j0 = (it + 1 + 2 * k) * B
                px, py, pz = pair_terms(j0, 2 * B)  # (B, 2B)
                if defer:
                    # accumulate both halves into the (B,B) carry
                    ax += px[:, :B] + px[:, B:]
                    ay += py[:, :B] + py[:, B:]
                    az += pz[:, :B] + pz[:, B:]
                else:
                    ax += jnp.sum(px, axis=1, keepdims=True)
                    ay += jnp.sum(py, axis=1, keepdims=True)
                    az += jnp.sum(pz, axis=1, keepdims=True)
                jside_write(j0, 2 * B, px, py, pz)
                return (ax, ay, az)

            acc = lax.fori_loop(0, npairs, jt_two, (accx, accy, accz))

            def tail(acc):
                j0 = (it + 1 + 2 * npairs) * B
                return jt_one(j0, acc)

            accx, accy, accz = lax.cond(
                (nblocks - it - 1) % 2 == 1, tail, lambda a: a, acc
            )
        elif pipe2:
            nfull = (nblocks - it - 1) // 2

            def jt_pipe(k, acc):
                ax, ay, az = acc
                j0 = (it + 1 + 2 * k) * B
                # BOTH tiles' geometry first (independent), reductions
                # after, in tile order (bit-identical sums vs unroll2).
                p0 = pair_terms(j0, B)
                p1 = pair_terms(j0 + B, B)
                ax += jnp.sum(p0[0], axis=1, keepdims=True)
                ay += jnp.sum(p0[1], axis=1, keepdims=True)
                az += jnp.sum(p0[2], axis=1, keepdims=True)
                jside_write(j0, B, *p0)
                ax += jnp.sum(p1[0], axis=1, keepdims=True)
                ay += jnp.sum(p1[1], axis=1, keepdims=True)
                az += jnp.sum(p1[2], axis=1, keepdims=True)
                jside_write(j0 + B, B, *p1)
                return (ax, ay, az)

            acc = lax.fori_loop(0, nfull, jt_pipe, (accx, accy, accz))
            accx, accy, accz = lax.fori_loop(
                it + 1 + 2 * nfull, nblocks,
                lambda jt, a: jt_one(jt * B, a), acc)
        elif unroll > 1:
            # Manual unroll (fori_loop's unroll= needs static bounds):
            # `unroll` independent (B,B) tiles per iteration so their
            # rsqrts overlap, plus a remainder loop.
            nfull = (nblocks - it - 1) // unroll

            def jt_u(k, acc):
                j0 = (it + 1 + unroll * k) * B
                for u in range(unroll):
                    acc = jt_one(j0 + u * B, acc)
                return acc

            acc = lax.fori_loop(0, nfull, jt_u, (accx, accy, accz))
            accx, accy, accz = lax.fori_loop(
                it + 1 + unroll * nfull, nblocks,
                lambda jt, a: jt_one(jt * B, a), acc)
        else:
            accx, accy, accz = lax.fori_loop(
                it + 1, nblocks,
                lambda jt, acc: jt_one(jt * B, acc),
                (accx, accy, accz),
            )

        if accs:
            acc_ref = scratch[0]
            ax = jnp.sum(acc_ref[0], axis=1, keepdims=True)
            ay = jnp.sum(acc_ref[1], axis=1, keepdims=True)
            az = jnp.sum(acc_ref[2], axis=1, keepdims=True)
        elif defer:
            ax = jnp.sum(accx, axis=1, keepdims=True)
            ay = jnp.sum(accy, axis=1, keepdims=True)
            az = jnp.sum(accz, axis=1, keepdims=True)
        else:
            ax, ay, az = accx, accy, accz
        isl = pl.ds(i0, B)
        out_ref[0:1, isl] += jnp.transpose(ax)
        out_ref[1:2, isl] += jnp.transpose(ay)
        out_ref[2:3, isl] += jnp.transpose(az)
        return _

    lax.fori_loop(0, nblocks, it_body, 0)
    gm = ps_rows[3:4, :]
    safe = jnp.where(gm > f32(0), gm, f32(1))
    out_ref[0:3, :] = jnp.where(gm > f32(0), out_ref[0:3, :] / safe, f32(0))


def accelerations(pos, mass, *, block, variant, interpret=False,
                  vmem_limit=100 * 2**20):
    n = pos.shape[1]
    ps_rows = pack_particles(pos, mass)
    scratches = [pltpu.VMEM(
        (2 * block if variant == "dbuf" else block, 8), jnp.float32)]
    if variant == "accs":
        scratches.append(pltpu.VMEM((3, block, block), jnp.float32))
    out = pl.pallas_call(
        functools.partial(_kernel, block=block, nblocks=n // block,
                          variant=variant),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
        scratch_shapes=scratches,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        cost_estimate=pl.CostEstimate(
            flops=14 * n * n, bytes_accessed=n * 64,
            transcendentals=n * n // 2,
        ),
        interpret=interpret,
    )(ps_rows)
    return out[0:3, :]


def _diff_time(run, loops):
    t1, t2 = run(loops), run(2 * loops)
    return max(t2 - t1, 1e-9) / loops


def measure(variant, n, block, loops, reps=3):
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.random((3, n)), jnp.float32)
    mass = jnp.asarray(rng.random(n), jnp.float32)
    fn = functools.partial(accelerations, block=block, variant=variant,
                           interpret=jax.default_backend() != "tpu")

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


def check_correct(variant, n=2048, block=256):
    from nbody_tpu.ops import naive

    rng = np.random.default_rng(1)
    pos = jnp.asarray(rng.random((3, n)), jnp.float32)
    mass = jnp.asarray(rng.random(n), jnp.float32)
    want = np.asarray(naive.accelerations(pos, mass), np.float64)
    got = np.asarray(
        accelerations(pos, mass, block=block, variant=variant,
                      interpret=jax.default_backend() != "tpu"),
        np.float64,
    )
    err = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert err < 1e-5, (variant, err)
    return err


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", default="65536,131072,262144")
    p.add_argument("--blocks", default="1024")
    p.add_argument("--variants", default="base,acc,jbatch2,acc+jb2")
    p.add_argument("--trials", type=int, default=3)
    p.add_argument("--cpu", action="store_true",
                   help="rehearse on the host backend (no tunnel)")
    args = p.parse_args()
    if args.cpu:
        from nbody_tpu.utils.platform import force_cpu

        force_cpu(1)

    from nbody_tpu.__main__ import _enable_compilation_cache

    _enable_compilation_cache()  # remote compiles are 1-300 s; reuse them

    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {dev.device_kind}")
    for v in args.variants.split(","):
        err = check_correct(v)
        print(f"# {v}: correctness rel-L2 {err:.1e}")

    sizes = [int(s) for s in args.sizes.split(",")]
    blocks = [int(b) for b in args.blocks.split(",")]
    for n in sizes:
        loops = max(1, (131072 * 131072 * 3) // (n * n))
        for b in blocks:
            for v in args.variants.split(","):
                rates = [measure(v, n, b, loops)
                         for _ in range(args.trials)]
                med = float(np.median(rates))
                spread = (max(rates) - min(rates)) / med * 100
                print(f"N={n:7d} b={b:5d} {v:8s}: {med/1e9:7.1f} Gpairs/s "
                      f"(spread {spread:4.1f}%)", flush=True)


if __name__ == "__main__":
    main()
