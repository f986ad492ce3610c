"""Pair-symmetric Pallas force kernel: each unordered tile pair computed
ONCE, accumulated into both tiles' outputs.

The reference evaluates every ordered pair (i, j) — N^2 interactions per
step (ver0/GSimulation.cpp:130-150).  Forces are exactly antisymmetric
(F_ji = -F_ij: d2 and inv^3 are symmetric and the IEEE negation of dx is
exact, diagonal exactly zero), so the upper triangle determines the lower
one.  This kernel sweeps only tile pairs with jt >= it:

* whole problem VMEM-resident — ONE (8, N) rows buffer in, ONE (8, N)
  accumulator out — so HBM is touched once on entry and once on exit.
  Everything stays in the rows layout: a fully-resident (N, 8) columns
  buffer would be lane-padded 8 -> 128 by the hardware (16x VMEM waste,
  the reason the first cut of this kernel stopped compiling at N=131072);
  instead each i-tile is transposed to (B, 8) in a small scratch once and
  reused across its whole row of j-tiles;
* off-diagonal (B, B) blocks compute the shared geometry u = 1/d^3 once,
  then form both mass-scaled reductions from the same u*dx products: the
  i-side as a lane-axis sum (transposed into the accumulator's i slice),
  the j-side as a sublane-axis sum subtracted from the j slice;
* diagonal blocks contain both orderings of their intra-tile pairs, so
  they use the plain one-sided sweep (self-interaction included: dx = 0
  makes the term exactly zero — never mask the diagonal);

Arithmetic per unordered pair (fold_mass=True default): both masses are
folded into the pair weight w = (G m_i)(G m_j)/d^3 so each side's
reduction consumes the SAME products, and one O(N) epilogue divide
(a = S / G m_i; zero-mass padding -> zero) recovers the accelerations —
~20 VPU ops + ONE rsqrt for TWO pair-interactions, vs ~17 ops + one
rsqrt per single interaction in ops/pallas_kernel.py.  Measured verdict:
docs/DESIGN.md "Pair-symmetry kernel" — 333 Gpairs/s on v5e, 1.77x the
streaming kernel, golden trace exact at printed precision.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import SOFTENING_SQUARED
from ..utils import device_caps
from .pallas_kernel import accelerations_between, pack_particles

DEFAULT_BLOCK = 1024


def max_sym_n() -> int:
    """VMEM-residency particle ceiling: 64*N bytes of resident state (two
    (8,N) fp32 buffers) + ~7 (B,B) fp32 pair intermediates must fit the
    attached device's VMEM (utils/device_caps.py).  Measured on v5e
    (128 MB): N=1048576 compiles and runs at full rate (261.7 Gpairs/s)
    under a 100 MB scoped-vmem limit; N=2M would need 128 MB of
    residency alone."""
    return device_caps.caps().max_sym_n


def auto_block(n: int) -> int:
    """VMEM-aware default block size for a padded particle count ``n``.

    The (8,N) in+out residency costs 64*N bytes and the b=1024 pair
    intermediates spill ~64 MB, so huge N drops to b=512 (~16 MB of
    spills) to stay inside the chip (v5e boundary: 48 MB residency —
    the device-scaled rule lives in utils/device_caps.py)."""
    return device_caps.caps().sym_auto_block(n)


def _bf16_round(dx, dy, dz):
    """bf16-distance mode: deltas subtract in f32 and are then ROUNDED
    through bf16 (casting positions first would catastrophically cancel
    near pairs — pallas_kernel.py order); all arithmetic stays f32.
    Rounding commutes with negation (round-to-nearest of -x = -round x),
    so F_ji = -F_ij stays EXACT and the pair-symmetric trick is still
    valid in this mode."""
    bf = jnp.bfloat16
    f32 = jnp.float32
    return (dx.astype(bf).astype(f32), dy.astype(bf).astype(f32),
            dz.astype(bf).astype(f32))


def _sym_kernel(ps_rows, out_ref, itile_s, *, block, nblocks, fold_mass,
                mxu_reduce=False, bf16=False):
    f32 = jnp.float32
    eps2 = f32(SOFTENING_SQUARED)
    B = block

    out_ref[...] = jnp.zeros_like(out_ref)

    if mxu_reduce:
        # Offload both reductions to the (otherwise idle) MXU as
        # dot-with-ones contractions so the VPU only produces the pair
        # terms.  HIGHEST precision keeps the fp32 sum exact to normal
        # fp32 accumulation (ones * x products are exact).
        ones_col = jnp.ones((B, 1), f32)
        ones_row = jnp.ones((1, B), f32)

        def _sum_lanes(p):  # (B,B) -> (B,1)
            return jax.lax.dot(p, ones_col,
                               precision=jax.lax.Precision.HIGHEST)

        def _sum_sublanes(p):  # (B,B) -> (1,B)
            return jax.lax.dot(ones_row, p,
                               precision=jax.lax.Precision.HIGHEST)
    else:
        def _sum_lanes(p):
            return jnp.sum(p, axis=1, keepdims=True)

        def _sum_sublanes(p):
            return jnp.sum(p, axis=0, keepdims=True)

    def it_body(it, _):
        i0 = it * B
        # One (8,B)->(B,8) relayout per i-tile, amortized over its whole
        # row of j-tiles (the ring_kernel.py scratch pattern).
        itile_s[...] = jnp.transpose(ps_rows[:, pl.ds(i0, B)])
        xi = itile_s[:, 0:1]  # (B, 1) — broadcast across lanes
        yi = itile_s[:, 1:2]
        zi = itile_s[:, 2:3]
        gmi = itile_s[:, 3:4]  # G*m of the i tile (the j-side scaling)

        def pair_terms(j0):
            xj = ps_rows[0:1, pl.ds(j0, B)]  # (1, B)
            yj = ps_rows[1:2, pl.ds(j0, B)]
            zj = ps_rows[2:3, pl.ds(j0, B)]
            gmj = ps_rows[3:4, pl.ds(j0, B)]
            dx = xj - xi  # (B, B)
            dy = yj - yi
            dz = zj - zi
            if bf16:
                dx, dy, dz = _bf16_round(dx, dy, dz)
            d2 = dx * dx + dy * dy + dz * dz + eps2
            inv = lax.rsqrt(d2)
            u = inv * inv * inv  # shared symmetric geometry 1/d^3
            if fold_mass:
                # Fold BOTH masses into the pair weight: S_i = gm_i * a_i
                # accumulates, and the caller divides by gm_i once at the
                # end.  Saves the second per-side mass scaling (4 element
                # ops per unordered pair).
                w = (gmi * gmj) * u
                return w * dx, w * dy, w * dz, None
            return u * dx, u * dy, u * dz, gmj

        # Diagonal tile: both orderings of its pairs are present, one-sided
        # lane reduction covers them (ops/pallas_kernel.py orientation).
        px, py, pz, gmj = pair_terms(i0)

        def iside(p):
            return _sum_lanes(p if fold_mass else gmj * p)

        ax, ay, az = iside(px), iside(py), iside(pz)  # (B, 1)

        def jt_body(jt, acc):
            ax, ay, az = acc
            j0 = jt * B
            px, py, pz, gmj = pair_terms(j0)

            def iside(p):
                return _sum_lanes(p if fold_mass else gmj * p)

            def jside(p):
                return _sum_sublanes(p if fold_mass else gmi * p)

            # i side: a_i += G*m_j * u * d   (lane-axis sum, carried)
            ax += iside(px)
            ay += iside(py)
            az += iside(pz)
            # j side: a_j -= G*m_i * u * d   (sublane-axis sum)
            js = pl.ds(j0, B)
            out_ref[0:1, js] -= jside(px)
            out_ref[1:2, js] -= jside(py)
            out_ref[2:3, js] -= jside(pz)
            return (ax, ay, az)

        # 2x-unrolled j sweep: two INDEPENDENT (B,B) tiles per iteration
        # so tile k+1's rsqrt issues while tile k's elementwise tail
        # drains (measured +3% at N>=65536 on v5e —
        # logs/hw_contact/sym_headroom.log, unroll2 vs base), plus a
        # remainder loop.  Manual: fori_loop's unroll= needs static
        # bounds and ``it`` is traced.  jt_body runs unchanged in the
        # same tile order, so every fp32 sum is BIT-identical to the
        # un-unrolled sweep (golden-trace invariant).
        nfull = (nblocks - it - 1) // 2

        def jt_two(k, acc):
            j = it + 1 + 2 * k
            return jt_body(j + 1, jt_body(j, acc))

        acc = lax.fori_loop(0, nfull, jt_two, (ax, ay, az))
        ax, ay, az = lax.fori_loop(it + 1 + 2 * nfull, nblocks, jt_body,
                                   acc)
        isl = pl.ds(i0, B)
        out_ref[0:1, isl] += jnp.transpose(ax)  # (B,1) -> (1,B)
        out_ref[1:2, isl] += jnp.transpose(ay)
        out_ref[2:3, isl] += jnp.transpose(az)
        return _

    lax.fori_loop(0, nblocks, it_body, 0)
    if fold_mass:
        # a = S / gm_i (zero-mass padding gets zero acceleration).
        gm = ps_rows[3:4, :]
        safe = jnp.where(gm > f32(0), gm, f32(1))
        out_ref[0:3, :] = jnp.where(
            gm > f32(0), out_ref[0:3, :] / safe, f32(0)
        )


def _two_sided_kernel(ps_t, ps_s, out_t, out_s, itile_s, *, block, nbi, nbj,
                      bf16=False):
    """All (i-tile, j-tile) block pairs of targets x sources, each block
    computed ONCE with the mass-folded weight feeding BOTH accumulators:
    out_t gets the action on the targets, out_s the reaction on the
    sources.  The building block of the half-ring multi-chip sweep
    (parallel/decompose._accel_ring_sym): a cross-shard block pair is
    evaluated by one shard only, and the reaction rides the ring home."""
    f32 = jnp.float32
    eps2 = f32(SOFTENING_SQUARED)
    B = block

    out_s[...] = jnp.zeros_like(out_s)

    def it_body(it, _):
        i0 = it * B
        itile_s[...] = jnp.transpose(ps_t[:, pl.ds(i0, B)])
        xi = itile_s[:, 0:1]
        yi = itile_s[:, 1:2]
        zi = itile_s[:, 2:3]
        gmi = itile_s[:, 3:4]

        def jt_body(jt, acc):
            ax, ay, az = acc
            j0 = jt * B
            xj = ps_s[0:1, pl.ds(j0, B)]
            yj = ps_s[1:2, pl.ds(j0, B)]
            zj = ps_s[2:3, pl.ds(j0, B)]
            gmj = ps_s[3:4, pl.ds(j0, B)]
            dx = xj - xi  # (B, B)
            dy = yj - yi
            dz = zj - zi
            if bf16:
                dx, dy, dz = _bf16_round(dx, dy, dz)
            d2 = dx * dx + dy * dy + dz * dz + eps2
            inv = lax.rsqrt(d2)
            w = (gmi * gmj) * (inv * inv * inv)
            px, py, pz = w * dx, w * dy, w * dz
            ax += jnp.sum(px, axis=1, keepdims=True)
            ay += jnp.sum(py, axis=1, keepdims=True)
            az += jnp.sum(pz, axis=1, keepdims=True)
            js = pl.ds(j0, B)
            out_s[0:1, js] -= jnp.sum(px, axis=0, keepdims=True)
            out_s[1:2, js] -= jnp.sum(py, axis=0, keepdims=True)
            out_s[2:3, js] -= jnp.sum(pz, axis=0, keepdims=True)
            return (ax, ay, az)

        zero = jnp.zeros((B, 1), jnp.float32)
        # 2x-unrolled j sweep: overlap consecutive tiles' rsqrts (the
        # _sym_kernel win, logs/hw_contact/sym_headroom.log).  Manual —
        # Mosaic's in-kernel fori_loop rejects partial unroll= factors
        # (only 1 or full) when COMPILED, which interpret-mode tests
        # cannot see.  Body order is unchanged, sums bit-identical.
        nfull = nbj // 2

        def jt_two(k, acc):
            return jt_body(2 * k + 1, jt_body(2 * k, acc))

        acc0 = lax.fori_loop(0, nfull, jt_two, (zero, zero, zero))
        ax, ay, az = lax.fori_loop(2 * nfull, nbj, jt_body, acc0)
        isl = pl.ds(i0, B)
        out_t[0:1, isl] = jnp.transpose(ax)
        out_t[1:2, isl] = jnp.transpose(ay)
        out_t[2:3, isl] = jnp.transpose(az)
        out_t[3:8, isl] = jnp.zeros((5, B), f32)
        return _

    lax.fori_loop(0, nbi, it_body, 0)

    def divide(out, ps):
        gm = ps[3:4, :]
        safe = jnp.where(gm > f32(0), gm, f32(1))
        out[0:3, :] = jnp.where(gm > f32(0), out[0:3, :] / safe, f32(0))

    divide(out_t, ps_t)
    divide(out_s, ps_s)


def accelerations_two_sided(
    pos_t: jax.Array,
    mass_t: jax.Array,
    pos_s: jax.Array,
    mass_s: jax.Array,
    block: int = 0,
    dist_dtype: str = "float32",
    interpret: bool = False,
) -> tuple:
    """Action AND reaction of one target-set x source-set sweep: returns
    (acc_t (3,Nt), acc_s (3,Ns)) with every unordered cross pair computed
    once (mass-folded).  Both particle sets must be VMEM-resident."""
    nt, ns = pos_t.shape[1], pos_s.shape[1]
    if not block:
        # Four (8,·) fp32 buffers resident (in+out per side) cost
        # 64*(nt+ns) bytes; with the ~28 MB of b=1024 (B,B) pair
        # intermediates the total must stay inside VMEM.  Measured on
        # v5e at nt=ns=524288 (67 MB residency): b=1024 compiles and
        # runs 1.30x faster than b=512 (307.5 vs 237.2 Gpairs/s model in
        # the chunked sweep); above ~80 MB (5/8 of VMEM) drop to b=512.
        block = device_caps.caps().two_sided_block(nt, ns)
    b = min(block, nt, ns)
    if nt % b or ns % b:
        raise ValueError(f"Nt={nt}, Ns={ns} must be divisible by block={b}")
    ps_t = pack_particles(pos_t, mass_t)
    ps_s = pack_particles(pos_s, mass_s)
    out_t, out_s = pl.pallas_call(
        functools.partial(_two_sided_kernel, block=b, nbi=nt // b,
                          nbj=ns // b,
                          bf16=jnp.dtype(dist_dtype) == jnp.bfloat16),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((8, nt), jnp.float32),
            jax.ShapeDtypeStruct((8, ns), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((b, 8), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=device_caps.caps().vmem_limit_bytes,
        ),
        cost_estimate=pl.CostEstimate(
            flops=11 * nt * ns,
            bytes_accessed=(nt + ns) * 64,
            transcendentals=nt * ns // 2,
        ),
        interpret=interpret,
    )(ps_t, ps_s)
    return out_t[0:3, :], out_s[0:3, :]


def accelerations(
    pos: jax.Array,
    mass: jax.Array,
    block: int = 0,
    tile_i: int = 0,
    tile_j: int = 0,  # accepted for registry-option uniformity; unused
    dist_dtype: str = "float32",
    fold_mass: bool = True,
    mxu_reduce: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """All-pairs self-accelerations via the pair-symmetric sweep.
    pos (3, N), mass (N,) -> (3, N) fp32.  N must be divisible by the
    block size and <= max_sym_n() (everything is VMEM-resident).

    ``dist_dtype='bfloat16'`` rounds pair deltas through bf16 (BASELINE
    config 3's reduced-precision mode) with fp32 arithmetic — see
    _bf16_round for why pair symmetry survives the rounding."""
    del tile_j
    n = pos.shape[1]
    if not (block or tile_i):
        block = auto_block(n)
    b = min(block or tile_i, n)
    if n % b:
        raise ValueError(f"N={n} must be divisible by block={b}")
    n_cap = max_sym_n()
    if n > n_cap:
        raise ValueError(
            f"pallas_sym holds the whole problem in VMEM; N={n} exceeds "
            f"max_sym_n()={n_cap} (use kernel='pallas')"
        )
    ps_rows = pack_particles(pos, mass)  # (8, N)
    out = pl.pallas_call(
        functools.partial(_sym_kernel, block=b, nblocks=n // b,
                          fold_mass=fold_mass, mxu_reduce=mxu_reduce,
                          bf16=jnp.dtype(dist_dtype) == jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, 8), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=device_caps.caps().vmem_limit_bytes,
        ),
        cost_estimate=pl.CostEstimate(
            flops=14 * n * n,  # ~27 ops per unordered pair
            bytes_accessed=n * 64,
            transcendentals=n * n // 2,
        ),
        interpret=interpret,
    )(ps_rows)
    return out[0:3, :]
