"""Fused sample-block kernel: an entire multi-step integration inside ONE
Pallas call, with the whole particle state resident in VMEM.

For small systems (N <= ~4096) the per-step cost is dominated not by the
O(N^2) pair math (~20 us at N=2048) but by per-step dispatch, packing and
HBM round-trips (~150 us).  This kernel runs the reference's whole
50-step sample block (ver0/GSimulation.cpp:127-196) on-chip:

* state lives in VMEM for the whole block — positions in both layouts
  (rows (8,N) for source broadcasting, columns (N,8) for targets),
  velocities in columns;
* each step: i-tile x j-tile pair sweep (same lane-reduction orientation
  as pallas_kernel), fp32 acceleration scratch, semi-implicit Euler
  update, then a (N,3) -> (3,N) relayout refreshes the source rows;
* HBM is touched exactly twice: initial load, final store.

This is the logical endpoint of the reference's ver6+ladder: not just the
force loop but the integrator inside the cache (VMEM) tier.

Constraints: single device, Euler integrator, fp32, N padded to tile_i.
The engine auto-selects it for eligible configs; the unfused path remains
the general one.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import G_NEWTON, SOFTENING_SQUARED
from ..utils import device_caps


def max_fused_n() -> int:
    """Particle ceiling for the COLUMNS-layout fused block (explicit
    rectangular tilings only): the lane-padded (N,8) state buffers cost
    N*512 bytes each, capping N at 8192 on a 128 MB v5e (device-scaled
    in utils/device_caps.py)."""
    return device_caps.caps().max_fused_n


def max_fused_rows_n() -> int:
    """Particle ceiling for the ROWS-layout (pair-symmetric) fused block
    — the default path: five (8,N) fp32 resident buffers cost 160*N
    bytes with NO lane padding, lifting the cap 8192 -> 314368 on a
    128 MB v5e (utils/device_caps.py)."""
    return device_caps.caps().max_fused_rows_n


def _is_sym(tile_i: int, tile_j: int) -> bool:
    """Whether fused_block's auto dispatch takes the rows-sym path for
    this tiling request (mirrors the ``sym is None`` rule below)."""
    return not tile_j or tile_i == tile_j


def fused_cap(tile_i: int = 0, tile_j: int = 0) -> int:
    """The particle ceiling that applies to this tiling request."""
    return max_fused_rows_n() if _is_sym(tile_i, tile_j) else max_fused_n()


# Tile defaults adapt to N: the lane-padded (N,8) state buffers cost
# N*512 bytes each (x3 resident), so larger systems get smaller pair
# tiles to stay inside VMEM.
DEFAULT_TILE_I = 0  # 0 = auto
DEFAULT_TILE_J = 0


def _auto_tiles(n: int) -> tuple[int, int]:
    if n <= 4096:
        return 256, 2048
    return 128, 2048


def _kernel(p_rows_in, p_cols_in, v_cols_in, p_cols_out, v_cols_out,
            rows_s, acc_s, *, steps, dt, tile_i, tile_j, integrator):
    n = p_rows_in.shape[1]
    ni = n // tile_i
    nj = n // tile_j
    f32 = jnp.float32
    dtf = f32(dt)
    half = f32(0.5) * dtf
    eps2 = f32(SOFTENING_SQUARED)

    rows_s[...] = p_rows_in[...]
    p_cols_out[...] = p_cols_in[...]
    v_cols_out[...] = v_cols_in[...]
    acc_s[...] = jnp.zeros_like(acc_s)

    def sweep_full():
        """One i x j pair sweep of the current positions into acc_s.
        fori_loops with dynamic slices keep the compiled program size
        independent of N (python unrolling blows up Mosaic compile time
        beyond ~100 tile blocks)."""

        def i_body(it, _):
            sl = pl.ds(it * tile_i, tile_i)
            xi = p_cols_out[sl, 0:1]  # (TI, 1)
            yi = p_cols_out[sl, 1:2]
            zi = p_cols_out[sl, 2:3]

            def j_body(jt, acc):
                ax, ay, az = acc
                js = pl.ds(jt * tile_j, tile_j)
                xj = rows_s[0:1, js]  # (1, TJ)
                yj = rows_s[1:2, js]
                zj = rows_s[2:3, js]
                gm = rows_s[3:4, js]
                dx = xj - xi
                dy = yj - yi
                dz = zj - zi
                d2 = dx * dx + dy * dy + dz * dz + eps2
                inv = jax.lax.rsqrt(d2)
                w = gm * (inv * inv * inv)
                ax += jnp.sum(w * dx, axis=1, keepdims=True)
                ay += jnp.sum(w * dy, axis=1, keepdims=True)
                az += jnp.sum(w * dz, axis=1, keepdims=True)
                return (ax, ay, az)

            zero = jnp.zeros((tile_i, 1), f32)
            ax, ay, az = jax.lax.fori_loop(0, nj, j_body, (zero, zero, zero))
            acc_s[sl, 0:1] = ax
            acc_s[sl, 1:2] = ay
            acc_s[sl, 2:3] = az
            return _

        jax.lax.fori_loop(0, ni, i_body, 0)

    sweep = sweep_full

    def move(v):
        """Drift positions by v*dt in both layouts."""
        p_new = p_cols_out[...] + v * dtf
        p_cols_out[...] = p_new
        rows_s[0:3, :] = jnp.transpose(p_new[:, 0:3])

    if integrator == "euler":

        def step_body(_, carry):
            sweep()
            v = v_cols_out[...] + acc_s[...] * dtf  # cols 3..7 stay zero
            v_cols_out[...] = v
            move(v)
            return carry

    else:  # leapfrog KDK with the acceleration carried in acc_s

        def step_body(_, carry):
            v_half = v_cols_out[...] + acc_s[...] * half  # kick
            move(v_half)                                  # drift
            sweep()                                       # new forces
            v_cols_out[...] = v_half + acc_s[...] * half  # kick
            return carry

    if integrator == "leapfrog":
        sweep()  # seed the carried acceleration from the initial positions
    jax.lax.fori_loop(0, steps, step_body, 0)


def _rows_kernel(p_rows_in, v_rows_in, p_out, v_out, itile_s, acc_s, *,
                 steps, dt, block, integrator):
    """Rows-only fused block: positions, velocities AND accelerations all
    live as (8, N) rows for the whole multi-step block, so the integrator
    updates are dense (3, N) elementwise ops and NO per-step relayout
    exists.  The columns-layout variant (_kernel) keeps an (N, 8) state
    copy whose minor-8 axis is lane-padded 8->128 by the hardware — a 16x
    tax on every integrator op plus a full (N,3)->(3,N) transpose per
    step; here only the per-i-tile (8,B)->(B,8) scratch transpose of the
    pair-symmetric sweep remains (amortized over a whole row of j-tiles).
    Pair arithmetic is identical to ops/pallas_sym.py (mass-folded,
    diagonal unmasked), so the golden trace is preserved."""
    n = p_rows_in.shape[1]
    B = block
    nb = n // B
    f32 = jnp.float32
    dtf = f32(dt)
    half = f32(0.5) * dtf
    eps2 = f32(SOFTENING_SQUARED)

    p_out[...] = p_rows_in[...]
    v_out[...] = v_rows_in[...]
    acc_s[...] = jnp.zeros_like(acc_s)

    def sweep():
        acc_s[...] = jnp.zeros_like(acc_s)

        def i_body(it, _):
            isl = pl.ds(it * B, B)
            itile_s[...] = jnp.transpose(p_out[:, isl])  # (B, 8)
            xi = itile_s[:, 0:1]
            yi = itile_s[:, 1:2]
            zi = itile_s[:, 2:3]
            gmi = itile_s[:, 3:4]

            def pair_terms(js):
                xj = p_out[0:1, js]
                yj = p_out[1:2, js]
                zj = p_out[2:3, js]
                gmj = p_out[3:4, js]
                dx = xj - xi
                dy = yj - yi
                dz = zj - zi
                d2 = dx * dx + dy * dy + dz * dz + eps2
                inv = jax.lax.rsqrt(d2)
                w = (gmi * gmj) * (inv * inv * inv)
                return w * dx, w * dy, w * dz

            px, py, pz = pair_terms(isl)  # diagonal block (dx=0 term = 0)
            ax = jnp.sum(px, axis=1, keepdims=True)
            ay = jnp.sum(py, axis=1, keepdims=True)
            az = jnp.sum(pz, axis=1, keepdims=True)

            def j_body(jt, acc):
                ax, ay, az = acc
                js = pl.ds(jt * B, B)
                px, py, pz = pair_terms(js)
                ax += jnp.sum(px, axis=1, keepdims=True)
                ay += jnp.sum(py, axis=1, keepdims=True)
                az += jnp.sum(pz, axis=1, keepdims=True)
                acc_s[0:1, js] -= jnp.sum(px, axis=0, keepdims=True)
                acc_s[1:2, js] -= jnp.sum(py, axis=0, keepdims=True)
                acc_s[2:3, js] -= jnp.sum(pz, axis=0, keepdims=True)
                return (ax, ay, az)

            ax, ay, az = jax.lax.fori_loop(it + 1, nb, j_body, (ax, ay, az))
            acc_s[0:1, isl] += jnp.transpose(ax)
            acc_s[1:2, isl] += jnp.transpose(ay)
            acc_s[2:3, isl] += jnp.transpose(az)
            return _

        jax.lax.fori_loop(0, nb, i_body, 0)
        # epilogue: a = S / gm_i (zero-mass padding -> zero acceleration)
        gm = p_out[3:4, :]
        safe = jnp.where(gm > f32(0), gm, f32(1))
        acc_s[0:3, :] = jnp.where(gm > f32(0), acc_s[0:3, :] / safe, f32(0))

    if integrator == "euler":

        def step_body(_, carry):
            sweep()
            v = v_out[0:3, :] + acc_s[0:3, :] * dtf
            v_out[0:3, :] = v
            p_out[0:3, :] += v * dtf
            return carry

    else:  # leapfrog KDK with the acceleration carried in acc_s

        def step_body(_, carry):
            v_half = v_out[0:3, :] + acc_s[0:3, :] * half  # kick
            p_out[0:3, :] += v_half * dtf                  # drift
            sweep()                                        # new forces
            v_out[0:3, :] = v_half + acc_s[0:3, :] * half  # kick
            return carry

    if integrator == "leapfrog":
        sweep()  # seed the carried acceleration from the initial positions
    jax.lax.fori_loop(0, steps, step_body, 0)


def _fused_block_rows(pos, vel, mass, dt, steps, block, integrator,
                      interpret):
    n = pos.shape[1]
    f32 = jnp.float32
    gm = (mass * f32(G_NEWTON)).astype(f32)
    p_rows = jnp.concatenate(
        [pos.astype(f32), gm[None, :], jnp.zeros((4, n), f32)], axis=0
    )  # (8, N): xyz, gm, zeros
    v_rows = jnp.concatenate(
        [vel.astype(f32), jnp.zeros((5, n), f32)], axis=0
    )
    kernel = functools.partial(
        _rows_kernel, steps=steps, dt=dt, block=block, integrator=integrator
    )
    p_out, v_out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((8, n), jnp.float32),
            jax.ShapeDtypeStruct((8, n), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block, 8), jnp.float32),
            pltpu.VMEM((8, n), jnp.float32),  # acceleration accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=14 * n * n * steps,
            bytes_accessed=4 * n * 32,
            transcendentals=(n * n * steps) // 2,
        ),
        interpret=interpret,
    )(p_rows, v_rows)
    return p_out[0:3, :], v_out[0:3, :]


def fused_block(
    pos: jax.Array,
    vel: jax.Array,
    mass: jax.Array,
    dt: float,
    steps: int,
    tile_i: int = DEFAULT_TILE_I,
    tile_j: int = DEFAULT_TILE_J,
    integrator: str = "euler",
    sym: bool = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Advance (pos (3,N), vel (3,N)) by ``steps`` steps in one Pallas
    call (euler or leapfrog).  Returns (pos, vel).

    ``sym`` selects the pair-symmetric sweep (each unordered tile pair
    once, square tile_i blocks — ops/pallas_sym.py inside the fused
    block); None = auto (on when no explicit rectangular tiling was
    requested)."""
    if integrator not in ("euler", "leapfrog"):
        raise ValueError(f"unknown integrator {integrator!r}")
    n = pos.shape[1]
    if sym is None:
        # Auto: rows-sym unless the caller asked for a tiling the sym
        # sweep cannot honor — a rectangular (ti != tj) pair, or a
        # tile_j-only request (sym blocks are square and keyed on tile_i,
        # so a lone tile_j would be silently discarded).
        sym = not tile_j or tile_i == tile_j
    if sym:
        if tile_i:
            ti = tj = min(tile_i, n)
        else:
            # Square blocks; biggest power-of-two divisor of n up to
            # 1024 keeps the pair matrices VMEM-friendly and the loop
            # count low.
            b = 1024
            while b > 1 and n % min(b, n):
                b //= 2
            ti = tj = min(b, n)
        if n % ti:
            raise ValueError(f"N={n} must be divisible by block {ti}")
        if n > max_fused_rows_n():
            raise ValueError(
                f"fused rows block supports N <= {max_fused_rows_n()}, "
                f"got {n}"
            )
        return _fused_block_rows(pos, vel, mass, dt, steps, ti, integrator,
                                 interpret)
    else:
        auto_i, auto_j = _auto_tiles(n)
        ti = min(tile_i or auto_i, n)
        tj = min(tile_j or auto_j, n)
    if n % ti or n % tj:
        raise ValueError(f"N={n} must be divisible by tiles ({ti},{tj})")
    if n > max_fused_n():
        raise ValueError(f"fused block supports N <= {max_fused_n()}, got {n}")
    f32 = jnp.float32
    gm = (mass * f32(G_NEWTON)).astype(f32)
    zeros = jnp.zeros((n,), f32)
    p_rows = jnp.concatenate(
        [pos.astype(f32), gm[None, :], jnp.zeros((4, n), f32)], axis=0
    )  # (8, N)
    # gm rides in column 3 (velocity col 3 is zero, so the integrator
    # preserves it); the sym sweep reads it as the i-side mass scaling.
    p_cols = jnp.stack(
        [pos[0], pos[1], pos[2], gm, zeros, zeros, zeros, zeros], axis=1
    )  # (N, 8)
    v_cols = jnp.stack(
        [vel[0], vel[1], vel[2], zeros, zeros, zeros, zeros, zeros], axis=1
    )

    kernel = functools.partial(
        _kernel, steps=steps, dt=dt, tile_i=ti, tile_j=tj,
        integrator=integrator,
    )
    p_out, v_out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, 8), jnp.float32),
            jax.ShapeDtypeStruct((n, 8), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((8, n), jnp.float32),
            pltpu.VMEM((n, 8), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=20 * n * n * steps,
            bytes_accessed=5 * n * 32,
            transcendentals=n * n * steps,
        ),
        interpret=interpret,
    )(p_rows, p_cols, v_cols)
    return p_out[:, 0:3].T, v_out[:, 0:3].T
