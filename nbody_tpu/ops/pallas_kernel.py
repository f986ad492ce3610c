"""Tiled Pallas TPU force kernel — the analog of the reference's entire
single-device optimization ladder (ver3-ver8).

What the reference achieves with SoA conversion (ver3/Particle.hpp:43-59),
SIMD reductions (ver4/GSimulation.cpp:142-146), aligned allocation
(ver5/GSimulation.cpp:102-114), cache tiling (ver6/GSimulation.cpp:136-171)
and OpenMP threading (ver7/GSimulation.cpp:141,179) is expressed here as one
Pallas grid:

* grid = (N/TILE_I, N/TILE_J) with j minor-most, so each i-tile's output
  block stays resident in VMEM while j-tiles stream through the Pallas
  pipeline (double-buffered DMA — the ver6 cache-tiling analog, with the
  pipeline doing what `_mm_malloc` alignment did).
* particle data is laid out twice for transpose-free broadcasting:
  row-major (8, N) for the i-tile (coordinates on sublanes) and column-major
  (N, 8) for the j-tile, with G*mass precomputed into row/col 3.
* the (TILE_J, TILE_I) pair matrices live in VMEM/VPU registers; the j-sum
  is a sublane reduction; fp32 accumulation into the output block (the
  ver4 `omp simd reduction` analog).

Self-interaction is included: dx=dy=dz=0 makes the term exactly zero
(matches ver0/GSimulation.cpp:132-147; do not mask the diagonal).

``dist_dtype='bfloat16'`` computes pair deltas in bf16 with fp32
accumulation (BASELINE.md config 3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import G_NEWTON, SOFTENING_SQUARED

# Defaults from an on-device sweep (v5e, N=16k-131k, in-loop timing):
# (512, 128) maximizes sustained pair rate; all (512, *) combos are within
# ~5%.  VMEM footprint stays well under budget: the (TJ, TI) pair matrices
# at fp32 are 256 KB each.
DEFAULT_TILE_I = 512
DEFAULT_TILE_J = 128


def _nbody_kernel(psi_ref, psjt_ref, out_ref, *, dist_dtype):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    f32 = jnp.float32
    xi = psi_ref[0:1, :]  # (1, TI) — broadcast across sublanes
    yi = psi_ref[1:2, :]
    zi = psi_ref[2:3, :]
    pj = psjt_ref[...]  # (TJ, 8)
    xj = pj[:, 0:1]  # (TJ, 1) — broadcast across lanes
    yj = pj[:, 1:2]
    zj = pj[:, 2:3]
    gm = pj[:, 3:4]

    if dist_dtype == jnp.bfloat16:
        dx = (xj - xi).astype(jnp.bfloat16)
        dy = (yj - yi).astype(jnp.bfloat16)
        dz = (zj - zi).astype(jnp.bfloat16)
        d2 = (
            dx.astype(f32) * dx.astype(f32)
            + dy.astype(f32) * dy.astype(f32)
            + dz.astype(f32) * dz.astype(f32)
            + f32(SOFTENING_SQUARED)
        )
        dx, dy, dz = dx.astype(f32), dy.astype(f32), dz.astype(f32)
    else:
        dx = xj - xi  # (TJ, TI)
        dy = yj - yi
        dz = zj - zi
        d2 = dx * dx + dy * dy + dz * dz + f32(SOFTENING_SQUARED)

    inv = jax.lax.rsqrt(d2)
    w = gm * (inv * inv * inv)  # (TJ, TI)

    # Sublane (j-axis) reductions -> (1, TI) rows, accumulated in fp32.
    out_ref[0:1, :] += jnp.sum(w * dx, axis=0, keepdims=True)
    out_ref[1:2, :] += jnp.sum(w * dy, axis=0, keepdims=True)
    out_ref[2:3, :] += jnp.sum(w * dz, axis=0, keepdims=True)


def pack_particles(pos: jax.Array, mass: jax.Array) -> jax.Array:
    """Pack (3,N) positions + (N,) masses into the kernel's (8,N) layout:
    rows [x, y, z, G*m, 0, 0, 0, 0]."""
    n = pos.shape[1]
    gm = (mass * jnp.float32(G_NEWTON)).astype(jnp.float32)
    return jnp.concatenate(
        [pos.astype(jnp.float32), gm[None, :], jnp.zeros((4, n), jnp.float32)],
        axis=0,
    )


def accelerations_between(
    pos_tgt: jax.Array,
    pos_src: jax.Array,
    mass_src: jax.Array,
    tile_i: int = DEFAULT_TILE_I,
    tile_j: int = DEFAULT_TILE_J,
    dist_dtype: str = "float32",
    interpret: bool = False,
) -> jax.Array:
    """Accelerations of targets due to sources via the tiled Pallas kernel.

    pos_tgt (3, Nt), pos_src (3, Ns), mass_src (Ns,) -> (3, Nt) fp32.
    Nt/Ns must be divisible by tile_i/tile_j respectively (pad with
    zero-mass particles; see state.pad_state).
    """
    nt = pos_tgt.shape[1]
    ns = pos_src.shape[1]
    ti = min(tile_i, nt)
    tj = min(tile_j, ns)
    if nt % ti or ns % tj:
        raise ValueError(
            f"particle counts ({nt},{ns}) must be divisible by tiles ({ti},{tj})"
        )
    ps_i = pack_particles(pos_tgt, jnp.zeros((nt,), jnp.float32))
    ps_jt = pack_particles(pos_src, mass_src).T  # (Ns, 8) column-major

    ddt = jnp.dtype(dist_dtype)
    grid = (nt // ti, ns // tj)
    flops_per_pair = 20 if ddt == jnp.float32 else 23
    out = pl.pallas_call(
        functools.partial(_nbody_kernel, dist_dtype=ddt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, ti), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tj, 8), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (8, ti), lambda i, j: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((8, nt), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_pair * nt * ns,
            bytes_accessed=(nt * ns // ti) * 32 + (nt + ns) * 64,
            transcendentals=nt * ns,
        ),
        interpret=interpret,
    )(ps_i, ps_jt)
    return out[0:3, :]


def accelerations(pos: jax.Array, mass: jax.Array, **opts) -> jax.Array:
    """All-pairs self-accelerations. pos (3,N), mass (N,) -> (3,N)."""
    return accelerations_between(pos, pos, mass, **opts)
