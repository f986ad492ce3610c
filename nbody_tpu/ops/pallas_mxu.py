"""MXU-assisted Pallas force kernel.

Reformulates the pair interaction so the two O(N^2) contractions ride the
128x128 systolic array instead of the VPU:

* squared distances via the expansion
      |r_j - r_i|^2 + eps = (|r_j|^2) + (|r_i|^2 + eps) - 2 r_j . r_i
  computed as ONE (TJ,8)x(8,TI) matmul over augmented coordinates
  A_j = [x, y, z, |r|^2, 1, .., ..] and B_i = [-2x, -2y, -2z, 1, |r|^2+eps];
* force accumulation via
      a_i = sum_j w_ij r_j  -  r_i * sum_j w_ij
  whose first term and the w-rowsum are ONE (8,TJ)x(TJ,TI) matmul against
  P_j = [x, y, z, 1]; the rank-1 correction is O(N) work outside the kernel.

VPU work per pair drops to rsqrt + 3 multiplies.  The trade-off is
accuracy on softening-dominated close pairs: the expansion cancels
catastrophically once particles drift far from the origin (error
~ |r|^2 * ulp vs the direct kernel's exact fp32 deltas), so d2 is clamped
to the softening floor and this kernel is opt-in (`--kernel pallas_mxu`).
Self-interaction cancels exactly in this formulation
(w_ii*r_i - r_i*w_ii = 0), matching the reference's unmasked diagonal.

Matmul precision is HIGHEST (6-pass bf16 ~ fp32) for the distance matrix
and the accumulation.

Measured verdict (v5e, N=131072, in-loop): 96 Gpairs/s vs the VPU kernel's
130 Gpairs/s, with L2 force error 4.5e-6 vs naive.  Both contractions have
an inherent narrow dimension of 8 (the augmented coordinate axis), capping
MXU utilization at 8/128 ~ 6%; no orientation fixes that (transposing just
moves the 8 from M to N).  Pair kernels with rank-3 geometry are VPU
workloads on TPU — this module stays as the documented experiment and an
accuracy cross-check.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import G_NEWTON, SOFTENING_SQUARED

DEFAULT_TILE_I = 512
DEFAULT_TILE_J = 512


def _kernel(a_ref, b_ref, p_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    f32 = jnp.float32
    a = a_ref[...]  # (TJ, 8): [x, y, z, |r|^2, 1, gm, 0, 0]
    # d2 = a @ b : (TJ, TI)
    d2 = jax.lax.dot_general(
        a,
        b_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d2 = jnp.maximum(d2, f32(SOFTENING_SQUARED))  # cancellation floor
    inv = jax.lax.rsqrt(d2)
    w = a[:, 5:6] * (inv * inv * inv)  # (TJ, TI), gm_j broadcast
    # m = p @ w : (8, TI) with rows [sum w*x_j, sum w*y_j, sum w*z_j, sum w]
    m = jax.lax.dot_general(
        p_ref[...],
        w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
        precision=jax.lax.Precision.HIGHEST,
    )
    out_ref[...] += m


def accelerations_between(
    pos_tgt: jax.Array,
    pos_src: jax.Array,
    mass_src: jax.Array,
    tile_i: int = DEFAULT_TILE_I,
    tile_j: int = DEFAULT_TILE_J,
    dist_dtype: str = "float32",
    interpret: bool = False,
) -> jax.Array:
    """MXU-path accelerations of targets due to sources. (3,Nt)/(3,Ns)/(Ns,)
    -> (3, Nt) fp32."""
    if jnp.dtype(dist_dtype) != jnp.float32:
        raise ValueError(
            "pallas_mxu supports only fp32 distances (the |r|^2 expansion "
            "already loses bits; use --kernel pallas for bf16 mode)"
        )
    nt = pos_tgt.shape[1]
    ns = pos_src.shape[1]
    ti = min(tile_i, nt)
    tj = min(tile_j, ns)
    if nt % ti or ns % tj:
        raise ValueError(
            f"particle counts ({nt},{ns}) must be divisible by tiles ({ti},{tj})"
        )
    f32 = jnp.float32
    gm = (mass_src * f32(G_NEWTON)).astype(f32)
    r2s = pos_src[0] ** 2 + pos_src[1] ** 2 + pos_src[2] ** 2  # (Ns,)
    r2t = pos_tgt[0] ** 2 + pos_tgt[1] ** 2 + pos_tgt[2] ** 2  # (Nt,)
    ones_s = jnp.ones((ns,), f32)
    zeros_s = jnp.zeros((ns,), f32)
    a = jnp.stack(
        [pos_src[0], pos_src[1], pos_src[2], r2s, ones_s, gm, zeros_s, zeros_s],
        axis=1,
    )  # (Ns, 8)
    b = jnp.stack(
        [
            f32(-2) * pos_tgt[0],
            f32(-2) * pos_tgt[1],
            f32(-2) * pos_tgt[2],
            jnp.ones((nt,), f32),
            r2t + f32(SOFTENING_SQUARED),
            jnp.zeros((nt,), f32),
            jnp.zeros((nt,), f32),
            jnp.zeros((nt,), f32),
        ],
        axis=0,
    )  # (8, Nt)
    p = jnp.stack(
        [pos_src[0], pos_src[1], pos_src[2], ones_s] + [zeros_s] * 4, axis=0
    )  # (8, Ns)

    grid = (nt // ti, ns // tj)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tj, 8), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, ti), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tj), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (8, ti), lambda i, j: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((8, nt), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=(16 + 16 + 4) * nt * ns,
            bytes_accessed=(nt * ns // ti) * 64 + (nt + ns) * 64,
            transcendentals=nt * ns,
        ),
        interpret=interpret,
    )(a, b, p)
    # a_i = (sum_j w r_j) - r_i * (sum_j w)
    return out[0:3, :] - pos_tgt * out[3:4, :]


def accelerations(pos: jax.Array, mass: jax.Array, **opts) -> jax.Array:
    return accelerations_between(pos, pos, mass, **opts)
