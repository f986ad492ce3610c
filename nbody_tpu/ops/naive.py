"""Naive all-pairs force kernel in pure jnp — the on-device correctness oracle.

This is the TPU analog of the reference's scalar ladder rungs ver0-ver2
(ver0/GSimulation.cpp:130-150 with ver2's float-consistent constants,
ver2/GSimulation.cpp:114-143): one O(N^2) softened-gravity evaluation,
expressed as broadcasted jnp ops and left to XLA to fuse and tile.

To bound memory at large N the i-axis is processed in chunks via
``lax.map``, so peak temporary footprint is O(chunk * N) instead of O(N^2).

Self-interaction is included (dx=0 makes it exactly zero), matching the
reference (ver0/GSimulation.cpp:132-147).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..types import G_NEWTON, SOFTENING_SQUARED


def _acc_block(pos_i: jax.Array, pos: jax.Array, gm: jax.Array,
               eps2: jax.Array, dist_dtype) -> jax.Array:
    """Accelerations on a block of targets. pos_i (3,C), pos (3,N), gm (N,)."""
    d = pos[:, None, :].astype(dist_dtype) - pos_i[:, :, None].astype(dist_dtype)
    d = d.astype(jnp.float32)  # accumulate geometry in f32
    d2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2] + eps2
    inv = jax.lax.rsqrt(d2)
    w = gm[None, :] * (inv * inv * inv)  # (C, N)
    return jnp.einsum("acn,cn->ac", d, w)  # sum over j: (3, C)


@functools.partial(jax.jit, static_argnames=("chunk", "dist_dtype"))
def accelerations(
    pos: jax.Array,
    mass: jax.Array,
    chunk: int = 2048,
    dist_dtype: str = "float32",
) -> jax.Array:
    """All-pairs accelerations. pos (3,N) f32, mass (N,) f32 -> (3,N) f32.

    ``dist_dtype='bfloat16'`` computes pairwise deltas in bf16 with fp32
    accumulation (BASELINE.md config 3); default is full fp32.
    """
    n = pos.shape[1]
    gm = (mass * jnp.float32(G_NEWTON)).astype(jnp.float32)
    eps2 = jnp.float32(SOFTENING_SQUARED)
    ddt = jnp.dtype(dist_dtype)
    c = min(chunk, n)
    if n % c:
        # fall back to one block when the chunk doesn't divide N
        c = n
    blocks = pos.reshape(3, n // c, c).transpose(1, 0, 2)  # (nb, 3, c)
    acc = jax.lax.map(lambda pi: _acc_block(pi, pos, gm, eps2, ddt), blocks)
    return acc.transpose(1, 0, 2).reshape(3, n)
