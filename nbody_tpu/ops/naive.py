"""Naive all-pairs force kernel in pure jnp — the on-device correctness oracle.

This is the TPU analog of the reference's scalar ladder rungs ver0-ver2
(ver0/GSimulation.cpp:130-150 with ver2's float-consistent constants,
ver2/GSimulation.cpp:114-143): one O(N^2) softened-gravity evaluation,
expressed as broadcasted jnp ops and left to XLA to fuse and tile.

Kernels are plain traceable functions (jit is applied at the sample-block
level by the engine).  The general form computes accelerations of a target
set due to a source set — the primitive the sharded data-decomposition
layer composes (each shard: local targets x streamed sources), mirroring
the reference's MPI i-slice partitioning (ver5_all/programming_models/
cpu/Compute.cpp:47-58).

To bound memory at large N the target axis is processed in chunks via
``lax.map``, so peak temporary footprint is O(chunk * N) instead of O(N^2).

Self-interaction is included (dx=0 makes it exactly zero), matching the
reference (ver0/GSimulation.cpp:132-147).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..types import G_NEWTON, SOFTENING_SQUARED


def _largest_divisor_leq(n: int, cap: int) -> int:
    for c in range(min(cap, n), 0, -1):
        if n % c == 0:
            return c
    return 1


def _acc_block(pos_t: jax.Array, pos_s: jax.Array, gm: jax.Array,
               dist_dtype) -> jax.Array:
    """Accelerations on a block of targets. pos_t (3,C), pos_s (3,N), gm (N,)."""
    # Deltas are computed in f32 and only then narrowed: casting positions
    # before subtracting would catastrophically cancel for near pairs.
    d = pos_s[:, None, :] - pos_t[:, :, None]
    d = d.astype(dist_dtype).astype(jnp.float32)  # accumulate in f32
    d2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2] + jnp.float32(SOFTENING_SQUARED)
    inv = jax.lax.rsqrt(d2)
    w = gm[None, :] * (inv * inv * inv)  # (C, N)
    return jnp.einsum("acn,cn->ac", d, w)  # sum over sources: (3, C)


def accelerations_between(
    pos_tgt: jax.Array,
    pos_src: jax.Array,
    mass_src: jax.Array,
    chunk: int = 1024,
    dist_dtype: str = "float32",
) -> jax.Array:
    """Accelerations of targets due to sources.

    pos_tgt (3, Nt), pos_src (3, Ns), mass_src (Ns,) -> acc (3, Nt), fp32.
    ``dist_dtype='bfloat16'`` computes pairwise deltas in bf16 with fp32
    accumulation (BASELINE.md config 3); default is full fp32.
    """
    nt = pos_tgt.shape[1]
    gm = (mass_src * jnp.float32(G_NEWTON)).astype(jnp.float32)
    ddt = jnp.dtype(dist_dtype)
    c = _largest_divisor_leq(nt, chunk)
    blocks = pos_tgt.reshape(3, nt // c, c).transpose(1, 0, 2)  # (nb, 3, c)
    acc = jax.lax.map(lambda pt: _acc_block(pt, pos_src, gm, ddt), blocks)
    return acc.transpose(1, 0, 2).reshape(3, nt)


def accelerations(pos: jax.Array, mass: jax.Array, **opts) -> jax.Array:
    """All-pairs self-accelerations. pos (3,N), mass (N,) -> (3,N).

    Pallas-specific registry options (tiles, interpret) are accepted and
    ignored so ``naive`` is drop-in wherever a kernel name is configurable.
    """
    for k in ("tile_i", "tile_j", "interpret", "block"):
        opts.pop(k, None)
    return accelerations_between(pos, pos, mass, **opts)
