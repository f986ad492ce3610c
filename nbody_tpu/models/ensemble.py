"""Batched ensembles of independent simulations — `jax.vmap` over the
sample block.

A capability the reference architecture cannot express: its per-run
state is a heap-allocated ``GSimulation`` object stepped by nested loops
(ver0/GSimulation.cpp:95-173), so E independent runs are E process
launches.  Here a sample block is a pure function of a ``ParticleState``
pytree, so an ensemble is ONE transformed function: ``vmap`` adds the
member axis, XLA fuses the batch into the same kernels (the pair sweep
becomes one (E·pairs) schedule, the mesh tier one batched FFT), and one
jit/dispatch steps every member.  Use cases: seed/IC parameter sweeps,
uncertainty ensembles, and batch serving of many small systems where
per-run dispatch overhead would dominate.

Scaling: members are embarrassingly parallel, so sharding the ENSEMBLE
axis over a device mesh needs no collectives at all — pass ``mesh`` to
place members across devices (data parallelism over runs; contrast the
particle-sharded axis in ``parallel/decompose.py`` which trades
collectives for single-system size).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from ..state import ParticleState
from .gravity import make_block_fn


def stack_states(states: Sequence[ParticleState]) -> ParticleState:
    """Stack E same-shape member states into one ensemble state with a
    leading member axis on every array leaf: pos/vel (E, 3, N),
    mass (E, N).  ``n`` is static pytree metadata and must agree."""
    if not states:
        raise ValueError("stack_states needs at least one member state")
    n = states[0].n
    npad = states[0].n_padded
    for s in states[1:]:
        if s.n != n or s.n_padded != npad:
            raise ValueError(
                f"ensemble members must share (n, n_padded); got "
                f"({s.n}, {s.n_padded}) vs ({n}, {npad})"
            )
    return ParticleState(
        pos=jnp.stack([s.pos for s in states]),
        vel=jnp.stack([s.vel for s in states]),
        mass=jnp.stack([s.mass for s in states]),
        n=n,
    )


def member(state: ParticleState, i: int) -> ParticleState:
    """Extract member ``i`` of an ensemble state."""
    return ParticleState(pos=state.pos[i], vel=state.vel[i],
                         mass=state.mass[i], n=state.n)


def make_ensemble_block_fn(
    accel_fn: Callable,
    dt: float,
    steps: int,
    integrator: str = "euler",
    mesh: Optional[jax.sharding.Mesh] = None,
    axis: Optional[str] = None,
) -> Callable:
    """Jitted ensemble sample block: (ensemble ParticleState) ->
    (ensemble ParticleState, per-member KE (E,)).

    ``accel_fn`` is any single-system registry kernel binding
    (``gravity.make_accel_fn``) — every kernel family vmaps, including
    the Pallas sweeps (batch grid dimension) and the mesh tiers
    (batched FFTs).  With ``mesh``, member arrays are constrained to be
    sharded over the ensemble axis (`P(axis)` on the leading dim) —
    collective-free data parallelism over runs, so E members on K
    devices cost the wall-clock of ceil(E/K) members."""
    blk = make_block_fn(accel_fn, dt, steps, integrator=integrator)
    vblk = jax.vmap(blk)
    if mesh is None:
        return jax.jit(vblk)

    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P(axis or mesh.axis_names[0]))

    def sharded(ens):
        # Same treedef as the ensemble state (n is static aux data),
        # sharding leaves over the leading (member) axis.
        constraint = ParticleState(pos=sh, vel=sh, mass=sh, n=ens.n)
        ens = jax.lax.with_sharding_constraint(ens, constraint)
        return vblk(ens)

    return jax.jit(sharded)
