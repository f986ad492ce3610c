"""The gravity model: semi-implicit Euler stepping + kinetic-energy
diagnostic, fused into a single on-device sample block.

Reference semantics (ver0/GSimulation.cpp:153-173):
  vel += acc * dt;  pos += vel_new * dt;  KE = 0.5 * sum(m * |v|^2)

The reference's offload backends copy positions/accelerations across the
host-device boundary every step and integrate on the host
(ver5_all/programming_models/cuda/Compute.cu:147-189).  Here the entire
sample block (sfreq steps, ver0/GSimulation.cpp:31 default 50) runs on
device inside one jitted ``lax.fori_loop``; the host syncs once per block
to print diagnostics — that sync is the only host<->device traffic.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from ..state import ParticleState

AccelFn = Callable[[jax.Array, jax.Array], jax.Array]


def kinetic_energy(state: ParticleState) -> jax.Array:
    """KE = 0.5 * sum_i m_i |v_i|^2 (ver0/GSimulation.cpp:167-173).
    Zero-mass padding particles contribute exactly zero."""
    v = state.vel
    v2 = v[0] * v[0] + v[1] * v[1] + v[2] * v[2]
    return jnp.float32(0.5) * jnp.sum(state.mass * v2)


def euler_step(state: ParticleState, accel_fn: AccelFn, dt: float) -> ParticleState:
    """One semi-implicit Euler step (ver0/GSimulation.cpp:153-161)."""
    dtf = jnp.float32(dt)
    acc = accel_fn(state.pos, state.mass)
    vel = state.vel + acc * dtf
    pos = state.pos + vel * dtf
    return ParticleState(pos=pos, vel=vel, mass=state.mass, n=state.n)


def make_block_fn(accel_fn: AccelFn, dt: float, block_steps: int):
    """Build a jitted function advancing ``block_steps`` steps on device and
    returning (new_state, kinetic_energy_after_last_step)."""

    @jax.jit
    def block(state: ParticleState):
        def body(_, st):
            return euler_step(st, accel_fn, dt)

        state = jax.lax.fori_loop(0, block_steps, body, state)
        return state, kinetic_energy(state)

    return block


def make_accel_fn(kernel_name: str, **opts) -> AccelFn:
    """Bind a registry kernel with its options into the AccelFn signature."""
    from ..ops import registry

    fn = registry.get(kernel_name)
    if opts:
        fn = functools.partial(fn, **opts)
    return fn
