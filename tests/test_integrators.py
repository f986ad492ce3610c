"""Integrator properties: Euler keeps reference parity; leapfrog is
symplectic (bounded energy error on a bound orbit where Euler drifts)."""

import numpy as np
import pytest

import jax.numpy as jnp

from nbody_tpu.models.gravity import make_accel_fn, potential_energy
from nbody_tpu.models.integrators import make_block_fn
from nbody_tpu.state import ParticleState
from nbody_tpu.types import G_NEWTON


def _binary_orbit_state():
    # Two equal masses on a circular orbit in the x-y plane.
    m = np.float32(1.0e10)  # G*m ~ 0.667
    r = 1.0
    a = G_NEWTON * float(m) / r**2
    v = np.sqrt(a * r / 2.0)
    pos = np.array([[-r / 2, r / 2], [0, 0], [0, 0]], np.float32)
    vel = np.array([[0, 0], [v, -v], [0, 0]], np.float32)
    mass = np.array([m, m], np.float32)
    return ParticleState(
        pos=jnp.asarray(pos), vel=jnp.asarray(vel), mass=jnp.asarray(mass), n=2
    )


def _total_energy(state):
    from nbody_tpu.models.gravity import kinetic_energy

    return float(kinetic_energy(state)) + float(potential_energy(state, chunk=2))


@pytest.mark.parametrize("integrator", ["euler", "leapfrog"])
def test_orbit_runs(integrator):
    state = _binary_orbit_state()
    blk = make_block_fn(make_accel_fn("naive", chunk=2), 0.01, 100,
                        integrator=integrator)
    out, ke = blk(state)
    assert np.isfinite(float(ke))


def test_leapfrog_conserves_energy_better_than_euler():
    accel = make_accel_fn("naive", chunk=2)
    steps = 2000  # ~3.7 orbital periods at dt=0.01
    drifts = {}
    for integ in ("euler", "leapfrog"):
        state = _binary_orbit_state()
        e0 = _total_energy(state)
        blk = make_block_fn(accel, 0.01, steps, integrator=integ)
        out, _ = blk(state)
        drifts[integ] = abs(_total_energy(out) - e0) / abs(e0)
    assert drifts["leapfrog"] < drifts["euler"] / 5
    assert drifts["leapfrog"] < 1e-3


def test_leapfrog_blocks_compose():
    # Two 50-step blocks must equal one 100-step block (the per-block
    # acceleration re-seed is exact, not an approximation).
    from nbody_tpu.init import make_state

    state = make_state(64)
    accel = make_accel_fn("naive", chunk=64)
    b50 = make_block_fn(accel, 0.1, 50, integrator="leapfrog")
    b100 = make_block_fn(accel, 0.1, 100, integrator="leapfrog")
    s_a, _ = b50(state)
    s_a, ke_a = b50(s_a)
    s_b, ke_b = b100(state)
    np.testing.assert_allclose(
        np.asarray(s_a.pos), np.asarray(s_b.pos), rtol=1e-6, atol=1e-9
    )
    assert float(ke_a) == pytest.approx(float(ke_b), rel=1e-6)
