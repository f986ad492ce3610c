"""Physics property tests: conservation laws, integrator order, edge cases
(the property-test layer the reference lacks — SURVEY.md §4)."""

import numpy as np
import pytest

import jax.numpy as jnp

from nbody_tpu.config import SimConfig
from nbody_tpu.init import make_state
from nbody_tpu.models.gravity import make_accel_fn
from nbody_tpu.models.integrators import make_block_fn
from nbody_tpu.simulation import run


def _angular_momentum(state):
    p = np.asarray(state.pos, np.float64)
    v = np.asarray(state.vel, np.float64)
    m = np.asarray(state.mass, np.float64)
    return (m[None, :] * np.cross(p.T, v.T).T).sum(axis=1)


def test_angular_momentum_conserved():
    # Central forces conserve total angular momentum sum m r x v.
    state = make_state(256)
    l0 = _angular_momentum(state)
    blk = make_block_fn(make_accel_fn("naive"), 0.1, 100)
    out, _ = blk(state)
    l1 = _angular_momentum(out)
    scale = np.abs(
        np.asarray(out.mass, np.float64)[None, :]
        * np.cross(np.asarray(out.pos, np.float64).T,
                   np.asarray(out.vel, np.float64).T).T
    ).sum()
    assert np.all(np.abs(l1 - l0) < 1e-5 * scale)


def _binary_state():
    from nbody_tpu.state import ParticleState
    from nbody_tpu.types import G_NEWTON

    m = np.float32(1.0e10)
    a = G_NEWTON * float(m)
    v = np.sqrt(a / 2.0)
    pos = np.array([[-0.5, 0.5], [0, 0], [0, 0]], np.float32)
    vel = np.array([[0, 0], [v, -v], [0, 0]], np.float32)
    return ParticleState(
        pos=jnp.asarray(pos), vel=jnp.asarray(vel),
        mass=jnp.asarray(np.array([m, m], np.float32)), n=2,
    )


@pytest.mark.parametrize("integrator,min_ratio", [
    ("euler", 1.4),     # first order: defect halves per dt halving (~2)
    ("leapfrog", 3.2),  # second order: quarters (~4)
])
def test_integrator_convergence_order(integrator, min_ratio):
    # Richardson check on a strongly-forced binary orbit (the default
    # system's forces are too weak for truncation error to clear fp32
    # roundoff): halving dt shrinks |x(dt) - x(dt/2)| by ~2^order.
    accel = make_accel_fn("naive", chunk=2)
    t_final = 3.2

    def final_pos(dt):
        blk = make_block_fn(accel, dt, int(round(t_final / dt)),
                            integrator=integrator)
        out, _ = blk(_binary_state())
        return np.asarray(out.pos, np.float64)

    d1 = np.linalg.norm(final_pos(0.08) - final_pos(0.04))
    d2 = np.linalg.norm(final_pos(0.04) - final_pos(0.02))
    assert d1 / max(d2, 1e-300) > min_ratio


def test_leapfrog_time_reversibility():
    # Leapfrog is time-symmetric: integrate forward, negate velocities,
    # integrate the same number of steps, and the initial positions come
    # back (up to fp32 noise).  Euler has no such symmetry.
    import jax.numpy as jnp

    from nbody_tpu.state import ParticleState

    state = _binary_state()
    accel = make_accel_fn("naive", chunk=2)
    blk = make_block_fn(accel, 0.02, 80, integrator="leapfrog")
    fwd, _ = blk(state)
    back = ParticleState(pos=fwd.pos, vel=-fwd.vel, mass=fwd.mass, n=fwd.n)
    ret, _ = blk(back)
    np.testing.assert_allclose(
        np.asarray(ret.pos), np.asarray(state.pos), atol=1e-4
    )


def test_single_particle_is_inertial():
    # One particle: zero force; position advances linearly.
    import jax.numpy as jnp

    from nbody_tpu.state import ParticleState

    st = ParticleState(
        pos=jnp.zeros((3, 1), jnp.float32),
        vel=jnp.ones((3, 1), jnp.float32),
        mass=jnp.ones((1,), jnp.float32),
        n=1,
    )
    blk = make_block_fn(make_accel_fn("naive", chunk=1), 0.5, 10)
    out, ke = blk(st)
    np.testing.assert_allclose(np.asarray(out.pos), 5.0, rtol=1e-6)
    assert float(ke) == pytest.approx(1.5)


def test_two_particles_attract():
    import jax.numpy as jnp

    from nbody_tpu.state import ParticleState

    st = ParticleState(
        pos=jnp.asarray([[-0.5, 0.5], [0, 0], [0, 0]], jnp.float32),
        vel=jnp.zeros((3, 2), jnp.float32),
        mass=jnp.full((2,), 1e10, jnp.float32),
        n=2,
    )
    acc = make_accel_fn("naive", chunk=2)(st.pos, st.mass)
    acc = np.asarray(acc)
    assert acc[0, 0] > 0 and acc[0, 1] < 0  # pulled toward each other
    np.testing.assert_allclose(acc[0, 0], -acc[0, 1], rtol=1e-6)
    assert np.all(acc[1:] == 0)


def test_zero_steps_run():
    result = run(SimConfig(n=64, nsteps=0, kernel="naive"), quiet=True)
    assert result.samples == []
