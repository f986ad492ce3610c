"""Differentiable rollout: remat and non-remat agree, gradients flow,
and the rollout matches the engine's block stepping."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nbody_tpu.init import make_state
from nbody_tpu.models.gravity import make_accel_fn
from nbody_tpu.models.integrators import make_block_fn
from nbody_tpu.models.rollout import make_rollout_fn, rollout_state


@pytest.fixture(scope="module")
def state():
    return make_state(128)


@pytest.mark.parametrize("integrator", ["euler", "leapfrog"])
def test_rollout_matches_block_fn(state, integrator):
    accel = make_accel_fn("naive")
    ro = make_rollout_fn(accel, 0.1, 7, integrator=integrator, remat=False)
    out = rollout_state(ro, state)
    blk = make_block_fn(accel, 0.1, 7, integrator=integrator)
    want, _ = blk(state)
    np.testing.assert_allclose(
        np.asarray(out.pos), np.asarray(want.pos), rtol=1e-6, atol=1e-9
    )


def test_remat_grad_matches_plain(state):
    accel = make_accel_fn("naive", differentiable=True)

    def loss_fn(remat):
        ro = make_rollout_fn(accel, 0.1, 6, remat=remat)

        def loss(vel):
            p, v = ro(state.pos, vel, state.mass)
            return jnp.sum(p * p)

        return loss

    g_plain = jax.grad(loss_fn(False))(state.vel)
    g_remat = jax.grad(loss_fn(True))(state.vel)
    np.testing.assert_allclose(
        np.asarray(g_plain), np.asarray(g_remat), rtol=1e-5, atol=1e-8
    )


def test_grad_wrt_mass_through_rollout(state):
    accel = make_accel_fn("naive", differentiable=True)
    ro = make_rollout_fn(accel, 0.1, 4, remat=True)

    def loss(mass):
        p, _ = ro(state.pos, state.vel, mass)
        return jnp.sum(p[0])

    g = jax.grad(loss)(state.mass)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).max() > 0
