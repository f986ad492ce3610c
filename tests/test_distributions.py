"""Initial-condition families."""

import numpy as np
import pytest

from nbody_tpu.config import SimConfig
from nbody_tpu.models.distributions import cold_sphere, make_arrays, plummer
from nbody_tpu.simulation import run
from nbody_tpu.types import G_NEWTON


def test_reference_distribution_is_default_init():
    from nbody_tpu.init import reference_init_arrays

    a = make_arrays("reference", 64)
    b = reference_init_arrays(64)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_plummer_properties():
    pos, vel, mass = plummer(4096, seed=1)
    assert pos.shape == (3, 4096) and vel.shape == (3, 4096)
    assert mass.dtype == np.float32
    # centre-of-mass frame
    assert np.abs(pos.mean(axis=1)).max() < 1e-5
    assert np.abs(vel.mean(axis=1)).max() < 1e-5
    # half-mass radius of a Plummer sphere ~ 1.3 a
    r = np.sort(np.linalg.norm(pos, axis=0))
    assert 1.0 < r[2048] < 1.7
    # roughly virialized: 2KE ~ -PE within a factor
    ke = 0.5 * np.sum(mass * np.sum(vel.astype(np.float64) ** 2, axis=0))
    d = pos[:, None, :] - pos[:, :, None]
    r2 = (d.astype(np.float64) ** 2).sum(axis=0) + 1e-12
    inv = 1.0 / np.sqrt(r2)
    np.fill_diagonal(inv, 0.0)
    pe = -0.5 * G_NEWTON * np.sum(mass[:, None] * mass[None, :] * inv)
    assert 0.5 < 2 * ke / -pe < 2.0


def test_cold_sphere_properties():
    pos, vel, mass = cold_sphere(1000, seed=3)
    assert np.all(vel == 0)
    assert np.linalg.norm(pos, axis=0).max() <= 1.0


def test_unknown_distribution():
    with pytest.raises(KeyError):
        make_arrays("gaussian", 10)


def test_run_with_plummer_and_energy_check():
    result = run(
        SimConfig(n=512, nsteps=100, dt=0.01, kernel="naive",
                  distribution="plummer", seed=7, integrator="leapfrog",
                  energy_check=True),
        quiet=True,
    )
    assert result.energy_drift is not None
    assert result.energy_drift < 1e-4  # bound system, symplectic integrator


def test_seeded_reference_distribution_differs():
    a = make_arrays("reference", 64, seed=43)
    b = make_arrays("reference", 64, seed=42)
    assert not np.array_equal(a[0], b[0])
