"""Kernel fuzzing: pallas (interpret) vs naive vs fp64 reference across
position magnitudes, mass scales, and awkward shapes — the drifted/late-time
regimes the golden traces don't reach."""

import numpy as np
import pytest

from nbody_tpu.ops import naive, pallas_kernel
from nbody_tpu.types import G_NEWTON, SOFTENING_SQUARED


def _ref64(pos, mass):
    p = pos.astype(np.float64)
    d = p[:, None, :] - p[:, :, None]
    d2 = (d**2).sum(axis=0) + SOFTENING_SQUARED
    w = (G_NEWTON * mass.astype(np.float64))[None, :] * d2**-1.5
    return (w[None] * d).sum(axis=2)


@pytest.mark.parametrize("seed,n,scale,offset", [
    (0, 384, 1.0, 0.0),
    (1, 256, 1e3, 0.0),      # late-time drifted cloud
    (2, 512, 1.0, 50.0),     # far from origin
    (3, 128, 1e-2, 0.0),     # dense core, softening-dominated
    (4, 640, 10.0, -20.0),   # negative octant
])
def test_kernels_against_fp64(seed, n, scale, offset):
    rng = np.random.default_rng(seed)
    pos = (rng.random((3, n)) * scale + offset).astype(np.float32)
    mass = (rng.random(n) * n).astype(np.float32)
    want = _ref64(pos, mass)
    wn = np.linalg.norm(want)

    got_n = np.asarray(naive.accelerations(pos, mass), np.float64)
    assert np.linalg.norm(got_n - want) / wn < 5e-6

    got_p = np.asarray(
        pallas_kernel.accelerations(pos, mass, tile_i=128, tile_j=128,
                                    interpret=True),
        np.float64,
    )
    assert np.linalg.norm(got_p - want) / wn < 5e-6


def test_coincident_distinct_particles():
    # Two massive particles at the SAME position: softening bounds the
    # force and antisymmetry makes it exactly zero.
    pos = np.zeros((3, 2), np.float32)
    mass = np.full(2, 1e6, np.float32)
    acc = np.asarray(naive.accelerations(pos, mass, chunk=2))
    assert np.all(acc == 0)
    acc_p = np.asarray(
        pallas_kernel.accelerations(pos, mass, tile_i=2, tile_j=2,
                                    interpret=True)
    )
    assert np.all(acc_p == 0)
