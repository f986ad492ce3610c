"""Initial conditions, bit-compatible with the reference.

The reference draws every field from a freshly re-seeded ``std::mt19937(42)``
(ver0/GSimulation.cpp:44-93):

* positions  ~ U(0, 1), three sequential draws per particle (:44-56)
* velocities ~ U(-1, 1) * 1.0e-3f, three draws per particle (:58-70)
* masses     = float(N) * U(0, 1), one draw per particle (:82-93)
* accelerations start at zero (:72-80) — implicit here (acc is not state)

Because each field re-seeds with 42, masses reuse the same underlying draw
sequence as positions (mass[i] scales the i-th draw; pos uses draws 3i..3i+2).

All arithmetic matches libstdc++ fp32 semantics exactly (see
utils/mt19937.py); validated bit-for-bit against GCC-12-built fixtures.
"""

from __future__ import annotations

import numpy as np

from .state import ParticleState, pad_state, round_up
from .utils.mt19937 import MT19937, generate_canonical_f32


def reference_init_arrays(n: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side (pos, vel, mass) exactly as the reference initializes them.

    Returns pos (3, n), vel (3, n), mass (n,), all fp32, where
    pos[:, i] = (x_i, y_i, z_i) in the reference's draw order.
    """
    u01 = generate_canonical_f32(MT19937(42).raw(3 * n))  # U(0,1) canonicals
    u11 = generate_canonical_f32(MT19937(42).raw(3 * n))
    # uniform_real_distribution(a, b): canonical * (b - a) + a, in fp32.
    pos = u01.reshape(n, 3).T.copy()  # (b-a)=1, a=0: identity
    vel_draw = (u11 * np.float32(2.0) + np.float32(-1.0)).astype(np.float32)
    vel = (vel_draw * np.float32(1.0e-3)).astype(np.float32).reshape(n, 3).T.copy()
    mass = (np.float32(n) * u01[:n]).astype(np.float32)
    return pos, vel, mass


def make_state(
    n: int,
    pad_multiple: int = 1,
    distribution: str = "reference",
    seed: int = 42,
) -> ParticleState:
    """Build a device ParticleState padded with zero-mass particles to a
    multiple of ``pad_multiple``.

    distribution: 'reference' (bit-exact reference ICs, the default),
    'plummer', or 'cold_sphere' (models/distributions.py)."""
    if distribution == "reference" and seed == 42:
        pos, vel, mass = reference_init_arrays(n)
    else:
        from .models.distributions import make_arrays

        pos, vel, mass = make_arrays(distribution, n, seed=seed)
    return pad_state(pos, vel, mass, round_up(n, max(1, pad_multiple)))
