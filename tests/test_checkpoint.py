"""Checkpoint / resume round-trips."""

import numpy as np

from nbody_tpu.config import SimConfig
from nbody_tpu.init import make_state
from nbody_tpu.simulation import run
from nbody_tpu.utils.checkpoint import load_state, save_state


def test_roundtrip(tmp_path):
    path = str(tmp_path / "ck.npz")
    state = make_state(100, pad_multiple=64)
    save_state(path, state, step=123)
    loaded, step = load_state(path, pad_multiple=64)
    assert step == 123
    assert loaded.n == 100 and loaded.n_padded == 128
    np.testing.assert_array_equal(
        np.asarray(loaded.pos)[:, :100], np.asarray(state.pos)[:, :100]
    )
    np.testing.assert_array_equal(
        np.asarray(loaded.mass), np.asarray(state.mass)
    )


def test_resume_continues_trajectory(tmp_path):
    path = str(tmp_path / "ck.npz")
    # one 100-step run
    full = run(SimConfig(n=128, nsteps=100, kernel="naive"), quiet=True)
    # 50 steps, checkpoint, resume 50 more
    run(
        SimConfig(n=128, nsteps=50, kernel="naive", save_state_path=path),
        quiet=True,
    )
    resumed = run(
        SimConfig(n=128, nsteps=50, kernel="naive", load_state_path=path),
        quiet=True,
    )
    ke_full = full.kenergy_trace[-1][1]
    ke_resumed = resumed.kenergy_trace[-1][1]
    assert abs(ke_resumed - ke_full) <= 1e-5 * abs(ke_full)
