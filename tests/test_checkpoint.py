"""Checkpoint / resume round-trips."""

import numpy as np
import pytest

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


def test_orbax_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from nbody_tpu.utils.checkpoint import load_state_orbax, save_state_orbax

    path = str(tmp_path / "orbax_ck")
    state = make_state(100, pad_multiple=64)
    save_state_orbax(path, state, step=7)
    loaded, step = load_state_orbax(path)
    assert step == 7 and loaded.n == 100
    np.testing.assert_array_equal(np.asarray(loaded.pos), np.asarray(state.pos))
    # the generic loader auto-detects the directory format
    loaded2, step2 = load_state(path, pad_multiple=64)
    assert step2 == 7 and loaded2.n_padded % 64 == 0


def test_orbax_through_engine(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    path = str(tmp_path / "ock")
    run(
        SimConfig(n=128, nsteps=50, kernel="naive", save_state_path=path,
                  checkpoint_backend="orbax"),
        quiet=True,
    )
    resumed = run(
        SimConfig(n=128, nsteps=50, kernel="naive", load_state_path=path),
        quiet=True,
    )
    full = run(SimConfig(n=128, nsteps=100, kernel="naive"), quiet=True)
    ke_r = resumed.kenergy_trace[-1][1]
    ke_f = full.kenergy_trace[-1][1]
    assert abs(ke_r - ke_f) <= 1e-5 * abs(ke_f)


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


def test_resume_keeps_absolute_step_counter(tmp_path):
    """A resumed run continues the checkpoint's absolute step counter in
    the printed step column and in subsequent checkpoints (chained
    resumes must not reset progress to 0)."""
    path = str(tmp_path / "ck.npz")
    run(
        SimConfig(n=128, nsteps=100, kernel="naive", save_state_path=path),
        quiet=True,
    )
    _, step = load_state(path)
    assert step == 100
    resumed = run(
        SimConfig(n=128, nsteps=50, kernel="naive",
                  load_state_path=path, save_state_path=path),
        quiet=True,
    )
    assert resumed.start_step == 100
    assert resumed.samples[0][0] == 150  # absolute, not relative
    assert resumed.samples[0][1] == pytest.approx(150 * 0.1, rel=1e-5)
    _, step2 = load_state(path)
    assert step2 == 150


def test_orbax_sharded_save_restore_reshard(tmp_path):
    """The multi-host restore path documented in checkpoint.py
    (load_state_orbax docstring): save an 8-way particle-sharded state
    directly from device shards, restore, re-shard with device_put onto
    the target sharding, and verify bit-exact state and identical
    stepping."""
    pytest.importorskip("orbax.checkpoint")
    import jax
    from jax.sharding import NamedSharding

    from nbody_tpu.parallel.decompose import (
        make_sharded_block_fn,
        shard_state,
        state_specs,
    )
    from nbody_tpu.state import ParticleState
    from nbody_tpu.utils.checkpoint import load_state_orbax, save_state_orbax

    path = str(tmp_path / "sharded_ck")
    state = make_state(512, pad_multiple=8)
    sharded, mesh = shard_state(state, 8)
    save_state_orbax(path, sharded, step=42)

    restored, step = load_state_orbax(path)
    assert step == 42 and restored.n == 512
    specs = state_specs()
    pos = jax.device_put(restored.pos, NamedSharding(mesh, specs.pos))
    vel = jax.device_put(restored.vel, NamedSharding(mesh, specs.vel))
    mass = jax.device_put(restored.mass, NamedSharding(mesh, specs.mass))
    np.testing.assert_array_equal(np.asarray(pos), np.asarray(sharded.pos))
    np.testing.assert_array_equal(np.asarray(vel), np.asarray(sharded.vel))
    np.testing.assert_array_equal(np.asarray(mass), np.asarray(sharded.mass))
    assert len(pos.sharding.device_set) == 8

    # The resharded state steps identically to the original.
    blk = make_sharded_block_fn("naive", {}, 0.1, 2, mesh, comm="ring")
    _, ke_restored = blk(
        ParticleState(pos=pos, vel=vel, mass=mass, n=restored.n)
    )
    _, ke_orig = blk(sharded)
    assert float(ke_restored) == float(ke_orig)
