"""Failure paths and robustness of the auxiliary subsystems."""

import json
import os

import numpy as np
import pytest

from nbody_tpu.init import make_state
from nbody_tpu.utils import autotune, native
from nbody_tpu.utils.checkpoint import load_state, save_state


def test_checkpoint_rejects_newer_version(tmp_path):
    path = str(tmp_path / "ck.npz")
    save_state(path, make_state(16), step=1)
    with np.load(path) as f:
        data = {k: f[k] for k in f.files}
    data["version"] = np.int64(999)
    np.savez_compressed(path, **data)
    with pytest.raises(ValueError):
        load_state(path)


def test_autotune_survives_corrupt_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    cache = tmp_path / "nbody_tpu" / "autotune.json"
    os.makedirs(cache.parent, exist_ok=True)
    cache.write_text("{not json")
    autotune._memory_cache.clear()
    ti, tj = autotune.autotune_tiles(
        128, candidates=[(64, 128)], loops=1, interpret=True
    )
    assert (ti, tj) == (64, 128)
    # and the cache was rewritten validly
    assert json.loads(cache.read_text())


def test_native_fallback_when_build_fails(monkeypatch):
    from nbody_tpu.oracle import run_ref64

    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_build_failed", True)
    assert not native.available()
    # engine='auto' silently falls back to numpy
    samples = run_ref64(64, 50, engine="auto")
    assert len(samples) == 1
    with pytest.raises(RuntimeError):
        native.oracle_run(
            np.zeros((3, 4), np.float32), np.zeros((3, 4), np.float32),
            np.ones(4, np.float32), 1, 0.1,
        )


def test_init_distributed_single_process_after_backend_init():
    # Backends are already initialized by earlier tests; a single-process
    # init must degrade gracefully to (0, 1) instead of raising.
    from nbody_tpu.parallel.distributed import init_distributed

    rank, size = init_distributed(
        coordinator_address="127.0.0.1:1", num_processes=1, process_id=0
    )
    assert (rank, size) == (0, 1)
    # idempotent
    assert init_distributed(num_processes=1) == (0, 1)
