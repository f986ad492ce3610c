"""bench.py helpers (the driver's headline artifact must be self-consistent).

The difference-timing method (run L and 2L steps, attribute T(2L)-T(L)
to L steps) assumes both runs use identical per-step machinery; these
tests pin the regime decision to the LONGER run of each pair so a config
straddling the host-chunking threshold cannot time two different block
implementations against each other (r2 review fix).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402
from nbody_tpu.config import SimConfig  # noqa: E402
from nbody_tpu.models.gravity import needs_host_chunking  # noqa: E402
from nbody_tpu.state import round_up  # noqa: E402


def test_bf16_suite_config_straddles_chunking_threshold():
    """Documents WHY _force_chunked exists: the bf16-n131072 suite config
    flips regimes between its half (50) and full (100) step runs."""
    cfg = SimConfig(n=131072, nsteps=100, precision="bf16")
    n_pad = round_up(cfg.n, cfg.pad_multiple())
    assert not needs_host_chunking(n_pad, 50)
    assert needs_host_chunking(n_pad, 100)


def test_force_chunked_decided_by_longer_run():
    cfg = SimConfig(n=131072, nsteps=100, precision="bf16")
    assert bench._force_chunked(cfg, 100) is True
    # small configs never chunk
    assert bench._force_chunked(SimConfig(n=2000, nsteps=500), 500) is False
    # fused and sharded runs have their own dispatch (never host-chunked)
    assert bench._force_chunked(
        SimConfig(n=2000, nsteps=500, fused=True), 10**9) is False


def test_probe_backend_fail_fast(monkeypatch):
    """bench.py must not hang forever when the accelerator tunnel is
    down at bench time: CPU-pinned processes skip the probe entirely
    (this suite), a timed-out subprocess probe becomes an error string
    (-> zero-valued JSON artifact + exit 1), and a healthy probe passes."""
    import subprocess

    # conftest pins jax_platforms=cpu -> probe skipped without subprocess
    def boom(*a, **k):
        raise AssertionError("probe subprocess must not run on cpu")

    monkeypatch.setattr(subprocess, "run", boom)
    assert bench._probe_backend(0.01) is None

    monkeypatch.setattr(bench, "_configured_platforms", lambda: "axon,cpu")

    def timeout_run(cmd, timeout, **k):
        raise subprocess.TimeoutExpired(cmd, timeout)

    monkeypatch.setattr(subprocess, "run", timeout_run)
    err = bench._probe_backend(0.01)
    assert err and "timed out" in err

    class _Ok:
        returncode = 0
        stderr = ""

    monkeypatch.setattr(subprocess, "run", lambda *a, **k: _Ok())
    assert bench._probe_backend(0.01) is None

    class _Bad:
        returncode = 1
        stderr = "RPC unavailable"

    monkeypatch.setattr(subprocess, "run", lambda *a, **k: _Bad())
    err = bench._probe_backend(0.01)
    assert err and "RPC unavailable" in err


def test_timed_steps_honors_force_chunked():
    """force_chunked=True must route even a tiny run through the
    host-chunked block builder (both halves share the machinery)."""
    cfg = SimConfig(n=128, nsteps=4, kernel="naive")
    t_plain = bench._timed_steps(cfg, 2, force_chunked=False)
    t_chunk = bench._timed_steps(cfg, 2, force_chunked=True)
    assert t_plain > 0 and t_chunk > 0
