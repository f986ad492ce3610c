"""Autotuner mechanism (timing runs in Pallas interpreter mode on CPU)."""

from nbody_tpu.utils import autotune


def test_autotune_picks_valid_candidate(tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    autotune._memory_cache.clear()
    ti, tj = autotune.autotune_tiles(
        256,
        candidates=[(128, 128), (128, 256), (999, 999)],
        loops=1,
        interpret=True,
    )
    assert (ti, tj) in [(128, 128), (128, 256)]
    # disk cache round-trip
    autotune._memory_cache.clear()
    ti2, tj2 = autotune.autotune_tiles(
        256, candidates=[(128, 128)], loops=1, interpret=True
    )
    assert (ti2, tj2) == (ti, tj)


def test_engine_autotune_wiring(tmp_path, monkeypatch):
    # --autotune --interpret must tune and run on CPU (interpret reaches
    # the tuner's candidate timing, not just the final kernel).
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    autotune._memory_cache.clear()

    from nbody_tpu.config import SimConfig
    from nbody_tpu.simulation import run

    cfg = SimConfig(n=128, nsteps=50, kernel="pallas", autotune=True,
                    interpret=True)
    result = run(cfg, quiet=True)
    assert len(result.samples) == 1
    # the tuner ran (tiles chosen, valid for the padded size)
    n_padded = 2048  # lcm of default pallas tiles
    assert cfg.tile_i and n_padded % cfg.tile_i == 0
    assert cfg.tile_j and n_padded % cfg.tile_j == 0


def test_autotune_rejects_nondividing(tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    autotune._memory_cache.clear()
    # none of the candidates divide 200 -> falls back to minimal tiles
    ti, tj = autotune.autotune_tiles(
        200, candidates=[(128, 128)], loops=1, interpret=True
    )
    assert 200 % ti == 0 and 200 % tj == 0


def test_autotune_families(tmp_path, monkeypatch):
    """Every kernel family tunes, picks a valid candidate, and caches per
    (family, N) — VERDICT item: --autotune covers forward, backward and
    fused (plus the sym forward)."""
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    autotune._memory_cache.clear()
    for family, cands in [
        ("forward", [(64, 128)]),
        ("forward_sym", [(64, 64), (128, 128)]),
        ("backward", [(64, 128)]),
        ("fused", [(64, 128)]),
    ]:
        ti, tj = autotune.autotune_tiles(
            256, family=family, candidates=cands, loops=1, interpret=True
        )
        assert 256 % ti == 0 and 256 % tj == 0, (family, ti, tj)
    import json
    import os

    with open(os.path.join(str(tmp_path), "nbody_tpu", "autotune.json")) as f:
        cache = json.load(f)
    assert sum("backward|" in k for k in cache) == 1
    assert sum("fused|" in k for k in cache) == 1
    assert sum("forward_sym|" in k for k in cache) == 1


def test_engine_autotune_fused_and_sym_wiring(tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    autotune._memory_cache.clear()

    from nbody_tpu.config import SimConfig
    from nbody_tpu.simulation import run

    cfg = SimConfig(n=128, nsteps=50, fused=True, autotune=True,
                    interpret=True)
    result = run(cfg, quiet=True)
    assert len(result.samples) == 1
    assert cfg.tile_i and cfg.tile_j  # fused-family tiles chosen

    autotune._memory_cache.clear()
    cfg = SimConfig(n=128, nsteps=50, kernel="pallas_sym", autotune=True,
                    interpret=True)
    result = run(cfg, quiet=True)
    assert cfg.tile_i and 1024 % cfg.tile_i == 0  # sym block chosen


def test_differentiable_backward_tiles():
    """Tuned backward tiles flow through make_accel_fn(backward_opts=...)."""
    import jax
    import numpy as np

    from nbody_tpu.init import make_state
    from nbody_tpu.models.gravity import make_accel_fn

    state = make_state(256, pad_multiple=128)
    fn = make_accel_fn(
        "pallas", tile_i=128, tile_j=128, interpret=True,
        differentiable=True,
        backward_opts=dict(backward="pallas", tile_i=64, tile_j=128,
                           interpret=True),
    )
    ref_fn = make_accel_fn("naive", differentiable=True,
                           backward_opts=dict(backward="jnp"))

    def loss(fn):
        def f(pos):
            acc = fn(pos, state.mass)
            return (acc * acc).sum()
        return jax.grad(f)(state.pos)

    np.testing.assert_allclose(
        np.asarray(loss(fn)), np.asarray(loss(ref_fn)), rtol=2e-4, atol=1e-9
    )


def test_autotune_online_cycles_and_locks(monkeypatch):
    """--autotune-online: one warm-up + one timed sample block per
    candidate, best locked afterwards; physics identical to a fixed-tile
    run (same kernel math, only tiling switches)."""
    monkeypatch.setitem(
        autotune.DEFAULT_CANDIDATES, "forward", ((32, 64), (64, 64))
    )
    from nbody_tpu.config import SimConfig
    from nbody_tpu.simulation import run

    cfg = SimConfig(n=128, nsteps=250, sfreq=50, kernel="pallas",
                    interpret=True, autotune_online=True)
    result = run(cfg, quiet=True)
    assert len(result.samples) == 5
    # after 2 candidates x (warm + timed) = 4 blocks, the 5th ran locked
    assert (cfg.tile_i, cfg.tile_j) in ((32, 64), (64, 64))

    ref = run(SimConfig(n=128, nsteps=250, sfreq=50, kernel="naive"),
              quiet=True)
    for (s, ke), (s_r, ke_r) in zip(result.kenergy_trace, ref.kenergy_trace):
        assert s == s_r and abs(ke - ke_r) <= 1e-5 * max(abs(ke_r), 1e-9)


def test_autotune_online_skips_failing_candidate(monkeypatch):
    """A candidate that fails to compile/run mid-sweep (the VMEM-overflow
    case on hardware, e.g. forward_sym (2048,2048)) is discarded and the
    run completes with the surviving candidates."""
    from nbody_tpu.ops import pallas_kernel, registry

    real = pallas_kernel.accelerations

    def flaky(pos, mass, **opts):
        if opts.get("tile_i") == 32:
            raise RuntimeError("synthetic compile failure")
        return real(pos, mass, **opts)

    monkeypatch.setitem(
        registry._REGISTRY, "pallas",
        (flaky, pallas_kernel.accelerations_between),
    )
    monkeypatch.setitem(
        autotune.DEFAULT_CANDIDATES, "forward", ((32, 64), (64, 64))
    )
    from nbody_tpu.config import SimConfig
    from nbody_tpu.simulation import run

    cfg = SimConfig(n=128, nsteps=250, sfreq=50, kernel="pallas",
                    interpret=True, autotune_online=True)
    result = run(cfg, quiet=True)
    assert len(result.samples) == 5
    assert (cfg.tile_i, cfg.tile_j) == (64, 64)  # survivor locked in

    ref = run(SimConfig(n=128, nsteps=250, sfreq=50, kernel="naive"),
              quiet=True)
    for (s, ke), (s_r, ke_r) in zip(result.kenergy_trace, ref.kenergy_trace):
        assert s == s_r and abs(ke - ke_r) <= 1e-5 * max(abs(ke_r), 1e-9)


def test_autotune_online_retries_transient_failure(monkeypatch):
    """Round-2 advisor: a TRANSIENT failure (the tunnel's erratic
    remote-compile HTTP 500s) must not permanently discard the current
    candidate — each candidate gets one retry before being dropped."""
    from nbody_tpu.ops import pallas_kernel, registry

    real = pallas_kernel.accelerations
    calls = {"n32": 0}

    def flaky_once(pos, mass, **opts):
        if opts.get("tile_i") == 32:
            calls["n32"] += 1
            if calls["n32"] == 1:
                raise RuntimeError("synthetic transient failure")
        return real(pos, mass, **opts)

    monkeypatch.setitem(
        registry._REGISTRY, "pallas",
        (flaky_once, pallas_kernel.accelerations_between),
    )
    monkeypatch.setitem(
        autotune.DEFAULT_CANDIDATES, "forward", ((32, 64), (64, 64))
    )
    from nbody_tpu.config import SimConfig
    from nbody_tpu.simulation import run

    cfg = SimConfig(n=128, nsteps=250, sfreq=50, kernel="pallas",
                    interpret=True, autotune_online=True)
    result = run(cfg, quiet=True)
    assert len(result.samples) == 5
    # the candidate was retried after the transient failure (called again)
    assert calls["n32"] >= 2


def test_pm_rejects_bf16():
    """Round-2 advisor: '--kernel pm --precision bf16' used to silently
    run fp32 while reporting bf16; it must be rejected."""
    import pytest

    from nbody_tpu.config import SimConfig

    with pytest.raises(ValueError, match="fp32-only"):
        SimConfig(kernel="pm", precision="bf16")
    # the post-construction mutation path is caught too
    cfg = SimConfig(kernel="pm")
    cfg.precision = "bf16"
    with pytest.raises(ValueError, match="fp32-only"):
        cfg.kernel_opts()


def test_fused_candidates_include_sym():
    """The fused sweep must be able to pick the rows-sym kernel (square
    tiles select it); an all-rectangular list would lock autotuned runs
    out of the 1.34x default path."""
    assert any(ti == tj for ti, tj in autotune.DEFAULT_CANDIDATES["fused"])
    assert any(ti != tj for ti, tj in autotune.DEFAULT_CANDIDATES["fused"])


def test_autotune_online_fused(monkeypatch):
    """VERDICT item 6: --autotune-online must cover the fused family."""
    monkeypatch.setitem(
        autotune.DEFAULT_CANDIDATES, "fused", ((32, 32), (64, 64))
    )
    from nbody_tpu.config import SimConfig
    from nbody_tpu.simulation import run

    cfg = SimConfig(n=128, nsteps=250, sfreq=50, fused=True,
                    interpret=True, autotune_online=True)
    result = run(cfg, quiet=True)
    assert len(result.samples) == 5
    assert (cfg.tile_i, cfg.tile_j) in ((32, 32), (64, 64))  # locked

    ref = run(SimConfig(n=128, nsteps=250, sfreq=50, kernel="naive"),
              quiet=True)
    for (s, ke), (s_r, ke_r) in zip(result.kenergy_trace, ref.kenergy_trace):
        assert s == s_r and abs(ke - ke_r) <= 1e-4 * max(abs(ke_r), 1e-9)


def test_autotune_online_sharded(monkeypatch):
    """VERDICT item 6: --autotune-online must cover sharded runs
    (candidates sized to the LOCAL shard)."""
    monkeypatch.setitem(
        autotune.DEFAULT_CANDIDATES, "forward", ((32, 64), (64, 64))
    )
    from nbody_tpu.config import SimConfig
    from nbody_tpu.simulation import run

    # 3 blocks: one per candidate, then the lock-in block (interpreted
    # sharded steps cost ~1.5 s each — keep the count minimal).
    cfg = SimConfig(n=260, nsteps=120, sfreq=40, kernel="pallas",
                    shards=4, comm="ring", interpret=True,
                    autotune_online=True)
    result = run(cfg, quiet=True)
    assert len(result.samples) == 3
    assert (cfg.tile_i, cfg.tile_j) in ((32, 64), (64, 64))  # locked

    ref = run(SimConfig(n=260, nsteps=120, sfreq=40, kernel="naive"),
              quiet=True)
    for (s, ke), (s_r, ke_r) in zip(result.kenergy_trace, ref.kenergy_trace):
        assert s == s_r and abs(ke - ke_r) <= 1e-4 * max(abs(ke_r), 1e-9)


def test_autotune_online_sym_chunked(monkeypatch):
    """VERDICT item 6: --autotune-online must retune the huge-N
    pair-symmetric chunk sweep (the candidate tile_i overrides the sym
    block size within the fixed chunk length)."""
    import nbody_tpu.models.gravity as gravity

    # Shrink the executable budget so a small N takes the huge-N path.
    monkeypatch.setattr(gravity, "max_pairs_per_exec", lambda: 256 * 768)
    monkeypatch.setitem(
        autotune.DEFAULT_CANDIDATES, "forward_sym", ((64, 64), (128, 128))
    )
    from nbody_tpu.config import SimConfig
    from nbody_tpu.simulation import run

    cfg = SimConfig(n=700, nsteps=250, sfreq=50, kernel="pallas_sym",
                    interpret=True, autotune_online=True)
    result = run(cfg, quiet=True)
    assert len(result.samples) == 5
    assert cfg.tile_i in (64, 128)  # a sym-block candidate locked in
    ref = run(SimConfig(n=700, nsteps=250, sfreq=50, kernel="naive"),
              quiet=True)
    for (s, ke), (s_r, ke_r) in zip(result.kenergy_trace, ref.kenergy_trace):
        assert s == s_r and abs(ke - ke_r) <= 1e-4 * max(abs(ke_r), 1e-9)


def test_sr_layout_setter_roundtrip():
    """pm.set_sr_layout maps names to the layout globals, returns the
    previous state for restore, and rejects unknown names."""
    import pytest

    from nbody_tpu.ops import pm

    orig = pm.sr_layout_state()
    try:
        prev = pm.set_sr_layout("pallas_paired_sym")
        assert prev == orig
        assert (pm.SR_SWEEP_IMPL, pm.SR_SYMMETRIC,
                pm.SR_PAIRED_ROWS) == ("auto", True, True)
        pm.set_sr_layout("xla")
        assert (pm.SR_SWEEP_IMPL, pm.SR_SYMMETRIC,
                pm.SR_PAIRED_ROWS) == ("xla", False, False)
        with pytest.raises(ValueError, match="unknown SR layout"):
            pm.set_sr_layout("mosaic")
        with pytest.raises(ValueError, match="triple"):
            pm.set_sr_layout(("auto", True))
        # restore from the returned state triple
        pm.set_sr_layout(orig)
        assert pm.sr_layout_state() == orig
    finally:
        pm.set_sr_layout(orig)


def test_autotune_sr_layout_picks_and_caches(tmp_path, monkeypatch):
    import numpy as np
    import pytest

    from nbody_tpu.ops import pm

    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    autotune._memory_cache.clear()
    rng = np.random.default_rng(3)
    pos = np.asarray(rng.random((3, 256)), np.float32)
    mass = np.asarray(rng.random(256), np.float32) / 256
    orig = pm.sr_layout_state()
    win = autotune.autotune_sr_layout(
        pos, mass, dict(grid=16, cutoff_cells=4),
        candidates=("xla", "pallas_sym"), loops=1)
    assert win in ("xla", "pallas_sym")
    # timing must leave the module layout state untouched
    assert pm.sr_layout_state() == orig
    # disk cache round-trip: a fresh process-level lookup with a
    # different candidate list still returns the cached winner
    autotune._memory_cache.clear()
    win2 = autotune.autotune_sr_layout(
        pos, mass, dict(grid=16, cutoff_cells=4), candidates=("xla",),
        loops=1)
    assert win2 == win
    # a different plan signature is a different cache row
    key_a = autotune._cache_key(256, "16/4/0/0/0/0/open", "p3m_sr")
    key_b = autotune._cache_key(256, "32/4/0/0/0/0/open", "p3m_sr")
    assert key_a in autotune._memory_cache
    assert key_b not in autotune._memory_cache
    with pytest.raises(ValueError, match="cutoff_cells"):
        autotune.autotune_sr_layout(pos, mass, dict(grid=16,
                                                    cutoff_cells=0))
    with pytest.raises(ValueError, match="candidates"):
        autotune.autotune_sr_layout(
            pos, mass, dict(grid=16, cutoff_cells=4),
            candidates=("mosaic",))


def test_engine_sr_layout_wiring(tmp_path, monkeypatch):
    """--autotune on a p3m run races the SR layouts with the measured
    plan and applies the winner; --pm-sr-layout forces one without
    timing."""
    import nbody_tpu.utils.autotune as at
    from nbody_tpu.config import SimConfig
    from nbody_tpu.ops import pm
    from nbody_tpu.simulation import run

    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    autotune._memory_cache.clear()
    orig = pm.sr_layout_state()
    calls = {}

    def fake_tune(pos, mass, opts=None, **kw):
        calls["opts"] = dict(opts or {})
        return "pallas_sym"

    monkeypatch.setattr(at, "autotune_sr_layout", fake_tune)
    applied = []
    real_set = pm.set_sr_layout

    def recording_set(layout):
        applied.append(layout)
        return real_set(layout)

    monkeypatch.setattr(pm, "set_sr_layout", recording_set)
    try:
        cfg = SimConfig(n=192, nsteps=10, sfreq=10, kernel="p3m",
                        pm_grid=16, autotune=True)
        result = run(cfg, quiet=True)
        assert len(result.samples) == 1
        assert cfg.pm_sr_layout == "pallas_sym"
        # the winner was applied for the run, then RESTORED (a layout
        # applies to its run; later runs see the module defaults)
        assert applied[0] == "pallas_sym"
        assert pm.sr_layout_state() == orig
        # Round 5: the race runs BEFORE plan resolution (plans are
        # sized per-layout now, so each candidate self-sizes inside
        # autotune_sr_layout); the engine then resolves the plan under
        # the applied winner.
        assert not calls["opts"].get("sr_slabs")
        assert cfg.pm_capacity and cfg.pm_sr_slabs and cfg.pm_sr_entries

        # explicit --pm-sr-layout wins without calling the tuner
        calls.clear()
        applied.clear()
        cfg2 = SimConfig(n=192, nsteps=10, sfreq=10, kernel="p3m",
                         pm_grid=16, pm_sr_layout="xla")
        run(cfg2, quiet=True)
        assert not calls
        assert applied[0] == "xla"
        assert pm.sr_layout_state() == orig
    finally:
        real_set(orig)


def test_sr_layout_config_validation():
    import pytest

    from nbody_tpu.config import SimConfig

    with pytest.raises(ValueError, match="unknown --pm-sr-layout"):
        SimConfig(kernel="p3m", pm_sr_layout="mosaic")
    with pytest.raises(ValueError, match="pm-sr-layout"):
        SimConfig(kernel="naive", pm_sr_layout="xla")
    with pytest.raises(ValueError, match="pm-sr-layout"):
        SimConfig(kernel="pm", pm_sr_layout="xla")  # no short-range pass
    SimConfig(kernel="pm", pm_cutoff=4, pm_sr_layout="pallas_paired")
    SimConfig(kernel="p3m", pm_sr_layout="pallas_paired_sym")


def test_sr_layout_force_parity():
    """The same state solved under each requested layout returns the
    same forces (on CPU the pallas requests degrade to the XLA sweep
    with the layout's symmetric flag — the dispatch contract)."""
    import numpy as np

    from nbody_tpu.ops import pm

    rng = np.random.default_rng(11)
    pos = np.asarray(rng.random((3, 384)), np.float32)
    mass = np.asarray(rng.random(384), np.float32) / 384
    orig = pm.sr_layout_state()
    try:
        accs = {}
        for name in pm.SR_LAYOUTS:
            pm.set_sr_layout(name)
            accs[name] = np.asarray(
                pm.accelerations(pos, mass, grid=16, cutoff_cells=4))
        base = accs.pop("xla")
        scale = np.abs(base).max()
        for name, a in accs.items():
            err = np.abs(a - base).max() / scale
            assert err < 1e-5, (name, err)
    finally:
        pm.set_sr_layout(orig)
