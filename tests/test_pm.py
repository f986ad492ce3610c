"""Particle-mesh solver (ops/pm.py): accuracy vs the exact kernels and
the structural invariants (momentum, self-force, padding neutrality).

The PM tier is approximate by construction, so there is no golden-trace
gate here — the contract is bounded force error against the exact
all-pairs law plus exactly-conserved momentum (reference force law:
ver0/GSimulation.cpp:130-150; softening makes it smooth on the grid
scale, which is what the error bound rests on).
"""

import numpy as np
import pytest

from nbody_tpu.init import make_state
from nbody_tpu.ops import naive, pm


def _random_system(n, seed=0):
    rng = np.random.default_rng(seed)
    pos = np.asarray(rng.random((3, n)), np.float32)
    mass = np.asarray(n * rng.random(n), np.float32)
    return pos, mass


def test_pm_force_accuracy_vs_naive():
    """Relative L2 force error small at ng=64 for a unit-box cloud (the
    softening eps~0.032 spans ~2 cells, so CIC smoothing is the only
    error source)."""
    pos, mass = _random_system(2048)
    err = float(pm.force_error_vs_exact(pos, mass, 64))
    assert err < 0.05, err


def test_pm_error_shrinks_with_grid():
    pos, mass = _random_system(1024, seed=3)
    e32 = float(pm.force_error_vs_exact(pos, mass, 32))
    e64 = float(pm.force_error_vs_exact(pos, mass, 64))
    assert e64 < e32


def test_pm_clustered_distributions():
    """Accuracy characterization on the framework's IC families.  The
    robust box + monopole far field keep heavy-tailed Plummer ICs usable
    (an exact bounding box measured 0.96 rel error — the tail dilated the
    grid); the residual error there is intrinsic one-level PM (grid
    spacing h >> softening for a spread cluster: sub-grid close-pair
    forces are mesh-smoothed).  Compact distributions sit in the
    high-accuracy regime (h < softening)."""
    from nbody_tpu.init import make_state as mk

    bounds = {
        ("reference", 64): 2e-2,
        ("cold_sphere", 64): 5e-2,
        ("plummer", 64): 0.5,     # documented PM limitation, not a bug
        ("plummer", 128): 0.25,
    }
    for (dist, ng), bound in bounds.items():
        state = mk(4096, distribution=dist)
        err = float(pm.force_error_vs_exact(state.pos, state.mass, ng))
        assert err < bound, (dist, ng, err, bound)


def test_pm_straddling_outliers():
    """Heavy bodies on OPPOSITE sides of a light cluster: a single
    collective outlier monopole would average them into a phantom
    central mass; the per-octant far field keeps each on its own side.
    Verified against the exact kernel."""
    rng = np.random.default_rng(8)
    pos = np.asarray(0.5 + 0.01 * rng.standard_normal((3, 512)), np.float32)
    mass = np.asarray(rng.random(512), np.float32)
    pos = np.concatenate(
        [pos, np.array([[-50.0, 51.0], [0.5, 0.5], [0.5, 0.5]], np.float32)],
        axis=1,
    )
    mass = np.concatenate([mass, np.array([3e4, 3e4], np.float32)])
    a_pm = np.asarray(pm.accelerations(pos, mass, grid=32))
    a_ref = np.asarray(naive.accelerations(pos, mass))
    # in-box particles: the two far bodies' pulls nearly cancel; the pm
    # field must reproduce that rather than invent a central mass
    err = (np.linalg.norm(a_pm[:, :512] - a_ref[:, :512])
           / np.linalg.norm(a_ref[:, :512]))
    assert err < 0.05, err
    # the outliers themselves: monopole of the cluster + the other body
    err_out = (np.linalg.norm(a_pm[:, 512:] - a_ref[:, 512:])
               / np.linalg.norm(a_ref[:, 512:]))
    assert err_out < 0.05, err_out


def test_pm_momentum_exactly_conserved():
    """Same CIC kernel both ways + antisymmetric force kernel => the
    discrete momentum flux cancels pairwise (sum m*a ~ 0 to rounding)."""
    pos, mass = _random_system(1024, seed=1)
    acc = np.asarray(pm.accelerations(pos, mass, grid=32))
    p_dot = (mass * acc).sum(axis=1)
    scale = np.abs(mass[None, :] * acc).sum(axis=1) + 1e-30
    assert np.all(np.abs(p_dot) / scale < 1e-4), p_dot / scale


def test_pm_self_force_zero():
    """A lone particle exerts no force on itself (symmetric cloud x
    antisymmetric kernel)."""
    pos = np.array([[0.37], [0.81], [0.24]], np.float32)
    mass = np.array([5.0], np.float32)
    acc = np.asarray(pm.accelerations(pos, mass, grid=32))
    assert np.all(np.abs(acc) < 1e-4), acc


def test_pm_zero_mass_padding_neutral():
    """Padding sits on a FAR-AWAY diagonal (state.pad_state); the
    mass-aware bounding box must ignore it, so the real particles' forces
    are bit-identical with or without padding and everything stays
    finite."""
    pos, mass = _random_system(512, seed=2)
    acc = np.asarray(pm.accelerations(pos, mass, grid=32))
    pos2 = np.concatenate(
        [pos, 1e6 + np.tile(np.arange(64, dtype=np.float32), (3, 1))], axis=1
    )
    mass2 = np.concatenate([mass, np.zeros(64, np.float32)])
    acc2 = np.asarray(pm.accelerations(pos2, mass2, grid=32))
    np.testing.assert_array_equal(acc2[:, :512], acc)
    assert np.isfinite(acc2).all()
    # and through the real IC/padding machinery
    state = make_state(500, pad_multiple=256)
    acc_p = np.asarray(pm.accelerations(state.pos, state.mass, grid=32))
    unpadded = np.asarray(
        pm.accelerations(state.pos[:, :500], state.mass[:500], grid=32)
    )
    np.testing.assert_array_equal(acc_p[:, :500], unpadded)


def test_pm_between_matches_naive_between():
    pos_t, mass_t = _random_system(256, seed=4)
    pos_s, mass_s = _random_system(512, seed=5)
    del mass_t
    a_pm = np.asarray(
        pm.accelerations_between(pos_t, pos_s, mass_s, grid=64)
    )
    a_ref = np.asarray(naive.accelerations_between(pos_t, pos_s, mass_s))
    err = np.linalg.norm(a_pm - a_ref) / np.linalg.norm(a_ref)
    assert err < 0.05, err


def test_pm_engine_run():
    """--kernel pm end-to-end through the engine: finite trace, energy
    in the right ballpark of the exact run."""
    from nbody_tpu.config import SimConfig
    from nbody_tpu.simulation import run

    res = run(SimConfig(n=512, nsteps=100, kernel="pm", pm_grid=32),
              quiet=True)
    ref = run(SimConfig(n=512, nsteps=100, kernel="naive"), quiet=True)
    assert len(res.samples) == 2
    for (s, ke), (s_r, ke_r) in zip(res.kenergy_trace, ref.kenergy_trace):
        assert s == s_r
        assert np.isfinite(ke)
        assert abs(ke - ke_r) < 0.2 * abs(ke_r) + 1e-6, (s, ke, ke_r)


def test_pm_kernel_opts_wiring():
    from nbody_tpu.config import SimConfig

    cfg = SimConfig(kernel="pm", pm_grid=48)
    assert cfg.kernel_opts().get("grid") == 48
    assert cfg.pad_multiple() == 1
    # other kernels never receive the pm grid option
    assert "grid" not in SimConfig(kernel="pallas", pm_grid=48).kernel_opts()


def test_pm_registry_entry():
    from nbody_tpu.ops import registry

    assert "pm" in registry.available()
    # auto never resolves to the approximate tier
    assert registry.resolve("auto", n=4096) != "pm"


def test_pm_autodiff_flows():
    """jax.grad flows through the mesh solve (scatter/FFT/gather are all
    natively differentiable) — but the derivative of the CIC hat kernel
    is piecewise constant, so mesh-force gradients are only accurate on
    scales above the grid spacing.  The contract tested here is
    structural: finite, nonzero, and jit-compatible.  Gradient-accurate
    work should use the exact kernels' analytic VJP (ops/grad.py)."""
    import jax
    import jax.numpy as jnp

    pos, mass = _random_system(256, seed=6)

    def loss(p):
        a = pm.accelerations(p, jnp.asarray(mass), grid=32)
        return (a * a).sum()

    g = jax.jit(jax.grad(loss))(jnp.asarray(pos))
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).max()) > 0


def test_pm_sharded_allgather_only():
    """Sharded pm matches single-device under allgather; EVERY other comm
    mode is rejected — incl. rdma/ring_sym, which would otherwise
    silently substitute exact Pallas kernels for the requested pm."""
    from nbody_tpu.config import SimConfig
    from nbody_tpu.parallel.decompose import make_sharded_block_fn
    from nbody_tpu.parallel.mesh import make_mesh
    from nbody_tpu.simulation import run

    res = run(SimConfig(n=512, nsteps=50, kernel="pm", pm_grid=32,
                        shards=4, comm="allgather"), quiet=True)
    ref = run(SimConfig(n=512, nsteps=50, kernel="pm", pm_grid=32),
              quiet=True)
    for (s, ke), (s_r, ke_r) in zip(res.kenergy_trace, ref.kenergy_trace):
        assert abs(ke - ke_r) <= 1e-4 * max(abs(ke_r), 1e-9), (s, ke, ke_r)

    mesh = make_mesh(4)
    for comm in ("ring", "ring_sym", "rdma"):
        with pytest.raises(ValueError, match="allgather"):
            make_sharded_block_fn("pm", {}, 0.1, 5, mesh, comm=comm)


def test_pm_grid_lower_bound():
    """ng <= 3 would divide by zero (all-NaN output); tiny grids are
    rejected up front."""
    pos, mass = _random_system(64, seed=7)
    for ng in (0, 3, 7):
        with pytest.raises(ValueError, match=">= 8"):
            pm.accelerations(pos, mass, grid=ng)


def test_pm_long_block_uses_per_step_executables():
    """A pm sample block whose estimated time approaches the executable
    watchdog must be split into one executable per step; short blocks
    stay fused.  (Physics is identical either way — same accel_fn.)"""
    from nbody_tpu.config import SimConfig
    from nbody_tpu.simulation import _DeviceRunner

    # huge N + big grid -> est_step * sfreq far exceeds the 30 s budget
    cfg = SimConfig(n=4_000_000, nsteps=50, kernel="pm", pm_grid=256)
    est = 1.5e-7 * 4_000_000 + 8e-9 * 512 ** 3
    assert 50 * est > 30.0  # the config the guard exists for
    # wiring-level check on a small instance: force the estimate over
    # budget via a large sfreq and confirm the per-step builder runs
    import nbody_tpu.models.gravity as gravity

    calls = {}
    orig = gravity.make_host_chunked_block_fn

    def spy(*a, **kw):
        calls["per_step"] = kw.get("per_step")
        return orig(*a, **kw)

    # prepare()'s build() closure binds the builder name at prepare
    # time, so the spy must be installed first
    gravity.make_host_chunked_block_fn = spy
    try:
        cfg = SimConfig(n=256, nsteps=2, kernel="pm", pm_grid=64)
        runner = _DeviceRunner(cfg)
        runner.prepare()
        # est_step at ng=64 is ~17 ms -> 2000 steps exceeds the 30 s
        # budget, flipping build() into the per-step regime (build only —
        # executing 2000 CPU FFT steps here would be pointless)
        runner._block_for(2000)
    finally:
        gravity.make_host_chunked_block_fn = orig
    assert calls.get("per_step") is True


def test_pm_sharded_long_block_per_step(monkeypatch):
    """The sharded path shares the watchdog logic: a long pm block runs
    as host-looped sub-block executables, physics identical to the
    normal fused sharded block.  The reference runner is built BEFORE
    the estimate is patched, so the two runners genuinely take
    different paths."""
    from nbody_tpu.config import SimConfig
    from nbody_tpu.simulation import _DeviceRunner

    ref = _DeviceRunner(SimConfig(n=512, nsteps=50, kernel="pm",
                                  pm_grid=32, shards=4))
    ref.prepare()
    # fused path taken for the MAIN block (the 1-step entry is the
    # watchdog-feedback probe, not a sub-block split)
    assert not any(isinstance(k, tuple) and k and k[0] == "pm-sub"
                   and k[1] != 1 for k in ref._blocks)
    ke_ref = ref.run_block(50)

    # est=2 s/step -> 50-step block over budget, sub-blocks of 15 steps
    monkeypatch.setattr(_DeviceRunner, "_pm_step_est", lambda self: 2.0)
    runner = _DeviceRunner(SimConfig(n=512, nsteps=50, kernel="pm",
                                     pm_grid=32, shards=4))
    runner.prepare()
    ke = runner.run_block(50)
    assert any(isinstance(k, tuple) and k and k[0] == "pm-sub"
               and k[1] != 1 for k in runner._blocks)  # sub-blocks engaged
    assert abs(ke - ke_ref) <= 1e-4 * max(abs(ke_ref), 1e-9), (ke, ke_ref)


def test_pm_docstring_accuracy_consistent():
    """The module docstring's headline error figure must match the
    tested/gated value (8.5e-4 at ng=128), not drift independently."""
    assert "8.5e-4" in pm.__doc__


def test_pm_watchdog_feedback_from_measured_step(monkeypatch):
    """Round-2 VERDICT item 7: the watchdog guard must be corrected by a
    MEASURED first step, not trust the open-loop constants.  A
    deliberately slowed accel_fn (host-callback sleep) makes the
    heuristic a huge underestimate; the engine must still end up with
    per-executable work inside the (shrunken, monkeypatched) budget."""
    import time as _time

    import jax

    from nbody_tpu.config import SimConfig
    from nbody_tpu.ops import pm as pm_ops
    from nbody_tpu.ops import registry
    from nbody_tpu.simulation import _DeviceRunner

    real = pm_ops.accelerations

    def slow_pm(pos, mass, **opts):
        def sleep_id(x):
            _time.sleep(0.05)
            return x

        acc = real(pos, mass, **opts)
        return jax.pure_callback(
            sleep_id, jax.ShapeDtypeStruct(acc.shape, acc.dtype), acc
        )

    monkeypatch.setitem(
        registry._REGISTRY, "pm", (slow_pm, pm_ops.accelerations_between)
    )
    # Budget shrunk so the test stays fast: measured ~0.05 s/step >>
    # heuristic (~1 ms at n=256/ng=32); 10-step block over a 0.2 s
    # budget must flip to per-step executables.
    monkeypatch.setattr(_DeviceRunner, "PM_EXEC_BUDGET_S", 0.2)

    import nbody_tpu.models.gravity as gravity

    builds = []
    orig = gravity.make_host_chunked_block_fn

    def spy(dt, block_steps, *a, **kw):
        builds.append((block_steps, kw.get("per_step")))
        return orig(dt, block_steps, *a, **kw)

    monkeypatch.setattr(gravity, "make_host_chunked_block_fn", spy)
    runner = _DeviceRunner(
        SimConfig(n=256, nsteps=10, sfreq=10, kernel="pm", pm_grid=32)
    )
    runner.prepare()
    assert runner._pm_measured >= 0.05  # the probe saw the slow backend
    # the MAIN block (10 steps) was built per-step despite the tiny
    # heuristic estimate
    assert (10, True) in builds, builds


# ---------------------------------------------------------------------------
# Periodic-box boundary mode (ops/pm.py "Periodic-box boundary mode")
# ---------------------------------------------------------------------------


def _kspace_reference(pos, mass, box, kmax=56):
    """Independent fp64 direct Fourier-series sum of the periodic
    softened-Plummer forces: a_i = (G/L^3) sum_{k!=0} Re[i k phi_hat(k)
    rho_hat(k) e^{ik.x_i}] with phi_hat = 4 pi (eps k) K1(eps k) / k^2
    (scipy Bessel, no grids, no FFTs — absolutely convergent thanks to
    the e^{-eps k} decay; truncation tail at kmax=56, eps=0.0316, L=1
    is ~1e-4 relative).  This is the ground truth the solver's CIC+FFT
    pipeline is measured against."""
    import scipy.special as sp

    L = float(box)
    eps = np.sqrt(1e-3)
    G = 6.67259e-11
    p = pos.astype(np.float64)
    m = mass.astype(np.float64)
    n1 = np.arange(-kmax, kmax + 1)
    ky, kz = np.meshgrid(2 * np.pi / L * n1, 2 * np.pi / L * n1,
                         indexing="ij")
    acc = np.zeros((3, p.shape[1]))
    for nx in n1:  # slab over kx keeps memory bounded
        kx = 2 * np.pi / L * nx
        kvec = np.stack([np.full_like(ky, kx), ky, kz]).reshape(3, -1)
        k2 = (kvec ** 2).sum(axis=0)
        kk = np.where(k2 > 0, np.sqrt(k2), 1.0)  # k=0 masked below
        phih = np.where(k2 > 0, 4 * np.pi * eps * sp.k1(kk * eps) / kk, 0.0)
        rho = (m[None, :] * np.exp(-1j * kvec.T @ p)).sum(axis=1)
        wave = np.exp(1j * kvec.T @ p)  # (K2, N)
        coef = 1j * kvec * (phih * rho)[None, :]  # (3, K2)
        acc += (coef @ wave).real
    return G / L ** 3 * acc


def test_pm_periodic_xk1_vs_scipy():
    """The fp32 A&S polynomial g(x) = x K1(x) used for the closed-form
    periodic kernel spectrum, against scipy's fp64 Bessel."""
    import scipy.special as sp

    x = np.concatenate([[0.0, 1e-6, 1e-3], np.linspace(0.01, 30.0, 400)])
    got = np.asarray(pm._xk1(x), np.float64)
    want = np.where(x > 0, x * sp.k1(np.maximum(x, 1e-300)), 1.0)
    assert np.all(np.abs(got - want) <= 2e-6 + 1e-5 * np.abs(want)), (
        np.abs(got - want).max())


def test_pm_periodic_vs_kspace_sum():
    """CIC+FFT periodic solve vs the independent direct k-space sum:
    the same CIC-limited error scaling as the open solver (module
    docstring: 3.7e-2 / 5.8e-3 at ng=32/64)."""
    rng = np.random.default_rng(11)
    pos = np.asarray(rng.random((3, 16)), np.float32)
    mass = np.asarray(1.0 + rng.random(16), np.float32)
    a_ref = _kspace_reference(pos, mass, 1.0)
    errs = {}
    for ng in (32, 64):
        a = np.asarray(pm.accelerations(pos, mass, grid=ng,
                                        boundary="periodic", box_size=1.0))
        errs[ng] = (np.linalg.norm(a - a_ref)
                    / np.linalg.norm(a_ref))
    assert errs[32] < 7e-2, errs
    assert errs[64] < 1.5e-2, errs
    assert errs[64] < errs[32], errs


def test_pm_periodic_momentum_and_wrap():
    """Momentum conservation (antisymmetric kernel), exact-image
    invariance (positions shifted by whole boxes), and zero-mass
    padding neutrality in the periodic solver."""
    rng = np.random.default_rng(12)
    pos = np.asarray(rng.random((3, 512)), np.float32)
    mass = np.asarray(rng.random(512), np.float32)
    acc = np.asarray(pm.accelerations(pos, mass, grid=32,
                                      boundary="periodic", box_size=1.0))
    p_dot = (mass * acc).sum(axis=1)
    scale = np.abs(mass[None, :] * acc).sum(axis=1) + 1e-30
    assert np.all(np.abs(p_dot) / scale < 1e-4), p_dot / scale
    # whole-box image shifts change nothing (up to the fp32 rounding of
    # pos+shift itself)
    shift = np.asarray(rng.integers(-3, 4, (3, 512)), np.float32)
    acc_s = np.asarray(pm.accelerations(pos + shift, mass, grid=32,
                                        boundary="periodic", box_size=1.0))
    num = np.linalg.norm(acc_s - acc)
    assert num / np.linalg.norm(acc) < 1e-3, num / np.linalg.norm(acc)
    # zero-mass padding (even far outside the box: it wraps) leaves the
    # real particles' forces bit-identical
    pos2 = np.concatenate(
        [pos, 1e6 + np.tile(np.arange(64, dtype=np.float32), (3, 1))], axis=1
    )
    mass2 = np.concatenate([mass, np.zeros(64, np.float32)])
    acc2 = np.asarray(pm.accelerations(pos2, mass2, grid=32,
                                       boundary="periodic", box_size=1.0))
    np.testing.assert_array_equal(acc2[:, :512], acc)
    assert np.isfinite(acc2).all()


def test_pm_periodic_uniform_background_subtraction():
    """A mesh-aligned uniform lattice is pure background: density
    contrast zero everywhere, so forces vanish (vs O(G*N/L^2) for the
    same masses scattered randomly)."""
    g1 = (np.arange(8, dtype=np.float32) + 0.5) / 8.0
    gx, gy, gz = np.meshgrid(g1, g1, g1, indexing="ij")
    pos = np.stack([gx.ravel(), gy.ravel(), gz.ravel()])
    mass = np.ones(512, np.float32)
    a_lat = np.asarray(pm.accelerations(pos, mass, grid=32,
                                        boundary="periodic", box_size=1.0))
    rng = np.random.default_rng(13)
    a_rnd = np.asarray(pm.accelerations(
        np.asarray(rng.random((3, 512)), np.float32), mass, grid=32,
        boundary="periodic", box_size=1.0))
    assert np.abs(a_lat).max() < 1e-3 * np.abs(a_rnd).max(), (
        np.abs(a_lat).max(), np.abs(a_rnd).max())


def test_pm_periodic_autodiff_flows():
    """The wrap is identity a.e. and the kernel spectrum is a trace
    constant: jax.grad flows (same structural contract as the open
    solver's autodiff test)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(14)
    pos = np.asarray(rng.random((3, 128)), np.float32)
    mass = np.asarray(rng.random(128), np.float32)

    def loss(p):
        a = pm.accelerations(p, jnp.asarray(mass), grid=32,
                             boundary="periodic", box_size=1.0)
        return (a * a).sum()

    g = jax.jit(jax.grad(loss))(jnp.asarray(pos))
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).max()) > 0


def test_pm_periodic_sharded_matches_single():
    """Sharded periodic solve (local deposit -> ONE grid psum ->
    replicated spectral solve -> local gather) agrees with the
    single-device block through the engine."""
    from nbody_tpu.config import SimConfig
    from nbody_tpu.simulation import run

    kw = dict(n=512, nsteps=50, kernel="pm", pm_grid=32,
              pm_boundary="periodic", pm_box=8.0)
    res = run(SimConfig(shards=4, comm="allgather", **kw), quiet=True)
    ref = run(SimConfig(**kw), quiet=True)
    for (s, ke), (s_r, ke_r) in zip(res.kenergy_trace, ref.kenergy_trace):
        assert abs(ke - ke_r) <= 1e-4 * max(abs(ke_r), 1e-9), (s, ke, ke_r)


def test_pm_periodic_option_validation():
    """Boundary-mode option errors at both the config and solver layers."""
    from nbody_tpu.config import SimConfig

    pos, mass = _random_system(64, seed=9)
    with pytest.raises(ValueError, match="boundary"):
        pm.accelerations(pos, mass, grid=32, boundary="reflecting")
    with pytest.raises(ValueError, match="box_size"):
        pm.accelerations(pos, mass, grid=32, boundary="periodic")
    with pytest.raises(ValueError, match="kernel pm"):
        SimConfig(kernel="naive", pm_boundary="periodic", pm_box=1.0)
    with pytest.raises(ValueError, match="pm-box"):
        SimConfig(kernel="pm", pm_boundary="periodic")
    with pytest.raises(ValueError, match="pm-box"):
        SimConfig(kernel="pm", pm_box=1.0)
    with pytest.raises(ValueError, match="ref64"):
        # the host oracle is the OPEN-boundary ver0 replica — silently
        # ignoring the box would run different physics than requested
        SimConfig(kernel="pm", pm_boundary="periodic", pm_box=1.0,
                  precision="ref64")
    opts = SimConfig(kernel="pm", pm_boundary="periodic",
                     pm_box=2.5).kernel_opts()
    assert opts.get("boundary") == "periodic"
    assert opts.get("box_size") == 2.5
    # open mode passes no boundary opts at all (solver defaults rule)
    assert "boundary" not in SimConfig(kernel="pm").kernel_opts()


def test_pm_periodic_energy_check():
    """--energy-check under periodic boundaries uses the mesh-solved
    background-subtracted PE (the open pairwise image sum diverges);
    a short periodic run must report finite, small drift."""
    from nbody_tpu.config import SimConfig
    from nbody_tpu.simulation import run

    res = run(SimConfig(n=512, nsteps=100, kernel="pm", pm_grid=32,
                        pm_boundary="periodic", pm_box=8.0,
                        energy_check=True), quiet=True)
    assert res.energy_drift is not None
    assert np.isfinite(res.energy_drift)
    assert abs(res.energy_drift) < 5e-2, res.energy_drift
