"""P3M: the particle-mesh solver with the exact short-range correction
(ops/pm.py, cutoff_cells > 0; the round-2 VERDICT's top ask).

Contract: the force split f = f*S + f*(1-S) is an exact identity, so the
only error sources are the mesh discretization of the SMOOTH tapered
part (CIC-deconvolved) and cell-capacity overflow (which falls back to
mesh-quality full forces).  That makes P3M accurate precisely where
one-level PM was not — clustered distributions (reference force law:
ver0/GSimulation.cpp:130-150)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu.models.distributions import cold_sphere, plummer
from nbody_tpu.ops import naive, pm


def _err(pos, mass, ng, cutoff, cap):
    return float(pm.force_error_vs_exact(pos, mass, ng, cutoff, cap))


def test_taper_properties():
    import jax.numpy as jnp

    q = jnp.linspace(-0.5, 1.5, 101)
    s = np.asarray(pm._taper(q))
    assert s[0] == 0.0 and s[-1] == 1.0
    assert np.all(np.diff(s) >= 0)  # monotone
    # compact support of the short-range factor: 1-S == 0 beyond R_c
    assert np.all(s[q >= 1.0] == 1.0)


def test_p3m_plummer_accuracy():
    """The VERDICT round-2 'done' criterion (scaled to CI size; the
    N=8192 measurement — 4.3e-3 / 3.1e-3 at ng=64/128 vs pm's 0.43/0.18
    — is recorded in docs/DESIGN.md)."""
    pos, _, mass = plummer(2048, seed=1)
    cap = pm.suggest_capacity(pos, mass, 64, 4)
    assert _err(pos, mass, 64, 4, cap) < 1.5e-2
    cap = pm.suggest_capacity(pos, mass, 128, 4)
    assert _err(pos, mass, 128, 4, cap) < 8e-3


def test_p3m_beats_pm_on_clustered():
    pos, _, mass = plummer(2048, seed=2)
    e_pm = _err(pos, mass, 64, 0, 0)
    e_p3m = _err(pos, mass, 64, 4, pm.suggest_capacity(pos, mass, 64, 4))
    assert e_p3m < e_pm / 5, (e_pm, e_p3m)


def test_p3m_cutoff_is_accuracy_knob():
    """Error ~ cutoff^-3: a larger split radius must help."""
    pos, _, mass = cold_sphere(2048, seed=1)
    e4 = _err(pos, mass, 64, 4, 128)
    e8 = _err(pos, mass, 64, 8, 512)
    assert e8 < e4 / 2, (e4, e8)


def test_p3m_sub_resolution_cells():
    """Coarse meshes use half-R_c cells with a +-2 reach (sub=2); the
    path must stay accurate."""
    nc, sub = pm._cell_grid_params(32, 4)
    assert sub == 2 and nc == 16
    nc, sub = pm._cell_grid_params(128, 4)
    assert sub == 1 and nc == 32
    pos, _, mass = cold_sphere(1024, seed=3)
    e_pm = _err(pos, mass, 32, 0, 0)
    e_p3m = _err(pos, mass, 32, 4, 256)
    assert e_p3m < e_pm, (e_pm, e_p3m)
    assert e_p3m < 5e-2


def test_p3m_momentum_conserved():
    """With no capacity overflow the short-range pair sum is exactly
    antisymmetric and the mesh part is deposit/gather-symmetric with an
    antisymmetric (deconvolved) kernel: total momentum flux ~ 0."""
    pos, _, mass = cold_sphere(1024, seed=4)
    cap = pm.suggest_capacity(pos, mass, 64, 4)
    assert float(pm.cell_overflow_fraction(pos, mass, 64, 4, cap)) == 0.0
    a = np.asarray(pm.accelerations(pos, mass, grid=64, cutoff_cells=4,
                                    capacity=cap))
    flux = np.abs((mass[None, :] * a).sum(axis=1))
    scale = np.abs(mass[None, :] * a).sum()
    assert np.all(flux < 2e-6 * scale), (flux, scale)


def test_p3m_overflow_falls_back_to_mesh_quality():
    """Starving the cell list (capacity 8) must degrade accuracy toward
    plain PM — never below it (the complement-kernel deposit gives
    overflowed sources a mesh-quality FULL force)."""
    pos, _, mass = plummer(2048, seed=5)
    ov = float(pm.cell_overflow_fraction(pos, mass, 64, 4, 8))
    assert ov > 0.1  # the core genuinely overflows at capacity 8
    e_pm = _err(pos, mass, 64, 0, 0)
    e_starved = _err(pos, mass, 64, 4, 8)
    e_full = _err(pos, mass, 64, 4, pm.suggest_capacity(pos, mass, 64, 4))
    assert e_full < e_starved <= e_pm * 1.25, (e_full, e_starved, e_pm)


def test_p3m_zero_mass_padding_neutral():
    from nbody_tpu.init import make_state

    state = make_state(1000, pad_multiple=256)  # padded to 1024
    acc = np.asarray(pm.accelerations(state.pos, state.mass, grid=32,
                                      cutoff_cells=4, capacity=64))
    ref = np.asarray(pm.accelerations(state.pos[:, :1000],
                                      state.mass[:1000], grid=32,
                                      cutoff_cells=4, capacity=64))
    np.testing.assert_allclose(acc[:, :1000], ref, rtol=2e-5, atol=1e-8)


def test_p3m_between_matches_self():
    pos, _, mass = cold_sphere(512, seed=6)
    a_self = np.asarray(pm.p3m_accelerations(pos, mass, grid=32,
                                             capacity=64))
    a_btwn = np.asarray(pm.p3m_accelerations_between(pos, pos, mass,
                                                     grid=32, capacity=64))
    np.testing.assert_array_equal(a_self, a_btwn)


def test_p3m_registry_and_config():
    from nbody_tpu.config import SimConfig
    from nbody_tpu.ops import registry

    assert "p3m" in registry.available()
    fn = registry.get("p3m")
    pos, _, mass = cold_sphere(256, seed=7)
    a = np.asarray(fn(pos, mass, grid=32, capacity=64))
    assert np.all(np.isfinite(a))

    cfg = SimConfig(kernel="p3m", pm_grid=32, pm_cutoff=6, pm_capacity=128)
    opts = cfg.kernel_opts()
    assert opts == {"grid": 32, "cutoff_cells": 6, "capacity": 128}


def test_p3m_sharded_matches_single():
    """Sharded p3m (local mesh deposit + grid psum; short-range entry
    chunks split across shards + slot-table psum) agrees with the
    single-device solve to summation-order tolerance."""
    from nbody_tpu.config import SimConfig
    from nbody_tpu.simulation import run

    kw = dict(n=512, nsteps=50, kernel="p3m", pm_grid=32,
              distribution="plummer", dt=0.01)
    res = run(SimConfig(shards=4, comm="allgather", **kw), quiet=True)
    ref = run(SimConfig(**kw), quiet=True)
    for (s, ke), (s_r, ke_r) in zip(res.kenergy_trace, ref.kenergy_trace):
        assert abs(ke - ke_r) <= 1e-4 * max(abs(ke_r), 1e-9), (s, ke, ke_r)


def test_suggest_sr_plan_measured_and_sufficient():
    """The measured plan (slab count S, worklist entries E) must give
    the SAME forces as the guaranteed default bounds — the plan is a
    memory/size optimization, never an accuracy knob — and starving
    sr_entries must degrade gracefully (finite, worse-or-equal)."""
    pos, _, mass = plummer(2048, seed=8)
    plan = pm.suggest_sr_plan(pos, mass, 64, 4)
    assert set(plan) == {"capacity", "sr_slabs", "sr_entries"}
    a_plan = np.asarray(pm.accelerations(pos, mass, grid=64,
                                         cutoff_cells=4, **plan))
    a_def = np.asarray(pm.accelerations(pos, mass, grid=64,
                                        cutoff_cells=4,
                                        capacity=plan["capacity"]))
    np.testing.assert_allclose(a_plan, a_def, rtol=1e-5, atol=1e-10)
    # plan sizes are powers of two (stable jit shapes on re-suggestion)
    for key in ("sr_slabs", "sr_entries"):
        v = plan[key]
        assert v >= 64 and (v & (v - 1)) == 0, (key, v)
    # truncation: a starved worklist drops SR pairs but stays finite
    a_trunc = np.asarray(pm.accelerations(
        pos, mass, grid=64, cutoff_cells=4, capacity=plan["capacity"],
        sr_slabs=plan["sr_slabs"], sr_entries=256))
    assert np.all(np.isfinite(a_trunc))


def test_sr_worklist_count_independent_of_slab_padding():
    """Review fix: windows reaching past the last real cell id must NOT
    sweep in the empty padding slabs (pinned at the n_cells sentinel) —
    that made n_e grow with sr_slabs table padding, so a measured
    suggest_sr_plan could overflow e_max on the very state it was sized
    from, silently dropping real t-major tail entries."""
    from nbody_tpu.init import make_state

    st = make_state(12288, distribution="reference", seed=3)
    plan = pm.suggest_sr_plan(st.pos, st.mass, 64, 4)
    # Plans are sized for the ACTIVE layout — pack the worklist the
    # production solver would realize for this plan.
    sym, pr = pm._active_sr_layout(plan["sr_slabs"] + 1)
    base = pm.sr_pack_inputs(st.pos, st.mass, grid=64, cutoff_cells=4,
                             sr_slabs=plan["sr_slabs"],
                             sr_entries=plan["sr_entries"],
                             symmetric=sym, paired=pr)
    # the realized production worklist fits the plan it was measured for
    assert int(base["n_e"]) <= base["e_max"], (int(base["n_e"]),
                                               base["e_max"])
    # and the overflow guard agrees: zero on the very state it was
    # sized from
    assert pm.sr_entry_overflow(st.pos, st.mass, 64, 4,
                                capacity=plan["capacity"],
                                sr_slabs=plan["sr_slabs"],
                                sr_entries=plan["sr_entries"]) == 0
    # and the count is a property of the DATA, not of the table padding
    padded = pm.sr_pack_inputs(st.pos, st.mass, grid=64, cutoff_cells=4,
                               sr_slabs=2 * plan["sr_slabs"],
                               sr_entries=4 * plan["sr_entries"],
                               symmetric=sym, paired=pr)
    assert int(padded["n_e"]) == int(base["n_e"])


def test_suggest_sr_plan_per_layout_sizing():
    """suggest_sr_plan sizes sr_entries for the requested/active layout:
    the clipped layouts carry fewer entries than the full worklist, an
    explicit layout name respects the pallas eligibility gates, and
    every per-layout plan still reproduces the full-plan forces when
    run under ITS OWN layout."""
    pos, _, mass = plummer(4096, seed=5)
    full = pm.suggest_sr_plan(pos, mass, 64, 4, layout="full")
    sym = pm.suggest_sr_plan(pos, mass, 64, 4, layout="pallas_sym")
    assert sym["sr_entries"] <= full["sr_entries"]
    # paired sizing requires the pallas sweep to be eligible; force it
    # (interpret mode runs it on CPU).
    prev = pm.set_sr_layout(("pallas", True, True))
    try:
        prsym = pm.suggest_sr_plan(pos, mass, 64, 4)
        assert prsym["sr_entries"] <= sym["sr_entries"]
        a_pr = np.asarray(pm.accelerations(pos, mass, grid=64,
                                           cutoff_cells=4, **prsym))
    finally:
        pm.set_sr_layout(prev)
    a_full = np.asarray(pm.accelerations(pos, mass, grid=64,
                                         cutoff_cells=4, **full))
    scale = np.abs(a_full).max()
    np.testing.assert_allclose(a_pr, a_full, rtol=0, atol=3e-5 * scale)
    with pytest.raises(ValueError):
        pm.suggest_sr_plan(pos, mass, 64, 4, layout="nope")


def test_sr_entry_overflow_guard():
    """The runtime guard behind per-layout plan sizing: zero on the
    state a plan was measured from, positive when the static
    sr_entries would drop live worklist entries, zero for the
    guaranteed (sr_entries=0) bounds."""
    pos, _, mass = plummer(4096, seed=6)
    plan = pm.suggest_sr_plan(pos, mass, 64, 4)
    assert pm.sr_entry_overflow(pos, mass, 64, 4, **plan) == 0
    starved = dict(plan, sr_entries=64)
    over = pm.sr_entry_overflow(pos, mass, 64, 4, **starved)
    assert over > 0
    assert pm.sr_entry_overflow(pos, mass, 64, 4,
                                capacity=plan["capacity"]) == 0


def test_engine_replans_on_entry_overflow():
    """simulation._check_sr_health treats dropped worklist entries as
    plan degradation: under --pm-replan a starved pinned sr_entries
    plan grows after the first sample block."""
    from nbody_tpu.config import SimConfig
    from nbody_tpu.models.gravity import make_accel_fn
    from nbody_tpu.simulation import _DeviceRunner

    cfg = SimConfig(n=2048, nsteps=4, sfreq=2, kernel="p3m", pm_grid=64,
                    pm_cutoff=4, distribution="plummer", dt=1e-6,
                    pm_replan=True)
    sim = _DeviceRunner(cfg)
    sim.prepare()
    plan_full = pm.suggest_sr_plan(sim.state.pos, sim.state.mass, 64, 4,
                                   layout="full")
    # Starve the plan mid-flight (as clustering drift would) and let
    # the per-block health check catch and regrow it.
    cfg.pm_sr_entries = 64
    sim._blocks.clear()
    sim.accel_fn = make_accel_fn(cfg.kernel, **cfg.kernel_opts())
    sim._check_sr_health()
    try:
        assert cfg.pm_sr_entries > 64
        assert cfg.pm_sr_entries <= plan_full["sr_entries"]
    finally:
        sim.finish()


def test_p3m_overflow_momentum_symmetric():
    """Round-3 fix: capacity-overflowed particles fall back to
    mesh-quality forces on BOTH sides of each pair (complement-kernel
    deposit as sources, complement-of-binned gather as targets), so
    momentum stays closed even under heavy overflow."""
    pos, _, mass = plummer(2048, seed=9)
    assert float(pm.cell_overflow_fraction(pos, mass, 64, 4, 16)) > 0.05
    a = np.asarray(pm.accelerations(pos, mass, grid=64, cutoff_cells=4,
                                    capacity=16))
    flux = np.abs((mass[None, :] * a).sum(axis=1))
    scale = np.abs(mass[None, :] * a).sum()
    assert np.all(flux < 1e-4 * scale), (flux / scale)


def _packed_sweep_inputs(n=2048, ng=64, cutoff=4, seed=11,
                         symmetric=False, paired=False, sr_slabs=0):
    """Short-range packing via the solver's own recipe (pm.sr_pack_inputs
    — the shared seam, so the sweeps are compared in exactly the
    configuration the production solver runs)."""
    pos, _, mass = plummer(n, seed=seed)
    cap = pm.suggest_capacity(pos, mass, ng, cutoff)
    pk = pm.sr_pack_inputs(pos, mass, grid=ng, cutoff_cells=cutoff,
                           capacity=cap, symmetric=symmetric,
                           paired=paired, sr_slabs=sr_slabs)
    return (pk["ptab"], pk["mtab"], pk["wl_t"], pk["wl_s"], pk["n_e"],
            pk["e_max"], pk["rc2"])


def _occupied(mtab):
    """Columns backed by a binned particle.  Empty slots sit at (0,0,0)
    with zero mass: harmless to every real force, but as targets or
    reaction recipients they accumulate variant-specific garbage (the
    beyond-window => zero-taper guarantee only holds inside cells), and
    the solver never gathers them — so table comparisons must not
    either (pm._sr_sweep_pallas docstring, EMPTY-SLOT CONTRACT)."""
    return np.asarray(mtab) > 0


def test_sr_sweep_pallas_matches_xla():
    """The Pallas short-range sweep (VMEM-resident row tables, SMEM
    worklist chunks, flush-on-target-change accumulator) must agree with
    the XLA-composed sweep to summation-order tolerance — same worklist,
    same pair math.  Uses a small chunk so runs genuinely span chunk
    boundaries."""
    import numpy as np

    ptab, mtab, wl_t, wl_s, n_e, e_max, rc2 = _packed_sweep_inputs()
    occ = _occupied(mtab)
    a_xla = np.asarray(pm._sr_sweep(ptab, mtab, wl_t, wl_s, n_e,
                                    rc2))[:, occ]
    a_pl = np.asarray(pm._sr_sweep_pallas(ptab, mtab, wl_t, wl_s,
                                          (0, e_max), rc2, chunk=128,
                                          interpret=True))[:, occ]
    assert a_pl.shape == a_xla.shape
    scale = np.abs(a_xla).max()
    np.testing.assert_allclose(a_pl, a_xla, rtol=0, atol=2e-5 * scale)
    # The flushless fallback (per-entry reduce, no cond-carried state)
    # must agree too — it is the first-Mosaic-contact insurance path.
    a_nf = np.asarray(pm._sr_sweep_pallas(ptab, mtab, wl_t, wl_s,
                                          (0, e_max), rc2, chunk=128,
                                          interpret=True,
                                          flush_runs=False))[:, occ]
    np.testing.assert_allclose(a_nf, a_xla, rtol=0, atol=2e-5 * scale)


def test_sr_sweep_pallas_bounds_split():
    """The sharded path sweeps disjoint entry ranges per shard and psums
    the slot tables: the per-range partial sweeps must sum to the full
    sweep (each entry lands in exactly one range; boundary runs RMW the
    same row from two ranges, so tolerance is summation-order)."""
    import jax.numpy as jnp
    import numpy as np

    (ptab, mtab, wl_t, wl_s, n_e, e_max,
     rc2) = _packed_sweep_inputs(n=1024, ng=32, seed=12)
    e_lim = int(n_e)
    full = np.asarray(pm._sr_sweep_pallas(ptab, mtab, wl_t, wl_s,
                                          (0, e_lim), rc2, chunk=128,
                                          interpret=True))
    k = 4
    per = -((-e_lim) // k)
    parts = sum(
        np.asarray(pm._sr_sweep_pallas(
            ptab, mtab, wl_t, wl_s,
            jnp.asarray([i * per, min((i + 1) * per, e_lim)], jnp.int32),
            rc2, chunk=128, interpret=True))
        for i in range(k))
    scale = np.abs(full).max()
    np.testing.assert_allclose(parts, full, rtol=1e-6, atol=2e-6 * scale)


def test_sr_sweep_impl_knob_end_to_end():
    """pm.SR_SWEEP_IMPL='pallas' routes the FULL p3m solve through the
    Pallas sweep (interpret mode off-TPU) and must agree with the XLA
    sweep to summation-order tolerance."""
    import numpy as np

    pos, _, mass = plummer(1024, seed=13)
    kw = dict(grid=32, cutoff_cells=4,
              capacity=pm.suggest_capacity(pos, mass, 32, 4))
    a_x = np.asarray(pm.accelerations(pos, mass, **kw))
    assert pm.SR_SWEEP_IMPL == "auto"
    pm.SR_SWEEP_IMPL = "pallas"
    try:
        a_p = np.asarray(pm.accelerations(pos, mass, **kw))
    finally:
        pm.SR_SWEEP_IMPL = "auto"
    scale = np.abs(a_x).max()
    np.testing.assert_allclose(a_p, a_x, rtol=0, atol=2e-5 * scale)


def test_sr_sweep_pallas_sharded_matches_single():
    """Forced-pallas sharded p3m: the per-shard traced entry bounds
    (k_id*per) + slot-table psum must reproduce the single-device
    solve."""
    import numpy as np

    from nbody_tpu.init import make_state
    from nbody_tpu.models.gravity import make_accel_fn
    from nbody_tpu.models.integrators import make_block_fn
    from nbody_tpu.parallel.decompose import (
        make_sharded_block_fn,
        shard_state,
    )

    opts = dict(grid=32, capacity=64)
    state = make_state(512, pad_multiple=8, distribution="plummer")
    pm.SR_SWEEP_IMPL = "pallas"
    try:
        ref_state, ref_ke = make_block_fn(
            make_accel_fn("p3m", **opts), 0.01, 2)(state)
        sharded, mesh = shard_state(state, 4)
        blk = make_sharded_block_fn("p3m", opts, 0.01, 2, mesh,
                                    comm="allgather")
        out, ke = blk(sharded)
    finally:
        pm.SR_SWEEP_IMPL = "auto"
    np.testing.assert_allclose(np.asarray(out.pos),
                               np.asarray(ref_state.pos),
                               rtol=2e-5, atol=1e-8)
    assert abs(float(ke) - float(ref_ke)) <= 1e-5 * abs(float(ref_ke))


def test_p3m_differentiable_grad():
    """differentiable=True: (a) forward values match the default path
    exactly (the static-bound sweep's extra sentinel chunks add literal
    zeros); (b) the sweep's reverse-mode gradient matches an
    independent no-loop dense formulation of the same worklist math;
    (c) jax.grad flows through the FULL p3m solve."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    pos, _, mass = plummer(256, seed=15)
    pos = jnp.asarray(pos, jnp.float32)
    mass = jnp.asarray(mass, jnp.float32)
    kw = dict(grid=16, cutoff_cells=4, capacity=64)

    a_def = np.asarray(pm.accelerations(pos, mass, **kw))
    a_dif = np.asarray(pm.accelerations(pos, mass, differentiable=True,
                                        **kw))
    np.testing.assert_array_equal(a_dif, a_def)

    ptab, mtab, wl_t, wl_s, n_e, e_max, rc2 = _packed_sweep_inputs(
        n=256, ng=16, seed=15)
    s1 = ptab.shape[1] // pm.SLAB

    def dense(pt):
        p = pt.reshape(3, s1, pm.SLAB)
        m = mtab.reshape(s1, pm.SLAB)
        d = (p[:, wl_s][:, :, None, :] - p[:, wl_t][:, :, :, None])
        r2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
        u = jax.lax.rsqrt(r2 + jnp.float32(pm.SOFTENING_SQUARED))
        w = (m[wl_s][:, None, :] * (1.0 - pm._taper(r2 / rc2))
             * (u * u * u))
        contrib = (w[None] * d).sum(axis=3)
        return jnp.zeros((3, s1, pm.SLAB)).at[:, wl_t].add(
            contrib).reshape(3, -1)

    def loss_sweep(pt):
        a = pm._sr_sweep(pt, mtab, wl_t, wl_s, n_e, rc2,
                         static_bound=True)
        return jnp.sum(a * a)

    def loss_dense(pt):
        a = dense(pt)
        return jnp.sum(a * a)

    g_sweep = np.asarray(jax.grad(loss_sweep)(ptab))
    g_dense = np.asarray(jax.grad(loss_dense)(ptab))
    scale = np.abs(g_dense).max()
    np.testing.assert_allclose(g_sweep, g_dense, rtol=0,
                               atol=1e-5 * scale)

    def full_loss(p):
        a = pm.accelerations(p, mass, differentiable=True, **kw)
        return jnp.mean(a * a)

    g = np.asarray(jax.jit(jax.grad(full_loss))(pos))
    assert np.all(np.isfinite(g)) and np.abs(g).max() > 0


def test_sr_pallas_differentiable_ad_wrapper():
    """differentiable=True with the Pallas sweep engaged: the primal is
    the Pallas kernel itself (bit-identical to the non-differentiable
    path — custom_vjp changes only the backward rule), and jax.grad
    matches the XLA static-bound sweep's gradient.  Also checked under
    SR_SYMMETRIC (the cotangent rule forwards the symmetric flag)."""
    import jax
    import jax.numpy as jnp

    pos, _, mass = plummer(1024, seed=22)
    pos = jnp.asarray(pos, jnp.float32)
    mass = jnp.asarray(mass, jnp.float32)
    kw = dict(grid=32, cutoff_cells=4,
              capacity=pm.suggest_capacity(pos, mass, 32, 4))

    def loss(p):
        return jnp.mean(pm.accelerations(p, mass, differentiable=True,
                                         **kw) ** 2)

    # Pin the plain (unpaired) layout: the differentiable dispatch masks
    # paired rows off (slab-granular backward), so under the
    # pallas_paired_sym DEFAULT the non-differentiable primal runs a
    # different summation order — bit-identity is a same-layout claim.
    prev = pm.set_sr_layout(("xla", False, False))
    try:
        g_xla = np.asarray(jax.jit(jax.grad(loss))(pos))
        pm.set_sr_layout(("pallas", False, False))
        a_nd = np.asarray(pm.accelerations(pos, mass, **kw))
        a_d = np.asarray(pm.accelerations(pos, mass, differentiable=True,
                                          **kw))
        np.testing.assert_array_equal(a_d, a_nd)
        g_pl = np.asarray(jax.jit(jax.grad(loss))(pos))
        pm.SR_SYMMETRIC = True
        g_sym = np.asarray(jax.jit(jax.grad(loss))(pos))
    finally:
        pm.set_sr_layout(prev)
    scale = np.abs(g_xla).max()
    assert np.isfinite(g_pl).all() and np.abs(g_pl).max() > 0
    np.testing.assert_allclose(g_pl, g_xla, rtol=0, atol=1e-5 * scale)
    np.testing.assert_allclose(g_sym, g_xla, rtol=0, atol=2e-5 * scale)


def test_p3m_forward_mode_via_xla_impl():
    """Forward-mode AD (jax.jvp) crosses the P3M short-range pass when
    pm.SR_SWEEP_IMPL='xla' forces the static-bound sweep (custom_vjp on
    the Pallas path forecloses jvp — the documented escape hatch), and
    the jvp agrees with the vjp-transposed gradient to fp32 noise."""
    import jax
    import jax.numpy as jnp

    pos, _, mass = plummer(512, seed=23)
    pos = jnp.asarray(pos, jnp.float32)
    mass = jnp.asarray(mass, jnp.float32)
    kw = dict(grid=32, cutoff_cells=4,
              capacity=pm.suggest_capacity(pos, mass, 32, 4))

    def loss(p):
        return jnp.mean(pm.accelerations(p, mass, differentiable=True,
                                         **kw) ** 2)

    tan = jnp.asarray(np.random.default_rng(5).normal(
        size=pos.shape), jnp.float32)
    pm.SR_SWEEP_IMPL = "xla"
    try:
        _, jvp_val = jax.jit(lambda p, t: jax.jvp(loss, (p,), (t,)))(
            pos, tan)
        g = jax.jit(jax.grad(loss))(pos)
    finally:
        pm.SR_SWEEP_IMPL = "auto"
    jvp_val = float(jvp_val)
    dot = float(jnp.vdot(g, tan))
    assert np.isfinite(jvp_val) and abs(jvp_val) > 0
    np.testing.assert_allclose(jvp_val, dot, rtol=1e-4)


def test_sr_sweep_symmetric_matches_full():
    """The pair-symmetric worklist (s >= t) + per-entry reaction must
    reproduce the full both-directions sweep: same physics, half the
    entries.  Checked for the XLA sweep, the Pallas sweep (interpret,
    chunk-boundary-spanning runs), and entry counts."""
    import numpy as np

    full = _packed_sweep_inputs(seed=16)
    sym = _packed_sweep_inputs(seed=16, symmetric=True)
    ptab, mtab, wl_t, wl_s, n_e, e_max, rc2 = full
    _, _, wt_s, ws_s, ne_s, _, _ = sym
    occ = _occupied(mtab)
    assert int(ne_s) < int(n_e)  # genuinely fewer entries
    a_full = np.asarray(pm._sr_sweep(ptab, mtab, wl_t, wl_s, n_e,
                                     rc2))[:, occ]
    a_sym = np.asarray(pm._sr_sweep(ptab, mtab, wt_s, ws_s, ne_s, rc2,
                                    symmetric=True))[:, occ]
    scale = np.abs(a_full).max()
    np.testing.assert_allclose(a_sym, a_full, rtol=0, atol=2e-5 * scale)
    a_sym_pl = np.asarray(pm._sr_sweep_pallas(
        ptab, mtab, wt_s, ws_s, (0, e_max), rc2, chunk=128,
        interpret=True, symmetric=True))[:, occ]
    np.testing.assert_allclose(a_sym_pl, a_full, rtol=0,
                               atol=2e-5 * scale)


def test_sr_symmetric_knob_end_to_end():
    """pm.SR_SYMMETRIC=True through the FULL p3m solve (plan suggestion
    + packed sweep) must agree with the default to summation-order
    tolerance and keep momentum closed."""
    import numpy as np

    pos, _, mass = plummer(2048, seed=17)
    kw = dict(grid=64, cutoff_cells=4)
    prev = pm.set_sr_layout(("auto", False, False))
    try:
        plan = pm.suggest_sr_plan(pos, mass, 64, 4)
        a_ref = np.asarray(pm.accelerations(pos, mass, **kw, **plan))
        pm.SR_SYMMETRIC = True
        # Plans are sized for the ACTIVE layout (the symmetric worklist
        # keeps ~half the entries); a later bigger-layout trace is
        # guarded at runtime by pm.sr_entry_overflow.
        plan_s = pm.suggest_sr_plan(pos, mass, 64, 4)
        assert plan_s["sr_entries"] <= plan["sr_entries"]
        a_sym = np.asarray(pm.accelerations(pos, mass, **kw, **plan_s))
    finally:
        pm.set_sr_layout(prev)
    scale = np.abs(a_ref).max()
    np.testing.assert_allclose(a_sym, a_ref, rtol=0, atol=3e-5 * scale)
    flux = np.abs((mass[None, :] * a_sym).sum(axis=1))
    assert np.all(flux < 1e-4 * np.abs(mass[None, :] * a_sym).sum())


def test_sr_ranges_paired_covers_and_dedups():
    """paired=True worklist structure: (a) no (target, source-row) pair
    is emitted twice (a duplicate would double-count that row's
    forces); (b) every slab-level entry (t, s) is covered by a paired
    entry (t, s//2) — coverage is what makes the value-level agreement
    below non-vacuous; (c) never more entries than the slab worklist."""
    full = _packed_sweep_inputs(seed=18)
    prd = _packed_sweep_inputs(seed=18, paired=True)
    wl_t, wl_s, n_e = full[2], full[3], int(full[4])
    pt, ps, ne_p = prd[2], prd[3], int(prd[4])
    assert 0 < ne_p <= n_e
    ent = set(zip(np.asarray(pt[:ne_p]).tolist(),
                  np.asarray(ps[:ne_p]).tolist()))
    assert len(ent) == ne_p  # no duplicates
    for t, s in zip(np.asarray(wl_t[:n_e]).tolist(),
                    np.asarray(wl_s[:n_e]).tolist()):
        assert (t, s // 2) in ent


def test_sr_sweep_pallas_paired_matches_xla():
    """The paired-row Pallas sweep (two slabs per 128-lane row,
    row-granular worklist) must agree with the XLA slab sweep: the
    row coarsening only adds beyond-R_c pairs, whose taper weight is
    exactly zero.  Covers the flush-runs and flushless bodies, an odd
    slab count (even-pairing pad slab — the default pow2-sized plans
    always produce one), and an even slab count (no pad)."""
    full = _packed_sweep_inputs(seed=19)
    prd = _packed_sweep_inputs(seed=19, paired=True)
    ptab, mtab, rc2 = full[0], full[1], full[6]
    occ = _occupied(mtab)
    assert (ptab.shape[1] // pm.SLAB) % 2 == 0  # even: no pad slab
    a_xla = np.asarray(pm._sr_sweep(ptab, mtab, full[2], full[3],
                                    full[4], rc2))[:, occ]
    a_pr = np.asarray(pm._sr_sweep_pallas(ptab, mtab, prd[2], prd[3],
                                          (0, prd[5]), rc2, chunk=128,
                                          interpret=True,
                                          paired=True))[:, occ]
    scale = np.abs(a_xla).max()
    np.testing.assert_allclose(a_pr, a_xla, rtol=0, atol=2e-5 * scale)
    a_nf = np.asarray(pm._sr_sweep_pallas(ptab, mtab, prd[2], prd[3],
                                          (0, prd[5]), rc2, chunk=128,
                                          interpret=True, paired=True,
                                          flush_runs=False))[:, occ]
    np.testing.assert_allclose(a_nf, a_xla, rtol=0, atol=2e-5 * scale)
    # Odd slab count (sr_slabs=34 + sentinel = 35): the even-pairing
    # pad slab is in play.
    fo = _packed_sweep_inputs(seed=19, sr_slabs=34)
    po = _packed_sweep_inputs(seed=19, sr_slabs=34, paired=True)
    occ2 = _occupied(fo[1])
    assert (fo[0].shape[1] // pm.SLAB) % 2 == 1
    a_xla2 = np.asarray(pm._sr_sweep(fo[0], fo[1], fo[2], fo[3], fo[4],
                                     fo[6]))[:, occ2]
    a_pr2 = np.asarray(pm._sr_sweep_pallas(fo[0], fo[1], po[2], po[3],
                                           (0, po[5]), fo[6], chunk=128,
                                           interpret=True,
                                           paired=True))[:, occ2]
    scale2 = np.abs(a_xla2).max()
    np.testing.assert_allclose(a_pr2, a_xla2, rtol=0, atol=2e-5 * scale2)


def test_sr_sweep_pallas_paired_bounds_split():
    """Sharded-path contract for the paired sweep: disjoint entry
    ranges must sum to the full sweep (each row entry lands in exactly
    one range)."""
    import jax.numpy as jnp

    prd = _packed_sweep_inputs(n=1024, ng=32, seed=12, paired=True)
    ptab, mtab, wl_t, wl_s, n_e, e_max, rc2 = prd
    e_lim = int(n_e)
    full = np.asarray(pm._sr_sweep_pallas(ptab, mtab, wl_t, wl_s,
                                          (0, e_lim), rc2, chunk=128,
                                          interpret=True, paired=True))
    k = 4
    per = -((-e_lim) // k)
    parts = sum(
        np.asarray(pm._sr_sweep_pallas(
            ptab, mtab, wl_t, wl_s,
            jnp.asarray([i * per, min((i + 1) * per, e_lim)], jnp.int32),
            rc2, chunk=128, interpret=True, paired=True))
        for i in range(k))
    scale = np.abs(full).max()
    np.testing.assert_allclose(parts, full, rtol=1e-6, atol=2e-6 * scale)


def test_sr_paired_knob_end_to_end():
    """pm.SR_PAIRED_ROWS=True routes the FULL p3m solve through the
    paired sweep (forced pallas, interpret off-TPU) and must agree with
    the default; combined with SR_SYMMETRIC both engage (paired
    symmetric worklist + per-lane masks) and must still agree."""
    pos, _, mass = plummer(2048, seed=20)
    kw = dict(grid=64, cutoff_cells=4)
    prev = pm.set_sr_layout(("auto", False, False))
    try:
        plan = pm.suggest_sr_plan(pos, mass, 64, 4)
        a_ref = np.asarray(pm.accelerations(pos, mass, **kw, **plan))
        pm.SR_PAIRED_ROWS = True
        pm.SR_SWEEP_IMPL = "pallas"
        a_pr = np.asarray(pm.accelerations(pos, mass, **kw, **plan))
        pm.SR_SYMMETRIC = True
        a_both = np.asarray(pm.accelerations(pos, mass, **kw, **plan))
    finally:
        pm.set_sr_layout(prev)
    scale = np.abs(a_ref).max()
    np.testing.assert_allclose(a_pr, a_ref, rtol=0, atol=2e-5 * scale)
    np.testing.assert_allclose(a_both, a_ref, rtol=0, atol=3e-5 * scale)


def test_sr_paired_sharded_matches_single():
    """Sharded p3m with the paired sweep: per-shard entry ranges over
    the ROW worklist + slot-table psum must reproduce the single-device
    solve."""
    from nbody_tpu.init import make_state
    from nbody_tpu.models.gravity import make_accel_fn
    from nbody_tpu.models.integrators import make_block_fn
    from nbody_tpu.parallel.decompose import (
        make_sharded_block_fn,
        shard_state,
    )

    opts = dict(grid=32, capacity=64)
    state = make_state(512, pad_multiple=8, distribution="plummer")
    prev = pm.set_sr_layout(("pallas", pm.SR_SYMMETRIC, True))
    try:
        ref_state, ref_ke = make_block_fn(
            make_accel_fn("p3m", **opts), 0.01, 2)(state)
        sharded, mesh = shard_state(state, 4)
        blk = make_sharded_block_fn("p3m", opts, 0.01, 2, mesh,
                                    comm="allgather")
        out, ke = blk(sharded)
    finally:
        pm.set_sr_layout(prev)
    np.testing.assert_allclose(np.asarray(out.pos),
                               np.asarray(ref_state.pos),
                               rtol=2e-5, atol=1e-8)
    assert abs(float(ke) - float(ref_ke)) <= 1e-5 * abs(float(ref_ke))


def test_sr_sweep_paired_symmetric_matches_full():
    """paired + symmetric compose: the s>=t-clipped worklist coarsened
    to rows, with per-lane slab masks replacing the per-slab
    diagonal/clip logic (forward keeps slab >= t, reaction keeps
    slab > t).  Must reproduce the full both-directions sweep; entries
    must undercut BOTH single-knob variants."""
    full = _packed_sweep_inputs(seed=21)
    sym = _packed_sweep_inputs(seed=21, symmetric=True)
    prd = _packed_sweep_inputs(seed=21, paired=True)
    both = _packed_sweep_inputs(seed=21, symmetric=True, paired=True)
    ptab, mtab, rc2 = full[0], full[1], full[6]
    occ = _occupied(mtab)
    assert int(both[4]) <= int(sym[4])
    assert int(both[4]) <= int(prd[4])
    a_full = np.asarray(pm._sr_sweep(ptab, mtab, full[2], full[3],
                                     full[4], rc2))[:, occ]
    a_ps = np.asarray(pm._sr_sweep_pallas(ptab, mtab, both[2], both[3],
                                          (0, both[5]), rc2, chunk=128,
                                          interpret=True, paired=True,
                                          symmetric=True))[:, occ]
    scale = np.abs(a_full).max()
    np.testing.assert_allclose(a_ps, a_full, rtol=0, atol=3e-5 * scale)
    a_nf = np.asarray(pm._sr_sweep_pallas(ptab, mtab, both[2], both[3],
                                          (0, both[5]), rc2, chunk=128,
                                          interpret=True, paired=True,
                                          symmetric=True,
                                          flush_runs=False))[:, occ]
    np.testing.assert_allclose(a_nf, a_full, rtol=0, atol=3e-5 * scale)


@pytest.mark.parametrize("dist,n,ng,seed", [
    ("plummer", 1024, 32, 3),
    ("plummer", 3072, 64, 4),       # non-power-of-two N
    ("cold_sphere", 2048, 32, 5),   # collapsing shell
    ("uniform", 2048, 32, 6),       # near-empty cell list tails
])
def test_sr_sweep_variants_fuzz(dist, n, ng, seed):
    """Every sweep variant (pallas plain/sym/paired/pair-sym, flush and
    flushless) against the XLA slab sweep over a spread of
    distributions, sizes, and grids — occupied slots only (EMPTY-SLOT
    CONTRACT)."""
    rng = np.random.default_rng(seed)
    if dist == "plummer":
        pos, _, mass = plummer(n, seed=seed)
    elif dist == "cold_sphere":
        pos, _, mass = cold_sphere(n, seed=seed)
    else:
        pos = rng.random((3, n)).astype(np.float32)
        mass = rng.random(n).astype(np.float32) * 1e5
    cap = pm.suggest_capacity(pos, mass, ng, 4)

    def pack(**kw):
        return pm.sr_pack_inputs(pos, mass, grid=ng, cutoff_cells=4,
                                 capacity=cap, **kw)

    full = pack()
    occ = _occupied(full["mtab"])
    a_ref = np.asarray(pm._sr_sweep(
        full["ptab"], full["mtab"], full["wl_t"], full["wl_s"],
        full["n_e"], full["rc2"]))[:, occ]
    scale = max(np.abs(a_ref).max(), 1e-30)
    for sym, prd in ((False, False), (True, False), (False, True),
                     (True, True)):
        pk = pack(symmetric=sym, paired=prd)
        for fr in (True, False):
            a = np.asarray(pm._sr_sweep_pallas(
                full["ptab"], full["mtab"], pk["wl_t"], pk["wl_s"],
                (0, pk["e_max"]), pk["rc2"], chunk=128, interpret=True,
                symmetric=sym, paired=prd, flush_runs=fr))[:, occ]
            np.testing.assert_allclose(
                a, a_ref, rtol=0, atol=4e-5 * scale,
                err_msg=f"sym={sym} paired={prd} flush={fr}")


def test_sr_paired_vmem_gate(monkeypatch):
    """Paired tables cost half the VMEM: the auto-dispatch gate must
    admit ~2x the slabs when paired."""
    import jax

    from nbody_tpu.utils import device_caps

    monkeypatch.setattr(pm, "SR_SWEEP_IMPL", "auto")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    limit = device_caps.caps().vmem_limit_bytes
    fits_plain = int(0.7 * limit) // (7 * 128 * 4)
    assert pm._use_pallas_sweep(fits_plain + 1) is False
    assert pm._use_pallas_sweep(fits_plain + 1, paired=True) is True
    fits_pr = int(0.7 * limit) // (7 * pm.SLAB * 4)
    assert pm._use_pallas_sweep(fits_pr + 1, paired=True) is False


def test_sr_sweep_dispatch_vmem_gate(monkeypatch):
    """auto-dispatch: Pallas on TPU only while the seven lane-padded
    (n_slabs, 128) tables fit the VMEM budget; forced modes are
    absolute."""
    import jax

    from nbody_tpu.utils import device_caps

    assert pm._use_pallas_sweep(100) is False  # cpu backend
    monkeypatch.setattr(pm, "SR_SWEEP_IMPL", "pallas")
    assert pm._use_pallas_sweep(10**9) is True  # forced wins
    monkeypatch.setattr(pm, "SR_SWEEP_IMPL", "xla")
    assert pm._use_pallas_sweep(1) is False
    monkeypatch.setattr(pm, "SR_SWEEP_IMPL", "auto")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    limit = device_caps.caps().vmem_limit_bytes
    fits = int(0.7 * limit) // (7 * 128 * 4)
    assert pm._use_pallas_sweep(fits - 1) is True
    assert pm._use_pallas_sweep(fits + 1) is False
    assert pm._use_pallas_sweep() is True  # unknown size: optimistic


def test_make_accel_fn_mesh_tiers_native_ad():
    """make_accel_fn('p3m', differentiable=True) must use the native AD
    path (static-bound sweep), NOT the exact-pair analytic VJP — a mesh
    forward with all-pairs cotangents would silently mismatch."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nbody_tpu.models.gravity import make_accel_fn

    pos, _, mass = plummer(256, seed=18)
    pos = jnp.asarray(pos, jnp.float32)
    mass = jnp.asarray(mass, jnp.float32)
    fn = make_accel_fn("p3m", differentiable=True, grid=16, capacity=64)

    def loss(p):
        a = fn(p, mass)
        return jnp.mean(a * a)

    g = np.asarray(jax.jit(jax.grad(loss))(pos))
    want = np.asarray(jax.grad(
        lambda p: jnp.mean(pm.accelerations(
            p, mass, grid=16, cutoff_cells=4, capacity=64,
            differentiable=True) ** 2))(pos))
    np.testing.assert_allclose(g, want, rtol=1e-4, atol=1e-8)


def test_suggest_capacity_data_driven():
    pos, _, mass = plummer(2048, seed=1)
    cap = pm.suggest_capacity(pos, mass, 128, 4)
    assert cap >= 64 and (cap & (cap - 1)) == 0  # pow2, >= floor
    occ = int(pm._max_occupancy(pos, mass, 128, 4))
    assert cap >= occ  # no overflow at the suggested size
    # compact uniform ICs need only the floor
    pos2, _, mass2 = cold_sphere(1024, seed=2)
    assert pm.suggest_capacity(pos2, mass2, 64, 4) == 64


def test_p3m_engine_run():
    """End-to-end: --kernel p3m through the engine (capacity auto-sized
    from the initial state), finite trace."""
    from nbody_tpu.config import SimConfig
    from nbody_tpu.simulation import run

    cfg = SimConfig(n=512, nsteps=20, sfreq=10, kernel="p3m", pm_grid=32,
                    distribution="plummer", dt=0.01)
    result = run(cfg, quiet=True)
    assert cfg.pm_capacity >= 64  # the engine sized the cell list
    assert len(result.samples) == 2
    assert all(np.isfinite(ke) for _, ke in result.kenergy_trace)


def _probe_env(monkeypatch, tmp_path, outcomes):
    """Wire _use_pallas_sweep's Mosaic probe ladder for testing: pretend
    a real TPU is attached, stub the probe compile with per-construct
    outcomes {(sym, flush, paired): exception | None}, and isolate both
    the in-process memo and the disk cache."""
    calls = []

    def fake_probe(symmetric, flush_runs, paired):
        calls.append((symmetric, flush_runs, paired))
        exc = outcomes.get((symmetric, flush_runs, paired))
        if exc is not None:
            raise exc

    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    monkeypatch.setattr(pm, "SR_SWEEP_IMPL", "auto")
    monkeypatch.setattr(pm, "SR_FLUSH_RUNS", True)
    # Pin the plain layout: these tests exercise the probe LADDER with
    # deterministic (sym, flush, paired) keys, independent of the
    # module's default layout (pallas_paired_sym since round 4).
    monkeypatch.setattr(pm, "SR_SYMMETRIC", False)
    monkeypatch.setattr(pm, "SR_PAIRED_ROWS", False)
    monkeypatch.setattr(pm, "_MOSAIC_PROBE", {})
    monkeypatch.setattr(pm, "_on_real_tpu", lambda: True)
    monkeypatch.setattr(pm, "_sr_probe_compile", fake_probe)
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    return calls


def test_sr_mosaic_probe_accepts(monkeypatch, tmp_path):
    """Probe passes -> Pallas dispatch unchanged, knob untouched, and
    the verdict persists so the probe compile runs exactly once."""
    calls = _probe_env(monkeypatch, tmp_path, {})
    assert pm._use_pallas_sweep(100) is True
    assert pm.SR_FLUSH_RUNS is True
    assert pm._use_pallas_sweep(100) is True
    assert len(calls) == 1  # in-process memo
    monkeypatch.setattr(pm, "_MOSAIC_PROBE", {})
    assert pm._use_pallas_sweep(100) is True
    assert len(calls) == 1  # disk-cache hit across "processes"


def test_sr_mosaic_probe_self_heals_to_flushless(monkeypatch, tmp_path):
    """The ROADMAP fallback, automated: Mosaic rejecting the
    cond-carried accumulator flips SR_FLUSH_RUNS instead of crashing an
    unattended bench run."""
    reject = Exception("Mosaic lowering failed: unsupported op")
    calls = _probe_env(
        monkeypatch, tmp_path,
        {(False, True, False): reject})
    assert pm._use_pallas_sweep(100) is True
    assert pm.SR_FLUSH_RUNS is False
    assert calls == [(False, True, False), (False, False, False)]


def test_sr_mosaic_probe_falls_back_to_xla(monkeypatch, tmp_path):
    """Both variants rejected -> XLA-composed sweep for the process."""
    reject = Exception("Mosaic lowering failed: unsupported op")
    _probe_env(
        monkeypatch, tmp_path,
        {(False, True, False): reject, (False, False, False): reject})
    assert pm._use_pallas_sweep(100) is False
    assert pm.SR_FLUSH_RUNS is True  # nothing to flip to


def test_sr_mosaic_probe_failures_never_persisted(monkeypatch, tmp_path):
    """A probe failure of ANY flavor must not brand the kernel as
    rejected forever: error text cannot reliably separate a genuine
    Mosaic rejection from a transient remote-compile failure whose
    message happens to contain a classifier token ('unsupported',
    'lowering', ...), so only acceptances persist to disk and rejections
    re-probe per process."""
    import json
    import os

    transient = Exception("HTTP 500 from remote compile service")
    _probe_env(
        monkeypatch, tmp_path,
        {(False, True, False): transient, (False, False, False): transient})
    assert pm._use_pallas_sweep(100) is False
    cache = os.path.join(str(tmp_path), "nbody_tpu", "autotune.json")
    persisted = json.load(open(cache)) if os.path.exists(cache) else {}
    assert not [k for k in persisted if k.startswith("sr_mosaic|")]

    # A definite-looking rejection does not persist either; the flushless
    # acceptance that heals it does.
    definite = Exception("Mosaic lowering failed: unsupported op")
    monkeypatch.setattr(pm, "_MOSAIC_PROBE", {})
    outcomes = {(False, True, False): definite, (False, False, False): None}
    monkeypatch.setattr(
        pm, "_sr_probe_compile",
        lambda s, f, p: (_ for _ in ()).throw(outcomes[(s, f, p)])
        if outcomes[(s, f, p)] else None)
    assert pm._use_pallas_sweep(100) is True
    persisted = json.load(open(cache))
    keys = sorted(k for k in persisted if k.startswith("sr_mosaic|"))
    assert len(keys) == 1  # ONLY the flushless acceptance
    assert [persisted[k] for k in keys] == [True]
    # The acceptance key carries the layout knobs the probe kernel baked
    # in, so retuning SR_CHUNK/SLAB re-probes instead of reusing a
    # verdict for a different kernel.
    assert f"|{pm.SR_CHUNK}|{pm.SLAB}|" in keys[0]

    # A stale False written by an older classifier is ignored on read.
    monkeypatch.setattr(pm, "_MOSAIC_PROBE", {})
    stale = {k: False for k in json.load(open(cache))}
    json.dump(stale, open(cache, "w"))
    calls = []
    monkeypatch.setattr(
        pm, "_sr_probe_compile",
        lambda s, f, p: calls.append((s, f, p)))
    assert pm._use_pallas_sweep(100) is True
    assert calls  # re-probed rather than trusting the stale rejection


def test_sr_mosaic_rejection_warns_once(monkeypatch, tmp_path, capsys):
    """The wholesale-rejection notice prints once per process, not once
    per retrace (an unattended run rebuilds blocks for hours)."""
    reject = Exception("Mosaic lowering failed: unsupported op")
    _probe_env(
        monkeypatch, tmp_path,
        {(False, True, False): reject, (False, False, False): reject})
    monkeypatch.setattr(pm, "_SR_WARNED", set())
    assert pm._use_pallas_sweep(100) is False
    assert pm._use_pallas_sweep(100) is False
    assert pm._use_pallas_sweep(200) is False
    err = capsys.readouterr().err
    assert err.count("Mosaic rejected the Pallas SR sweep") == 1


def test_sr_agreed_verdicts_broadcast_from_process_zero(monkeypatch,
                                                        tmp_path):
    """Multi-process runs must agree on ONE sweep implementation: a
    non-zero process never probes locally (its transient failure would
    diverge the traced program from process 0's) — it takes process 0's
    broadcast verdicts."""
    calls = _probe_env(monkeypatch, tmp_path, {})
    import jax

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 1)

    received = []

    def fake_broadcast(x):
        received.append(np.asarray(x))
        return np.asarray([1, 0], dtype=np.int32)  # process 0 said: accepted

    from jax.experimental import multihost_utils

    monkeypatch.setattr(multihost_utils, "broadcast_one_to_all",
                        fake_broadcast)
    assert pm._sr_agreed_verdicts(False, True, False) == (True, False)
    assert calls == []  # process 1 never ran a probe compile
    # Process 1's placeholder contribution is all-False (broadcast_one_to_all
    # ignores non-source inputs but they must be well-formed).
    assert received and received[0].tolist() == [0, 0]


# ---------------------------------------------------------------------------
# Periodic P3M (ghost images; ops/pm.py _periodic_p3m_between)
# ---------------------------------------------------------------------------


def _corner_blob(n=96, seed=5):
    """Gaussian blob wrapped around a box CORNER: every particle sits
    near faces in all three axes, so min-image neighbor pairs cross the
    boundary in 1, 2 and 3 axes at once — the adversarial case for the
    ghost-image machinery."""
    rng = np.random.default_rng(seed)
    pos = np.asarray((0.06 * rng.standard_normal((3, n))) % 1.0,
                     np.float32)
    mass = np.asarray(1.0 + rng.random(n), np.float32)
    return pos, mass


def _periodic_exact(pos, mass, box, kmax=48):
    """fp64 direct Fourier-series sum (scipy Bessel) — the independent
    periodic ground truth; see tests/test_pm.py::_kspace_reference."""
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
    for nx in n1:
        kx = 2 * np.pi / L * nx
        kvec = np.stack([np.full_like(ky, kx), ky, kz]).reshape(3, -1)
        k2 = (kvec ** 2).sum(axis=0)
        kk = np.where(k2 > 0, np.sqrt(k2), 1.0)
        phih = np.where(k2 > 0, 4 * np.pi * eps * sp.k1(kk * eps) / kk,
                        0.0)
        rho = (m[None, :] * np.exp(-1j * kvec.T @ p)).sum(axis=1)
        wave = np.exp(1j * kvec.T @ p)
        coef = 1j * kvec * (phih * rho)[None, :]
        acc += (coef @ wave).real
    return G / L ** 3 * acc


def test_ghost_images_cover_min_image_pairs():
    """Every within-R_c min-image pair must have a DIRECT counterpart
    against the augmented (real + ghost) source set, at exactly the
    min-image displacement — the property that lets the open-boundary
    sweep kernels run unchanged."""
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    pos = np.asarray(rng.random((3, 128)), np.float32)
    mass = np.asarray(1.0 + rng.random(128), np.float32)
    rc = 0.15
    gpos, gmass, n_g = pm._ghost_images(jnp.asarray(pos),
                                        jnp.asarray(mass), 1.0,
                                        jnp.float32(rc), 7 * 128)
    n_g = int(n_g)
    aug = np.concatenate([pos, np.asarray(gpos)[:, :n_g]], axis=1)
    d = pos[:, :, None] - pos[:, None, :]  # direct (3, N, N)
    dmin = d - np.round(d)  # min image on the unit box
    r2 = (dmin ** 2).sum(axis=0)
    da = aug[:, None, :] - pos[:, :, None]  # (3, N, N+G) src - tgt
    for i, j in zip(*np.where((r2 < rc * rc) & (r2 > 0))):
        want = -dmin[:, i, j]  # x_src_image - x_tgt
        hit = np.abs(da[:, i, :] - want[:, None]).max(axis=0) < 1e-6
        assert hit.any(), (i, j, want)
    # count matches the per-axis sign construction
    sig = (pos < rc).astype(int) - (pos > 1.0 - rc).astype(int)
    expect = int((np.prod(1 + np.abs(sig), axis=0) - 1).sum())
    assert n_g == expect
    assert np.all(np.asarray(gmass)[:n_g] > 0)


def test_ghost_images_multiset_and_truncation():
    """The packed image MULTISET equals the brute-force enumeration
    (every massive boundary particle x every admissible nonempty shift
    combo), and a truncating gcap still packs exactly gcap live images
    while n_ghost stays the exact total — pins the two-stage
    boundary-compaction decode (_ghost_images / _GHOST_COMBO_TABLE)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(13)
    n = 256
    pos = np.asarray(rng.random((3, n)), np.float32)
    mass = np.asarray(1.0 + rng.random(n), np.float32)
    mass[:: 9] = 0.0  # padding particles never ghost
    rc = 0.2
    # Brute-force reference multiset of (x, y, z, m) image rows.
    sig = (pos < rc).astype(int) - (pos > 1.0 - rc).astype(int)
    want = []
    for i in range(n):
        if mass[i] <= 0:
            continue
        for c in pm._GHOST_COMBOS:
            cv = np.asarray(c)
            if np.all((cv != 1) | (sig[:, i] != 0)):
                sh = np.where(cv == 1, sig[:, i], 0).astype(np.float32)
                want.append([*(pos[:, i] + sh), mass[i]])
    want = np.asarray(sorted(map(tuple, want)), np.float32)

    gpos, gmass, n_g = pm._ghost_images(
        jnp.asarray(pos), jnp.asarray(mass), 1.0, jnp.float32(rc),
        7 * n)
    assert int(n_g) == len(want)
    live = np.asarray(gmass) > 0
    got = np.concatenate(
        [np.asarray(gpos)[:, live], np.asarray(gmass)[None, live]]).T
    got = np.asarray(sorted(map(tuple, got)), np.float32)
    assert got.shape == want.shape
    assert np.array_equal(got, want)

    gcap = len(want) // 2  # force truncation
    gpos2, gmass2, n_g2 = pm._ghost_images(
        jnp.asarray(pos), jnp.asarray(mass), 1.0, jnp.float32(rc), gcap)
    assert int(n_g2) == len(want)  # exact count survives truncation
    live2 = np.asarray(gmass2) > 0
    assert int(live2.sum()) == gcap  # every slot packed
    got2 = np.concatenate(
        [np.asarray(gpos2)[:, live2], np.asarray(gmass2)[None, live2]]).T
    want_set = set(map(tuple, want))
    assert all(tuple(r) in want_set for r in np.asarray(got2, np.float32))


def test_p3m_periodic_vs_kspace_sum():
    """The headline: on a corner-wrapped blob (boundary-crossing close
    pairs) periodic P3M lands near its mesh floor while plain periodic
    PM keeps CIC-scale error; both measured against the independent
    k-space sum."""
    pos, mass = _corner_blob()
    a_ref = _periodic_exact(pos, mass, 1.0)

    def err(a):
        return np.linalg.norm(a - a_ref) / np.linalg.norm(a_ref)

    for ng, bound in ((32, 2.5e-2), (64, 1.5e-2)):
        plan = pm.suggest_sr_plan(pos, mass, ng, 4, boundary="periodic",
                                  box_size=1.0)
        a = np.asarray(pm.accelerations(
            pos, mass, grid=ng, cutoff_cells=4, boundary="periodic",
            box_size=1.0, **plan))
        e_p3m = err(a)
        e_pm = err(np.asarray(pm.accelerations(
            pos, mass, grid=ng, boundary="periodic", box_size=1.0)))
        assert e_p3m < bound, (ng, e_p3m)
        assert e_p3m < e_pm / 3, (ng, e_pm, e_p3m)


def test_p3m_periodic_boundary_pair_exact():
    """A close pair straddling a face: P3M recovers the exact min-image
    force (CIC-floor residual); plain periodic PM misses it badly."""
    pos = np.array([[0.01, 0.99], [0.5, 0.5], [0.5, 0.5]], np.float32)
    mass = np.array([2.0, 3.0], np.float32)
    G, eps2 = 6.67259e-11, 1e-3
    d = np.array([-0.02, 0.0, 0.0])
    exact = G * mass[1] * d * (d[0] ** 2 + eps2) ** -1.5
    a = np.asarray(pm.accelerations(pos, mass, grid=32, cutoff_cells=4,
                                    boundary="periodic", box_size=1.0))
    a_pm = np.asarray(pm.accelerations(pos, mass, grid=32,
                                       boundary="periodic", box_size=1.0))
    assert abs(a[0, 0] - exact[0]) < 0.05 * abs(exact[0]), (a[:, 0], exact)
    assert abs(a_pm[0, 0] - exact[0]) > 0.3 * abs(exact[0])  # pm can't


def test_p3m_periodic_momentum_conserved():
    """Ghost images carry real mass, so the reaction bookkeeping must
    still close: sum m*a ~ 0 on the adversarial corner blob."""
    pos, mass = _corner_blob(seed=9)
    plan = pm.suggest_sr_plan(pos, mass, 32, 4, boundary="periodic",
                              box_size=1.0)
    a = np.asarray(pm.accelerations(pos, mass, grid=32, cutoff_cells=4,
                                    boundary="periodic", box_size=1.0,
                                    **plan))
    p_dot = (mass * a).sum(axis=1)
    scale = np.abs(mass[None, :] * a).sum(axis=1) + 1e-30
    assert np.all(np.abs(p_dot) / scale < 1e-4), p_dot / scale


def test_p3m_periodic_plan_measured():
    """suggest_sr_plan with periodic boundaries measures the ghost count
    (sr_ghosts key) and a capacity covering the ghost-extended grid;
    cell_overflow_fraction then reports zero."""
    pos, mass = _corner_blob(seed=11)
    plan = pm.suggest_sr_plan(pos, mass, 32, 4, boundary="periodic",
                              box_size=1.0)
    assert plan["sr_ghosts"] >= 64
    assert plan["sr_ghosts"] <= 7 * pos.shape[1]
    over = float(pm.cell_overflow_fraction(
        pos, mass, 32, 4, capacity=plan["capacity"],
        boundary="periodic", box_size=1.0))
    assert over == 0.0
    # starved defaults on this blob are measurably worse than the plan
    a_ref = _periodic_exact(pos, mass, 1.0)

    def err(a):
        return np.linalg.norm(a - a_ref) / np.linalg.norm(a_ref)

    kw = dict(grid=32, cutoff_cells=4, boundary="periodic", box_size=1.0)
    e_plan = err(np.asarray(pm.accelerations(pos, mass, **kw, **plan)))
    assert e_plan < 2.5e-2, e_plan


def test_periodic_overflow_diag_uses_solver_capacity():
    """cell_overflow_fraction's capacity=0 baseline must resolve the
    SAME default capacity as the solver's _sr_sizing.  Periodic solves
    bin on the ghost-extended grid, whose larger cell count auto-sizes
    a SMALLER cap (N=65536, grid=32: cap=64 on 20^3 cells vs 128 on the
    core 16^3) — sizing the diagnostic from the core grid once reported
    0.0 while the actual run dropped particles to mesh-quality
    forces."""
    rng = np.random.default_rng(5)
    n = 65536
    pos = rng.uniform(0, 1, size=(3, n)).astype(np.float32)
    # 100 particles piled into one interior cell: over the solver's
    # auto cap (64) but under the core-grid cap (128) the diagnostic
    # previously used.  0.53125 is a CELL CENTER of the ghost-extended
    # grid (lo=-0.125, cs=0.0625) — 0.5 would be a cell boundary and
    # split the pile 8 ways.
    pos[:, :100] = np.float32(0.53125) + np.asarray(
        0.001 * rng.standard_normal((3, 100)), np.float32)
    mass = np.full((n,), 1.0 / n, np.float32)
    kw = dict(boundary="periodic", box_size=1.0)
    over = float(pm.cell_overflow_fraction(pos, mass, 32, 4, 0, **kw))
    assert over > 0.0, "diagnostic must see the solver's cap overflow"
    # ...and a capacity covering the pile reports zero again
    assert float(pm.cell_overflow_fraction(pos, mass, 32, 4, 256,
                                           **kw)) == 0.0


def test_ghost_overflow_count_diag():
    """ghost_overflow_count is the runtime detector for _ghost_images'
    silent drop path (dropped ghosts lose the ENTIRE short-range term
    — worse than cell overflow, which keeps mesh-quality forces)."""
    pos, mass = _corner_blob(seed=7)
    # the guaranteed 7N bound can never overflow
    assert pm.ghost_overflow_count(pos, mass, 32, 4,
                                   sr_ghosts=7 * pos.shape[1],
                                   box_size=1.0) == 0
    # the measured-plan cap is sufficient for the state it measured
    plan = pm.suggest_sr_plan(pos, mass, 32, 4, boundary="periodic",
                              box_size=1.0)
    assert pm.ghost_overflow_count(pos, mass, 32, 4,
                                   sr_ghosts=plan["sr_ghosts"],
                                   box_size=1.0) == 0
    # a deliberately starved cap reports the dropped images
    dropped = pm.ghost_overflow_count(pos, mass, 32, 4, sr_ghosts=8,
                                      box_size=1.0)
    assert dropped > 0, "starved ghost cap must be detected"


def test_p3m_periodic_config_and_cell_validation():
    """Config accepts p3m periodic; the solver rejects R_c >= box/2
    cell geometries instead of silently wrapping the taper onto its
    own images."""
    from nbody_tpu.config import SimConfig

    cfg = SimConfig(kernel="p3m", pm_boundary="periodic", pm_box=2.0,
                    pm_grid=64)
    opts = cfg.kernel_opts()
    assert opts["boundary"] == "periodic" and opts["box_size"] == 2.0
    pos, mass = _corner_blob(seed=3)
    with pytest.raises(ValueError, match="box/2"):
        pm.accelerations(pos, mass, grid=8, cutoff_cells=4,
                         boundary="periodic", box_size=1.0)


def test_periodic_mesh_env_freezes_spectra():
    """Periodic mesh_env (round-5: the round-4 'periodic p3m slower
    than open' anomaly was the env being silently ignored on the
    periodic dispatch): the frozen-spectra step must be EXACT vs the
    in-trace rebuild (the spectra are run constants), for both plain
    pm and p3m, and a boundary/grid-mismatched env must be rejected."""
    pos, mass = _corner_blob(seed=11)
    for cutoff in (0, 4):
        kw = dict(grid=32, cutoff_cells=cutoff, boundary="periodic",
                  box_size=1.0)
        env = pm.make_mesh_env(pos, mass, **kw)
        assert env, "periodic env must carry frozen spectra now"
        spec = env["spectra"]
        leaf = spec[0][0] if cutoff else spec[0]
        assert leaf.shape == (32, 32, 32)  # ng^3, not (2ng)^3
        a_env = np.asarray(pm.accelerations(pos, mass, mesh_env=env,
                                            **kw))
        a_ref = np.asarray(pm.accelerations(pos, mass, **kw))
        # Same arithmetic, but not bit-identical: with the env the
        # spectra arrive as executable INPUTS, without it XLA fuses
        # their build into the spectral multiply and rounds the fused
        # form differently — ulp-level drift only.
        np.testing.assert_allclose(a_env, a_ref, rtol=0,
                                   atol=1e-5 * np.abs(a_ref).max())
    # open env into a periodic call (and vice versa) is a config error
    env_open = pm.make_mesh_env(pos, mass, grid=32, cutoff_cells=4)
    with pytest.raises(ValueError, match="different solver config"):
        pm.accelerations(pos, mass, grid=32, cutoff_cells=4,
                         boundary="periodic", box_size=1.0,
                         mesh_env=env_open)
    env_per = pm.make_mesh_env(pos, mass, grid=32, cutoff_cells=4,
                               boundary="periodic", box_size=1.0)
    with pytest.raises(ValueError, match="different solver config"):
        pm.accelerations(pos, mass, grid=32, cutoff_cells=4,
                         mesh_env=env_per)


def test_p3m_periodic_sweep_variants_agree():
    """SR_SYMMETRIC and SR_PAIRED_ROWS (interpret-mode Pallas) through
    the FULL periodic solve agree with the default XLA sweep — the
    ghost-augmented tables are ordinary packed tables, so every sweep
    variant must compose."""
    import jax

    pos, mass = _corner_blob(seed=13)
    kw = dict(grid=32, cutoff_cells=4, boundary="periodic", box_size=1.0)
    # One plan raced across every layout: size for the full worklist.
    plan = pm.suggest_sr_plan(pos, mass, 32, 4, boundary="periodic",
                              box_size=1.0, layout="full")
    prev = pm.set_sr_layout(("xla", False, False))
    try:
        a_ref = np.asarray(pm.accelerations(pos, mass, **kw, **plan))
        scale = np.abs(a_ref).max()
        pm.SR_SYMMETRIC = True
        a_sym = np.asarray(pm.accelerations(pos, mass, **kw, **plan))
        np.testing.assert_allclose(a_sym, a_ref, rtol=0,
                                   atol=3e-5 * scale)
        pm.SR_SYMMETRIC = False
        pm.SR_SWEEP_IMPL = "pallas"  # interpret on CPU
        a_pl = np.asarray(pm.accelerations(pos, mass, **kw, **plan))
        pm.SR_PAIRED_ROWS = True
        a_pr = np.asarray(pm.accelerations(pos, mass, **kw, **plan))
    finally:
        pm.set_sr_layout(prev)
    np.testing.assert_allclose(a_pl, a_ref, rtol=0, atol=3e-5 * scale)
    np.testing.assert_allclose(a_pr, a_ref, rtol=0, atol=3e-5 * scale)
    del jax


def test_p3m_periodic_differentiable():
    """differentiable=True keeps values identical and lets grad flow
    through the ghost compaction (scatter), wrap, FFTs and the
    static-bound sweep."""
    import jax
    import jax.numpy as jnp

    pos, mass = _corner_blob(n=64, seed=15)
    kw = dict(grid=32, cutoff_cells=4, boundary="periodic", box_size=1.0,
              capacity=256, sr_ghosts=512)
    a0 = np.asarray(pm.accelerations(pos, mass, **kw))
    a1 = np.asarray(pm.accelerations(pos, mass, **kw,
                                     differentiable=True))
    np.testing.assert_array_equal(a0, a1)

    def loss(p):
        a = pm.accelerations(p, jnp.asarray(mass), differentiable=True,
                             **kw)
        return (a * a).sum()

    g = jax.jit(jax.grad(loss))(jnp.asarray(pos))
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).max()) > 0


def test_p3m_periodic_sharded_matches_single():
    """Engine-level 1-vs-4 agreement for sharded periodic P3M (mesh
    local-deposit+psum; SR entry chunks split across shards, one table
    psum)."""
    from nbody_tpu.config import SimConfig
    from nbody_tpu.simulation import run

    kw = dict(n=512, nsteps=50, kernel="p3m", pm_grid=32,
              pm_boundary="periodic", pm_box=8.0)
    res = run(SimConfig(shards=4, comm="allgather", **kw), quiet=True)
    ref = run(SimConfig(**kw), quiet=True)
    for (s, ke), (s_r, ke_r) in zip(res.kenergy_trace, ref.kenergy_trace):
        assert abs(ke - ke_r) <= 1e-4 * max(abs(ke_r), 1e-9), (s, ke, ke_r)


def test_sr_health_warns_on_overflow(capsys):
    """A pinned-tiny capacity overflows immediately; the per-block
    health check reports it ONCE on stderr and the run completes (the
    overflowed pairs degrade to mesh-quality forces, never crash)."""
    from nbody_tpu.config import SimConfig
    from nbody_tpu.simulation import run

    cfg = SimConfig(n=512, nsteps=100, sfreq=50, kernel="p3m",
                    pm_grid=16, pm_capacity=1)
    result = run(cfg, quiet=True)
    err = capsys.readouterr().err
    assert len(result.samples) == 2
    assert err.count("p3m plan health") == 1
    assert "--pm-replan" in err


def test_sr_health_replan_grows_plan(capsys):
    """--pm-replan re-measures the degraded plan, grows the static
    shapes, and rebuilds the blocks mid-run."""
    from nbody_tpu.config import SimConfig
    from nbody_tpu.simulation import run

    cfg = SimConfig(n=512, nsteps=150, sfreq=50, kernel="p3m",
                    pm_grid=16, pm_capacity=1, pm_replan=True)
    result = run(cfg, quiet=True)
    err = capsys.readouterr().err
    assert len(result.samples) == 3
    assert "replanned" in err
    assert cfg.pm_capacity > 1
    ke = [s[2] for s in result.samples]
    assert all(np.isfinite(k) for k in ke)


def test_sr_health_quiet_when_healthy(capsys):
    """A measured plan on a static-shape-friendly run emits nothing."""
    from nbody_tpu.config import SimConfig
    from nbody_tpu.simulation import run

    cfg = SimConfig(n=512, nsteps=50, sfreq=50, kernel="p3m",
                    pm_grid=16)
    run(cfg, quiet=True)
    assert "p3m plan health" not in capsys.readouterr().err


def test_pm_replan_config_validation():
    import pytest

    from nbody_tpu.config import SimConfig

    with pytest.raises(ValueError, match="pm-replan"):
        SimConfig(kernel="naive", pm_replan=True)
    with pytest.raises(ValueError, match="pm-replan"):
        SimConfig(kernel="pm", pm_replan=True)  # no short-range pass
    SimConfig(kernel="pm", pm_cutoff=4, pm_replan=True)
    SimConfig(kernel="p3m", pm_replan=True)


def _cold_lattice(nl: int, box: float = 1.0):
    """nl^3 cold cubic lattice (cell-centered) in the periodic box."""
    q1 = (np.arange(nl) + 0.5) / nl * box
    qx, qy, qz = np.meshgrid(q1, q1, q1, indexing="ij")
    q = np.stack([qx.ravel(), qy.ravel(), qz.ravel()]).astype(np.float32)
    m = np.full((nl ** 3,), 1.0 / nl ** 3, np.float32)  # M=1, rho=1
    return q, m


def test_periodic_linear_response_analytic():
    """Zel'dovich linear response: a cold lattice displaced by
    xi = A sin(k q_x) at the fundamental k = 2 pi / L must feel
    a_x = 4 pi G rho_bar * (k eps) K1(k eps) * xi — the plane-wave
    linear-theory result for the softened Plummer kernel (the
    (k eps) K1(k eps) factor IS the kernel's closed-form spectrum shape,
    validated independently against an fp64 Bessel sum in test_pm).
    This pins the periodic solver's absolute normalization (G, the
    background subtraction, deposit/gather calibration) end-to-end,
    for both the pure mesh and the P3M split (whose taper must
    reassemble the SAME total force)."""
    from nbody_tpu.types import G_NEWTON, SOFTENING_SQUARED

    L = 1.0
    q, m = _cold_lattice(24, L)
    k = np.float32(2 * np.pi / L)
    A = np.float32(0.002)  # linear regime: A*k = 0.013 << 1
    pos = q.copy()
    pos[0] += A * np.sin(k * q[0])
    soft = float(pm._xk1(jnp.float32(k * np.sqrt(SOFTENING_SQUARED))))
    pred = 4 * np.pi * G_NEWTON * 1.0 * soft * A
    n = q.shape[1]
    for cutoff in (0, 4):
        acc = np.asarray(pm.accelerations(
            jnp.asarray(pos), jnp.asarray(m), grid=32,
            cutoff_cells=cutoff, boundary="periodic", box_size=L))
        # amplitude of the sin(k q_x) mode of a_x
        proj = 2.0 / n * np.sum(acc[0] * np.sin(k * q[0]))
        err = abs(proj / pred - 1.0)
        assert err < 1.5e-2, (cutoff, proj, pred, err)
        # transverse components carry no coherent mode
        for c in (1, 2):
            t = 2.0 / n * np.sum(acc[c] * np.sin(k * q[0]))
            assert abs(t) < 0.02 * abs(proj), (cutoff, c, t, proj)


@pytest.mark.slow
def test_periodic_linear_growth_rate():
    """Dynamic completion of the linear-response test: with zero
    initial velocity the mode amplitude must grow as
    D(t) = A cosh(t / tau), tau^-2 = 4 pi G rho_bar (k eps) K1(k eps)
    (the pressureless Jeans growing+decaying pair under the periodic
    solver's uniform-background subtraction).  One full growth time
    under leapfrog, measured 0.23% off cosh(1) at nl=24/ng=32 — this
    exercises solver + integrator + engine block machinery as a
    physical system, not just a force snapshot."""
    from nbody_tpu.models.gravity import make_accel_fn, make_block_fn
    from nbody_tpu.state import ParticleState
    from nbody_tpu.types import G_NEWTON, SOFTENING_SQUARED

    L = 1.0
    q, m = _cold_lattice(24, L)
    n = q.shape[1]
    k = np.float32(2 * np.pi / L)
    A = np.float32(0.002)
    pos = q.copy()
    pos[0] += A * np.sin(k * q[0])
    soft = float(pm._xk1(jnp.float32(k * np.sqrt(SOFTENING_SQUARED))))
    tau = 1.0 / np.sqrt(4 * np.pi * G_NEWTON * soft)
    steps = 50
    blk = jax.jit(make_block_fn(
        make_accel_fn("pm", grid=32, boundary="periodic", box_size=L),
        tau / steps, steps, integrator="leapfrog"))
    st = ParticleState(pos=jnp.asarray(pos),
                       vel=jnp.zeros((3, n), jnp.float32),
                       mass=jnp.asarray(m), n=n)
    out, _ = blk(st)
    xp = np.asarray(out.pos)
    D = 2.0 / n * np.sum((xp[0] - q[0]) * np.sin(k * q[0]))
    growth = D / A
    assert abs(growth / np.cosh(1.0) - 1.0) < 2e-2, growth


def test_sr_health_replan_sharded():
    """The plan health check + --pm-replan also serve SHARDED p3m runs
    (the diagnostics are plain jitted calls over the globally-viewed
    sharded state; replan clears the pm-sub block cache so the next
    sample block rebuilds at the grown static shapes)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from nbody_tpu.config import SimConfig
    from nbody_tpu.simulation import run

    cfg = SimConfig(n=512, nsteps=100, sfreq=50, kernel="p3m",
                    pm_grid=16, pm_capacity=1, pm_replan=True,
                    shards=4)
    result = run(cfg, quiet=True)
    assert len(result.samples) == 2
    assert cfg.pm_capacity > 1
    assert all(np.isfinite(s[2]) for s in result.samples)

def test_mesh_env_freeze_first_step_exact():
    """A mesh_env built from the SAME positions must reproduce the
    per-step solve bit-exactly (same box, same spectra arithmetic) —
    the per-block freeze only diverges once particles drift, and then
    by at most the robust box's 3x expansion slack."""
    pos, _, mass = plummer(2048, seed=3)
    kw = dict(grid=64, cutoff_cells=4)
    plan = pm.suggest_sr_plan(pos, mass, 64, 4)
    env = pm.make_mesh_env(pos, mass, grid=64, cutoff_cells=4)
    a_env = np.asarray(pm.accelerations(pos, mass, **kw, **plan,
                                        mesh_env=env))
    a_ref = np.asarray(pm.accelerations(pos, mass, **kw, **plan))
    np.testing.assert_array_equal(a_env, a_ref)
    # plain pm too (3-spectra env)
    env_pm = pm.make_mesh_env(pos, mass, grid=64)
    np.testing.assert_array_equal(
        np.asarray(pm.accelerations(pos, mass, grid=64, mesh_env=env_pm)),
        np.asarray(pm.accelerations(pos, mass, grid=64)))
    # config-mismatch guard
    with pytest.raises(ValueError, match="different solver config"):
        pm.accelerations(pos, mass, grid=32, cutoff_cells=4,
                         mesh_env=env)
    # periodic env: spectra-only, ng^3 (round 5) — the full periodic
    # freeze/mismatch coverage lives in
    # test_periodic_mesh_env_freezes_spectra.
    env_per = pm.make_mesh_env(pos, mass, grid=32, boundary="periodic",
                               box_size=8.0)
    assert np.asarray(env_per["spectra"][0]).shape == (32, 32, 32)


def test_mesh_env_block_matches_per_step_solve():
    """A 5-step block with the per-block frozen env stays within drift
    tolerance of the exact per-step-box block (the engine's default
    wiring for mesh kernels — simulation._mesh_env_fn)."""
    from nbody_tpu.models.integrators import make_block_fn
    from nbody_tpu.state import ParticleState

    pos, vel, mass = plummer(1024, seed=9)
    state = ParticleState(pos=pos, vel=vel * 0.01, mass=mass, n=1024)
    kw = dict(grid=32, cutoff_cells=4, capacity=64)

    def accel(p, m, mesh_env=None):
        return pm.accelerations(p, m, mesh_env=mesh_env, **kw)

    ref, ke_ref = make_block_fn(accel, 0.01, 5)(state)
    out, ke = make_block_fn(
        accel, 0.01, 5,
        env_fn=lambda p, m: pm.make_mesh_env(p, m, grid=32,
                                             cutoff_cells=4))(state)
    scale = np.abs(np.asarray(ref.pos)).max()
    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos),
                               rtol=0, atol=1e-5 * scale)
    assert float(ke) == pytest.approx(float(ke_ref), rel=1e-4)


def test_engine_skips_env_on_periodic_runs():
    """Round-5 measured decision (DESIGN.md 'Periodic P3M cost
    ledger'): periodic spectra are loop-invariant constants XLA hoists
    inside the block executable, and a cross-executable frozen env
    measured 25-45 ms/step SLOWER at N=1M — the engine must build an
    env for OPEN mesh runs and NONE for periodic ones, and the
    periodic run must still work end-to-end."""
    from nbody_tpu.config import SimConfig
    from nbody_tpu.simulation import _DeviceRunner, run

    cfg = SimConfig(n=512, nsteps=2, sfreq=2, kernel="p3m", pm_grid=16,
                    pm_boundary="periodic", pm_box=8.0)
    sim = _DeviceRunner(cfg)
    assert sim._mesh_env_fn("p3m") is None
    assert sim._mesh_env_fn("pm") is None
    open_cfg = SimConfig(n=512, nsteps=2, sfreq=2, kernel="p3m",
                         pm_grid=16)
    assert _DeviceRunner(open_cfg)._mesh_env_fn("p3m") is not None
    result = run(cfg, quiet=True)
    assert np.isfinite(result.samples[-1][2])
