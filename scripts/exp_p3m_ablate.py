#!/usr/bin/env python
"""In-context ablation of the P3M step (open or periodic boundary).

The round-3 stage profile (scripts/exp_p3m_profile.py,
logs/hw_contact/p3m_profile.log) timed each stage in ISOLATION and left
~170-1500 ms/step of the FULL solve unexplained (isolated stages are
free of the full step's scheduling/fusion/DCE context — e.g. the
isolated spectra stage fetches one of six spectra so XLA dead-code
eliminates the rest).  This script attributes the full step's cost
exactly instead: it times `pm.accelerations(...)` repeatedly while
monkeypatching successive stages into shape-correct no-ops, so each
ladder delta IS that stage's in-context cost — everything XLA actually
schedules around it included.

Ladder (each row removes one more stage; values become garbage, the
step's structure does not):

  full        baseline (module-default SR layout)
  lay:psym    baseline under the pallas_paired_sym SR layout
  -sweep      short-range sweep stubbed to zeros
  -ranges     + worklist construction stubbed (n_e = 0)
  -over       + the overflow lax.cond branch forced to _plain while the
                REAL pack still decides `binned` (drops the roh fftn and
                3 of the 6 ifftns iff the step actually overflowed)
  -spectra    + per-step kernel spectra (6 (2ng)^3 fftns + sampling)
                replaced by constants
  -pack       + slab packing (2 argsorts + scatters) stubbed (ablated
                LAST: its `binned` stub would otherwise flip the
                overflow cond and conflate the rungs)

Periodic mode (--boundary periodic --box 1.0) times the production
step (frozen-spectra mesh_env) and swaps the ladder for the periodic
stages: a `noenv` rung (per-step spectra rebuild — the round-4 env
miss), a `-ghosts` rung (_ghost_images: the 7N-candidate cumsum +
scatter compaction), and the periodic over/force-grid path.

Run: python scripts/exp_p3m_ablate.py [--sizes 262144] [--reps 4]
     [--dists plummer] [--cpu] [--boundary periodic --box 1.0]
"""

from __future__ import annotations

import argparse
import contextlib
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _time_loop(make_run, base_reps):
    def t(k):
        run = make_run(k)
        float(run())  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run())
            best = min(best, time.perf_counter() - t0)
        return best

    L = max(1, base_reps)
    return max(t(2 * L) - t(L), 1e-9) / L


def _timed_full(pos, mass, ng, cutoff, plan, reps, bkw=None, env=None):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from nbody_tpu.ops import pm

    kw = dict(bkw or {})

    def make_run(k):
        @jax.jit
        def run(pos, mass, env_arg):
            # env as a traced ARGUMENT, never a closure capture: jit
            # would embed captured arrays as mlir CONSTANTS, which
            # fetches them to host — and complex64 fetches raise
            # UNIMPLEMENTED on this backend (periodic_ablate_r5.log).
            ekw = dict(kw, mesh_env=env_arg) if env_arg else kw

            def body(i, carry):
                acc = pm.accelerations(pos + carry, mass, grid=ng,
                                       cutoff_cells=cutoff, **plan,
                                       **ekw)
                return acc[0, 0]

            return lax.fori_loop(0, k, body, jnp.float32(0))

        return lambda: run(pos, mass, env)

    return _time_loop(make_run, reps)


@contextlib.contextmanager
def _patched(**repls):
    from nbody_tpu.ops import pm

    saved = {k: getattr(pm, k) for k in repls}
    try:
        for k, v in repls.items():
            setattr(pm, k, v)
        yield
    finally:
        for k, v in saved.items():
            setattr(pm, k, v)


def _stubs():
    """Shape-correct no-op replacements for each ablatable stage."""
    import jax
    import jax.numpy as jnp

    from nbody_tpu.ops import pm

    i32, f32, c64 = jnp.int32, jnp.float32, jnp.complex64

    def z_sweep(ptab, mtab, wl_t, wl_s, *a, **k):
        # Consume every input (cheap elementwise probe): a plain
        # zeros_like would let XLA dead-code-eliminate the whole pack +
        # ranges pipeline upstream, silently folding their cost into
        # this rung's delta.
        probe = (jnp.sum(mtab) + jnp.sum(wl_t.astype(f32))
                 + jnp.sum(wl_s.astype(f32))) * f32(1e-38)
        return ptab * f32(1e-38) + probe

    def z_ranges(slab_lo, slab_hi, nc, sub, e_max, symmetric=False,
                 paired=False):
        s_max = slab_lo.shape[0]
        sent = (s_max // 2) if paired else s_max
        return (jnp.full((e_max,), s_max, i32),
                jnp.full((e_max,), sent, i32), jnp.zeros((), i32))

    def z_pack(cid, pos, mass, n_cells, cap, s_max):
        ns = cid.shape[0]
        nslots = (s_max + 1) * pm.SLAB
        # binned all-True so has_over stays False (the -over rung has
        # already forced the plain branch by the time this applies).
        return (jnp.zeros((3, nslots), f32), jnp.zeros((nslots,), f32),
                jnp.full((s_max,), n_cells, i32),
                jnp.full((s_max,), n_cells, i32),
                jnp.zeros((ns,), i32), jnp.ones((ns,), bool))

    def z_spectra(h, ng, rc2):
        m = 2 * ng
        one = jnp.ones((m, m, m), c64) * (1.0 + h[0] * 0)
        zero = jnp.zeros((m, m, m), c64)
        return (one, one, one), (zero, zero, zero)

    def plain_grids(rho_hat, rho_over_hat_fn, h, ng, rc2, has_over,
                    spectra=None):
        (kx, ky, kz), _ = spectra or pm._p3m_spectra(h, ng, rc2)
        g = jnp.stack([
            -jnp.fft.ifftn(rho_hat * k).real[:ng, :ng, :ng]
            for k in (kx, ky, kz)])
        return g, jnp.zeros_like(g)

    def z_ghosts(pos_w, mass, box, rc, gcap):
        # Consume pos/mass (probe) or XLA folds the candidate build +
        # cumsum + scatter into this rung's upstream and the delta lies.
        probe = (jnp.sum(pos_w) + jnp.sum(mass)) * f32(1e-38)
        return (jnp.zeros((3, gcap), f32) + probe,
                jnp.zeros((gcap,), f32), jnp.zeros((), i32))

    def per_plain_grids(rho_hat, rho_over_hat_fn, comb, comp, has_over):
        g = jnp.stack([jnp.fft.ifftn(rho_hat * c).real for c in comb])
        return g, jnp.zeros_like(g)

    return dict(sweep=dict(_sr_sweep_pallas=z_sweep, _sr_sweep=z_sweep),
                ranges=dict(_sr_ranges=z_ranges),
                pack=dict(_sr_pack=z_pack),
                spectra=dict(_p3m_spectra=z_spectra),
                over=dict(_p3m_force_grids=plain_grids),
                ghosts=dict(_ghost_images=z_ghosts),
                per_over=dict(_periodic_p3m_force_grids=per_plain_grids))


def profile_one(state, ng, cutoff, reps, label, boundary="open",
                box=0.0):
    import jax.numpy as jnp

    from nbody_tpu.ops import pm

    f32 = jnp.float32
    pos, mass = state.pos.astype(f32), state.mass.astype(f32)
    periodic = boundary == "periodic"
    bkw = (dict(boundary="periodic", box_size=box) if periodic else {})
    plan = pm.suggest_sr_plan(pos, mass, ng, cutoff, **bkw)
    print(f"# {label}: plan={plan}", flush=True)
    stubs = _stubs()
    env = (pm.make_mesh_env(pos, mass, grid=ng, cutoff_cells=cutoff,
                            **bkw) if periodic else None)

    rows = []

    def rec(name, patches, layout=None, env_row=env):
        prev = pm.set_sr_layout(layout) if layout else None
        try:
            with _patched(**patches):
                t = _timed_full(pos, mass, ng, cutoff, plan, reps,
                                bkw=bkw, env=env_row)
        finally:
            if prev:
                pm.set_sr_layout(prev)
        rows.append((name, t * 1e3))
        base = rows[0][1]
        prevv = rows[-2][1] if len(rows) > 1 else base
        print(f"{label:>18} {name:>9} {t*1e3:>9.2f} ms"
              f"  (delta vs prev {prevv - t*1e3:+8.2f})", flush=True)

    acc = {}
    rec("full", dict(acc))
    if periodic:
        # Ladder order: each rung must not flip a structure an earlier
        # rung still measures — ghosts BEFORE pack (pack keeps its
        # shapes), over before pack (z_pack's all-True binned would
        # flip the cond), pack last.
        rec("noenv", dict(acc), env_row=None)
        for key in ("sweep", "ranges", "ghosts", "per_over", "pack"):
            acc.update(stubs[key])
            rec("-" + key.replace("per_", ""), dict(acc))
        return rows
    rec("lay:psym", dict(acc), layout="pallas_paired_sym")
    for key in ("sweep", "ranges", "over", "spectra", "pack"):
        acc.update(stubs[key])
        rec("-" + key, dict(acc))
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", default="262144")
    p.add_argument("--ng", type=int, default=128)
    p.add_argument("--reps", type=int, default=4)
    p.add_argument("--dists", default="plummer")
    p.add_argument("--boundary", default="open",
                   choices=("open", "periodic"))
    p.add_argument("--box", type=float, default=1.0)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        from nbody_tpu.utils.platform import force_cpu

        force_cpu(1)
    import jax

    from nbody_tpu.__main__ import _enable_compilation_cache

    _enable_compilation_cache()
    from nbody_tpu.init import make_state
    from nbody_tpu.ops import pm

    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {dev.device_kind}")
    cutoff = pm.DEFAULT_CUTOFF_CELLS
    for dist in args.dists.split(","):
        for n in (int(s) for s in args.sizes.split(",")):
            state = make_state(n, pad_multiple=1024, distribution=dist,
                               seed=42 if dist == "reference" else 7)
            profile_one(state, args.ng, cutoff, args.reps,
                        f"{dist}/{n}", boundary=args.boundary,
                        box=args.box)


if __name__ == "__main__":
    main()
