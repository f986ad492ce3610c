#!/usr/bin/env python
"""Stage-by-stage timing of the open-boundary P3M step.

The round-3 hardware logs left ~450-1500 ms/step of the p3m solve
unexplained (p3m minus pm-solve minus isolated-sweep, sr_pallas.log /
p3m_stress.log); this script times every stage of
`pm.accelerations_between`'s p3m path in isolation — box, deposit,
rho FFT, kernel spectra (the 6 per-step (2ng)^3 fftns), inverse
transforms (plain and overflow branches), gather, cid binning, slab
packing (incl. its two argsorts), worklist ranges, and the sweep —
so optimization effort aims at the measured dominant term instead of
the assumed one (VERDICT round 3, item 1).

Methodology: each stage is a jitted k-repeat fori_loop returning one
scalar; min-of-3 difference timing cancels dispatch/fetch constants
(docs/DESIGN.md).  Run: python scripts/exp_p3m_profile.py
[--sizes 262144,1048576] [--cpu] [--reps K]
"""

from __future__ import annotations

import argparse
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


def _staged(fn, reps, env):
    """Time `fn(carry, env) -> scalar-ish` as a k-repeat jitted loop.

    ``env`` (a pytree of device arrays) is passed as a JIT ARGUMENT, not
    a closure: zero-arg jits embed closed-over arrays as MLIR constants
    via a host fetch, and complex64 fetches raise UNIMPLEMENTED on the
    tunneled backend (CLAUDE.md gotchas)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def make_run(k):
        @jax.jit
        def run(env):
            def body(i, carry):
                out = fn(carry, env)
                return jnp.asarray(out, jnp.float32).reshape(-1)[0]

            return lax.fori_loop(0, k, body, jnp.float32(0))

        return lambda: run(env)

    return _time_loop(make_run, reps)


def profile_one(state, ng, cutoff, reps, label):
    import jax
    import jax.numpy as jnp

    from nbody_tpu.ops import pm

    f32 = jnp.float32
    pos, mass = state.pos.astype(f32), state.mass.astype(f32)
    n = pos.shape[1]
    plan = pm.suggest_sr_plan(pos, mass, ng, cutoff)
    cap, s_max, e_max = (plan["capacity"], plan["sr_slabs"],
                         plan["sr_entries"])
    nc, sub = pm._cell_grid_params(ng, cutoff)
    n_cells = nc * nc * nc
    m = 2 * ng

    # Precompute every stage's inputs once (on device).
    lo_box, hi_box = pm._robust_box(pos, mass)
    span = hi_box - lo_box
    in_src = pm._inside(pos, lo_box, hi_box)
    m_in = mass * in_src
    h = (span / f32(ng - 3))[:, 0]
    inv_h = 1.0 / h[:, None]
    lo = lo_box - h[:, None]
    rho = pm._deposit(pos, m_in, lo, inv_h, ng)
    rho_hat = jnp.fft.fftn(rho, s=(m, m, m))
    rc2 = pm._sr_rc2(span, nc, sub)
    inc = m_in > 0
    cid = pm._bin_cids(pos, lo_box, span, nc, inc)
    packed = pm._sr_pack(cid, pos, m_in, n_cells, cap, s_max)
    ptab, mtab, slab_lo, slab_hi, pslot, binned = packed
    (kx, ky, kz), (sx, sy, sz) = pm._p3m_spectra(h, ng, rc2)
    acc_grids = jnp.stack([
        -jnp.fft.ifftn(rho_hat * k).real[:ng, :ng, :ng]
        for k in (kx, ky, kz)])
    wl_t, wl_s, n_e = pm._sr_ranges(slab_lo, slab_hi, nc, sub, e_max)
    for x in (rho_hat, ptab, wl_t, acc_grids):
        x.block_until_ready()

    rows = []
    env = dict(
        pos=pos, mass=mass, m_in=m_in, lo_box=lo_box, hi_box=hi_box,
        span=span, lo=lo, inv_h=inv_h, h=h, rho=rho, rho_hat=rho_hat,
        rc2=rc2, cid=cid, inc=inc, ptab=ptab, mtab=mtab,
        slab_lo=slab_lo, slab_hi=slab_hi, wl_t=wl_t, wl_s=wl_s, n_e=n_e,
        kx=kx, ky=ky, kz=kz, sx=sx, sy=sy, sz=sz, acc_grids=acc_grids,
    )

    def rec(name, fn):
        t = _staged(fn, reps, env)
        rows.append((name, t * 1e3))
        print(f"{label:>22} {name:>12} {t*1e3:>9.2f} ms", flush=True)

    rec("box", lambda c, e: pm._robust_box(
        e["pos"] + c, e["mass"])[0][0, 0])
    rec("moments", lambda c, e: pm._outlier_moments(
        e["pos"] + c, e["mass"], e["m_in"], e["lo_box"], e["hi_box"],
        lambda x: x)[0])
    rec("deposit", lambda c, e: pm._deposit(
        e["pos"] + c, e["m_in"], e["lo"], e["inv_h"], ng)[0, 0, 0])
    rec("rho_fft", lambda c, e: jnp.fft.fftn(
        e["rho"] + c, s=(m, m, m)).real[0, 0, 0])
    rec("spectra6", lambda c, e: pm._p3m_spectra(
        e["h"] + c, ng, e["rc2"])[0][0].real[0, 0, 0])
    rec("inv3", lambda c, e: sum(
        jnp.fft.ifftn((e["rho_hat"] + c) * e[k]).real[0, 0, 0]
        for k in ("kx", "ky", "kz")))
    # Overflow branch extras: complement deposit+fft plus 3 MORE ifftns
    # (comp_grids) — the _over branch runs 6 ifftns total vs _plain's 3.
    rec("over_extra", lambda c, e: (
        lambda roh: sum(
            jnp.fft.ifftn((e["rho_hat"] - roh) * e[s]).real[0, 0, 0]
            for s in ("sx", "sy", "sz")))(
        jnp.fft.fftn(pm._deposit(e["pos"] + c, e["m_in"] * 0.01,
                                 e["lo"], e["inv_h"], ng),
                     s=(m, m, m))))
    rec("gather", lambda c, e: pm._gather(
        e["acc_grids"], e["pos"] + c, e["lo"], e["inv_h"], ng)[0, 0])
    rec("bincid", lambda c, e: pm._bin_cids(
        e["pos"] + c, e["lo_box"], e["span"], nc, e["inc"])[0])
    rec("sort1", lambda c, e: jnp.argsort(
        e["cid"] + jnp.int32(c * 0))[0])
    rec("pack", lambda c, e: pm._sr_pack(
        e["cid"] + jnp.int32(c * 0), e["pos"], e["m_in"], n_cells, cap,
        s_max)[0][0, 0])
    rec("ranges", lambda c, e: pm._sr_ranges(
        e["slab_lo"] + jnp.int32(c * 0), e["slab_hi"], nc, sub,
        e_max)[2])
    interp = jax.default_backend() != "tpu"
    rec("sweep", lambda c, e: pm._sr_sweep_pallas(
        e["ptab"] + c, e["mtab"], e["wl_t"], e["wl_s"],
        (jnp.zeros((), jnp.int32), jnp.minimum(e["n_e"], e_max)),
        e["rc2"], interpret=interp)[0, 0])
    rec("FULL p3m", lambda c, e: pm.accelerations(
        e["pos"] + c, e["mass"], grid=ng, cutoff_cells=cutoff,
        **plan)[0, 0])

    staged = sum(t for name, t in rows
                 if name not in ("FULL p3m", "sort1"))
    full = dict(rows)["FULL p3m"]
    print(f"{label:>22} {'sum-stages':>12} {staged:>9.2f} ms "
          f"(full {full:.2f}, unexplained {full-staged:+.2f})",
          flush=True)
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", default="262144,1048576")
    p.add_argument("--ng", type=int, default=128)
    p.add_argument("--reps", type=int, default=4)
    p.add_argument("--dists", default="reference,plummer")
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
                        f"{dist}/{n}")


if __name__ == "__main__":
    main()
