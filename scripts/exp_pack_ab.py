#!/usr/bin/env python
"""A/B of the _sr_pack formulations, in-context (round 5).

A searchsorted+gather reformulation of _sr_pack's scatters (the
_ghost_images trick) looked like the next P3M lever — the pack is the
top 1M in-context term (p3m_ablate_1m_r5.log).  First hardware rows
after trying it (p3m_stress_r5c.log): uniform 65k p3m 65.6 vs 34.4
ms, 262k 194.8 vs 89.9 — a ~2x REGRESSION, so production reverted to
the scatter form.  This script is the controlled race: the full p3m
step and the isolated pack stage under three formulations,

  scatter : production (argsort + 5 scatters)
  gather  : searchsorted-based (2 searchsorteds, tables as gathers,
            1 scatter)
  hybrid  : scatter pord + gather tables + derived binned (3 scatters)

Run: python scripts/exp_pack_ab.py [--sizes 65536,1048576]
     [--dists reference,plummer] [--cpu]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])
sys.path.insert(0, __file__.rsplit("/", 1)[0])

from exp_p3m_ablate import _patched, _time_loop, _timed_full  # noqa: E402


def _variant_factories():
    """gather/hybrid _sr_pack variants (same signature/returns as
    production; both validated bit-identical on CPU by this script's
    --selfcheck).  Production itself is left unpatched."""
    import jax.numpy as jnp

    from nbody_tpu.ops import pm

    def common_head(cid, n_cells, cap):
        i32 = jnp.int32
        ns = cid.shape[0]
        order = jnp.argsort(cid).astype(i32)
        sc = cid[order]
        cells = jnp.arange(n_cells, dtype=i32)
        starts = jnp.searchsorted(sc, cells, side="left").astype(i32)
        rank = (jnp.arange(ns, dtype=i32)
                - starts[jnp.clip(sc, 0, n_cells - 1)])
        valid = (sc < n_cells) & (rank < cap)
        return order, sc, valid

    def slabs(pc, n_bin, n_cells, s_max, ns):
        i32 = jnp.int32
        sidx = jnp.arange(s_max, dtype=i32) * pm.SLAB
        has = sidx < n_bin
        last = jnp.clip(jnp.minimum(sidx + (pm.SLAB - 1), n_bin - 1),
                        0, ns - 1)
        slab_lo = jnp.where(has, pc[jnp.minimum(sidx, ns - 1)], n_cells)
        slab_hi = jnp.where(has, pc[last], n_cells)
        return slab_lo, slab_hi

    def gather_pack(cid, pos, mass, n_cells, cap, s_max):
        i32, f32 = jnp.int32, jnp.float32
        ns = cid.shape[0]
        order, sc, valid = common_head(cid, n_cells, cap)
        vi = valid.astype(i32)
        cum = jnp.cumsum(vi)
        n_bin = cum[-1]
        ppos = jnp.arange(ns, dtype=i32)
        inv_cum = (ppos + 1) - cum
        tv = jnp.searchsorted(cum, ppos + 1, side="left").astype(i32)
        ti = jnp.searchsorted(inv_cum, ppos - n_bin + 1,
                              side="left").astype(i32)
        pord = jnp.minimum(jnp.where(ppos < n_bin, tv, ti), ns - 1)
        perm = order[pord]
        pc = jnp.where(valid, sc, n_cells)[pord]
        nslots = (s_max + 1) * pm.SLAB
        ok = (ppos < n_bin) & (ppos < s_max * pm.SLAB)
        slot = jnp.where(ok, ppos, nslots - 1)
        kk = jnp.arange(nslots, dtype=i32)
        okk = (kk < n_bin) & (kk < s_max * pm.SLAB)
        ksrc = jnp.minimum(kk, ns - 1)
        ptab = jnp.where(okk[None, :], pos[:, perm[ksrc]], f32(0))
        mtab = jnp.where(okk, mass[perm[ksrc]], f32(0))
        pslot = jnp.zeros((ns,), i32).at[perm].set(
            slot, unique_indices=True)
        binned = pslot != (nslots - 1)
        return (ptab, mtab) + slabs(pc, n_bin, n_cells, s_max, ns) + (
            pslot, binned)

    def hybrid_pack(cid, pos, mass, n_cells, cap, s_max):
        i32, f32 = jnp.int32, jnp.float32
        ns = cid.shape[0]
        order, sc, valid = common_head(cid, n_cells, cap)
        vi = valid.astype(i32)
        nv = jnp.cumsum(vi) - vi
        n_bin = jnp.sum(vi)
        ppos = jnp.arange(ns, dtype=i32)
        dest = jnp.where(valid, nv, n_bin + (ppos - nv))
        pord = jnp.zeros((ns,), i32).at[dest].set(ppos)
        perm = order[pord]
        pc = jnp.where(valid, sc, n_cells)[pord]
        nslots = (s_max + 1) * pm.SLAB
        ok = (ppos < n_bin) & (ppos < s_max * pm.SLAB)
        slot = jnp.where(ok, ppos, nslots - 1)
        kk = jnp.arange(nslots, dtype=i32)
        okk = (kk < n_bin) & (kk < s_max * pm.SLAB)
        ksrc = jnp.minimum(kk, ns - 1)
        ptab = jnp.where(okk[None, :], pos[:, perm[ksrc]], f32(0))
        mtab = jnp.where(okk, mass[perm[ksrc]], f32(0))
        pslot = jnp.zeros((ns,), i32).at[perm].set(
            slot, unique_indices=True)
        binned = pslot != (nslots - 1)
        return (ptab, mtab) + slabs(pc, n_bin, n_cells, s_max, ns) + (
            pslot, binned)

    return {"gather": gather_pack, "hybrid": hybrid_pack}


def _timed_pack_only(pos, mass, ng, cutoff, plan, reps):
    """The pack stage in isolation: cid binning + _sr_pack, outputs
    consumed into one scalar (defeats DCE), iterated in a fori_loop
    with a position perturbation so no step can be hoisted."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from nbody_tpu.ops import pm

    f32 = jnp.float32
    nc, sub = pm._cell_grid_params(ng, cutoff)
    n_cells = nc * nc * nc
    ns = pos.shape[1]
    cap, s_max, _ = pm._sr_sizing(ns, ns, n_cells, plan["capacity"],
                                  plan["sr_slabs"], plan["sr_entries"])

    def make_run(k):
        @jax.jit
        def run(pos, mass):
            lo, hi = pm._robust_box(pos, mass)
            span = hi - lo

            def body(i, carry):
                p = pos + carry
                cid = pm._bin_cids(p, lo, span, nc, mass > 0)
                ptab, mtab, slab_lo, slab_hi, pslot, binned = (
                    pm._sr_pack(cid, p, mass, n_cells, cap, s_max))
                return (ptab[0, 0] + mtab[0] + f32(slab_lo[0])
                        + f32(pslot[0]) + f32(binned[0])) * f32(1e-30)

            return lax.fori_loop(0, k, body, f32(0))

        return lambda: run(pos, mass)

    return _time_loop(make_run, reps)


def _selfcheck(variants):
    import numpy as np

    from nbody_tpu.ops import pm

    rng = np.random.default_rng(0)
    for ns, n_cells, cap, s_max in [(1000, 64, 4, 20), (513, 27, 1, 3),
                                    (1000, 1000, 8, 2)]:
        cid = rng.integers(0, n_cells + 1, ns).astype(np.int32)
        pos = rng.normal(size=(3, ns)).astype(np.float32)
        mass = rng.random(ns).astype(np.float32)
        ref = pm._sr_pack(cid, pos, mass, n_cells, cap, s_max)
        for name, fn in variants.items():
            got = fn(cid, pos, mass, n_cells, cap, s_max)
            for x, y in zip(ref, got):
                np.testing.assert_array_equal(np.asarray(x),
                                              np.asarray(y),
                                              err_msg=name)
    print("# selfcheck: all variants bit-identical to production")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", default="65536,1048576")
    p.add_argument("--dists", default="reference,plummer")
    p.add_argument("--ng", type=int, default=128)
    p.add_argument("--reps", type=int, default=4)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--selfcheck", action="store_true")
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
    variants = _variant_factories()
    if args.selfcheck:
        _selfcheck(variants)
        return
    for dist in args.dists.split(","):
        for n in [int(s) for s in args.sizes.split(",")]:
            state = make_state(n, pad_multiple=1024, distribution=dist,
                               seed=42 if dist == "reference" else 7)
            pos = state.pos.astype("float32")
            mass = state.mass.astype("float32")
            plan = pm.suggest_sr_plan(pos, mass, args.ng, cutoff)
            rows = [("scatter", {})] + [
                (nm, {"_sr_pack": fn}) for nm, fn in variants.items()]
            for name, patches in rows:
                with _patched(**patches):
                    t_full = _timed_full(pos, mass, args.ng, cutoff,
                                         plan, args.reps)
                    t_pack = _timed_pack_only(pos, mass, args.ng,
                                              cutoff, plan, args.reps)
                print(f"{dist:>10}/{n:<8} pack={name:<7}  "
                      f"full {t_full*1e3:8.2f} ms/step   "
                      f"pack-only {t_pack*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
