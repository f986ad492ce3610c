#!/usr/bin/env python
"""Round-5: in-context A/B of the two-stage ghost compaction.

Cross-run periodic-1M numbers have real spread on this backend (the
IDENTICAL binary measured 609 vs 991 ms/step across runs —
docs/DESIGN.md "Periodic P3M cost ledger"), so the ghost-build
reformulation is judged the way the ablation campaign judges stages:
BOTH variants timed in ONE process, alternating, min-of-reps.

  legacy: one ok/cumsum/searchsorted chain over all 7N (combo,
          particle) candidates (the round-5 implicit-candidate form,
          logs/hw_contact/periodic_ab4_r5.log);
  packed: boundary particles compact first (N-length chain into
          min(gcap, n) slots), ghost slots decode (parent, rank)
          against per-particle image counts with _GHOST_COMBO_TABLE
          (the production _ghost_images).

Run: python scripts/exp_ghost_ab.py [--n 1048576] [--steps 4]
     [--reps 3] [--cpu]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _legacy_ghost_images(pos_w, mass, box, rc, gcap: int):
    """The pre-round-5f formulation: single chain over 7N candidates
    (kept verbatim for the A/B; see _ghost_images for the contract)."""
    import jax.numpy as jnp

    from nbody_tpu.ops.pm import _GHOST_COMBOS

    f32, i32 = jnp.float32, jnp.int32
    L = jnp.float32(box)
    one = jnp.ones((), i32)
    n = pos_w.shape[1]
    sig = jnp.where(pos_w < rc, one,
                    jnp.where(pos_w > L - rc, -one, 0))
    cand_ok = []
    for c in _GHOST_COMBOS:
        cvec = jnp.asarray(c, i32)[:, None]
        shift = jnp.where(cvec == 1, sig, 0)
        cand_ok.append(
            jnp.all((cvec != 1) | (shift != 0), axis=0) & (mass > 0))
    cok = jnp.concatenate(cand_ok)
    cum = jnp.cumsum(cok.astype(i32))
    n_ghost = cum[-1]
    slots = jnp.arange(gcap, dtype=i32)
    src = jnp.searchsorted(cum, slots + 1, side="left")
    src = jnp.minimum(src, cok.shape[0] - 1)
    valid = slots < n_ghost
    pi = src % n
    ci = src // n
    combos = jnp.asarray(_GHOST_COMBOS, i32).T
    shift_g = jnp.where(combos[:, ci] == 1, sig[:, pi], 0)
    gpos = jnp.where(valid[None, :],
                     pos_w[:, pi] + L * shift_g.astype(f32), f32(0))
    gmass = jnp.where(valid, mass[pi], f32(0))
    return gpos, gmass, n_ghost


def _make_legacy_method(method: str):
    """Legacy chain with an explicit searchsorted lowering method
    (default 'scan' = log2(7N) sequential gather rounds; 'sort'
    concatenates queries+array into ONE XLA sort — the lowering that
    beat scan in the pack campaign, logs/hw_contact/pack_ab_r5.log)."""
    import functools

    import jax.numpy as jnp

    def impl(pos_w, mass, box, rc, gcap: int):
        from unittest import mock

        ss = functools.partial(jnp.searchsorted, method=method)
        with mock.patch("jax.numpy.searchsorted", ss):
            return _legacy_ghost_images(pos_w, mass, box, rc, gcap)

    return impl


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1048576)
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        from nbody_tpu.utils.platform import force_cpu

        force_cpu(1)
    import jax

    from nbody_tpu.__main__ import _enable_compilation_cache

    _enable_compilation_cache()
    from nbody_tpu.init import make_state
    from nbody_tpu.models.gravity import make_accel_fn, make_block_fn
    from nbody_tpu.ops import pm

    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {dev.device_kind}; N={args.n}")
    state = make_state(args.n, pad_multiple=1024,
                       distribution="reference", seed=42)
    plan = pm.suggest_sr_plan(state.pos, state.mass,
                              boundary="periodic", box_size=1.0)
    print(f"# periodic plan: {plan}", flush=True)
    fn = make_accel_fn("p3m", **plan, boundary="periodic", box_size=1.0)

    packed_impl = pm._ghost_images

    def timed(tag, steps):
        blk = make_block_fn(fn, 0.1, steps)
        out, ke = blk(state)
        float(ke)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out, ke = blk(state)
            float(ke)
            best = min(best, time.perf_counter() - t0)
        return best

    variants = (
        ("packed", packed_impl),
        ("legacy", _legacy_ghost_images),
        ("leg_sort", _make_legacy_method("sort")),
        ("leg_unroll", _make_legacy_method("scan_unrolled")),
    )
    half = max(1, args.steps // 2)
    rows = {tag: [] for tag, _ in variants}
    for rep in range(args.reps):
        for tag, impl in variants:
            pm._ghost_images = impl
            try:
                ms = max(timed(tag, 2 * half) - timed(tag, half),
                         1e-9) / half * 1e3
            finally:
                pm._ghost_images = packed_impl
            rows[tag].append(ms)
            print(f"  rep{rep} {tag:>10}: {ms:9.2f} ms/step", flush=True)
    for tag, r in rows.items():
        print(f"{tag:>12}: min {min(r):8.2f}  all "
              f"{' '.join(f'{x:.1f}' for x in r)}", flush=True)


if __name__ == "__main__":
    main()
