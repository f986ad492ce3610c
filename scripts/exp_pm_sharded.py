#!/usr/bin/env python
"""Round-3 measurement (VERDICT r2 item 2 done-criterion): the
local-deposit + grid-psum sharded mesh solve vs the round-2
replicated-allgather formulation, on the 8-virtual-device CPU mesh.

The round-2 sharded pm all-gathered positions+masses and had EVERY
shard deposit all N sources and FFT the full grid — K shards did K x
the single-device mesh work.  The round-3 path
(pm.sharded_accelerations) deposits only local sources, psums the
(ng)^3 mass grid once, and keeps the (cheap) FFT convolution
replicated.  This script measures one jitted step of each at N=1M on
the virtual mesh and reports per-step wall time; the replicated variant
is reconstructed inline exactly as decompose.py built it in round 2.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python scripts/exp_pm_sharded.py [--n 1048576] [--ng 128]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from nbody_tpu.utils.platform import force_cpu  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1048576)
    p.add_argument("--ng", type=int, default=128)
    p.add_argument("--shards", type=int, default=8)
    args = p.parse_args()

    force_cpu(args.shards)

    import jax
    from jax import lax

    from nbody_tpu.init import make_state
    from nbody_tpu.ops import pm
    from nbody_tpu.parallel.decompose import shard_state, shard_map, \
        state_specs
    from nbody_tpu.parallel.mesh import AXIS
    from jax.sharding import PartitionSpec as P

    state = make_state(args.n, pad_multiple=1024 * args.shards)
    sharded, mesh = shard_state(state, args.shards)
    specs = state_specs()

    def timed(fn, tag):
        out = fn(sharded.pos, sharded.mass)
        out.block_until_ready()  # CPU backend: this one does block
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(sharded.pos, sharded.mass)
            out.block_until_ready()
            best = min(best, time.perf_counter() - t0)
        print(f"  {tag:28s}: {best*1e3:8.1f} ms/solve", flush=True)
        return best

    print(f"# N={args.n}, ng={args.ng}, {args.shards}-device CPU mesh")

    # Round-3 path: local deposit + grid psum.
    local = jax.jit(
        shard_map(
            lambda p_, m_: pm.sharded_accelerations(
                p_, m_, AXIS, grid=args.ng),
            mesh=mesh, in_specs=(specs.pos, specs.mass),
            out_specs=P(None, AXIS), check_vma=False,
        )
    )
    t_new = timed(local, "local-deposit + grid-psum")

    # Round-2 path (reconstructed): all-gather sources, every shard
    # deposits ALL N and FFTs the full grid for its local targets.
    def replicated(p_l, m_l):
        p_all = lax.all_gather(p_l, AXIS, axis=1, tiled=True)
        m_all = lax.all_gather(m_l, AXIS, axis=0, tiled=True)
        return pm.accelerations_between(p_l, p_all, m_all, grid=args.ng)

    gather = jax.jit(
        shard_map(replicated, mesh=mesh,
                  in_specs=(specs.pos, specs.mass),
                  out_specs=P(None, AXIS), check_vma=False)
    )
    t_old = timed(gather, "replicated allgather (r2)")

    # Single-device reference solve.
    single = jax.jit(lambda p_, m_: pm.accelerations(p_, m_, grid=args.ng))
    t_one = timed(single, "single-device")

    print(f"  speedup vs replicated: {t_old/t_new:.2f}x; "
          f"vs single-device: {t_one/t_new:.2f}x")

    # Compiler-side evidence, immune to virtual-mesh core contention
    # (all 8 "devices" share host cores, so wall-clock understates the
    # win): XLA's per-shard cost model.  The FFT convolution is
    # REPLICATED by design (O(ng^3 log ng), cheap), so flops barely
    # move; the deposit/gather tier — the part that must scale with
    # N/K — shows up as bytes-accessed and transcendentals.
    for tag, fn in (("local-deposit + grid-psum", local),
                    ("replicated allgather (r2)", gather)):
        ca = fn.lower(sharded.pos, sharded.mass).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        print(f"  cost[{tag:28s}]: bytes={ca['bytes accessed']:.3e} "
              f"transcendentals={ca.get('transcendentals', 0.0):.3e} "
              f"flops={ca['flops']:.3e}")


if __name__ == "__main__":
    main()
