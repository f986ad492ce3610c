#!/usr/bin/env python
"""Benchmark entry point for the driver.

Runs the flagship single-chip configuration (BASELINE.md config 2:
N=16384, 500 steps, tiled Pallas kernel) on the default accelerator and
prints ONE JSON line:
    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

The metric is sustained GFLOP/s under the reference's own FLOP model
(29 N^2 + 19 N per step, ver0/GSimulation.cpp:122), averaged over sample
blocks excluding the first two — exactly the statistic the reference's
footer reports.  vs_baseline compares against the reference's published
ver0 number (4.0513 GFlop/s, README.md:56; see BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import time

REFERENCE_GFLOPS = 4.0513  # ver0 published average (BASELINE.md)

# BASELINE.md benchmark configurations (precision mode, N, timed steps,
# fused).  Small-N configs use long step counts so the timing signal
# dominates per-run jitter (~tens of ms on tunneled backends); the rate is
# steady-state either way.
# (name, precision, N, timed steps, fused, kernel-override[, extra
# SimConfig kwargs]).  A None
# kernel uses the --kernel argument; the pm rows pin the O(N log N) mesh
# tier, whose gflops_model/pairs_per_sec report EQUIVALENT exact-model
# work per second (the mesh solve does O(ng^3 log ng + N) actual work).
# The periodic row boxes the reference's U(0,1)^3 ICs at L=1.  Its MESH
# half is measured faster than open pm (ng^3 FFTs instead of (2 ng)^3:
# 106 vs 124 ms at N=1M, logs/hw_contact/periodic_ab_r5.log), but the
# full p3m row is slower than open p3m: the short-range half pays for
# ghost images (~0.37N extra particles at the default R_c through
# pack/ranges/sweep) — see docs/DESIGN.md "Periodic P3M cost ledger".
SUITE = (
    ("parity-n2000", "f32", 2000, 20000, False, None),
    ("parity-n2000-fused", "f32", 2000, 20000, True, None),
    ("single-chip-n16384", "f32", 16384, 500, False, None),
    ("bf16-n131072", "bf16", 131072, 100, False, None),
    ("n1m", "f32", 1048576, 4, False, None),
    ("n4m", "f32", 4194304, 2, False, None),  # host-chunked executables
    ("n4m-pm-equivalent", "f32", 4194304, 8, False, "pm"),
    ("n1m-p3m-equivalent", "f32", 1048576, 8, False, "p3m"),
    ("n1m-p3m-periodic", "f32", 1048576, 8, False, "p3m",
     {"pm_boundary": "periodic", "pm_box": 1.0}),
)


def _suite(kernel: str) -> int:
    from nbody_tpu.config import SimConfig
    from nbody_tpu.utils.flops import pairs_per_step, step_gflops

    for name, precision, n, steps, fused, kernel_pin, *extra in SUITE:
        cfg = SimConfig(n=n, nsteps=steps, kernel=kernel_pin or kernel,
                        precision=precision, fused=fused,
                        **(extra[0] if extra else {}))
        half = max(1, steps // 2)
        # Pin both runs to the regime the LONGER run needs: the
        # difference method assumes identical per-step machinery, and
        # needs_host_chunking() is step-count-dependent, so the half run
        # must not silently use the single-executable path while the full
        # run is host-chunked.
        chunked = _force_chunked(cfg, 2 * half)
        t_half = _timed_steps(cfg, half, force_chunked=chunked)
        t_full = _timed_steps(cfg, 2 * half, force_chunked=chunked)
        sps = half / max(t_full - t_half, 1e-9)
        row = {
            "config": name,
            "n": n,
            "precision": precision,
            "gflops_model": round(step_gflops(n) * sps, 2),
            "pairs_per_sec": f"{pairs_per_step(n) * sps:.4g}",
            "steps_per_sec": round(sps, 4),
        }
        if kernel_pin:
            row["kernel"] = kernel_pin
        print(json.dumps(row), flush=True)
    return 0


# Perf-regression gate (scripts/tpu_check.sh): per-config floors pinned
# to round-3/4 measured rates minus ~5-10% margin, so kernel work cannot
# silently regress a tier.  gflops_model floors are in the reference's
# own flop model (29 N^2 + 19 N); the mesh rows gate ms/step instead
# (the mesh tier's cost is not pair-shaped).  The Plummer p3m row is the
# clustered-IC sentinel (round-3 VERDICT item 7): the short-range tier's
# whole point is clustered accuracy, and a plan/sweep regression would
# pass every uniform floor.  Its floor sits BELOW the same-config exact
# kernel (~199 ms/step) so the gate certifies the tier WINNING its
# flagship regime, not just existing (measured 182.7 ms/step round 5
# with per-layout worklist sizing, logs/hw_contact/p3m_stress_r5.log).
# (name, precision, n, timed steps, kernel, metric, op, bound[, extras])
GATES = (
    ("n16384-f32", "f32", 16384, 500, None, "gflops_model", ">=", 8500.0),
    ("n262144-f32", "f32", 262144, 64, None, "gflops_model", ">=", 9500.0),
    ("bf16-n131072", "bf16", 131072, 100, None, "gflops_model", ">=", 8500.0),
    ("pm-n1m", "f32", 1048576, 8, "pm", "ms_per_step", "<=", 140.0),
    ("p3m-plummer-262k", "f32", 262144, 16, "p3m", "ms_per_step", "<=",
     195.0, {"distribution": "plummer"}),
)


def _gate(kernel: str) -> int:
    from nbody_tpu.config import SimConfig
    from nbody_tpu.utils.flops import step_gflops

    failed = 0
    for name, precision, n, steps, kernel_pin, metric, op, bound, *ex \
            in GATES:
        extras = ex[0] if ex else {}
        cfg = SimConfig(n=n, nsteps=steps, kernel=kernel_pin or kernel,
                        precision=precision)
        dist = extras.get("distribution", "reference")
        half = max(1, steps // 2)
        chunked = _force_chunked(cfg, 2 * half)
        t_half = _timed_steps(cfg, half, force_chunked=chunked,
                              distribution=dist)
        t_full = _timed_steps(cfg, 2 * half, force_chunked=chunked,
                              distribution=dist)
        sps = half / max(t_full - t_half, 1e-9)
        if metric == "gflops_model":
            value = step_gflops(n) * sps
        else:  # ms_per_step
            value = 1e3 / sps
        ok = value >= bound if op == ">=" else value <= bound
        print(f"GATE {name:14s}: {value:10.2f} {metric} "
              f"(bound {op} {bound:g}) -> {'PASS' if ok else 'FAIL'}",
              flush=True)
        failed += not ok
    return 1 if failed else 0


def _force_chunked(cfg, nsteps) -> bool:
    """Whether a run of ``nsteps`` uses the host-chunked regime (decided
    once per difference-timing pair so both runs share the machinery)."""
    from nbody_tpu.models.gravity import needs_host_chunking
    from nbody_tpu.state import round_up

    if (cfg.shards > 1 or getattr(cfg, "fused", False)
            or cfg.kernel in ("pm", "p3m")):
        return False
    return needs_host_chunking(round_up(cfg.n, cfg.pad_multiple()), nsteps)


def _env_fn(cfg):
    """Per-block frozen mesh env for pm/p3m rows — the engine's wiring
    (simulation._mesh_env_fn), mirrored so bench times the production
    step."""
    from nbody_tpu.ops.registry import resolve

    resolved = resolve(cfg.kernel)
    if resolved not in ("pm", "p3m"):
        return None
    from nbody_tpu.ops import pm as pm_ops

    ko = cfg.kernel_opts()
    cutoff = ko.get("cutoff_cells", 0)
    if resolved == "p3m":
        cutoff = cutoff or pm_ops.DEFAULT_CUTOFF_CELLS
    kw = dict(grid=ko.get("grid", pm_ops.DEFAULT_GRID),
              cutoff_cells=cutoff,
              boundary=ko.get("boundary", "open"),
              box_size=ko.get("box_size", 0.0))
    return lambda pos, mass: pm_ops.make_mesh_env(pos, mass, **kw)


def _timed_steps(cfg, nsteps, force_chunked=None,
                 distribution="reference"):
    """Wall time for an nsteps on-device run (one warm-started block fn)."""
    from nbody_tpu.init import make_state
    from nbody_tpu.models.gravity import (
        make_accel_fn,
        make_block_fn,
        make_fused_block_fn,
        make_host_chunked_block_fn,
        needs_host_chunking,
    )

    state = make_state(cfg.n, pad_multiple=cfg.pad_multiple(),
                       distribution=distribution,
                       seed=42 if distribution == "reference" else 7)
    # P3M rows run on the MEASURED short-range plan, exactly like an
    # engine run (guaranteed-sufficient bounds oversize the tables and
    # under-report the tier's real rate); mutating cfg here also lets
    # the second _timed_steps call of a difference pair reuse the plan.
    cfg.resolve_sr_plan(state.pos, state.mass)
    if cfg.shards > 1:
        from nbody_tpu.parallel.decompose import (
            make_sharded_block_fn,
            shard_state,
        )

        state, mesh = shard_state(state, cfg.shards)
        blk = make_sharded_block_fn(
            cfg.kernel, cfg.kernel_opts(), cfg.dt, nsteps, mesh, comm=cfg.comm
        )
    elif getattr(cfg, "fused", False):
        blk = make_fused_block_fn(cfg.dt, nsteps)
    elif (needs_host_chunking(state.n_padded, nsteps)
          if force_chunked is None else force_chunked):
        blk = make_host_chunked_block_fn(
            cfg.dt, nsteps, state.n_padded,
            accel_fn=make_accel_fn(cfg.kernel, **cfg.kernel_opts()),
            dist_dtype="bfloat16" if cfg.precision == "bf16" else "float32",
            sym=cfg.kernel in ("auto", "pallas_sym")
            and cfg.precision in ("f32", "bf16"),
            env_fn=_env_fn(cfg),
        )
    else:
        blk = make_block_fn(
            make_accel_fn(cfg.kernel, **cfg.kernel_opts()), cfg.dt, nsteps,
            env_fn=_env_fn(cfg),
        )
    out, ke = blk(state)
    float(ke)  # compile + execute once (sync via fetch)
    best = float("inf")
    for _ in range(3):  # min-of-3 suppresses transient jitter/contention
        t0 = time.perf_counter()
        out, ke = blk(state)
        float(ke)
        best = min(best, time.perf_counter() - t0)
    return best


def _fidelity(kernel: str) -> dict:
    """The BASELINE.json fidelity gate, certified inside the headline
    artifact: run the reference's default config (N=2000, 500 steps) and
    compare the kenergy trace against the committed g++ ver0 golden
    capture at full printed precision (%.5g strings)."""
    import os

    from nbody_tpu.config import SimConfig
    from nbody_tpu.simulation import run as sim_run
    from nbody_tpu.utils.reporting import _g5, parse_trace

    golden_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tests", "golden", "ver0_n2000_s500.txt",
    )
    try:
        with open(golden_path) as f:
            golden = parse_trace(f.read())
    except OSError:
        return {"trace_match": None}
    res = sim_run(SimConfig(n=2000, nsteps=500, kernel=kernel), quiet=True)
    ours = {s: ke for (s, _, ke, _, _) in res.samples}
    match = bool(golden)
    max_rel = 0.0
    for s, ke_str in golden:
        ke = ours.get(s)
        if ke is None or _g5(ke) != ke_str:
            match = False
        if ke is not None and float(ke_str):
            max_rel = max(max_rel, abs(ke - float(ke_str)) / abs(float(ke_str)))
    return {
        "trace_match": match,
        "ke_max_rel_err_vs_ref": float(f"{max_rel:.2e}"),
    }


def _probe_backend(timeout_s: float) -> str | None:
    """Fail FAST when the accelerator backend is unreachable, instead of
    hanging forever on first device contact.

    The default backend here is a real TPU behind a network tunnel that
    has had multi-hour outages; ``jax.devices()`` blocks indefinitely
    while it is down.  Probing in a SUBPROCESS (the hang is C-level gRPC
    — in-process signals cannot interrupt it) bounds the wait, so the
    driver gets an honest error artifact rather than a killed run.
    Returns None when the backend answers (or when the process is
    already pinned to CPU, e.g. under the test suite); an error string
    otherwise."""
    import os
    import subprocess

    if _configured_platforms().startswith("cpu"):
        return None
    if os.environ.get("NBODY_BENCH_SKIP_PROBE"):
        return None
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            timeout=timeout_s, capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired:
        return (f"device probe timed out after {timeout_s:.0f}s "
                "(accelerator tunnel down?)")
    if r.returncode != 0:
        detail = (r.stderr.strip() or r.stdout.strip())[-200:]
        return (f"device probe failed (exit {r.returncode}): "
                f"{detail or 'no output'}")
    return None


def _configured_platforms() -> str:
    """The configured jax platform list WITHOUT initializing backends."""
    import jax

    return str(getattr(jax.config, "jax_platforms", "") or "")


def main() -> int:
    import argparse
    import os

    from nbody_tpu.__main__ import _enable_compilation_cache

    _enable_compilation_cache()

    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=16384)
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--kernel", default="auto")
    p.add_argument("--shards", type=int, default=1,
                   help="particle-shard the run over this many devices "
                        "(ring comm); ready for multi-chip rounds")
    p.add_argument("--suite", action="store_true",
                   help="run every BASELINE.md config that fits the "
                        "available devices (one JSON line per config)")
    p.add_argument("--gate", action="store_true",
                   help="perf-regression gate: measure each GATES config "
                        "and exit non-zero if any is below its pinned "
                        "floor (scripts/tpu_check.sh)")
    args = p.parse_args()

    from nbody_tpu.config import SimConfig
    from nbody_tpu.utils.flops import pairs_per_step, step_gflops

    err = _probe_backend(
        float(os.environ.get("NBODY_BENCH_PROBE_TIMEOUT", "600")))
    if err:
        # Driver contract: still exactly ONE JSON line, zero-valued with
        # the failure recorded, and a nonzero exit.
        print(json.dumps({
            "metric": "sustained GFLOP/s (reference flop model, N=%d)"
            % args.n,
            "value": 0.0,
            "unit": "GFLOP/s",
            "vs_baseline": 0.0,
            "error": err,
        }))
        return 1

    if args.suite:
        return _suite(args.kernel)
    if args.gate:
        return _gate(args.kernel)

    cfg = SimConfig(n=args.n, nsteps=args.steps, kernel=args.kernel,
                    shards=args.shards, comm="ring")

    # Difference-method timing: run L and 2L steps, attribute T(2L)-T(L)
    # to L steps.  This cancels fixed per-run costs (host dispatch and the
    # device->host fetch, which costs ~40 ms over a tunneled backend) and
    # reports the device's true sustained rate — the number that matters
    # for production serving, where results stay on device.
    half = max(1, args.steps // 2)
    chunked = _force_chunked(cfg, 2 * half)
    t_half = _timed_steps(cfg, half, force_chunked=chunked)
    t_full = _timed_steps(cfg, 2 * half, force_chunked=chunked)
    steps_per_sec = half / max(t_full - t_half, 1e-9)

    value = step_gflops(args.n) * steps_per_sec
    pair_rate = pairs_per_step(args.n) * steps_per_sec
    payload = {
        "metric": "sustained GFLOP/s (reference flop model, N=%d)"
        % args.n,
        "value": round(value, 2),
        "unit": "GFLOP/s",
        "vs_baseline": round(value / REFERENCE_GFLOPS, 2),
        "pair_interactions_per_sec": f"{pair_rate:.4g}",
        "config": {
            "n": args.n,
            "nsteps": args.steps,
            "kernel": args.kernel,
        },
    }
    # Fidelity north-star (BASELINE.json metric triple): golden-trace
    # agreement rides along so each BENCH_r* artifact certifies both the
    # throughput and the correctness gate by itself.
    payload.update(_fidelity(args.kernel))
    print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    sys.exit(main())
