"""The simulation engine — GSimulation analog.

Owns the run lifecycle the reference's ``GSimulation::start()`` owns
(ver0/GSimulation.cpp:95-213): allocate + initialize state, print the
header, run the sample-block loop with per-block timing and GFlop/s stats,
print the footer.  Differences are deliberate TPU-first design:

* the entire sample block (sfreq steps) is one jitted on-device
  ``lax.fori_loop``; the host syncs once per block (the reference's GPU
  backends instead cross PCIe six times per step,
  ver5_all/programming_models/cuda/Compute.cu:152-166);
* compilation happens ahead-of-time, before the clock starts;
* ``precision='ref64'`` routes through the bit-exact host oracle so the
  printed kenergy column reproduces the compiled C++ reference exactly.

The GFlop/s statistics replicate the reference's: per-block
``gflops*sfreq/block_seconds`` with running mean/stddev that exclude the
first two sample blocks (ver0/GSimulation.cpp:186-203).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, List, Optional, Tuple

import jax
import numpy as np

from .config import SimConfig
from .init import make_state, reference_init_arrays
from .models.gravity import make_accel_fn, make_block_fn
from .state import ParticleState
from .utils import reporting
from .utils.flops import step_gflops
from .utils.timer import WallTime


@dataclasses.dataclass
class RunResult:
    samples: List[Tuple[int, float, float, float, float]]
    # each: (step, phys_time, kenergy, block_seconds, block_gflops)
    total_time: float
    av: float
    dev: float
    nthreads: int
    energy_drift: Optional[float] = None  # set when energy_check is on
    start_step: int = 0  # non-zero when resumed from a checkpoint

    @property
    def kenergy_trace(self) -> List[Tuple[int, float]]:
        return [(s, ke) for (s, _, ke, _, _) in self.samples]

    def to_dict(self) -> dict:
        return dict(
            samples=[
                dict(step=s, t_phys=t, kenergy=ke, seconds=b, gflops=g)
                for (s, t, ke, b, g) in self.samples
            ],
            total_time=self.total_time,
            gflops_mean=self.av,
            gflops_dev=self.dev,
            nthreads=self.nthreads,
            energy_drift=self.energy_drift,
            start_step=self.start_step,
        )


class _BlockRunner:
    """Produces (state, kenergy) per sample block; pluggable per precision."""

    def __init__(self, cfg: SimConfig):
        self.cfg = cfg
        # Absolute step the run starts at (non-zero when resuming, so the
        # printed step column and saved checkpoints stay on the absolute
        # counter across chained resumes — checkpoint.py's contract).
        self.start_step = 0

    def prepare(self) -> None:  # compile / allocate before the clock starts
        raise NotImplementedError

    def run_block(self, steps: int) -> float:  # returns kenergy, advances state
        raise NotImplementedError

    def observe(self, block_secs: float) -> None:
        """Feedback hook after each full sample block (online retuning)."""

    def finish(self) -> None:
        """Teardown after the run (also on failure): undo process-global
        state the runner set up (e.g. a forced SR layout)."""

    def save(self, path: str, step: int) -> None:
        raise NotImplementedError

    def total_energy(self) -> float:
        raise NotImplementedError


class _DeviceRunner(_BlockRunner):
    # Per-executable wall-clock budget for the mesh-solver tiers: one XLA
    # executable must stay well under the ~1 min TPU runtime watchdog.
    PM_EXEC_BUDGET_S = 30.0

    def __init__(self, cfg: SimConfig):
        super().__init__(cfg)
        self.accel_fn = make_accel_fn(cfg.kernel, **cfg.kernel_opts())
        self.state: Optional[ParticleState] = None
        self._blocks = {}
        self._pm_measured = 0.0  # measured seconds/step (watchdog feedback)
        self._sr_health = False  # per-block P3M plan health check
        self._sr_warned = False
        self._sr_layout_prev = None  # pm layout state to restore

    def finish(self) -> None:
        if self._sr_layout_prev is not None:
            from .ops import pm

            pm.set_sr_layout(self._sr_layout_prev)
            self._sr_layout_prev = None

    def save(self, path: str, step: int) -> None:
        if self.cfg.checkpoint_backend == "orbax":
            from .utils.checkpoint import save_state_orbax

            save_state_orbax(path, self.state, step)
        else:
            from .utils.checkpoint import save_state

            save_state(path, self.state, step)

    def prepare(self) -> None:
        cfg = self.cfg
        if cfg.load_state_path:
            from .utils.checkpoint import load_state

            state, self.start_step = load_state(
                cfg.load_state_path, cfg.pad_multiple()
            )
            cfg.n = state.n
        else:
            state = make_state(
                cfg.n,
                pad_multiple=cfg.pad_multiple(),
                distribution=cfg.distribution,
                seed=cfg.seed,
            )
        if cfg.platform and cfg.shards <= 1:
            # Sharded runs place state themselves (shard_state); committing
            # to one device first would block multi-process device_put.
            dev = jax.local_devices(backend=cfg.platform)[0]
            state = jax.device_put(state, dev)
        from .ops.registry import resolve

        ddt = "bfloat16" if cfg.precision == "bf16" else "float32"
        resolved = resolve(cfg.kernel, n=state.n_padded, dist_dtype=ddt)
        if resolved == "p3m" or (resolved == "pm" and cfg.pm_cutoff):
            # The P3M cell capacity and short-range plan (slab/worklist
            # sizes) are static shapes under jit, so they cannot follow
            # the data inside the compiled block — size them here from
            # the CONCRETE initial state (clustered cores make occupancy
            # wildly data-dependent; pm.suggest_sr_plan).
            # Short-range sweep layout: the explicit --pm-sr-layout
            # override wins; otherwise --autotune races the layouts
            # on-device (each candidate self-sizes its plan — the P3M
            # analog of the tile sweep; pm.SR_LAYOUTS /
            # autotune_sr_layout).  Layout globals are read at trace
            # time AND at plan-suggestion time (suggest_sr_plan sizes
            # sr_entries for the ACTIVE layout), so the layout must
            # land before resolve_sr_plan below.
            from .ops import pm as _pm

            if cfg.pm_sr_layout:
                self._sr_layout_prev = _pm.set_sr_layout(
                    cfg.pm_sr_layout)
            elif cfg.autotune:
                from .utils.autotune import autotune_sr_layout

                # Device arrays pass through as-is: np.asarray here
                # would fetch megabytes over the tunnel (minutes-slow,
                # CLAUDE.md) and strip the --platform placement.
                cfg.pm_sr_layout = autotune_sr_layout(
                    state.pos, state.mass, cfg.kernel_opts(),
                )
                self._sr_layout_prev = _pm.set_sr_layout(
                    cfg.pm_sr_layout)
            cfg.resolve_sr_plan(state.pos, state.mass)
            self._sr_health = cfg.nsteps > 0
            self.accel_fn = make_accel_fn(cfg.kernel, **cfg.kernel_opts())
        if cfg.fused:
            family = "fused"
        else:
            family = {"pallas": "forward",
                      "pallas_sym": "forward_sym"}.get(resolved)
        if cfg.autotune and family and not (cfg.tile_i and cfg.tile_j):
            from .utils.autotune import autotune_tiles

            cfg.tile_i, cfg.tile_j = autotune_tiles(
                state.n_padded, dist_dtype=ddt, family=family,
                interpret=cfg.interpret,
            )
            self.accel_fn = make_accel_fn(cfg.kernel, **cfg.kernel_opts())
        self._online = None
        # The online retuner covers every tile-parameterized regime (the
        # reference's tuner ran unconditionally every sample block,
        # opencl/Compute.cpp:317-321): single-device forward kernels, the
        # fused block, SHARDED runs (candidates sized to the local
        # shard), and the huge-N pair-symmetric chunk sweep (candidates
        # retune the sym block size within the fixed chunk length).
        online_family = family
        sym_per = 0
        if (
            not cfg.fused and cfg.shards == 1 and cfg.nsteps > 0
            and cfg.kernel in ("auto", "pallas_sym")
            and cfg.precision in ("f32", "bf16")
        ):
            from .models.gravity import (
                _sym_chunking,
                max_pairs_per_exec,
                needs_host_chunking,
            )

            if needs_host_chunking(state.n_padded,
                                   min(cfg.sfreq, cfg.nsteps)):
                chunk = _sym_chunking(state.n_padded, max_pairs_per_exec())
                if chunk:
                    sym_per = chunk[0]
                    online_family = "forward_sym"
        if (
            cfg.autotune_online
            and online_family in ("forward", "forward_sym", "fused")
            and not (cfg.tile_i and cfg.tile_j)
        ):
            from .utils.autotune import DEFAULT_CANDIDATES

            local = state.n_padded // max(1, cfg.shards)

            def _valid(c):
                if sym_per:  # tile_i overrides the sym-chunk block size
                    return c[0] <= sym_per and sym_per % c[0] == 0
                if online_family == "fused":
                    # Mirror autotune._time_fused: a candidate whose
                    # layout cap (rows-only vs rectangular columns)
                    # cannot hold N deterministically raises — each
                    # such attempt burns two remote compiles (1-300 s)
                    # before being discarded.
                    from .ops.fused_block import fused_cap

                    if local > fused_cap(*c):
                        return False
                return local % c[0] == 0 and local % c[1] == 0

            cands = [c for c in DEFAULT_CANDIDATES[online_family]
                     if _valid(c)]
            if cands:
                self._online = dict(cands=cands, idx=0, results=[],
                                    warmed=False, locked=False,
                                    retried=False)
                self._set_tiles(cands[0])
        if cfg.shards > 1:
            from .parallel.decompose import shard_state, make_sharded_block_fn

            state, mesh = shard_state(state, cfg.shards)

            def sharded_sub_block(k):
                # Cached independently of the outer block length so every
                # sample block reuses the same compiled sub-executable
                # (remote compiles cost 1-300 s per new shape here).
                # external_env: the sub-block loop freezes ONE mesh env
                # per outer sample block (below) — re-freezing per
                # sub-block would make the watchdog split physically
                # observable vs the monolithic sharded block.
                key = ("pm-sub", k)
                if key not in self._blocks:
                    self._blocks[key] = make_sharded_block_fn(
                        cfg.kernel, cfg.kernel_opts(), cfg.dt, k, mesh,
                        comm=cfg.comm, integrator=cfg.integrator,
                        external_env=resolved in ("pm", "p3m"),
                    )
                return self._blocks[key]

            def build_sharded(steps):
                est = self._pm_step_est()
                budget = self.PM_EXEC_BUDGET_S
                if resolved in ("pm", "p3m") and steps * est > budget:
                    # Same watchdog logic as the single-device pm branch,
                    # but in the LARGEST sub-blocks that fit the budget:
                    # each sub-block re-seeds the leapfrog acceleration,
                    # so bigger sub-blocks amortize that extra solve
                    # (overhead 1/sub instead of 2x at sub=1).
                    sub = max(1, min(steps, int(budget / max(est, 1e-9))))

                    def block(st):
                        done, ke, env = 0, None, None
                        while done < steps:
                            k = min(sub, steps - done)
                            sb = sharded_sub_block(k)
                            if env is None:
                                # ONE frozen env for the whole outer
                                # sample block, like the monolithic path
                                env = sb.make_env(st)
                            st, ke = sb(st, env)
                            done += k
                        return st, ke

                    return block
                return make_sharded_block_fn(
                    cfg.kernel, cfg.kernel_opts(), cfg.dt, steps, mesh,
                    comm=cfg.comm, integrator=cfg.integrator,
                )

            if resolved in ("pm", "p3m") and cfg.nsteps > 0:
                # Watchdog feedback BEFORE the first full block: a wrong
                # open-loop estimate would build an executable that trips
                # the runtime watchdog in warm-up.
                self._pm_measured = self._measure_pm_step(
                    state, sharded_sub_block
                )
            self._block_for = lambda steps: self._cached(
                steps, lambda: build_sharded(steps)
            )
        elif cfg.fused:
            from .models.gravity import make_fused_block_fn
            from .ops.fused_block import fused_cap

            cap = fused_cap(cfg.tile_i, cfg.tile_j)
            if cfg.precision != "f32" or state.n_padded > cap:
                raise ValueError(
                    "--fused requires f32 precision, a single device and "
                    f"padded N <= {cap} for this tiling"
                )
            from .models.gravity import max_pairs_per_exec

            n2 = state.n_padded * state.n_padded
            if n2 * max(cfg.sfreq, 1) > max_pairs_per_exec():
                # The fused block IS one executable; the runtime watchdog
                # meters executables (~1 min).  With the rows cap at
                # ~314k this is now reachable — fail with guidance
                # instead of crashing the TPU worker mid-run.
                raise ValueError(
                    "--fused sample block exceeds the per-executable "
                    f"pair budget ({max_pairs_per_exec():.2e} pairs); "
                    "reduce the sample frequency steps or drop --fused "
                    "(the unfused path host-chunks automatically)"
                )
            self._block_for = lambda steps: self._cached(
                steps,
                lambda: make_fused_block_fn(
                    cfg.dt, steps, tile_i=cfg.tile_i, tile_j=cfg.tile_j,
                    integrator=cfg.integrator, interpret=cfg.interpret,
                ),
            )
        else:
            from .models.gravity import (
                make_host_chunked_block_fn,
                needs_host_chunking,
            )

            def build(steps):
                if resolved in ("pm", "p3m"):
                    # Mesh steps are O(ng^3 log ng + N) — pair-count
                    # chunking doesn't apply (it would silently swap in
                    # exact kernels) — but a long sample block is still
                    # ONE executable and the runtime watchdog meters
                    # executables (~1 min).  Above the block estimate
                    # (open-loop model corrected by the measured first
                    # step), run one executable per step.
                    env_fn = self._mesh_env_fn(resolved)
                    if steps * self._pm_step_est() > self.PM_EXEC_BUDGET_S:
                        return make_host_chunked_block_fn(
                            cfg.dt, steps, state.n_padded,
                            accel_fn=self.accel_fn,
                            integrator=cfg.integrator, per_step=True,
                            env_fn=env_fn,
                        )
                    return make_block_fn(
                        self.accel_fn, cfg.dt, steps,
                        integrator=cfg.integrator, env_fn=env_fn,
                    )
                if needs_host_chunking(state.n_padded, steps):
                    # Huge N: the single-executable block would trip the
                    # runtime watchdog; orchestrate short executables from
                    # the host (pair-symmetric chunk sweeps when the
                    # kernel choice allows, else the tiled between
                    # kernel).
                    return make_host_chunked_block_fn(
                        cfg.dt, steps, state.n_padded,
                        accel_fn=self.accel_fn,
                        tile_i=cfg.tile_i, tile_j=cfg.tile_j,
                        integrator=cfg.integrator,
                        dist_dtype="bfloat16" if cfg.precision == "bf16"
                        else "float32",
                        sym=cfg.kernel in ("auto", "pallas_sym")
                        and cfg.precision in ("f32", "bf16"),
                        interpret=cfg.interpret,
                    )
                return make_block_fn(
                    self.accel_fn, cfg.dt, steps, integrator=cfg.integrator
                )

            if resolved in ("pm", "p3m") and cfg.nsteps > 0:
                self._pm_measured = self._measure_pm_step(state)
            self._block_for = lambda steps: self._cached(
                steps, lambda: build(steps)
            )
        self.state = state
        # Warm-up call (compiles and runs one block, result discarded) so
        # the timed loop never pays compilation; state is immutable so the
        # warm-up does not advance the simulation.  The scalar fetch is the
        # sync point — on tunneled backends block_until_ready alone does
        # not guarantee the executable has finished building/running.
        while True:
            try:
                main = self._block_for(min(cfg.sfreq, cfg.nsteps))
                _, ke = main(state)
                float(ke)
                break
            except Exception as e:  # noqa: BLE001 — see _candidate_failed
                self._candidate_failed(e)  # re-raises unless retuning

    def _mesh_env_fn(self, resolved):
        """Per-block frozen mesh environment builder (pm.make_mesh_env):
        robust box + force-kernel spectra computed once per sample block
        instead of every step (~34 ms/step of the Plummer-262k p3m step
        — logs/hw_contact/p3m_ablate.log).  None for non-mesh kernels.

        None for PERIODIC mesh runs too (measured, round 5): the open
        env pays off because its spectra depend on the per-step robust
        BOX, but periodic spectra are position-independent constants —
        XLA already hoists their in-trace build out of the block's
        fori_loop (one build per executable), while a frozen env
        crosses the executable boundary as ~100 MB of complex inputs
        every block and measured 25-45 ms/step SLOWER at N=1M
        (periodic_ablate_r5.log full-vs-noenv, periodic_ab2_r5.log).
        pm.make_mesh_env still builds periodic envs for callers that
        trace the env INSIDE their own executable (the sharded
        internal-env block) or need one frozen env across watchdog
        sub-blocks."""
        if resolved not in ("pm", "p3m"):
            return None
        from .ops import pm as pm_ops

        ko = self.cfg.kernel_opts()
        if ko.get("boundary", "open") == "periodic":
            return None
        cutoff = ko.get("cutoff_cells", 0)
        if resolved == "p3m":
            cutoff = cutoff or pm_ops.DEFAULT_CUTOFF_CELLS
        kw = dict(grid=ko.get("grid", pm_ops.DEFAULT_GRID),
                  cutoff_cells=cutoff,
                  boundary=ko.get("boundary", "open"),
                  box_size=ko.get("box_size", 0.0))
        return lambda pos, mass: pm_ops.make_mesh_env(pos, mass, **kw)

    def _measure_pm_step(self, state, sharded_sub_block=None) -> float:
        """Watchdog feedback: run ONE compiled mesh-solver step and time
        it, so _pm_step_est is corrected by reality instead of trusting
        the open-loop constants (round-2 weakness: a slower backend or
        bigger grid would silently re-trip the watchdog).  State is
        immutable, so the probe does not advance the simulation; the
        value fetch is the sync (block_until_ready does not block on
        tunneled backends)."""
        import time as _time

        from .models.gravity import make_host_chunked_block_fn

        if sharded_sub_block is not None:
            blk = sharded_sub_block(1)
        else:
            from .ops.registry import resolve

            blk = make_host_chunked_block_fn(
                self.cfg.dt, 1, state.n_padded, accel_fn=self.accel_fn,
                per_step=True,
                env_fn=self._mesh_env_fn(resolve(self.cfg.kernel)),
            )
        _, ke = blk(state)
        float(ke)  # compile + first run (discarded)
        t0 = _time.perf_counter()
        _, ke = blk(state)
        float(ke)
        return _time.perf_counter() - t0

    def _pm_step_est(self) -> float:
        """Seconds-per-step estimate for the mesh solver, used to keep
        any single executable well under the ~1 min runtime watchdog:
        max(open-loop model, measured first step).  The model (measured
        ~2-3x above actual on v5e) is the floor; the measurement
        (_measure_pm_step) corrects it on backends/grids the constants
        do not describe.  P3M adds the short-range slab sweep:
        sr_entries dense SLAB^2 pair blocks per step."""
        from .ops.pm import DEFAULT_CUTOFF_CELLS, DEFAULT_GRID, SLAB

        cfg = self.cfg
        ng = cfg.pm_grid or DEFAULT_GRID
        est = 1.5e-7 * self.state.n_padded + 8e-9 * (2 * ng) ** 3
        cutoff = cfg.pm_cutoff or (
            DEFAULT_CUTOFF_CELLS if cfg.kernel == "p3m" else 0
        )
        if cutoff:
            entries = cfg.pm_sr_entries or 4 * self.state.n_padded // SLAB
            est += 2e-12 * entries * SLAB * SLAB
        return max(est, self._pm_measured)

    def _cached(self, steps: int, build: Callable):
        # Keyed by tiles too: the online retuner switches tile configs
        # between sample blocks.
        key = (steps, self.cfg.tile_i, self.cfg.tile_j)
        if key not in self._blocks:
            self._blocks[key] = build()
        return self._blocks[key]

    def _set_tiles(self, tiles) -> None:
        self.cfg.tile_i, self.cfg.tile_j = tiles
        self.accel_fn = make_accel_fn(self.cfg.kernel, **self.cfg.kernel_opts())

    def _discard_candidate(self) -> None:
        """Drop the online retuner's current candidate (it failed to
        compile/run — e.g. tiles whose pair intermediates exceed VMEM)
        and move to the next, or lock in the best-so-far."""
        ol = self._online
        del ol["cands"][ol["idx"]]
        ol["warmed"] = False
        ol["retried"] = False
        if ol["idx"] < len(ol["cands"]):
            self._set_tiles(ol["cands"][ol["idx"]])
        else:
            ol["locked"] = True
            self._set_tiles(min(ol["results"])[1] if ol["results"] else (0, 0))

    def _candidate_failed(self, exc: Exception) -> None:
        """Failure policy while the online retuner is active.  Transient
        backend errors (remote-compile HTTP 500s are documented-erratic
        on this tunnel) must not be pinned on the current tile candidate,
        and real bugs must not be silently swallowed: each candidate gets
        ONE retry, and a discard is logged with the triggering exception.
        Outside retuning (or after lock-in) the exception propagates."""
        ol = self._online
        if not ol or ol["locked"]:
            raise exc
        if not ol["retried"]:
            ol["retried"] = True
            return
        import sys

        print(
            f"# autotune-online: discarding tiles {ol['cands'][ol['idx']]} "
            f"after two failures ({type(exc).__name__}: {exc})",
            file=sys.stderr,
        )
        self._discard_candidate()

    # Cell-overflow fraction above which the t=0 P3M plan is declared
    # degraded (overflowed particles fall back to mesh-quality forces —
    # accuracy decays toward pure PM for those pairs).
    SR_HEALTH_MAX_OVERFLOW = 0.005

    def _check_sr_health(self) -> None:
        """Per-sample-block P3M plan health: the static plan was sized
        from the t=0 state (resolve_sr_plan), but clustering EVOLVES —
        a collapse run overflows a plan that was exact at start without
        any error.  Check the overflow diagnostics on the CURRENT state
        and either warn once (default) or, under --pm-replan,
        re-measure the plan and rebuild the blocks.  Replanning only
        ever GROWS the static shapes (max with current), so a run
        recompiles at most a handful of times as structure forms."""
        cfg = self.cfg
        if not self._sr_health:
            return
        from .ops import pm

        grid = cfg.pm_grid or pm.DEFAULT_GRID
        cutoff = cfg.pm_cutoff or pm.DEFAULT_CUTOFF_CELLS
        frac = float(pm.cell_overflow_fraction(
            self.state.pos, self.state.mass, grid, cutoff,
            cfg.pm_capacity, boundary=cfg.pm_boundary,
            box_size=cfg.pm_box))
        ghosts = 0
        if cfg.pm_boundary == "periodic":
            ghosts = pm.ghost_overflow_count(
                self.state.pos, self.state.mass, grid, cutoff,
                sr_ghosts=cfg.pm_sr_ghosts, box_size=cfg.pm_box)
        # Worklist entry overflow: the runtime guard that makes
        # per-layout plan sizing safe (suggest_sr_plan sizes sr_entries
        # for the ACTIVE layout only; dropped entries silently lose
        # their whole short-range correction, so any overflow is
        # degradation — no fraction threshold).
        entries = pm.sr_entry_overflow(
            self.state.pos, self.state.mass, grid, cutoff,
            capacity=cfg.pm_capacity, sr_slabs=cfg.pm_sr_slabs,
            sr_entries=cfg.pm_sr_entries, boundary=cfg.pm_boundary,
            box_size=cfg.pm_box)
        if (frac <= self.SR_HEALTH_MAX_OVERFLOW and not ghosts
                and not entries):
            return
        import sys

        # Multi-process runs: every rank computes the diagnostics (and
        # replans — cfg mutations must stay rank-identical for the
        # rebuilt shard_map blocks to agree), but only rank 0 narrates
        # (the reference gates all output on world_rank 0,
        # ver5_all/GSimulation.cpp:119).
        def _say(msg):
            if jax.process_index() == 0:
                print(msg, file=sys.stderr)

        detail = (f"cell overflow {frac:.1%}"
                  + (f", {ghosts} ghost images dropped" if ghosts
                     else "")
                  + (f", {entries} worklist entries dropped" if entries
                     else ""))
        if not cfg.pm_replan:
            if not self._sr_warned:
                self._sr_warned = True
                _say(
                    f"# p3m plan health: {detail} on the current state "
                    "— the t=0 plan no longer fits (accuracy degrades "
                    "toward pure PM for the overflowed pairs"
                    + (";\n# dropped ghosts lose their short-range term "
                       "entirely" if ghosts else "")
                    + (";\n# dropped worklist entries lose their "
                       "short-range term entirely" if entries else "")
                    + ").  Rerun with --pm-replan to re-measure "
                    "mid-run, or raise --pm-capacity."
                )
            return
        plan = pm.suggest_sr_plan(
            self.state.pos, self.state.mass, grid, cutoff,
            boundary=cfg.pm_boundary, box_size=cfg.pm_box)
        cap = max(cfg.pm_capacity, plan["capacity"])
        if cap != plan["capacity"]:
            # S/E must be measured at the capacity the rebuilt blocks
            # will actually bin with (a bigger cap bins MORE particles
            # -> more slabs/entries); sizing them at a smaller measured
            # cap would silently starve the worklist — the exact
            # failure suggest_sr_plan's docstring warns about.
            plan = pm.suggest_sr_plan(
                self.state.pos, self.state.mass, grid, cutoff,
                capacity=cap, boundary=cfg.pm_boundary,
                box_size=cfg.pm_box)
        grown = dict(
            pm_capacity=max(cfg.pm_capacity, plan["capacity"]),
            pm_sr_slabs=max(cfg.pm_sr_slabs, plan["sr_slabs"]),
            pm_sr_entries=max(cfg.pm_sr_entries, plan["sr_entries"]),
            pm_sr_ghosts=max(cfg.pm_sr_ghosts,
                             plan.get("sr_ghosts", 0)),
        )
        if all(grown[k] == getattr(cfg, k) for k in grown):
            # The measured plan cannot grow past the current one (e.g.
            # ghost churn inside the suggested headroom): nothing to
            # rebuild, and re-suggesting every block would thrash.
            if not self._sr_warned:
                self._sr_warned = True
                _say(
                    f"# p3m plan health: {detail}, but a re-measured "
                    "plan is no larger than the current one — raise "
                    "--pm-capacity explicitly if this persists."
                )
            return
        for k, v in grown.items():
            setattr(cfg, k, v)
        self._sr_warned = False  # a future degradation re-reports
        _say(
            f"# p3m plan health: {detail} — replanned to "
            f"capacity={cfg.pm_capacity} slabs={cfg.pm_sr_slabs} "
            f"entries={cfg.pm_sr_entries}"
            + (f" ghosts={cfg.pm_sr_ghosts}"
               if cfg.pm_boundary == "periodic" else "")
            + " (blocks rebuild on next sample block)"
        )
        self._blocks.clear()
        self.accel_fn = make_accel_fn(cfg.kernel, **cfg.kernel_opts())

    def observe(self, block_secs: float) -> None:
        """Online per-block retuning (the reference's OpenCL tuner adjusts
        its work split every sample block, opencl/Compute.cpp:317-321).
        Each candidate gets one warm-up block (absorbs its compile) and
        one timed block; after the last candidate the best is locked."""
        self._check_sr_health()
        ol = self._online
        if not ol or ol["locked"]:
            return
        if not ol["warmed"]:
            ol["warmed"] = True  # compile/warm-up block — discard timing
            return
        ol["results"].append((block_secs, ol["cands"][ol["idx"]]))
        ol["idx"] += 1
        ol["warmed"] = False
        ol["retried"] = False
        if ol["idx"] < len(ol["cands"]):
            self._set_tiles(ol["cands"][ol["idx"]])
        else:
            ol["locked"] = True
            self._set_tiles(min(ol["results"])[1])

    def run_block(self, steps: int) -> float:
        while True:
            try:
                fn = self._block_for(steps)
                state, ke = fn(self.state)
                # float() forces a device->host fetch of the block's final
                # kinetic energy — the once-per-block sync point (ver0 reads
                # _kenergy on the host every step; our block runs sfreq
                # steps between syncs).  The fetch is also where remote
                # compile failures surface, so it stays inside the retry.
                ke = float(ke)
            except Exception as e:  # noqa: BLE001 — see _candidate_failed
                # A failure during online retuning: state never advanced,
                # so retry/skip the candidate and rerun the block (the
                # policy — one retry, logged discard — lives in
                # _candidate_failed; outside retuning it re-raises).
                self._candidate_failed(e)
                continue
            self.state = state
            return ke

    def total_energy(self) -> float:
        from .models.gravity import kinetic_energy, potential_energy

        if self.cfg.pm_boundary == "periodic":
            # The open pairwise PE is meaningless under periodic
            # boundaries (the image sum diverges); use the mesh-solved
            # background-subtracted PE — same definition at t=0 and
            # t=end, which is all a drift diagnostic needs.
            from .ops.pm import DEFAULT_GRID, periodic_potential_energy

            pe = float(periodic_potential_energy(
                self.state.pos, self.state.mass, self.cfg.pm_box,
                self.cfg.pm_grid or DEFAULT_GRID))
            return float(kinetic_energy(self.state)) + pe
        return float(kinetic_energy(self.state)) + float(
            potential_energy(self.state)
        )


class _OracleRunner(_BlockRunner):
    """Bit-exact ver0-semantics host runner (see oracle.py)."""

    def prepare(self) -> None:
        if self.cfg.load_state_path:
            from .utils.checkpoint import load_state

            state, self.start_step = load_state(self.cfg.load_state_path)
            self.pos = np.asarray(state.pos)
            self.vel = np.asarray(state.vel)
            self.mass = np.asarray(state.mass)
            self.cfg.n = state.n
        else:
            self.pos, self.vel, self.mass = reference_init_arrays(self.cfg.n)
        self.ke = np.float32(0.0)

    def save(self, path: str, step: int) -> None:
        from .state import pad_state
        from .utils.checkpoint import save_state

        st = pad_state(self.pos, self.vel, self.mass, self.pos.shape[1])
        save_state(path, st, step)

    def run_block(self, steps: int) -> float:
        from .oracle import step_ref64

        for _ in range(steps):
            self.pos, self.vel, self.ke = step_ref64(
                self.pos, self.vel, self.mass, self.cfg.dt
            )
        return float(self.ke)

    def total_energy(self) -> float:
        import jax.numpy as jnp

        from .models.gravity import kinetic_energy, potential_energy
        from .state import ParticleState

        st = ParticleState(
            pos=jnp.asarray(self.pos), vel=jnp.asarray(self.vel),
            mass=jnp.asarray(self.mass), n=self.pos.shape[1],
        )
        return float(kinetic_energy(st)) + float(potential_energy(st))


def run(cfg: SimConfig, out=None, quiet: bool = False) -> RunResult:
    runner: _BlockRunner
    if cfg.precision == "ref64":
        runner = _OracleRunner(cfg)
    else:
        runner = _DeviceRunner(cfg)
    try:
        return _run_prepared(runner, cfg, out, quiet)
    finally:
        # A forced/autotuned SR layout applies to THIS run only:
        # restore the pm module state even on failure, so later runs in
        # the process see the documented module defaults (or their own
        # overrides) instead of silently inheriting this run's layout.
        runner.finish()


def _run_prepared(runner: _BlockRunner, cfg: SimConfig, out,
                  quiet: bool) -> RunResult:
    emit = (lambda *_: None) if quiet else reporting.emit

    if cfg.debug_nans:
        jax.config.update("jax_debug_nans", True)

    runner.prepare()
    # Absolute step offset: 0 on fresh runs, the checkpoint's step counter
    # on resume, so printed steps / saved checkpoints continue the counter.
    step0 = runner.start_step

    e0 = runner.total_energy() if cfg.energy_check else None

    emit(reporting.header(cfg.n, cfg.nsteps, cfg.dt), out)

    gflops = step_gflops(cfg.n)
    timer = WallTime()
    samples: List[Tuple[int, float, float, float, float]] = []
    av = 0.0
    dev = 0.0
    nf = 0

    profile_ctx = None
    if cfg.profile_dir:
        profile_ctx = jax.profiler.trace(cfg.profile_dir)
        profile_ctx.__enter__()

    t0 = timer.start()
    s = 0
    while s < cfg.nsteps:
        steps = min(cfg.sfreq, cfg.nsteps - s)
        b0 = timer.start()
        ke = runner.run_block(steps)
        b1 = timer.stop()
        s += steps
        if steps == cfg.sfreq and s % cfg.sfreq == 0:
            nf += 1
            block_secs = b1 - b0
            block_gf = gflops * cfg.sfreq / block_secs
            t_phys = float(np.float32(step0 + s) * np.float32(cfg.dt))
            samples.append((step0 + s, t_phys, ke, block_secs, block_gf))
            emit(
                reporting.stats_row(step0 + s, t_phys, ke, block_secs, block_gf),
                out,
            )
            runner.observe(block_secs)
            if nf > 2:
                av += block_gf
                dev += block_gf * block_gf
            if (
                cfg.checkpoint_every
                and cfg.save_state_path
                and nf % cfg.checkpoint_every == 0
            ):
                runner.save(cfg.save_state_path, step0 + s)
            if (
                cfg.snapshot_every
                and cfg.snapshot_dir
                and nf % cfg.snapshot_every == 0
            ):
                import os

                os.makedirs(cfg.snapshot_dir, exist_ok=True)
                runner.save(
                    os.path.join(cfg.snapshot_dir, f"step_{step0 + s:06d}.npz"),
                    step0 + s,
                )
    t1 = timer.stop()

    if cfg.save_state_path:
        runner.save(cfg.save_state_path, step0 + cfg.nsteps)

    if profile_ctx:
        profile_ctx.__exit__(None, None, None)

    total = t1 - t0
    if nf > 2:
        av /= nf - 2
        dev = math.sqrt(max(dev / (nf - 2) - av * av, 0.0))
    else:
        av = dev = float("nan")

    nthreads = cfg.shards if cfg.shards > 1 else 1
    emit(reporting.footer(nthreads, total, av, dev), out)
    result = RunResult(samples, total, av, dev, nthreads, start_step=step0)
    if cfg.energy_check and e0 is not None:
        e1 = runner.total_energy()
        drift = abs(e1 - e0) / max(abs(e0), 1e-30)
        result.energy_drift = drift
        emit(f"# Energy drift |dE/E|: {drift:.3e} "
             f"(E0={e0:.6g}, E1={e1:.6g})", out)
    return result


class Simulation:
    """Class-style facade mirroring the reference's GSimulation public API
    (ver0/GSimulation.hpp:36-80; ver5_all/GSimulation.hpp:40-65)."""

    def __init__(self, config: Optional[SimConfig] = None, quiet: bool = False):
        self.config = config or SimConfig()
        self._quiet = quiet
        self.world_rank = 0  # ver5_all/GSimulation.hpp:60-61 equivalents
        self.world_size = 1
        # The banner is deferred until the rank is known (init_mpi) or the
        # run starts: printing it here would emit it on every rank of a
        # multi-process run, whereas the reference gates all output on
        # world_rank == 0 (ver5_all/GSimulation.cpp:119).
        self._banner_printed = False
        self.result: Optional[RunResult] = None

    def _print_banner_once(self) -> None:
        if not self._banner_printed and not self._quiet and self.world_rank == 0:
            reporting.print_banner()
        self._banner_printed = True

    def init_mpi(self) -> None:
        """Multi-host bootstrap — the reference's ``init_mpi()``
        (ver5_all/GSimulation.cpp:93-115).  On a single host this is a
        no-op; in a multi-process TPU environment (coordinator address in
        the environment) it initializes jax.distributed and records
        rank/size.  Non-zero ranks print nothing (the reference gates
        output on world_rank == 0, ver5_all/GSimulation.cpp:119)."""
        import os

        if not (
            os.environ.get("JAX_COORDINATOR_ADDRESS")
            or os.environ.get("COORDINATOR_ADDRESS")
            or int(os.environ.get("NBODY_NUM_PROCESSES", "1")) > 1
        ):
            self._print_banner_once()
            return
        from .parallel.distributed import init_distributed

        self.world_rank, self.world_size = init_distributed()
        if self.world_rank != 0:
            self._quiet = True
        self._print_banner_once()

    def set_number_of_particles(self, n: int) -> None:
        self.config.n = n

    def set_number_of_steps(self, nsteps: int) -> None:
        self.config.nsteps = nsteps

    # ver5_all extensions (ver5_all/GSimulation.hpp:51-58).  CPU/GPU work
    # ratios are meaningless on a homogeneous TPU mesh; thread dims map
    # onto kernel tile sizes; the device selector keeps its reference
    # semantics (1=cpu, 2=gpu-class accelerator, 3=split -> accelerator).
    def set_devices(self, n: int) -> None:
        self._devices = n
        if n == 1:
            self.config.platform = "cpu"
        elif n in (2, 3):
            self.config.platform = None

    def set_cpu_ratio(self, ratio: float) -> None:
        """ver5_all CLI parity (main.cpp:49).  The OpenCL backend splits
        each step's work between CPU and GPU by this ratio
        (opencl/Compute.cpp:241-255); a TPU mesh is homogeneous, so there
        is nothing to split — the value is recorded and a note is emitted
        rather than the flag being silently inert."""
        import sys

        self._cpu_ratio = ratio
        if not self._quiet and self.world_rank == 0:
            print(
                f"# cpu_ratio={ratio:g} noted: TPU meshes are homogeneous; "
                "work is split evenly across shards (no CPU/GPU "
                "co-execution to tune)",
                file=sys.stderr,
            )

    def set_thread_dim0(self, d: int) -> None:
        if d > 0:
            self.config.tile_i = d

    def set_thread_dim1(self, d: int) -> None:
        if d > 0:
            self.config.tile_j = d

    def start(self) -> RunResult:
        self._print_banner_once()  # single-host path without init_mpi()
        self.result = run(self.config, quiet=self._quiet)
        return self.result
