"""The gravity model: semi-implicit Euler stepping + kinetic-energy
diagnostic, fused into a single on-device sample block.

Reference semantics (ver0/GSimulation.cpp:153-173):
  vel += acc * dt;  pos += vel_new * dt;  KE = 0.5 * sum(m * |v|^2)

The reference's offload backends copy positions/accelerations across the
host-device boundary every step and integrate on the host
(ver5_all/programming_models/cuda/Compute.cu:147-189).  Here the entire
sample block (sfreq steps, ver0/GSimulation.cpp:31 default 50) runs on
device inside one jitted ``lax.fori_loop``; the host syncs once per block
to print diagnostics — that sync is the only host<->device traffic.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from ..state import ParticleState

AccelFn = Callable[[jax.Array, jax.Array], jax.Array]


def kinetic_energy(state: ParticleState) -> jax.Array:
    """KE = 0.5 * sum_i m_i |v_i|^2 (ver0/GSimulation.cpp:167-173).
    Zero-mass padding particles contribute exactly zero."""
    v = state.vel
    v2 = v[0] * v[0] + v[1] * v[1] + v[2] * v[2]
    return jnp.float32(0.5) * jnp.sum(state.mass * v2)


def euler_step(state: ParticleState, accel_fn: AccelFn, dt: float) -> ParticleState:
    """One semi-implicit Euler step (ver0/GSimulation.cpp:153-161)."""
    dtf = jnp.float32(dt)
    acc = accel_fn(state.pos, state.mass)
    vel = state.vel + acc * dtf
    pos = state.pos + vel * dtf
    return ParticleState(pos=pos, vel=vel, mass=state.mass, n=state.n)


def make_block_fn(accel_fn: AccelFn, dt: float, block_steps: int,
                  integrator: str = "euler", env_fn=None):
    """Build a jitted function advancing ``block_steps`` steps on device and
    returning (new_state, kinetic_energy_after_last_step).  ``env_fn``
    computes a per-block environment fed to accel_fn as ``mesh_env=``
    (see integrators.make_block_fn)."""
    from .integrators import make_block_fn as _mk

    return _mk(accel_fn, dt, block_steps, integrator=integrator,
               env_fn=env_fn)


def make_fused_block_fn(dt: float, block_steps: int, tile_i: int = 0,
                        tile_j: int = 0, integrator: str = "euler",
                        interpret: bool = False):
    """Jitted sample block running entirely inside one Pallas call with the
    state VMEM-resident (ops/fused_block.py).  fp32, single-device,
    N <= fused_block.max_fused_n().  Same (state) -> (state, ke) contract as
    make_block_fn.

    Note: fused leapfrog re-seeds the carried acceleration each block (one
    extra pair sweep per block), identical to the unfused leapfrog."""
    from ..ops import fused_block as fb

    ti = tile_i or fb.DEFAULT_TILE_I
    tj = tile_j or fb.DEFAULT_TILE_J

    @jax.jit
    def block(state: ParticleState):
        pos, vel = fb.fused_block(
            state.pos, state.vel, state.mass, dt, block_steps,
            tile_i=ti, tile_j=tj, integrator=integrator, interpret=interpret,
        )
        new = ParticleState(pos=pos, vel=vel, mass=state.mass, n=state.n)
        return new, kinetic_energy(new)

    return block


def max_pairs_per_exec() -> int:
    """One XLA executable execution longer than ~1 min trips the TPU
    worker watchdog (observed: a single N=4M force sweep, ~92 s, crashes
    the worker even when split into chunked pallas_calls INSIDE one jit —
    the watchdog meters the executable, not the kernel).  Above this
    pairs-per-executable budget (~6 s at the attached device's streaming
    pair rate — utils/device_caps.py; 2^40 on v5e) the sample block is
    orchestrated from the host as many short executables with no host
    syncs between them."""
    from ..utils import device_caps

    return device_caps.caps().max_pairs_per_exec


def needs_host_chunking(n_padded: int, block_steps: int) -> bool:
    return n_padded * n_padded * block_steps > max_pairs_per_exec()


def _sym_chunking(n: int, max_pairs: int) -> tuple[int, int] | None:
    """Pick ``(per, block)`` for the pair-symmetric host-chunked sweep:
    ``per`` is an equal chunk size — a lane-aligned divisor of ``n`` that
    keeps one cross sweep (per^2 unordered pairs) inside the
    per-executable budget and the two-sided kernel's VMEM residency
    (128*per bytes of (8,per) buffers) on-chip — and ``block`` is the
    Pallas block size the sym kernels will be called with: the largest
    power-of-two divisor of ``per`` capped at 1024 (always >= 128 since
    per is a multiple of 128).  The explicit block matters when n has an
    odd factor: the kernels' block=0 auto pick (1024) need not divide
    per (e.g. n=4608 -> per=2304), which used to raise at runtime.
    Candidates are ranked by (block, per): a bigger block is the measured
    1.30x two-sided-kernel lever, a bigger per means fewer executables.
    None when no divisor qualifies (caller falls back to the streaming
    chunked sweep)."""
    from ..ops.pallas_sym import max_sym_n

    # per <= 512k keeps the two-sided cross kernel in its fast b=1024
    # regime (64*(2*per) <= 80 MB VMEM residency; measured 1.30x over
    # b=512 — see ops/pallas_sym.accelerations_two_sided).
    cap = min(int(max_pairs ** 0.5), max_sym_n(), 512 * 2**10)
    best, best_key = None, (0, 0)
    for per in range(128, cap + 1, 128):
        if n % per == 0 and n // per >= 2:
            block = min(per & -per, 1024)  # largest pow2 divisor, capped
            if (block, per) > best_key:
                best, best_key = (per, block), (block, per)
    return best


def make_host_chunked_block_fn(dt: float, block_steps: int, n_padded: int,
                               accel_fn: AccelFn = None,
                               tile_i: int = 0, tile_j: int = 0,
                               integrator: str = "euler",
                               max_pairs_per_exec: int = 0,
                               dist_dtype: str = "float32",
                               sym: bool = False,
                               interpret: bool = False,
                               per_step: bool = False,
                               env_fn=None):
    """Watchdog-safe sample block for huge work (needs_host_chunking):
    the block is orchestrated from the host as many short executables
    with NO host syncs between them — the device stays busy back-to-back
    and nothing is fetched until the caller reads the returned kinetic
    energy.

    Two regimes:
    * one sweep fits the budget (N^2 <= max_pairs_per_exec, only the
      step count is too big): one jitted executable PER STEP, using the
      caller's ``accel_fn`` (i.e. the best kernel for the shape);
    * a single sweep exceeds the budget (BASELINE config 5, N=4M): each
      step's force sweep runs as K jitted executables over tile-aligned
      target chunks of the streaming between-kernel (~6 s each), plus a
      small integrate executable.  Bit-identical to the unchunked sweep
      (same tiles, same accumulation order).

    Same (state) -> (state, ke) contract as make_block_fn."""
    import math

    from jax import lax

    if integrator not in ("euler", "leapfrog"):
        raise ValueError(f"unknown integrator {integrator!r}")
    if not max_pairs_per_exec:  # 0 = device-derived budget
        from ..utils import device_caps

        max_pairs_per_exec = device_caps.caps().max_pairs_per_exec
    dtf = jnp.float32(dt)
    half = jnp.float32(0.5) * dtf

    if (per_step or n_padded * n_padded <= max_pairs_per_exec) \
            and accel_fn is not None:
        # Per-step executables.  ``per_step=True`` forces this regime for
        # kernels whose cost is not pair-count-shaped (the pm mesh solver:
        # cheap steps, but a long block is still ONE executable and the
        # watchdog meters executables).  ``env_fn`` builds the per-BLOCK
        # mesh environment in its own small executable; the env arrays
        # then ride into every per-step executable as ordinary device
        # arguments (never fetched — complex64 cannot cross the tunnel).
        if env_fn is None:
            def call(p, m, _env):
                return accel_fn(p, m)
        else:
            env_build = jax.jit(env_fn)

            def call(p, m, env):
                return accel_fn(p, m, mesh_env=env)

        @jax.jit
        def euler_one(pos, vel, mass, env):
            acc = call(pos, mass, env)
            v = vel + acc * dtf
            return pos + v * dtf, v

        @jax.jit
        def lf_one(pos, vel, acc, mass, env):
            v_h = vel + acc * half
            p = pos + v_h * dtf
            acc_n = call(p, mass, env)
            return p, v_h + acc_n * half, acc_n

        # jitted — an eager accel_fn call dispatches per-op over tunneled
        # backends (minutes for a mesh solve)
        accel_seed = jax.jit(lambda p, m, env: call(p, m, env))

        def block(state: ParticleState):
            pos, vel, mass = state.pos, state.vel, state.mass
            env = env_build(pos, mass) if env_fn is not None else None
            if integrator == "euler":
                for _ in range(block_steps):
                    pos, vel = euler_one(pos, vel, mass, env)
            else:
                acc = accel_seed(pos, mass, env)
                for _ in range(block_steps):
                    pos, vel, acc = lf_one(pos, vel, acc, mass, env)
            new = ParticleState(pos=pos, vel=vel, mass=mass, n=state.n)
            return new, kinetic_energy(new)

        return block

    sym_chunk = (
        _sym_chunking(n_padded, max_pairs_per_exec)
        if sym and dist_dtype in ("float32", "bfloat16") else None
    )
    if sym_chunk is not None:
        per, blk = sym_chunk
        if tile_i and per % tile_i == 0:
            # tile_i doubles as an explicit sym-block override (the
            # pallas_sym convention) — the online retuner's knob for
            # this regime.
            blk = tile_i
        sweep = _make_sym_chunked_sweep(n_padded, per, interpret, block=blk,
                                        dist_dtype=dist_dtype)
        return _orchestrated_block(sweep, dtf, half, block_steps, integrator)

    from ..ops.pallas_kernel import (
        DEFAULT_TILE_I,
        DEFAULT_TILE_J,
        accelerations_between,
    )

    ti = min(tile_i or DEFAULT_TILE_I, n_padded)
    tj = min(tile_j or DEFAULT_TILE_J, n_padded)
    nchunks = max(1, math.ceil(n_padded * n_padded / max_pairs_per_exec))
    per = -(-n_padded // nchunks)  # ceil
    per = max(ti, -(-per // ti) * ti)  # round up to a tile multiple
    # Equal chunk shapes: the dynamic start index makes one compiled
    # program serve every chunk; the tail start is clamped so the last
    # chunk overlaps the previous one instead of changing shape (the
    # overlap recomputes a few tile rows — cheaper than a second
    # executable; overlapped rows are overwritten with identical values).
    starts = sorted({min(s, n_padded - per)
                     for s in range(0, n_padded, per)})

    @jax.jit
    def accel_chunk(pos, mass, i0):
        tgt = lax.dynamic_slice(pos, (0, i0), (3, per))
        return accelerations_between(
            tgt, pos, mass, tile_i=ti, tile_j=tj, dist_dtype=dist_dtype,
            interpret=interpret, max_pairs_per_call=0,
        )

    def sweep(pos, mass):
        chunks = [accel_chunk(pos, mass, jnp.int32(i0)) for i0 in starts]
        return assemble(pos, *chunks)

    @jax.jit
    def assemble(pos, *chunks):
        acc = jnp.zeros_like(pos)
        for i0, c in zip(starts, chunks):
            acc = lax.dynamic_update_slice(acc, c, (0, i0))
        return acc

    return _orchestrated_block(sweep, dtf, half, block_steps, integrator)


def _make_sym_chunked_sweep(n_padded: int, per: int, interpret: bool,
                            block: int = 0, dist_dtype: str = "float32"):
    """Pair-symmetric host-chunked force sweep: the particle range is cut
    into C = n/per equal chunks and every unordered CHUNK pair is computed
    by exactly one short executable — diagonal chunks by the resident sym
    kernel, cross chunks by the two-sided action/reaction kernel — so the
    whole sweep does N^2/2 pair evaluations instead of N^2.  One assemble
    executable sums each chunk's C contributions (the mass division is
    linear, so per-call divided contributions add exactly like undivided
    sums).  Two compiled programs serve all chunk indices (dynamic
    starts)."""
    from jax import lax

    from ..ops.pallas_sym import accelerations as sym_accel
    from ..ops.pallas_sym import accelerations_two_sided

    if not block:
        # The kernels' own auto pick (1024) need not divide per when n
        # has an odd factor; default to per's largest pow2 divisor.
        block = min(per & -per, 1024)
    C = n_padded // per
    starts = [i * per for i in range(C)]

    @jax.jit
    def diag_chunk(pos, mass, i0):
        p = lax.dynamic_slice(pos, (0, i0), (3, per))
        m = lax.dynamic_slice(mass, (i0,), (per,))
        return sym_accel(p, m, block=block, dist_dtype=dist_dtype,
                         interpret=interpret)

    @jax.jit
    def cross_chunk(pos, mass, i0, j0):
        pt = lax.dynamic_slice(pos, (0, i0), (3, per))
        mt = lax.dynamic_slice(mass, (i0,), (per,))
        ps = lax.dynamic_slice(pos, (0, j0), (3, per))
        ms = lax.dynamic_slice(mass, (j0,), (per,))
        return accelerations_two_sided(pt, mt, ps, ms, block=block,
                                       dist_dtype=dist_dtype,
                                       interpret=interpret)

    @jax.jit
    def assemble(parts):
        return jnp.concatenate(
            [sum(p[1:], p[0]) for p in parts], axis=1
        )

    def sweep(pos, mass):
        parts = [[] for _ in range(C)]
        for i in range(C):
            parts[i].append(diag_chunk(pos, mass, jnp.int32(starts[i])))
            for j in range(i + 1, C):
                at, ar = cross_chunk(
                    pos, mass, jnp.int32(starts[i]), jnp.int32(starts[j])
                )
                parts[i].append(at)
                parts[j].append(ar)
        return assemble(tuple(tuple(p) for p in parts))

    return sweep


def _orchestrated_block(sweep, dtf, half, block_steps: int, integrator: str):
    """Host-orchestrated sample block over a ``sweep(pos, mass) -> acc``
    built from short executables; no host syncs between them."""

    @jax.jit
    def euler_update(pos, vel, acc):
        v = vel + acc * dtf
        return pos + v * dtf, v

    @jax.jit
    def kick_drift(pos, vel, acc):
        v_h = vel + acc * half
        return pos + v_h * dtf, v_h

    @jax.jit
    def kick(vel, acc):
        return vel + acc * half

    def block(state: ParticleState):
        pos, vel, mass = state.pos, state.vel, state.mass
        if integrator == "euler":
            for _ in range(block_steps):
                acc = sweep(pos, mass)
                pos, vel = euler_update(pos, vel, acc)
        else:  # leapfrog KDK
            acc = sweep(pos, mass)
            for _ in range(block_steps):
                pos, vel = kick_drift(pos, vel, acc)
                acc = sweep(pos, mass)
                vel = kick(vel, acc)
        new = ParticleState(pos=pos, vel=vel, mass=mass, n=state.n)
        return new, kinetic_energy(new)

    return block


def potential_energy(state: ParticleState, chunk: int = 1024) -> jax.Array:
    """Softened potential energy, consistent with the force law:
    PE = -(G/2) sum_i sum_j m_i m_j (|r_ij|^2 + eps)^(-1/2).

    Includes the i==j self term, which is a constant (-G m^2 / (2 sqrt(eps))
    per particle) and therefore irrelevant to conservation diagnostics; the
    reference likewise never masks the diagonal.  KE + PE is the conserved
    energy of the softened system (the reference prints only KE)."""
    from ..ops.naive import _largest_divisor_leq
    from ..types import G_NEWTON, SOFTENING_SQUARED

    pos, mass = state.pos, state.mass
    n = pos.shape[1]
    c = _largest_divisor_leq(n, chunk)
    eps2 = jnp.float32(SOFTENING_SQUARED)

    def block(args):
        pos_i, m_i = args  # (3, c), (c,)
        d = pos[:, None, :] - pos_i[:, :, None]  # (3, c, N)
        d2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2] + eps2
        inv = jax.lax.rsqrt(d2)  # (c, N)
        return jnp.sum((m_i[:, None] * mass[None, :]) * inv)

    blocks = (
        pos.reshape(3, n // c, c).transpose(1, 0, 2),
        mass.reshape(n // c, c),
    )
    total = jnp.sum(jax.lax.map(block, blocks))
    return jnp.float32(-0.5 * G_NEWTON) * total


def make_accel_fn(
    kernel_name: str, differentiable: bool = False,
    backward_opts: dict = None, **opts
) -> AccelFn:
    """Bind a registry kernel with its options into the AccelFn signature.

    ``differentiable=True`` attaches the analytic custom VJP (ops/grad.py),
    required to differentiate through the Pallas kernels and cheaper than
    XLA autodiff for the naive one.  ``backward_opts`` flow to the VJP
    wrapper (backward mode, tiles — e.g. from
    ``autotune_tiles(n, family='backward')``).

    The mesh tiers differentiate NATIVELY instead: the exact-pair
    analytic VJP would silently return all-pairs cotangents for a mesh
    forward.  pm is reverse-differentiable as-is; p3m gets the
    static-bound sweep (ops/pm.py ``differentiable=True``)."""
    from ..ops import registry

    fn = registry.get(kernel_name)
    if kernel_name in ("pm", "p3m"):
        if backward_opts:
            raise ValueError(
                "backward_opts tune the exact-pair analytic VJP and do "
                f"not apply to the native-AD mesh tier '{kernel_name}'"
            )
        if differentiable:
            opts = dict(opts, differentiable=True)
        return functools.partial(fn, **opts) if opts else fn
    if opts:
        fn = functools.partial(fn, **opts)
    if differentiable:
        from ..ops.grad import differentiable as _diff

        fn = _diff(fn, **(backward_opts or {}))
    return fn
