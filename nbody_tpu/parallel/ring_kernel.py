"""Fused RDMA ring force kernel: communication and computation overlapped
INSIDE one Pallas kernel per shard.

The XLA-level ring (decompose._accel_ring) leaves comm/compute overlap to
the XLA scheduler, and each hop's pair kernel is a separate pallas_call.
This kernel is the speed-of-light version (pallas_guide.md §18 pattern):

* each shard holds its (8, N/K) source block [x, y, z, G*m];
* a double-buffered scratch ring: while the VPU consumes the in-hand
  block, `pltpu.make_async_remote_copy` streams it to the right neighbor
  over ICI; semaphores order the hand-off;
* a neighbor barrier precedes the first send so no RDMA lands in an
  unentered kernel;
* per-slot backpressure: a device may overwrite its right neighbor's
  ring slot only after that neighbor signals (REGULAR semaphore) that it
  has finished sweeping the block previously held there.  Without this
  handshake a fast neighbor's hop-(h+1) remote copy could land in a slot
  the local sweep of hop h is still reading (cross-device WAR race);
* per hop, the pair sweep accumulates local-target accelerations in fp32
  (sublane-reduction orientation: targets stay in the rows layout, so the
  only relayouts are one (8,TJ)->(TJ,8) transpose per source tile per
  hop, amortized over all target tiles).

Everything (targets, accumulators, both ring buffers) lives in VMEM for
the whole K-hop sweep; HBM is touched once on entry and once on exit.
Per-shard VMEM is O(N/K), so e.g. N=1M on 8 shards needs ~3 x 4 MB
resident + pair tiles.

Validated against the XLA ring and single-device kernels in interpreter
mode on an 8-virtual-device CPU mesh (tests/test_ring_kernel.py) for
euler and leapfrog.  Compiling it requires a real multi-worker TPU
runtime: chipless/AOT compile services reject semaphore+RDMA kernels
(libtpu needs TPU_WORKER_HOSTNAMES), so on single-chip tunneled setups
use ``comm='ring'`` (XLA ppermute), which is compute-bound-equivalent at
these arithmetic intensities (ROADMAP.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import G_NEWTON, SOFTENING_SQUARED
from .mesh import AXIS

DEFAULT_TILE_I = 512
DEFAULT_TILE_J = 1024


def _kernel(ps_ref, out_ref, comm_buf, jsrc_s, send_sem, recv_sem,
            free_sem, *, num_shards, tile_i, tile_j, use_barrier):
    nl = ps_ref.shape[1]
    ni = nl // tile_i
    nj = nl // tile_j
    f32 = jnp.float32
    eps2 = f32(SOFTENING_SQUARED)

    my = lax.axis_index(AXIS)
    right = lax.rem(my + 1, num_shards)
    left = lax.rem(my + num_shards - 1, num_shards)

    out_ref[...] = jnp.zeros_like(out_ref)
    comm_buf[0] = ps_ref[...]

    if num_shards > 1 and use_barrier:
        # Make sure both neighbors have entered the kernel (and therefore
        # allocated comm_buf) before any RDMA lands in their memory.
        # (Skipped in interpreter mode, which has no barrier semaphore and
        # serializes the emulated DMAs safely.)
        barrier = pltpu.get_barrier_semaphore()
        pltpu.semaphore_signal(
            barrier, inc=1, device_id=left,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        pltpu.semaphore_signal(
            barrier, inc=1, device_id=right,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        pltpu.semaphore_wait(barrier, 2)

    def sweep(cur):
        """Accumulate forces from the in-hand source block comm_buf[cur].
        fori_loops with dynamic slices keep compiled size independent of
        the local shard size."""

        def j_body(jt, _):
            # one relayout per source tile, reused across all target tiles
            jsrc_s[...] = jnp.transpose(
                comm_buf[cur, :, pl.ds(jt * tile_j, tile_j)]
            )  # (TJ, 8)
            xj = jsrc_s[:, 0:1]  # (TJ, 1)
            yj = jsrc_s[:, 1:2]
            zj = jsrc_s[:, 2:3]
            gm = jsrc_s[:, 3:4]

            def i_body(it, __):
                isl = pl.ds(it * tile_i, tile_i)
                xi = ps_ref[0:1, isl]  # (1, TI) — targets stay in rows
                yi = ps_ref[1:2, isl]
                zi = ps_ref[2:3, isl]
                dx = xj - xi  # (TJ, TI)
                dy = yj - yi
                dz = zj - zi
                d2 = dx * dx + dy * dy + dz * dz + eps2
                inv = lax.rsqrt(d2)
                w = gm * (inv * inv * inv)
                out_ref[0:1, isl] += jnp.sum(w * dx, axis=0, keepdims=True)
                out_ref[1:2, isl] += jnp.sum(w * dy, axis=0, keepdims=True)
                out_ref[2:3, isl] += jnp.sum(w * dz, axis=0, keepdims=True)
                return __

            lax.fori_loop(0, ni, i_body, 0)
            return _

        lax.fori_loop(0, nj, j_body, 0)

    # Slot-reuse backpressure only matters once a slot is overwritten
    # while its first tenant could still be in use: hop h writes the
    # right neighbor's slot (h+1)%2, which that neighbor last read as its
    # hop-(h-1) sweep source.  Interpret mode serializes the emulated
    # DMAs, so (like the entry barrier) the handshake is compiled-only.
    handshake = num_shards > 2 and use_barrier
    for hop in range(num_shards):
        cur = hop % 2
        nxt = (hop + 1) % 2
        if hop < num_shards - 1:
            if handshake and hop >= 1:
                # WAR guard: the right neighbor must have finished its
                # hop-(h-1) sweep of the slot we are about to overwrite.
                pltpu.semaphore_wait(free_sem.at[nxt], 1)
            rdma = pltpu.make_async_remote_copy(
                src_ref=comm_buf.at[cur],
                dst_ref=comm_buf.at[nxt],
                send_sem=send_sem.at[cur],
                recv_sem=recv_sem.at[nxt],
                device_id=right,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
            rdma.start()   # streams to the neighbor while we compute
            sweep(cur)
            rdma.wait()    # our send done AND our incoming block arrived
            if handshake and hop + 1 < num_shards - 1:
                # Tell the left neighbor (the writer into our buffers)
                # that our slot `cur` is free for its hop-(h+1) send.
                pltpu.semaphore_signal(
                    free_sem.at[cur], inc=1, device_id=left,
                    device_id_type=pltpu.DeviceIdType.LOGICAL,
                )
        else:
            sweep(cur)


def ring_accelerations(
    pos_l: jax.Array,
    mass_l: jax.Array,
    num_shards: int,
    tile_i: int = DEFAULT_TILE_I,
    tile_j: int = DEFAULT_TILE_J,
    interpret: bool = False,
) -> jax.Array:
    """Per-shard accelerations with the fused RDMA ring.  Must be called
    inside shard_map over the particle axis.  pos_l (3, Nl), mass_l (Nl,)
    -> acc (3, Nl) fp32."""
    nl = pos_l.shape[1]
    ti = min(tile_i, nl)
    tj = min(tile_j, nl)
    if nl % ti or nl % tj:
        raise ValueError(f"local N={nl} must be divisible by tiles ({ti},{tj})")
    f32 = jnp.float32
    gm = (mass_l * f32(G_NEWTON)).astype(f32)
    ps = jnp.concatenate(
        [pos_l.astype(f32), gm[None, :], jnp.zeros((4, nl), f32)], axis=0
    )  # (8, Nl)
    out = pl.pallas_call(
        functools.partial(
            _kernel, num_shards=num_shards, tile_i=ti, tile_j=tj,
            use_barrier=not interpret,
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, nl), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 8, nl), jnp.float32),
            pltpu.VMEM((tj, 8), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.REGULAR((2,)),  # per-slot 'free' handshake
        ],
        # collective_id is only legal alongside the custom barrier, which
        # a single-shard "ring" (no RDMA, no barrier) doesn't use.
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            **({"collective_id": 0} if num_shards > 1 else {}),
        ),
        cost_estimate=pl.CostEstimate(
            flops=20 * nl * nl * num_shards,
            bytes_accessed=nl * 64 * num_shards,
            transcendentals=nl * nl * num_shards,
        ),
        interpret=interpret,
    )(ps)
    return out[0:3, :]
