"""Multi-host initialization.

The reference's process bootstrap is ``MPI_Init`` + rank/size bookkeeping
(ver5_all/GSimulation.cpp:93-115).  On TPU pods the equivalent is
``jax.distributed.initialize()``: every host then sees the global device
set, and the same mesh/shard_map code paths work across ICI within a slice
and DCN across slices with no transport code here."""

from __future__ import annotations

from typing import Optional


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> tuple[int, int]:
    """Initialize multi-host JAX (idempotent).  Returns (process_id,
    process_count).  With no arguments, relies on the TPU environment's
    automatic configuration (GKE/GCE metadata)."""
    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        msg = str(e).lower()
        if "already" in msg:
            pass  # initialized earlier in this process — fine
        elif "must be called before" in msg and num_processes in (None, 1):
            # Backends are already up but this is a single-process run, so
            # there is nothing to coordinate; proceed.
            pass
        else:
            raise
    return jax.process_index(), jax.process_count()
