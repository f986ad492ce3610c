"""Checkpoint / resume.

The reference keeps state only in RAM for the lifetime of a run
(SURVEY.md §5 — no checkpointing anywhere).  Here the SoA state is one
pytree, with two backends:

* ``npz`` (default) — one compressed file: positions, velocities, masses
  (real particles only; padding is reconstructed on load) plus the
  absolute step counter.  Right for single-host runs of any N that fits
  host memory.
* ``orbax`` — directory-based orbax-checkpoint save of the device pytree.
  Saves the padded arrays directly from device shards without a host
  gather, which is what large multi-host sharded states need.
"""

from __future__ import annotations

import os

import numpy as np

from ..state import ParticleState, pad_state, round_up

FORMAT_VERSION = 1
BACKENDS = ("npz", "orbax")


def save_state(path: str, state: ParticleState, step: int = 0) -> None:
    from ..state import to_host

    host = to_host(state)
    np.savez_compressed(
        path,
        version=FORMAT_VERSION,
        pos=host["pos"],
        vel=host["vel"],
        mass=host["mass"],
        step=np.int64(step),
    )


def save_state_orbax(dirpath: str, state: ParticleState, step: int = 0) -> None:
    """Save the (padded) device state as an orbax checkpoint directory."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        os.path.abspath(dirpath),
        dict(
            pos=state.pos,
            vel=state.vel,
            mass=state.mass,
            n=np.int64(state.n),
            step=np.int64(step),
            version=np.int64(FORMAT_VERSION),
        ),
        force=True,
    )
    ckptr.wait_until_finished()


def load_state_orbax(dirpath: str) -> tuple[ParticleState, int]:
    """Restore an orbax checkpoint to HOST numpy regardless of the
    topology it was saved under — a state saved from a multi-process pod
    mesh must load on a single host and vice versa, and orbax's default
    restore rejects any device-id mismatch.  For multi-host resharded
    restores pass the arrays through jax.device_put with the target
    sharding afterwards (test_multiprocess.py does exactly this)."""
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    path = os.path.abspath(dirpath)
    ckptr = ocp.PyTreeCheckpointer()
    meta = ckptr.metadata(path).item_metadata.tree
    restore_args = {
        k: ocp.RestoreArgs(restore_type=np.ndarray) for k in meta
    }
    t = ckptr.restore(path, restore_args=restore_args)
    if int(t["version"]) > FORMAT_VERSION:
        raise ValueError(f"checkpoint version {int(t['version'])} too new")
    state = ParticleState(
        pos=jnp.asarray(t["pos"]),
        vel=jnp.asarray(t["vel"]),
        mass=jnp.asarray(t["mass"]),
        n=int(t["n"]),
    )
    return state, int(t["step"])


def load_state(path: str, pad_multiple: int = 1) -> tuple[ParticleState, int]:
    if os.path.isdir(path):  # orbax checkpoints are directories
        state, step = load_state_orbax(path)
        if state.n_padded % max(1, pad_multiple):
            from ..state import to_host

            host = to_host(state)
            state = pad_state(
                host["pos"], host["vel"], host["mass"],
                round_up(state.n, max(1, pad_multiple)),
            )
        return state, step
    with np.load(path) as f:
        version = int(f["version"])
        if version > FORMAT_VERSION:
            raise ValueError(f"checkpoint version {version} is newer than "
                             f"supported {FORMAT_VERSION}")
        pos = np.asarray(f["pos"], np.float32)
        vel = np.asarray(f["vel"], np.float32)
        mass = np.asarray(f["mass"], np.float32)
        step = int(f["step"])
    n = pos.shape[1]
    state = pad_state(pos, vel, mass, round_up(n, max(1, pad_multiple)))
    return state, step
