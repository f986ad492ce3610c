"""Checkpoint / resume.

The reference keeps state only in RAM for the lifetime of a run
(SURVEY.md §5 — no checkpointing anywhere).  Here the SoA state is one
pytree, so a checkpoint is a single compressed npz: positions, velocities,
masses (real particles only — padding is reconstructed on load), plus the
absolute step counter for bookkeeping.
"""

from __future__ import annotations

import numpy as np

from ..state import ParticleState, pad_state, round_up

FORMAT_VERSION = 1


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


def load_state(path: str, pad_multiple: int = 1) -> tuple[ParticleState, int]:
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
