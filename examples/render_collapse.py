#!/usr/bin/env python
"""Render a cold-collapse simulation as a panel of scatter plots.

Runs the cold uniform sphere (classic violent-relaxation test), snapshots
the state every sample block, and renders an x-y projection panel to PNG.

Usage: python examples/render_collapse.py [N] [out.png]
"""

from __future__ import annotations

import glob
import os
import sys
import tempfile

sys.path.insert(0, ".")


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    out_png = sys.argv[2] if len(sys.argv) > 2 else "collapse.png"

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from nbody_tpu.config import SimConfig
    from nbody_tpu.simulation import run

    snapdir = tempfile.mkdtemp(prefix="nbody_snaps_")
    cfg = SimConfig(
        n=n, nsteps=300, dt=0.01, sfreq=50, distribution="cold_sphere",
        seed=11, integrator="leapfrog", snapshot_every=1,
        snapshot_dir=snapdir,
    )
    run(cfg, quiet=True)

    snaps = sorted(glob.glob(os.path.join(snapdir, "step_*.npz")))
    fig, axes = plt.subplots(1, len(snaps), figsize=(3 * len(snaps), 3.2))
    for ax, path in zip(np.atleast_1d(axes), snaps):
        with np.load(path) as f:
            pos, step = f["pos"], int(f["step"])
        ax.scatter(pos[0], pos[1], s=0.5, alpha=0.4, lw=0)
        ax.set_title(f"step {step}")
        ax.set_xlim(-1.5, 1.5)
        ax.set_ylim(-1.5, 1.5)
        ax.set_aspect("equal")
        ax.set_xticks([])
        ax.set_yticks([])
    fig.suptitle(f"cold-sphere collapse, N={n} (x-y projection)")
    fig.tight_layout()
    fig.savefig(out_png, dpi=110)
    print(f"wrote {out_png} ({len(snaps)} snapshots from {snapdir})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
