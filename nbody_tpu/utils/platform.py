"""Platform selection helpers.

The environment may register accelerator PJRT plugins that force
``jax_platforms`` at import time; tests and CPU-pinned runs re-override it.
Must be called before any JAX backend is initialized (i.e. before the
first ``jax.devices()``/computation)."""

from __future__ import annotations

import os


def force_cpu(n_virtual_devices: int | None = None) -> None:
    """Route JAX to the host CPU backend, optionally with N virtual devices
    (the TPU-idiomatic way to test multi-chip sharding without chips)."""
    if n_virtual_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        want = f"--xla_force_host_platform_device_count={n_virtual_devices}"
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (flags + " " + want).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
