"""Pluggable force-kernel registry.

The reference selects among eight compute backends at *link time* — one
Compute.cpp per build (ver5_all/CMakeLists.txt:17,49; ver5_all/Makefile:104).
Here backend selection is a runtime registry keyed by name; all kernels share
the signature ``fn(pos (3,N) f32, mass (N,) f32, **opts) -> acc (3,N) f32``.

Registered kernels:
* ``naive``  — broadcasted jnp, XLA-fused (ver0-2 analog; correctness oracle)
* ``pallas`` — tiled Pallas VMEM-streaming kernel (ver3-8 analog)
* ``auto``   — pallas on TPU, naive elsewhere
"""

from __future__ import annotations

from typing import Callable, Dict

import jax

from . import naive, pallas_kernel

KernelFn = Callable[..., jax.Array]

_REGISTRY: Dict[str, KernelFn] = {}


def register(name: str, fn: KernelFn) -> None:
    _REGISTRY[name] = fn


def available() -> tuple[str, ...]:
    return tuple(sorted(_REGISTRY)) + ("auto",)


def get(name: str) -> KernelFn:
    if name == "auto":
        platform = jax.default_backend()
        name = "pallas" if platform == "tpu" else "naive"
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown kernel {name!r}; available: {available()}"
        ) from None


register("naive", naive.accelerations)
register("pallas", pallas_kernel.accelerations)
