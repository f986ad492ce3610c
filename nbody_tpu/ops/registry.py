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

from . import naive, pallas_kernel, pallas_mxu

KernelFn = Callable[..., jax.Array]

# name -> (self_accelerations, accelerations_between)
_REGISTRY: Dict[str, tuple[KernelFn, KernelFn]] = {}


def register(name: str, self_fn: KernelFn, between_fn: KernelFn) -> None:
    _REGISTRY[name] = (self_fn, between_fn)


def available() -> tuple[str, ...]:
    return tuple(sorted(_REGISTRY)) + ("auto",)


def resolve(name: str) -> str:
    if name == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "naive"
    return name


def get(name: str) -> KernelFn:
    """Self-acceleration kernel: fn(pos (3,N), mass (N,), **opts) -> (3,N)."""
    return _lookup(name)[0]


def get_between(name: str) -> KernelFn:
    """Target/source kernel: fn(pos_tgt, pos_src, mass_src, **opts)."""
    return _lookup(name)[1]


def _lookup(name: str):
    name = resolve(name)
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown kernel {name!r}; available: {available()}"
        ) from None


register("naive", naive.accelerations, naive.accelerations_between)
register("pallas", pallas_kernel.accelerations, pallas_kernel.accelerations_between)
register("pallas_mxu", pallas_mxu.accelerations, pallas_mxu.accelerations_between)
