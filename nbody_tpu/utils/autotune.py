"""Kernel tile autotuning.

The reference's only runtime tuner adjusts the OpenCL CPU/GPU work split by
+0.01 per sample block (ver5_all/programming_models/opencl/Compute.cpp:
317-321).  The TPU analog is tile-size selection for the Pallas kernel:
on-device timing of candidate (tile_i, tile_j) pairs using difference-method
timing (two loop lengths, attributing the difference to the extra steps) so
fixed dispatch/fetch costs cancel.

Results are cached in-process and optionally on disk
(~/.cache/nbody_tpu/autotune.json) keyed by (backend, device kind, padded N,
dtype mode).
"""

from __future__ import annotations

import json
import os
import time
from typing import Iterable, Optional, Tuple

import numpy as np

DEFAULT_CANDIDATES: tuple[Tuple[int, int], ...] = (
    (512, 2048), (512, 1024), (256, 2048), (1024, 1024), (512, 512),
    (256, 1024),
)

_memory_cache: dict = {}


def _cache_path() -> str:
    base = os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache"))
    return os.path.join(base, "nbody_tpu", "autotune.json")


def _load_disk_cache() -> dict:
    try:
        with open(_cache_path()) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _save_disk_cache(cache: dict) -> None:
    path = _cache_path()
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(cache, f, indent=1, sort_keys=True)
    except OSError:
        pass  # caching is best-effort


def _cache_key(n_padded: int, dist_dtype: str) -> str:
    import jax

    dev = jax.devices()[0]
    return f"{jax.default_backend()}|{dev.device_kind}|{n_padded}|{dist_dtype}"


def _time_loop(pos, mass, ti: int, tj: int, loops: int, dist_dtype: str,
               interpret: bool) -> Optional[float]:
    """Seconds per force evaluation in a jitted loop, or None on failure."""
    import jax

    from ..ops.pallas_kernel import accelerations

    def body(_, p):
        acc = accelerations(
            p, mass, tile_i=ti, tile_j=tj, dist_dtype=dist_dtype,
            interpret=interpret,
        )
        return p + np.float32(1e-30) * acc

    def run(k):
        f = jax.jit(lambda p: jax.lax.fori_loop(0, k, body, p))
        out = f(pos)
        float(out[0, 0])  # sync via fetch
        t0 = time.perf_counter()
        out = f(pos)
        float(out[0, 0])
        return time.perf_counter() - t0

    try:
        t1 = run(loops)
        t2 = run(2 * loops)
    except Exception:
        return None
    return max(t2 - t1, 1e-9) / loops


def autotune_tiles(
    n_padded: int,
    dist_dtype: str = "float32",
    candidates: Iterable[Tuple[int, int]] = DEFAULT_CANDIDATES,
    loops: int = 5,
    interpret: bool = False,
    use_disk_cache: bool = True,
    verbose: bool = False,
) -> Tuple[int, int]:
    """Pick the fastest (tile_i, tile_j) for this device and problem size."""
    key = _cache_key(n_padded, dist_dtype)
    if key in _memory_cache:
        return tuple(_memory_cache[key])
    disk = _load_disk_cache() if use_disk_cache else {}
    if key in disk:
        _memory_cache[key] = disk[key]
        return tuple(disk[key])

    rng = np.random.default_rng(0)
    pos = np.asarray(rng.random((3, n_padded)), np.float32)
    mass = np.asarray(rng.random(n_padded), np.float32)

    def _largest_divisor_leq(n: int, cap: int) -> int:
        for c in range(min(cap, n), 0, -1):
            if n % c == 0:
                return c
        return 1

    valid = [
        (ti, tj)
        for ti, tj in candidates
        if n_padded % ti == 0 and n_padded % tj == 0
    ] or [(
        _largest_divisor_leq(n_padded, 512),
        _largest_divisor_leq(n_padded, 128),
    )]

    best, best_t = None, float("inf")
    for ti, tj in valid:
        t = _time_loop(pos, mass, ti, tj, loops, dist_dtype, interpret)
        if verbose:
            rate = n_padded * n_padded / t / 1e9 if t else float("nan")
            print(f"  autotune ({ti},{tj}): "
                  + (f"{rate:.1f} Gpairs/s" if t else "failed"))
        if t is not None and t < best_t:
            best, best_t = (ti, tj), t
    if best is None:
        raise RuntimeError("autotune: every candidate tile failed to compile")

    _memory_cache[key] = list(best)
    if use_disk_cache:
        disk[key] = list(best)
        _save_disk_cache(disk)
    return best
