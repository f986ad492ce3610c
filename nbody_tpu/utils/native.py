"""ctypes loader for the native oracle engine (native/oracle_engine.cpp).

Builds the shared library on demand with the repo Makefile if a toolchain
is available; callers fall back to the numpy oracle when it is not."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libnbody_oracle.so")


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_SO_PATH):
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except (OSError, subprocess.SubprocessError):
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.nbody_oracle_run.restype = ctypes.c_int
        lib.nbody_oracle_run.argtypes = [
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_float,
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def oracle_run(
    pos: np.ndarray, vel: np.ndarray, mass: np.ndarray, nsteps: int, dt: float
) -> np.ndarray:
    """Advance (pos, vel) in place by nsteps of exact ver0 arithmetic;
    returns the per-step kinetic-energy trace (nsteps fp32 values)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native oracle engine unavailable (no toolchain?)")
    n = pos.shape[1]
    assert pos.shape == (3, n) and vel.shape == (3, n) and mass.shape == (n,)
    pos_c = np.ascontiguousarray(pos, np.float32)
    vel_c = np.ascontiguousarray(vel, np.float32)
    mass_c = np.ascontiguousarray(mass, np.float32)
    ke = np.empty(nsteps, np.float32)
    rc = lib.nbody_oracle_run(
        pos_c, vel_c, mass_c, n, nsteps, np.float32(dt), ke
    )
    if rc != 0:
        raise RuntimeError(f"native oracle returned {rc}")
    pos[...] = pos_c
    vel[...] = vel_c
    return ke
