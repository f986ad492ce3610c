"""Shared test helpers."""

from __future__ import annotations

from nbody_tpu.utils.reporting import parse_trace


def parse_golden_trace(path: str) -> list[tuple[int, str]]:
    """Parse a captured reference stdout into [(step, kenergy_string)].

    The kenergy strings are the reference's %.5g renderings — comparing
    against them as strings asserts agreement at full printed precision.
    (Delegates to reporting.parse_trace, which bench.py also uses for the
    headline fidelity field.)"""
    with open(path) as f:
        return parse_trace(f.read())
