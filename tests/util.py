"""Shared test helpers."""

from __future__ import annotations

import re

_ROW = re.compile(r"^ (\d+)\s+(\S+)\s+(\S+)\s+(\S+)\s+(\S+)\s*$")


def parse_golden_trace(path: str) -> list[tuple[int, str]]:
    """Parse a captured reference stdout into [(step, kenergy_string)].

    The kenergy strings are the reference's %.5g renderings — comparing
    against them as strings asserts agreement at full printed precision."""
    rows = []
    with open(path) as f:
        for line in f:
            m = _ROW.match(line.rstrip("\n"))
            if m and m.group(1).isdigit():
                rows.append((int(m.group(1)), m.group(3)))
    return rows
