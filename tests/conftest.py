"""Test configuration: run everything on an 8-virtual-device CPU mesh.

This is the TPU-idiomatic substitute for the multi-node hardware the
reference never tests without (SURVEY.md §4): sharding/collective logic is
validated on fake devices; numerics are validated against golden fixtures
from the compiled C++ reference."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nbody_tpu.utils.platform import force_cpu

force_cpu(8)

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running fidelity tests")


GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


@pytest.fixture(scope="session")
def golden_dir():
    return GOLDEN_DIR
