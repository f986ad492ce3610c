"""Oracle fidelity: the host ver0-semantics engine must reproduce the
compiled C++ reference's kinetic-energy trace at full printed precision."""

import os

import pytest

from nbody_tpu.oracle import run_ref64
from nbody_tpu.utils.reporting import _g5

from .util import parse_golden_trace


@pytest.mark.parametrize("engine", ["numpy", "native"])
@pytest.mark.parametrize("n,steps,fname", [
    (256, 100, "ver0_n256_s100.txt"),
    (512, 100, "ver0_n512_s100.txt"),
    (2000, 50, "ver0_n2000_s50.txt"),
])
def test_oracle_matches_reference_binary(golden_dir, n, steps, fname, engine):
    if engine == "native":
        from nbody_tpu.utils import native

        if not native.available():
            pytest.skip("no native toolchain")
    golden = parse_golden_trace(os.path.join(golden_dir, fname))
    got = run_ref64(n, steps, engine=engine)
    assert len(got) == len(golden)
    for (s_g, ke_g), (s, ke) in zip(golden, got):
        assert s == s_g
        assert _g5(float(ke)) == ke_g, f"step {s}: {_g5(float(ke))} != {ke_g}"


def test_native_bit_identical_to_numpy():
    from nbody_tpu.utils import native

    if not native.available():
        pytest.skip("no native toolchain")
    a = run_ref64(128, 60, engine="native")
    b = run_ref64(128, 60, engine="numpy")
    assert [(s, float(k)) for s, k in a] == [(s, float(k)) for s, k in b]


@pytest.mark.slow
def test_oracle_full_default_run(golden_dir):
    golden = parse_golden_trace(os.path.join(golden_dir, "ver0_n2000_s500.txt"))
    got = run_ref64(2000, 500, engine="auto")
    for (s_g, ke_g), (s, ke) in zip(golden, got):
        assert _g5(float(ke)) == ke_g, f"step {s}: {_g5(float(ke))} != {ke_g}"
