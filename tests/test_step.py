"""End-to-end device stepping: the jitted fp32 sample-block loop must
reproduce the compiled C++ reference's kinetic-energy trace at full printed
precision for the golden configs."""

import os

import numpy as np
import pytest

from nbody_tpu.config import SimConfig
from nbody_tpu.init import make_state
from nbody_tpu.models.gravity import (
    euler_step,
    kinetic_energy,
    make_accel_fn,
    make_block_fn,
)
from nbody_tpu.simulation import run
from nbody_tpu.utils.reporting import _g5

from .util import parse_golden_trace


@pytest.mark.parametrize("n,steps,fname", [
    (128, 50, "ver0_n128_s50.txt"),
    (256, 100, "ver0_n256_s100.txt"),
    (1024, 200, "ver0_n1024_s200.txt"),
    (2000, 50, "ver0_n2000_s50.txt"),
])
def test_device_trace_matches_reference(golden_dir, n, steps, fname):
    golden = parse_golden_trace(os.path.join(golden_dir, fname))
    cfg = SimConfig(n=n, nsteps=steps, kernel="naive")
    result = run(cfg, quiet=True)
    assert len(result.samples) == len(golden)
    for (s_g, ke_g), (s, ke) in zip(golden, result.kenergy_trace):
        assert s == s_g
        assert _g5(ke) == ke_g, f"step {s}: {_g5(ke)} != {ke_g}"


def test_device_trace_numeric_tolerance(golden_dir):
    # The BASELINE.md fidelity gate: 1e-4 relative on the kenergy trace.
    golden = parse_golden_trace(os.path.join(golden_dir, "ver0_n2000_s50.txt"))
    cfg = SimConfig(n=2000, nsteps=50, kernel="naive")
    result = run(cfg, quiet=True)
    for (s_g, ke_g), (_, ke) in zip(golden, result.kenergy_trace):
        assert abs(ke - float(ke_g)) <= 1e-4 * abs(float(ke_g))


def test_block_fn_equals_stepwise():
    cfg = SimConfig(n=128, kernel="naive")
    state = make_state(cfg.n)
    accel = make_accel_fn("naive")
    blk = make_block_fn(accel, 0.1, 5)
    s_block, ke_block = blk(state)

    s_loop = state
    for _ in range(5):
        s_loop = euler_step(s_loop, accel, 0.1)
    # fori_loop and eager stepping may fuse differently (ulp-level), so
    # compare with a tight tolerance rather than bitwise.
    np.testing.assert_allclose(
        np.asarray(s_block.pos), np.asarray(s_loop.pos), rtol=1e-6, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(s_block.vel), np.asarray(s_loop.vel), rtol=1e-6, atol=1e-9
    )
    assert float(ke_block) == pytest.approx(float(kinetic_energy(s_loop)), rel=1e-6)


def test_padding_does_not_change_dynamics():
    cfg_a = SimConfig(n=100, nsteps=10, kernel="naive")
    res_a = run(cfg_a, quiet=True)
    state = make_state(100, pad_multiple=64)  # padded to 128
    blk = make_block_fn(make_accel_fn("naive"), 0.1, 10)
    state2, ke2 = blk(state)
    # compare against unpadded run of the same steps
    state_u = make_state(100)
    blk_u = make_block_fn(make_accel_fn("naive"), 0.1, 10)
    state3, ke3 = blk_u(state_u)
    np.testing.assert_allclose(
        np.asarray(state2.pos)[:, :100], np.asarray(state3.pos), rtol=1e-6
    )
    assert float(ke2) == pytest.approx(float(ke3), rel=1e-6)
    assert res_a is not None


def test_momentum_conserved_through_integration():
    # Net force is zero for antisymmetric pairwise forces, so total
    # momentum sum(m*v) is conserved up to fp32 accumulation drift.
    cfg = SimConfig(n=512, nsteps=100, kernel="naive")
    state = make_state(cfg.n)
    p0 = (np.asarray(state.mass)[None, :] * np.asarray(state.vel)).sum(axis=1)
    blk = make_block_fn(make_accel_fn("naive"), 0.1, 100)
    state2, _ = blk(state)
    p1 = (np.asarray(state2.mass)[None, :] * np.asarray(state2.vel)).sum(axis=1)
    scale = np.abs(np.asarray(state2.mass)[None, :] * np.asarray(state2.vel)).sum()
    assert np.all(np.abs(p1 - p0) < 1e-5 * scale)


def test_sym_kernel_trace_matches_reference(golden_dir):
    """The pair-symmetric kernel is an fp32 production path, so it must
    hold the same golden-trace invariant as naive/pallas/fused."""
    golden = parse_golden_trace(os.path.join(golden_dir, "ver0_n256_s100.txt"))
    cfg = SimConfig(n=256, nsteps=100, kernel="pallas_sym", tile_i=128,
                    interpret=True)
    result = run(cfg, quiet=True)
    assert len(result.samples) == len(golden)
    for (s_g, ke_g), (s, ke) in zip(golden, result.kenergy_trace):
        assert s == s_g
        assert f"{ke:.5g}" == ke_g, (s, ke, ke_g)


def test_host_chunked_block_matches_block_fn():
    """The watchdog-safe host-orchestrated block (both regimes: per-step
    executables and chunked sweeps) must reproduce the single-executable
    block bit-for-bit."""
    import numpy as np

    from nbody_tpu.init import make_state
    from nbody_tpu.models.gravity import (
        make_accel_fn,
        make_block_fn,
        make_host_chunked_block_fn,
    )

    state = make_state(512, pad_multiple=128)
    accel = make_accel_fn("naive")
    for integ in ("euler", "leapfrog"):
        ref_state, ref_ke = make_block_fn(accel, 0.1, 5, integrator=integ)(
            state
        )
        # regime 1: per-step executables with the same kernel
        s1, ke1 = make_host_chunked_block_fn(
            0.1, 5, state.n_padded, accel_fn=accel, integrator=integ
        )(state)
        np.testing.assert_array_equal(
            np.asarray(s1.pos), np.asarray(ref_state.pos)
        )
        assert float(ke1) == float(ref_ke)
        # regime 2: chunked pallas sweeps (force it via a tiny budget)
        s2, ke2 = make_host_chunked_block_fn(
            0.1, 5, state.n_padded, accel_fn=None, tile_i=128, tile_j=128,
            integrator=integ, max_pairs_per_exec=128 * 512,
            interpret=True,
        )(state)
        ref2, ref2_ke = make_block_fn(
            make_accel_fn("pallas", tile_i=128, tile_j=128, interpret=True),
            0.1, 5, integrator=integ,
        )(state)
        np.testing.assert_array_equal(
            np.asarray(s2.pos), np.asarray(ref2.pos)
        )
        assert float(ke2) == float(ref2_ke)
        # regime 3: pair-symmetric chunk sweeps (diag sym kernel +
        # two-sided cross kernels; accumulation order differs from the
        # monolithic kernel, so allclose instead of bit-equality)
        s3, ke3 = make_host_chunked_block_fn(
            0.1, 5, state.n_padded, accel_fn=None,
            integrator=integ, max_pairs_per_exec=128 * 512,
            sym=True, interpret=True,
        )(state)
        np.testing.assert_allclose(
            np.asarray(s3.pos), np.asarray(ref_state.pos),
            rtol=2e-5, atol=1e-6,
        )
        assert abs(float(ke3) - float(ref_ke)) <= 1e-4 * abs(float(ref_ke))


def test_sym_chunked_sweep_matches_naive():
    """The pair-symmetric host-chunked sweep (every unordered chunk pair
    computed once) must agree with the naive all-pairs force."""
    import numpy as np

    from nbody_tpu.init import make_state
    from nbody_tpu.models.gravity import _make_sym_chunked_sweep, _sym_chunking
    from nbody_tpu.ops import naive

    state = make_state(700, pad_multiple=256)  # n_padded=768, 3 chunks
    per, block = _sym_chunking(state.n_padded, max_pairs=256 * 256)
    assert per == 256 and state.n_padded // per == 3
    assert per % block == 0
    sweep = _make_sym_chunked_sweep(state.n_padded, per, interpret=True,
                                    block=block)
    acc = np.asarray(sweep(state.pos, state.mass))
    ref = np.asarray(naive.accelerations(state.pos, state.mass))
    err = np.linalg.norm(acc - ref) / np.linalg.norm(ref)
    assert err < 5e-6, err
    # zero-mass padding stays force-neutral
    assert np.all(acc[:, state.n:] == 0.0)


def test_sym_chunking_odd_factor_block_divides():
    """Regression (round-2 advisor): padded N with an odd factor used to
    pick per > 1024 not divisible by the kernels' auto block (1024) and
    crash at runtime; the chunking must now return a block that divides
    per, and the sweep must run."""
    import numpy as np

    from nbody_tpu.init import make_state
    from nbody_tpu.models.gravity import _make_sym_chunked_sweep, _sym_chunking
    from nbody_tpu.ops import naive

    # n=4608 = 2^9 * 3^2: divisors allow per=2304 (pow2 part 256) etc.
    per, block = _sym_chunking(4608, max_pairs=1 << 40)
    assert per % block == 0 and per % 128 == 0 and 4608 % per == 0
    assert block <= 1024 and block >= 128

    # And the full sweep runs (small odd-factor case, 384 = 128*3: the
    # auto block 1024 would not divide per=384... exercised end to end).
    state = make_state(380, pad_multiple=384)  # n_padded = 384
    chunk = _sym_chunking(state.n_padded, max_pairs=128 * 384)
    assert chunk is not None
    per, block = chunk
    assert per % block == 0
    sweep = _make_sym_chunked_sweep(state.n_padded, per, interpret=True,
                                    block=block)
    acc = np.asarray(sweep(state.pos, state.mass))
    ref = np.asarray(naive.accelerations(state.pos, state.mass))
    err = np.linalg.norm(acc - ref) / np.linalg.norm(ref)
    assert err < 5e-6, err
