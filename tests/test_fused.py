"""Fused sample-block kernel (interpret mode on CPU)."""

import numpy as np
import pytest

from nbody_tpu.config import SimConfig
from nbody_tpu.init import make_state
from nbody_tpu.models.gravity import make_accel_fn, make_fused_block_fn
from nbody_tpu.models.integrators import make_block_fn
from nbody_tpu.ops.fused_block import fused_block, max_fused_n


def test_fused_matches_unfused():
    state = make_state(256)
    p, v = fused_block(
        state.pos, state.vel, state.mass, 0.1, 10,
        tile_i=128, tile_j=256, interpret=True,
    )
    blk = make_block_fn(make_accel_fn("naive"), 0.1, 10)
    want, ke = blk(state)
    np.testing.assert_allclose(np.asarray(p), np.asarray(want.pos),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(v), np.asarray(want.vel),
                               rtol=1e-6, atol=1e-10)


def test_fused_block_fn_contract():
    state = make_state(128)
    blk = make_fused_block_fn(0.1, 5, tile_i=128, tile_j=128, interpret=True)
    out, ke = blk(state)
    ublk = make_block_fn(make_accel_fn("naive"), 0.1, 5)
    want, ke_want = ublk(state)
    assert float(ke) == pytest.approx(float(ke_want), rel=1e-6)
    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(want.pos),
                               rtol=1e-6, atol=1e-8)


def test_fused_leapfrog_matches_unfused():
    state = make_state(256)
    p, v = fused_block(
        state.pos, state.vel, state.mass, 0.1, 8,
        tile_i=128, tile_j=256, integrator="leapfrog", interpret=True,
    )
    blk = make_block_fn(make_accel_fn("naive"), 0.1, 8, integrator="leapfrog")
    want, _ = blk(state)
    np.testing.assert_allclose(np.asarray(p), np.asarray(want.pos),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(v), np.asarray(want.vel),
                               rtol=1e-6, atol=1e-10)


def test_fused_tile_j_only_is_honored():
    """A tile_j-only request (the reference's dim1 arg) must reach the
    legacy columns kernel, not be silently discarded by the sym auto
    (r2 review fix).  Physics must match either way."""
    state = make_state(256)
    p, v = fused_block(
        state.pos, state.vel, state.mass, 0.1, 6, tile_j=64, interpret=True,
    )
    blk = make_block_fn(make_accel_fn("naive"), 0.1, 6)
    want, _ = blk(state)
    np.testing.assert_allclose(np.asarray(p), np.asarray(want.pos),
                               rtol=1e-6, atol=1e-8)
    # discriminator: a non-dividing tile_j must be rejected by the legacy
    # path (the old sym auto silently swallowed it)
    with pytest.raises(ValueError, match="divisible"):
        fused_block(state.pos, state.vel, state.mass, 0.1, 1, tile_j=96,
                    interpret=True)


def test_fused_size_guard():
    from nbody_tpu.ops.fused_block import max_fused_rows_n

    # Columns layout (explicit rectangular tiling): lane-padded cap.
    state = make_state(max_fused_n() + 512)
    with pytest.raises(ValueError, match="fused block supports"):
        fused_block(state.pos, state.vel, state.mass, 0.1, 1,
                    tile_i=128, tile_j=256, interpret=True)
    # Rows layout (default): the ~38x higher rows-residency cap.
    big = make_state(max_fused_rows_n() + 1024)
    with pytest.raises(ValueError, match="fused rows block supports"):
        fused_block(big.pos, big.vel, big.mass, 0.1, 1, interpret=True)
    assert max_fused_rows_n() > 30 * max_fused_n()


def test_engine_rejects_ineligible_fused():
    from nbody_tpu.simulation import run

    with pytest.raises(ValueError):
        run(SimConfig(n=128, nsteps=50, fused=True, precision="bf16"),
            quiet=True)
