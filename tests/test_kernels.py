"""Kernel equivalence: every registered device kernel must agree with the
fp64 oracle forces (single evaluation, tight relative error) and with each
other.  The Pallas kernel runs in interpreter mode on CPU."""

import numpy as np
import pytest

from nbody_tpu.init import reference_init_arrays
from nbody_tpu.oracle import accelerations_ref64
from nbody_tpu.ops import naive, pallas_kernel, pallas_mxu, pallas_sym, registry


def _rel_err(got, want):
    scale = np.abs(want) + np.abs(want).max() * 1e-3
    return np.max(np.abs(got - want) / scale)


@pytest.fixture(scope="module")
def system():
    pos, vel, mass = reference_init_arrays(512)
    acc64 = accelerations_ref64(pos, mass)
    return pos, mass, acc64


def test_naive_matches_oracle(system):
    pos, mass, acc64 = system
    acc = np.asarray(naive.accelerations(pos, mass))
    assert _rel_err(acc, acc64) < 2e-5


def test_naive_chunking_invariance(system):
    pos, mass, _ = system
    a1 = np.asarray(naive.accelerations(pos, mass, chunk=512))
    a2 = np.asarray(naive.accelerations(pos, mass, chunk=128))
    np.testing.assert_allclose(a1, a2, rtol=2e-6, atol=1e-12)


def test_pallas_matches_naive(system):
    pos, mass, _ = system
    want = np.asarray(naive.accelerations(pos, mass))
    got = np.asarray(
        pallas_kernel.accelerations(
            pos, mass, tile_i=128, tile_j=256, interpret=True
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-12)


def test_pallas_matches_oracle(system):
    pos, mass, acc64 = system
    got = np.asarray(
        pallas_kernel.accelerations(
            pos, mass, tile_i=128, tile_j=128, interpret=True
        )
    )
    assert _rel_err(got, acc64) < 2e-5


def test_pallas_tile_invariance(system):
    pos, mass, _ = system
    a1 = np.asarray(
        pallas_kernel.accelerations(pos, mass, tile_i=256, tile_j=512, interpret=True)
    )
    a2 = np.asarray(
        pallas_kernel.accelerations(pos, mass, tile_i=128, tile_j=128, interpret=True)
    )
    np.testing.assert_allclose(a1, a2, rtol=2e-5, atol=1e-12)


def _l2_rel(got, want):
    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    return np.linalg.norm(got - want) / np.linalg.norm(want)


def test_bf16_distance_mode(system):
    pos, mass, acc64 = system
    got = np.asarray(
        naive.accelerations(pos, mass, dist_dtype="bfloat16")
    )
    # bf16 deltas carry ~2.4 decimal digits; individual components with
    # strong cancellation are noisy, but the field error norm stays small.
    assert _l2_rel(got, acc64) < 5e-3
    got_p = np.asarray(
        pallas_kernel.accelerations(
            pos, mass, tile_i=128, tile_j=128, dist_dtype="bfloat16",
            interpret=True,
        )
    )
    assert _l2_rel(got_p, acc64) < 5e-3


def test_bf16_sym_matches_streaming_bf16(system):
    """VERDICT-r2 item 3: the pair-symmetric kernel supports the
    bf16-distance mode (same delta-rounding semantics as the streaming
    kernel — _bf16_round rounds fp32 deltas through bf16, arithmetic
    stays fp32), so BASELINE config 3 is no longer streaming-only."""
    pos, mass, acc64 = system
    want = np.asarray(
        naive.accelerations(pos, mass, dist_dtype="bfloat16")
    )
    got = np.asarray(
        pallas_sym.accelerations(
            pos, mass, block=128, dist_dtype="bfloat16", interpret=True
        )
    )
    # identical per-pair geometry, different accumulation order only
    assert _l2_rel(got, want) < 2e-6
    assert _l2_rel(got, acc64) < 5e-3
    # momentum conservation survives the rounding: rounding commutes
    # with negation, so F_ji = -F_ij stays exact pairwise.
    mom = (np.asarray(got, np.float64) * np.asarray(mass, np.float64)).sum(1)
    scale = np.abs(np.asarray(got, np.float64) * mass).sum(1).max()
    assert np.abs(mom).max() < 1e-3 * scale


def test_bf16_two_sided_matches_streaming_bf16(system):
    """Two-sided (action/reaction) sweep in bf16-distance mode: both
    outputs must match the streaming between-kernel's bf16 geometry."""
    pos, mass, _ = system
    nt = 256
    pt, mt = pos[:, :nt], mass[:nt]
    ps, ms = pos[:, nt:], mass[nt:]
    acc_t, acc_s = pallas_sym.accelerations_two_sided(
        pt, mt, ps, ms, block=128, dist_dtype="bfloat16", interpret=True
    )
    ref_t = naive.accelerations_between(pt, ps, ms, dist_dtype="bfloat16")
    ref_s = naive.accelerations_between(ps, pt, mt, dist_dtype="bfloat16")
    assert _l2_rel(acc_t, ref_t) < 2e-6
    assert _l2_rel(acc_s, ref_s) < 2e-6


def test_mxu_kernel_matches_naive(system):
    pos, mass, acc64 = system
    want = np.asarray(naive.accelerations(pos, mass))
    got = np.asarray(
        pallas_mxu.accelerations(
            pos, mass, tile_i=128, tile_j=128, interpret=True
        )
    )
    # the |r|^2 expansion loses a few bits on close pairs; field norm tight
    assert _l2_rel(got, want) < 1e-4
    assert _l2_rel(got, acc64) < 1e-4


def test_registry_names():
    assert set(registry.available()) >= {"naive", "pallas", "pallas_mxu", "auto"}
    assert registry.resolve("auto") in ("naive", "pallas")
    with pytest.raises(KeyError):
        registry.get("bogus")


def test_between_consistency(system):
    pos, mass, _ = system
    whole = np.asarray(naive.accelerations(pos, mass))
    half = np.asarray(
        naive.accelerations_between(pos[:, :256], pos, mass)
    )
    np.testing.assert_allclose(half, whole[:, :256], rtol=1e-6)


def test_self_interaction_exactly_zero():
    # A single particle exerts no force on itself (dx=0 -> contribution 0),
    # matching the reference's unmasked diagonal (ver0/GSimulation.cpp:132-147).
    pos = np.zeros((3, 1), np.float32)
    mass = np.ones(1, np.float32)
    acc = np.asarray(naive.accelerations(pos, mass, chunk=1))
    assert np.all(acc == 0)


def test_zero_mass_sources_contribute_nothing(system):
    pos, mass, _ = system
    acc_ref = np.asarray(naive.accelerations_between(pos[:, :128], pos, mass))
    pos_aug = np.concatenate([pos, pos[:, :64]], axis=1)  # duplicate positions
    mass_aug = np.concatenate([mass, np.zeros(64, np.float32)])
    acc_aug = np.asarray(
        naive.accelerations_between(pos[:, :128], pos_aug, mass_aug)
    )
    np.testing.assert_array_equal(acc_ref, acc_aug)


def test_momentum_conservation():
    # Sum_i m_i * a_i = 0 for pairwise-antisymmetric forces (the softened
    # kernel is antisymmetric because w_ij depends only on |r_i - r_j|).
    pos, _, mass = reference_init_arrays(256)
    acc = np.asarray(naive.accelerations(pos, mass)).astype(np.float64)
    net = (mass.astype(np.float64)[None, :] * acc).sum(axis=1)
    scale = np.abs(mass[None, :] * acc).sum()
    assert np.all(np.abs(net) < 1e-7 * scale)


def test_chunked_dispatch_bit_identical():
    """Watchdog-safe chunked dispatch (max_pairs_per_call) must reproduce
    the single-call sweep bit-for-bit: same tiles, same accumulation
    order, just split across sequential pallas_calls."""
    import numpy as np

    from nbody_tpu.init import make_state
    from nbody_tpu.ops import pallas_kernel

    state = make_state(1024, pad_multiple=256)
    pos, mass = state.pos, state.mass
    one = pallas_kernel.accelerations_between(
        pos, pos, mass, tile_i=128, tile_j=256, interpret=True,
        max_pairs_per_call=0,
    )
    chunked = pallas_kernel.accelerations_between(
        pos, pos, mass, tile_i=128, tile_j=256, interpret=True,
        max_pairs_per_call=256 * 1024,  # forces 4 chunks of 256 targets
    )
    np.testing.assert_array_equal(np.asarray(one), np.asarray(chunked))


def test_pallas_sym_matches_naive():
    """Pair-symmetric kernel vs the naive oracle (interpret mode)."""
    import numpy as np

    from nbody_tpu.init import make_state
    from nbody_tpu.ops import naive, pallas_sym

    state = make_state(1500, pad_multiple=512)  # padded tail exercised
    pos, mass = state.pos, state.mass
    ref = np.asarray(naive.accelerations(pos, mass))
    for b in (256, 512):
        sym = np.asarray(
            pallas_sym.accelerations(pos, mass, block=b, interpret=True)
        )
        err = np.linalg.norm(sym - ref) / np.linalg.norm(ref)
        assert err < 5e-6, (b, err)


def test_pallas_sym_mxu_reduce_matches():
    """The MXU-offloaded reduction variant (documented negative result
    for speed, docs/DESIGN.md) must stay numerically equivalent."""
    import numpy as np

    from nbody_tpu.init import make_state
    from nbody_tpu.ops import pallas_sym

    state = make_state(512, pad_multiple=256)
    ref = np.asarray(
        pallas_sym.accelerations(state.pos, state.mass, block=256,
                                 interpret=True)
    )
    mxu = np.asarray(
        pallas_sym.accelerations(state.pos, state.mass, block=256,
                                 mxu_reduce=True, interpret=True)
    )
    err = np.linalg.norm(mxu - ref) / np.linalg.norm(ref)
    assert err < 1e-6, err


def test_pallas_sym_auto_block_vmem_aware():
    """The auto block pick must shrink at huge N so the (8,N) residency
    plus the pair intermediates stay inside v5e VMEM — and the auto
    registry dispatch must share the same rule (a forced DEFAULT_BLOCK at
    N=1M exceeds the chip; VERDICT r2 regression guard)."""
    from nbody_tpu.ops.pallas_sym import DEFAULT_BLOCK, auto_block

    assert auto_block(65536) == DEFAULT_BLOCK
    assert auto_block(786432) == DEFAULT_BLOCK  # 64*N == 48 MB boundary
    assert auto_block(786432 + 512) == 512
    assert auto_block(1048576) == 512


def test_registry_auto_uses_vmem_aware_block(monkeypatch):
    """kernel='auto' must defer to pallas_sym's auto block when the user
    gave none — not force DEFAULT_BLOCK (which exceeds VMEM at N=1M)."""
    import numpy as np

    from nbody_tpu.ops import registry

    seen = {}

    def spy(pos, mass, block=0, **opts):
        seen["block"] = block
        return np.zeros_like(pos)

    monkeypatch.setattr(registry.pallas_sym, "accelerations", spy)
    monkeypatch.setattr(registry.jax, "default_backend", lambda: "tpu")
    n = 1048576
    registry._auto_self(np.zeros((3, n), np.float32), np.ones(n, np.float32))
    assert seen["block"] == 512
    # an explicit block is still honored
    registry._auto_self(np.zeros((3, n), np.float32), np.ones(n, np.float32),
                        block=256)
    assert seen["block"] == 256


def test_pallas_sym_guards():
    import numpy as np
    import pytest as _pytest

    from nbody_tpu.ops import pallas_sym

    pos = np.zeros((3, 512), np.float32)
    mass = np.ones(512, np.float32)
    with _pytest.raises(ValueError, match="divisible"):
        pallas_sym.accelerations(pos, mass, block=300)


def test_two_sided_block_matches_naive():
    """accelerations_two_sided returns both the action on targets and
    the reaction on sources from one sweep (the half-ring building
    block)."""
    import numpy as np

    from nbody_tpu.init import make_state
    from nbody_tpu.ops import naive, pallas_sym

    a = make_state(256, pad_multiple=64)
    b = make_state(192, pad_multiple=64, distribution="plummer", seed=3)
    acc_t, acc_s = pallas_sym.accelerations_two_sided(
        a.pos, a.mass, b.pos, b.mass, block=64, interpret=True
    )
    ref_t = naive.accelerations_between(a.pos, b.pos, b.mass)
    ref_s = naive.accelerations_between(b.pos, a.pos, a.mass)
    np.testing.assert_allclose(
        np.asarray(acc_t), np.asarray(ref_t), rtol=3e-5, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(acc_s), np.asarray(ref_s), rtol=3e-5, atol=1e-8
    )
