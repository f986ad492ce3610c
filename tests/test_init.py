"""Initial-condition fidelity and padding properties."""

import numpy as np

from nbody_tpu.init import make_state, reference_init_arrays
from nbody_tpu.state import pad_state, round_up


def test_shapes_and_dtypes():
    pos, vel, mass = reference_init_arrays(100)
    assert pos.shape == (3, 100) and vel.shape == (3, 100)
    assert mass.shape == (100,)
    assert pos.dtype == vel.dtype == mass.dtype == np.float32


def test_field_distributions():
    pos, vel, mass = reference_init_arrays(2000)
    assert (pos >= 0).all() and (pos < 1).all()
    assert (np.abs(vel) <= 1.0e-3).all()
    assert (mass >= 0).all() and (mass < 2000).all()


def test_mass_reuses_position_draw_stream():
    # Both fields re-seed mt19937(42) (ver0/GSimulation.cpp:47,:86), so
    # mass[i] = N * (the draw that pos consumed as its i-th value).
    n = 64
    pos, _, mass = reference_init_arrays(n)
    flat_draws = pos.T.reshape(-1)  # reference draw order
    assert np.array_equal(mass, (np.float32(n) * flat_draws[:n]).astype(np.float32))


def test_padding_zero_mass():
    pos, vel, mass = reference_init_arrays(10)
    st = pad_state(pos, vel, mass, 16)
    assert st.n == 10 and st.n_padded == 16
    assert np.asarray(st.mass)[10:].sum() == 0
    # real particles unchanged
    assert np.array_equal(np.asarray(st.pos)[:, :10], pos)


def test_make_state_pad_multiple():
    st = make_state(2000, pad_multiple=512)
    assert st.n_padded == round_up(2000, 512) == 2048


def test_aos_roundtrip():
    from nbody_tpu.state import AOS_DTYPE, from_aos, to_aos

    st = make_state(50, pad_multiple=16)
    aos = to_aos(st)
    assert aos.dtype == AOS_DTYPE and len(aos) == 50
    assert np.all(aos["acc"] == 0)
    back = from_aos(aos, pad_multiple=16)
    assert back.n == 50 and back.n_padded == 64
    np.testing.assert_array_equal(
        np.asarray(back.pos)[:, :50], np.asarray(st.pos)[:, :50]
    )
    np.testing.assert_array_equal(np.asarray(back.mass), np.asarray(st.mass))
