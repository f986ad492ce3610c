"""RNG bit-compatibility vs GCC-12 libstdc++ fixtures."""

import os

import numpy as np

from nbody_tpu.utils.mt19937 import MT19937, generate_canonical_f32, uniform_real_f32


def _load(golden_dir, name, dtype):
    return np.fromfile(os.path.join(golden_dir, name), dtype=dtype)


def test_raw_stream_exact(golden_dir):
    golden = _load(golden_dir, "mt19937_42_raw.u32", np.uint32)
    assert np.array_equal(MT19937(42).raw(len(golden)), golden)


def test_raw_stream_chunked_reads(golden_dir):
    golden = _load(golden_dir, "mt19937_42_raw.u32", np.uint32)
    gen = MT19937(42)
    parts = [gen.raw(1), gen.raw(623), gen.raw(624), gen.raw(1000)]
    got = np.concatenate(parts)
    assert np.array_equal(got, golden[: len(got)])


def test_uniform01_exact(golden_dir):
    golden = _load(golden_dir, "mt19937_42_u01.f32", np.float32)
    got = uniform_real_f32(42, len(golden), 0.0, 1.0)
    assert got.dtype == np.float32
    assert np.array_equal(got, golden)


def test_uniform11_exact(golden_dir):
    golden = _load(golden_dir, "mt19937_42_u11.f32", np.float32)
    got = uniform_real_f32(42, len(golden), -1.0, 1.0)
    assert np.array_equal(got, golden)


def test_canonical_clamps_at_one():
    # Raw values within 128 of 2^32 round to 2^32 in fp32 and must clamp
    # to nextafter(1, 0), exactly as GCC 12's generate_canonical does.
    raw = np.array([2**32 - 1, 2**32 - 128, 2**32 - 129, 0], dtype=np.uint32)
    got = generate_canonical_f32(raw)
    clamp = np.nextafter(np.float32(1.0), np.float32(0.0))
    assert got[0] == clamp and got[1] == clamp
    assert got[2] < np.float32(1.0)
    assert got[3] == np.float32(0.0)
