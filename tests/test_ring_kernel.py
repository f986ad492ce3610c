"""Fused RDMA ring kernel: in-kernel remote DMAs around the virtual mesh
must reproduce the XLA-collective ring and the single-device kernels
(interpreter mode on the 8-virtual-device CPU mesh)."""

import numpy as np
import pytest

import jax
from jax.sharding import PartitionSpec as P

from nbody_tpu.init import make_state
from nbody_tpu.models.gravity import make_accel_fn
from nbody_tpu.models.integrators import make_block_fn
from nbody_tpu.ops import naive
from nbody_tpu.parallel.decompose import (
    make_sharded_block_fn,
    shard_state,
    shard_map,
)
from nbody_tpu.parallel.mesh import AXIS
from nbody_tpu.parallel.ring_kernel import ring_accelerations

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)

OPTS = dict(tile_i=32, tile_j=64, interpret=True)


def test_ring_kernel_forces_match_naive():
    state = make_state(512, pad_multiple=8)
    sharded, mesh = shard_state(state, 8)

    def accel(pos_l, mass_l):
        return ring_accelerations(pos_l, mass_l, 8, **OPTS)

    sm = shard_map(
        accel, mesh=mesh,
        in_specs=(P(None, AXIS), P(AXIS)),
        out_specs=P(None, AXIS),
        check_vma=False,
    )
    got = np.asarray(jax.jit(sm)(sharded.pos, sharded.mass))
    want = np.asarray(naive.accelerations(state.pos, state.mass))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-10)


def test_rdma_block_matches_single_device():
    n, steps = 512, 6
    state = make_state(n, pad_multiple=8)
    blk1 = make_block_fn(make_accel_fn("naive"), 0.1, steps)
    ref_state, ref_ke = blk1(state)

    sharded, mesh = shard_state(state, 8)
    blk = make_sharded_block_fn("pallas", OPTS, 0.1, steps, mesh, comm="rdma")
    out_state, ke = blk(sharded)
    np.testing.assert_allclose(
        np.asarray(out_state.pos), np.asarray(ref_state.pos), rtol=2e-5,
        atol=1e-9,
    )
    assert float(ke) == pytest.approx(float(ref_ke), rel=1e-4)


def test_rdma_matches_xla_ring():
    n, steps = 256, 4
    state = make_state(n, pad_multiple=8)
    sharded, mesh = shard_state(state, 8)
    rdma = make_sharded_block_fn("pallas", OPTS, 0.1, steps, mesh, comm="rdma")
    xla = make_sharded_block_fn("naive", {}, 0.1, steps, mesh, comm="ring")
    st_a, ke_a = rdma(sharded)
    st_b, ke_b = xla(sharded)
    np.testing.assert_allclose(
        np.asarray(st_a.pos), np.asarray(st_b.pos), rtol=2e-5, atol=1e-10
    )
    assert float(ke_a) == pytest.approx(float(ke_b), rel=1e-5)


def test_rdma_leapfrog():
    n, steps = 256, 4
    state = make_state(n, pad_multiple=8)
    blk1 = make_block_fn(make_accel_fn("naive"), 0.1, steps,
                         integrator="leapfrog")
    ref_state, ref_ke = blk1(state)
    sharded, mesh = shard_state(state, 8)
    blk = make_sharded_block_fn("pallas", OPTS, 0.1, steps, mesh,
                                comm="rdma", integrator="leapfrog")
    out_state, ke = blk(sharded)
    np.testing.assert_allclose(
        np.asarray(out_state.pos), np.asarray(ref_state.pos), rtol=2e-5,
        atol=1e-9,
    )
    assert float(ke) == pytest.approx(float(ref_ke), rel=1e-4)
