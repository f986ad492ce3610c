"""True multi-process distribution: two OS processes, each with four
virtual CPU devices, forming one 8-device global mesh with cross-process
collectives (the DCN analog of the reference's mpirun workflow —
ver5_all/GSimulation.cpp:93-115 — which the reference itself never tests)."""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = """
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
port, pid, repo = sys.argv[1], int(sys.argv[2]), sys.argv[3]
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=2, process_id=pid)
sys.path.insert(0, repo)
from nbody_tpu.init import make_state
from nbody_tpu.parallel.decompose import make_sharded_block_fn, shard_state
from nbody_tpu.parallel.mesh import make_mesh

mesh = make_mesh(8)
state = make_state(512, pad_multiple=8)
sharded, _ = shard_state(state, 8, mesh=mesh)
blk = make_sharded_block_fn("naive", {}, 0.1, 5, mesh, comm="ring")
out, ke = blk(sharded)
print("KE_RESULT", float(ke))
# Distributed mesh solve across the SAME 2-process mesh: the grid psum
# (pm.sharded_accelerations) crosses the process boundary over DCN.
blk_pm = make_sharded_block_fn("pm", dict(grid=16), 0.1, 5, mesh,
                               comm="allgather")
out_pm, ke_pm = blk_pm(sharded)
print("KE_PM_RESULT", float(ke_pm))
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_ring_matches_single_device(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    port = str(_free_port())

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), port, str(pid), repo],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, env=env,
            text=True,
        )
        for pid in (0, 1)
    ]
    kes, kes_pm = [], []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        assert p.returncode == 0, out
        for line in out.splitlines():
            if line.startswith("KE_RESULT"):
                kes.append(float(line.split()[1]))
            elif line.startswith("KE_PM_RESULT"):
                kes_pm.append(float(line.split()[1]))
    assert len(kes) == 2 and kes[0] == kes[1]
    assert len(kes_pm) == 2 and kes_pm[0] == kes_pm[1]

    # single-device reference values (in this process)
    from nbody_tpu.init import make_state
    from nbody_tpu.models.gravity import make_accel_fn
    from nbody_tpu.models.integrators import make_block_fn

    state = make_state(512, pad_multiple=8)
    blk = make_block_fn(make_accel_fn("naive"), 0.1, 5)
    _, ke_ref = blk(state)
    assert kes[0] == pytest.approx(float(ke_ref), rel=1e-5)
    blk_pm = make_block_fn(make_accel_fn("pm", grid=16), 0.1, 5)
    _, ke_pm_ref = blk_pm(state)
    assert kes_pm[0] == pytest.approx(float(ke_pm_ref), rel=1e-5)


_ORBAX_WORKER = """
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
port, pid, repo, ckdir = sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4]
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=2, process_id=pid)
sys.path.insert(0, repo)
import numpy as np
from jax.sharding import NamedSharding
from nbody_tpu.init import make_state
from nbody_tpu.parallel.decompose import (make_sharded_block_fn,
                                          shard_state, state_specs)
from nbody_tpu.parallel.mesh import make_mesh
from nbody_tpu.state import ParticleState
from nbody_tpu.utils.checkpoint import load_state_orbax, save_state_orbax

mesh = make_mesh(8)
state = make_state(512, pad_multiple=8)
sharded, _ = shard_state(state, 8, mesh=mesh)
# Save ACROSS the 2-process mesh: each process writes only its own
# device shards; orbax coordinates the commit over jax.distributed.
save_state_orbax(ckdir, sharded, step=42)
restored, step = load_state_orbax(ckdir)
assert step == 42 and restored.n == 512, (step, restored.n)
specs = state_specs()
pos = jax.device_put(restored.pos, NamedSharding(mesh, specs.pos))
vel = jax.device_put(restored.vel, NamedSharding(mesh, specs.vel))
mass = jax.device_put(restored.mass, NamedSharding(mesh, specs.mass))
blk = make_sharded_block_fn("naive", {}, 0.1, 5, mesh, comm="ring")
_, ke_restored = blk(ParticleState(pos=pos, vel=vel, mass=mass,
                                   n=restored.n))
_, ke_orig = blk(sharded)
assert float(ke_restored) == float(ke_orig)
print("KE_CKPT_RESULT", float(ke_restored))
"""


@pytest.mark.slow
def test_two_process_orbax_save_restore(tmp_path):
    """The multi-host checkpoint path end-to-end: a state sharded over a
    2-process 8-device mesh is orbax-saved from device shards (each
    process writing only its own), restored in both processes,
    device_put back onto the mesh sharding, and steps identically to
    the original — the restart workflow a pod run would use
    (checkpoint.py save_state_orbax/load_state_orbax)."""
    pytest.importorskip("orbax.checkpoint")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = tmp_path / "worker_orbax.py"
    worker.write_text(_ORBAX_WORKER)
    port = str(_free_port())
    ckdir = str(tmp_path / "ck_orbax")

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), port, str(pid), repo, ckdir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for pid in (0, 1)
    ]
    kes = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        assert p.returncode == 0, out
        kes += [float(l.split()[1]) for l in out.splitlines()
                if l.startswith("KE_CKPT_RESULT")]
    assert len(kes) == 2 and kes[0] == kes[1]

    # The directory is also restorable by a plain SINGLE-process run
    # (the pod-to-single-host migration path).
    from nbody_tpu.utils.checkpoint import load_state
    state, step = load_state(ckdir, pad_multiple=8)
    assert step == 42 and state.n == 512


@pytest.mark.slow
def test_pod_launcher_rank_gating(tmp_path):
    """scripts/pod_run.sh reproduces the hand-built 2-process mesh above
    with one command, and only rank 0 emits the banner/table (reference
    behavior: ver5_all/GSimulation.cpp:119 gates output on rank 0)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["NBODY_LOG_DIR"] = str(tmp_path)
    res = subprocess.run(
        ["bash", os.path.join(repo, "scripts", "pod_run.sh"), "2",
         "512", "50", "cpu", "0.5", "--platform", "cpu", "--shards", "8",
         "--kernel", "naive"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=240,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    rank0 = (tmp_path / "rank0.out").read_text()
    rank1 = (tmp_path / "rank1.out").read_text()
    assert " Initialize Gravity Simulation" in rank0
    # the device-token echo (ver5_all/main.cpp:42) is rank-0-only too
    assert "cpu" in rank0.splitlines()
    assert any(l.startswith(" 50 ") for l in rank0.splitlines())
    # rank 1 may leak transport-layer chatter (Gloo) but nothing of ours
    own = [l for l in rank1.splitlines()
           if l.strip() and not l.startswith("[Gloo]")]
    assert own == [], own
