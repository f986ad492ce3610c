#!/usr/bin/env bash
# TPU acceptance check: runs the parity configuration on the default
# accelerator with both kernel paths and diffs the kenergy column against
# the golden reference capture.  Exits non-zero on any mismatch.
set -euo pipefail
cd "$(dirname "$0")/.."

GOLDEN=tests/golden/ver0_n2000_s500.txt
extract() { grep -E '^\s+[0-9]+' | awk '{print $1, $3}'; }

want="$(extract < "$GOLDEN")"
for args in "--kernel pallas" "--kernel pallas_sym" "--fused" \
            "--kernel pallas --precision bf16" "--precision bf16"; do
    echo "== python -m nbody_tpu 2000 500 $args"
    got="$(python -m nbody_tpu 2000 500 $args 2>/dev/null | extract)"
    if [[ "$args" == *"bf16"* ]]; then
        # bf16 distances: trajectory-level agreement is not expected in the
        # chaotic regime; just require a sane finite trace.
        echo "$got" | awk '{if ($2+0 != $2) exit 1}' \
            && echo "   bf16 trace finite ok" || { echo "FAIL"; exit 1; }
    elif [ "$got" = "$want" ]; then
        echo "   kenergy trace matches reference exactly"
    else
        echo "FAIL: trace mismatch"; diff <(echo "$want") <(echo "$got") || true
        exit 1
    fi
done
# PM tier (approximate O(N log N) mesh solve): no golden gate; require a
# finite trace plus a bounded force error vs the exact kernel.
echo "== python -m nbody_tpu 65536 10 --kernel pm"
python -m nbody_tpu 65536 10 --sfreq 5 --kernel pm 2>/dev/null | extract \
    | awk '{if ($2+0 != $2) exit 1}' \
    && echo "   pm trace finite ok" || { echo "FAIL: pm trace"; exit 1; }
python - <<'PY'
from nbody_tpu.__main__ import _enable_compilation_cache
_enable_compilation_cache()  # new shapes remote-compile in 1-300 s; reuse
from nbody_tpu.init import make_state
from nbody_tpu.ops import pm
state = make_state(65536, pad_multiple=1024)
err = float(pm.force_error_vs_exact(state.pos, state.mass, 128))
assert err < 5e-3, f"pm force error regression: {err}"
print(f"   pm force error ok ({err:.2e} rel L2 at ng=128)")
PY
# P3M tier: clustered-IC accuracy (the round-3 headline claim) plus
# compiled Pallas-sweep/XLA-sweep agreement on the real chip.
echo "== p3m short-range tier (Plummer accuracy + Pallas sweep parity)"
python - <<'PY'
from nbody_tpu.__main__ import _enable_compilation_cache
_enable_compilation_cache()  # new shapes remote-compile in 1-300 s; reuse
import numpy as np
from nbody_tpu.models.distributions import plummer
from nbody_tpu.ops import pm
pos, _, mass = plummer(8192, seed=1)
plan = pm.suggest_sr_plan(pos, mass, 128, 4)
err = float(pm.force_error_vs_exact(pos, mass, 128, 4, plan["capacity"]))
assert err < 8e-3, f"p3m clustered force error regression: {err}"
print(f"   p3m Plummer force error ok ({err:.2e} rel L2 at ng=128)")
import jax
kw = dict(grid=64, cutoff_cells=4, capacity=plan["capacity"])
# Fresh jit per impl: eager dispatch is minutes-slow over the tunnel,
# and a shared jit cache would bake the first knob value.
a_p = np.asarray(jax.jit(
    lambda p, m: pm.accelerations(p, m, **kw))(pos, mass))
pm.SR_SWEEP_IMPL = "xla"
try:
    a_x = np.asarray(jax.jit(
        lambda p, m: pm.accelerations(p, m, **kw))(pos, mass))
finally:
    pm.SR_SWEEP_IMPL = "auto"
d = float(np.abs(a_p - a_x).max() / np.abs(a_x).max())
assert d < 5e-5, f"pallas/xla sweep disagreement: {d}"
print(f"   p3m pallas sweep agrees with xla ({d:.1e})")
# Layout variants must also survive their FIRST Mosaic compile and
# agree: paired rows (parity conds + half-row RMW) and paired+symmetric
# (per-lane slab masks + reaction).  See pm.SR_PAIRED_ROWS/SR_SYMMETRIC.
for pr, sym, name in ((True, False, "paired"), (True, True, "pair-sym"),
                      (False, True, "sym")):
    pm.SR_PAIRED_ROWS, pm.SR_SYMMETRIC = pr, sym
    try:
        a_v = np.asarray(jax.jit(
            lambda p, m: pm.accelerations(p, m, **kw))(pos, mass))
    finally:
        pm.SR_PAIRED_ROWS, pm.SR_SYMMETRIC = False, False
    d = float(np.abs(a_v - a_x).max() / np.abs(a_x).max())
    assert d < 5e-5, f"{name} sweep disagreement: {d}"
    print(f"   p3m {name} sweep agrees with xla ({d:.1e})")
PY
# Periodic boundary mode: the closed-form-spectrum mesh + ghost-image
# short range on the real chip, gated against ANALYTIC truths (exact
# min-image pair force; momentum closure) so the check is
# backend-independent.
echo "== periodic boundary mode (pm + p3m)"
python - <<'PY'
from nbody_tpu.__main__ import _enable_compilation_cache
_enable_compilation_cache()  # new shapes remote-compile in 1-300 s; reuse
import numpy as np
from nbody_tpu.ops import pm
pos = np.array([[0.01, 0.99], [0.5, 0.5], [0.5, 0.5]], np.float32)
mass = np.array([2.0, 3.0], np.float32)
G, eps2 = 6.67259e-11, 1e-3
exact = G * mass[1] * -0.02 * (0.02 ** 2 + eps2) ** -1.5
import jax
a = np.asarray(jax.jit(lambda p, m: pm.accelerations(
    p, m, grid=32, cutoff_cells=4, boundary="periodic",
    box_size=1.0))(pos, mass))
d = abs(a[0, 0] - exact) / abs(exact)
assert d < 0.05, f"periodic p3m straddling-pair error: {d}"
print(f"   periodic p3m min-image pair ok ({d:.1e} rel)")
rng = np.random.default_rng(5)
pos = np.asarray((0.06 * rng.standard_normal((3, 96))) % 1.0, np.float32)
mass = np.asarray(1.0 + rng.random(96), np.float32)
plan = pm.suggest_sr_plan(pos, mass, 32, 4, boundary="periodic",
                          box_size=1.0)
a = np.asarray(jax.jit(lambda p, m: pm.accelerations(
    p, m, grid=32, cutoff_cells=4, boundary="periodic", box_size=1.0,
    **plan))(pos, mass))
p_dot = np.abs((mass * a).sum(axis=1))
scale = np.abs(mass[None, :] * a).sum(axis=1)
assert np.all(p_dot < 1e-4 * scale), f"periodic momentum leak: {p_dot}"
print("   periodic p3m momentum closed ok")
# Linear-theory absolute normalization on the REAL chip: a Zel'dovich
# plane wave on a cold lattice must feel a = 4 pi G rho (ke)K1(ke) xi
# (0.4% on CPU — tests/test_p3m.py; gate 2% covers backend fp drift).
import jax.numpy as jnp
from nbody_tpu.types import G_NEWTON, SOFTENING_SQUARED
nl = 16
q1 = (np.arange(nl) + 0.5) / nl
qx, qy, qz = np.meshgrid(q1, q1, q1, indexing="ij")
q = np.stack([qx.ravel(), qy.ravel(), qz.ravel()]).astype(np.float32)
k, A = np.float32(2 * np.pi), np.float32(0.002)
p = q.copy(); p[0] += A * np.sin(k * q[0])
m = np.full((nl ** 3,), 1.0 / nl ** 3, np.float32)
a = np.asarray(jax.jit(lambda p_, m_: pm.accelerations(
    p_, m_, grid=32, boundary="periodic", box_size=1.0))(p, m))
proj = 2.0 / nl ** 3 * np.sum(a[0] * np.sin(k * q[0]))
pred = float(4 * np.pi * G_NEWTON
             * pm._xk1(jnp.float32(k * np.sqrt(SOFTENING_SQUARED))) * A)
d = abs(proj / pred - 1.0)
assert d < 0.02, f"linear-response normalization off: {d:.3e}"
print(f"   periodic linear response ok ({d:.1e} vs 4piG rho xK1(x))")
PY
# The parity runs above already proved the device reachable — skip
# bench.py's subprocess probe (a duplicate backend handshake) here.
export NBODY_BENCH_SKIP_PROBE=1
bench_json="$(python bench.py 2>/dev/null | tail -1)"
echo "$bench_json"
python - "$bench_json" <<'PY'
import json, sys
r = json.loads(sys.argv[1])
assert r["vs_baseline"] > 500, f"performance regression: {r['vs_baseline']}x"
print(f"   perf sanity ok ({r['vs_baseline']}x baseline)")
PY
# Per-config perf-regression gate: floors pinned to measured round-2/3
# rates (bench.py GATES); any tier below its floor fails the check.
echo "== python bench.py --gate"
python bench.py --gate
echo "TPU acceptance: OK"
