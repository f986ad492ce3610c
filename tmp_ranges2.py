import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from nbody_tpu.__main__ import _enable_compilation_cache
_enable_compilation_cache()
from nbody_tpu.init import make_state
from nbody_tpu.ops import pm

state = make_state(262144, pad_multiple=1024, distribution="plummer", seed=7)
pos, mass = state.pos.astype(jnp.float32), state.mass.astype(jnp.float32)
plan = pm.suggest_sr_plan(pos, mass, 128, pm.DEFAULT_CUTOFF_CELLS)
cap, s_max, e_max = plan["capacity"], plan["sr_slabs"], plan["sr_entries"]
nc, sub = pm._cell_grid_params(128, pm.DEFAULT_CUTOFF_CELLS)
n_cells = nc**3
lo_box, hi_box = pm._robust_box(pos, mass)
span = hi_box - lo_box
inc = (mass * pm._inside(pos, lo_box, hi_box)) > 0
cid = pm._bin_cids(pos, lo_box, span, nc, inc)
ptab, mtab, slab_lo, slab_hi, _, _ = pm._sr_pack(cid, pos, mass, n_cells, cap, s_max)
slab_lo.block_until_ready()

def timeit(fn, args, L=8):
    def t(k):
        @jax.jit
        def go(*a):
            def body(i, c):
                out = fn(*[x + (c * 0).astype(x.dtype) for x in a])
                return jnp.asarray(out, jnp.float32)
            return lax.fori_loop(0, k, body, jnp.float32(0))
        f = lambda: go(*args)
        float(f()); best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); float(f()); best = min(best, time.perf_counter()-t0)
        return best
    return max(t(2*L)-t(L),1e-9)/L

for sym, pr, label in ((True, True, "paired_sym"), (False, False, "plain")):
    def run(slo, shi):
        wl_t, wl_s, n_e = pm._sr_ranges(slo, shi, nc, sub, e_max, symmetric=sym, paired=pr)
        return (wl_t.sum() + wl_s.sum() + n_e).astype(jnp.float32)
    t = timeit(run, (slab_lo, slab_hi))
    print(f"_sr_ranges isolated ({label}, e_max={e_max}): {t*1e3:.2f} ms")
