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
cid.block_until_ready()
i32 = jnp.int32
ns = cid.shape[0]
print(f"ns={ns} n_cells={n_cells} cap={cap} s_max={s_max}")

def timeit(fn, args, L=8):
    def t(k):
        @jax.jit
        def go(*a):
            def body(i, c):
                return jnp.asarray(fn(*[x + (c*0).astype(x.dtype) for x in a]), jnp.float32)
            return lax.fori_loop(0, k, body, jnp.float32(0))
        f = lambda: go(*args)
        float(f()); best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); float(f()); best = min(best, time.perf_counter()-t0)
        return best
    return max(t(2*L)-t(L),1e-9)/L

order = jnp.argsort(cid).astype(i32)
sc = cid[order]
sc.block_until_ready()

cases = {
 "argsort(cid) 262k":       (lambda c: jnp.argsort(c).sum().astype(jnp.float32), (cid,)),
 "sort(cid) only":          (lambda c: jnp.sort(c).sum().astype(jnp.float32), (cid,)),
 "searchsorted(sc,cells)":  (lambda s: jnp.searchsorted(s, jnp.arange(n_cells, dtype=i32)).sum().astype(jnp.float32), (sc,)),
 "scatmin+revcummin":       (lambda s: lax.cummin(jnp.full((n_cells,), ns, i32).at[jnp.clip(s, 0, n_cells-1)].min(jnp.arange(ns, dtype=i32), mode="drop"), reverse=True).sum().astype(jnp.float32), (sc,)),
 "bincount scatter-add":    (lambda c: jnp.zeros((n_cells+1,), i32).at[c].add(1, mode="drop").sum().astype(jnp.float32), (cid,)),
 "gather262k":              (lambda o: cid[o].sum().astype(jnp.float32), (order,)),
 "scatter262k set":         (lambda o: jnp.zeros((ns,), i32).at[o].set(jnp.arange(ns, dtype=i32)).sum().astype(jnp.float32), (order,)),
 "full _sr_pack":           (lambda c: sum(x.sum().astype(jnp.float32) for x in pm._sr_pack(c, pos, mass, n_cells, cap, s_max)[:4]), (cid,)),
}
for name, (fn, args) in cases.items():
    print(f"{name:>24}: {timeit(fn, args)*1e3:7.2f} ms", flush=True)
