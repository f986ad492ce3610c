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
i32 = jnp.int32
print(f"s_max={s_max} e_max={e_max} nc={nc} sub={sub} n_cells={n_cells}")

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

offs = sorted((ox * nc + oy) * nc for ox in range(-sub, sub + 1) for oy in range(-sub, sub + 1))
off_arr = jnp.asarray(offs, i32)[None, :]
n_rows = off_arr.shape[1]

def windows(slab_lo, slab_hi):
    lo_w = slab_lo[:, None] + (off_arr - sub)
    hi_w = jnp.minimum(slab_hi[:, None] + (off_arr + sub), n_cells - 1)
    return lo_w, hi_w

def ss(slab_lo, slab_hi):
    lo_w, hi_w = windows(slab_lo, slab_hi)
    s0 = jnp.searchsorted(slab_hi, lo_w.reshape(-1), side="left")
    s1 = jnp.searchsorted(slab_lo, hi_w.reshape(-1), side="right")
    return (s0.sum() + s1.sum()).astype(jnp.float32)

def lut(slab_lo, slab_hi):
    lo_w, hi_w = windows(slab_lo, slab_hi)
    # f[c] = #slabs with hi < c  == searchsorted(slab_hi, c, left)
    cnt_hi = jnp.zeros((n_cells + 2,), i32).at[
        jnp.clip(slab_hi + 1, 0, n_cells + 1)].add(1, mode="drop")
    f = jnp.cumsum(cnt_hi)          # index by c in [0, n_cells+1]
    cnt_lo = jnp.zeros((n_cells + 2,), i32).at[
        jnp.clip(slab_lo + 1, 0, n_cells + 1)].add(1, mode="drop")
    g = jnp.cumsum(cnt_lo)          # g[c] = #slabs with lo <= c-1
    s0 = f[jnp.clip(lo_w.reshape(-1), 0, n_cells + 1)]
    s1 = g[jnp.clip(hi_w.reshape(-1) + 1, 0, n_cells + 1)]
    return (s0.sum() + s1.sum()).astype(jnp.float32)

def full(slab_lo, slab_hi):
    wl_t, wl_s, n_e = pm._sr_ranges(slab_lo, slab_hi, nc, sub, e_max,
                                    symmetric=True, paired=True)
    return (wl_t.sum() + wl_s.sum() + n_e).astype(jnp.float32)

# sanity: lut == searchsorted
lo_w, hi_w = windows(slab_lo, slab_hi)
s0a = jnp.searchsorted(slab_hi, lo_w.reshape(-1), side="left")
cnt_hi = jnp.zeros((n_cells + 2,), i32).at[jnp.clip(slab_hi + 1, 0, n_cells + 1)].add(1, mode="drop")
f = jnp.cumsum(cnt_hi)
s0b = f[jnp.clip(lo_w.reshape(-1), 0, n_cells + 1)]
s1a = jnp.searchsorted(slab_lo, hi_w.reshape(-1), side="right")
cnt_lo = jnp.zeros((n_cells + 2,), i32).at[jnp.clip(slab_lo + 1, 0, n_cells + 1)].add(1, mode="drop")
g = jnp.cumsum(cnt_lo)
s1b = g[jnp.clip(hi_w.reshape(-1) + 1, 0, n_cells + 1)]
print("lut==ss s0:", bool((s0a.astype(i32) == s0b).all()),
      " s1:", bool((s1a.astype(i32) == s1b).all()))

for name, fn in (("searchsorted pair", ss), ("LUT pair", lut), ("full _sr_ranges", full)):
    print(f"{name:>18}: {timeit(fn, (slab_lo, slab_hi))*1e3:7.2f} ms")
