import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from nbody_tpu.__main__ import _enable_compilation_cache
_enable_compilation_cache()

S, R, e_max = 8192, 25, 2097152
nb = S * R
rng = np.random.default_rng(0)
flat_np = rng.integers(0, 12, size=nb).astype(np.int32)
flat = jnp.asarray(flat_np)
i32 = jnp.int32

def timeit(fn, args, L=8):
    def t(k):
        @jax.jit
        def go(*a):
            def body(i, c):
                return (fn(*[x + c.astype(x.dtype) * 0 for x in a]) + c).astype(jnp.float32).reshape(-1)[0]
            return lax.fori_loop(0, k, body, jnp.float32(0))
        f = lambda: go(*args)
        float(f()); best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); float(f()); best = min(best, time.perf_counter()-t0)
        return best
    return max(t(2*L)-t(L),1e-9)/L

cum = jnp.cumsum(flat); base = cum - flat
start = jnp.where((flat > 0) & (base < e_max), base, e_max)
vals = jnp.arange(nb, dtype=i32)
marks = jnp.zeros((e_max,), i32).at[start].max(vals, mode="drop")
jc = jnp.minimum(lax.cummax(marks), nb - 1)
s0f = jnp.asarray(rng.integers(0, S, size=nb).astype(np.int32))

pieces = {
 "cumsum(flat)":      lambda f: (jnp.cumsum(f) * vals).sum(),
 "scatter-max":       lambda f: jnp.zeros((e_max,), i32).at[jnp.where((f>0), jnp.cumsum(f)-f, e_max)].max(vals, mode="drop").sum(),
 "cummax(2M)":        lambda m: lax.cummax(m).sum(),
 "gather 2M from S*R":lambda j: s0f[j].sum(),
 "where+arith 2M":    lambda j: jnp.where(jnp.arange(e_max, dtype=i32) < 12345, j // R, S).sum(),
}
args_map = {
 "cumsum(flat)": (flat,), "scatter-max": (flat,), "cummax(2M)": (marks,),
 "gather 2M from S*R": (jc,), "where+arith 2M": (jc,),
}
for name, fn in pieces.items():
    t = timeit(fn, args_map[name])
    print(f"{name:>20}: {t*1e3:7.2f} ms")
