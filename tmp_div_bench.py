import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from nbody_tpu.__main__ import _enable_compilation_cache
_enable_compilation_cache()

e_max = 2097152
rng = np.random.default_rng(0)
j = jnp.asarray(rng.integers(0, 204800, size=e_max).astype(np.int32))
s0f = jnp.asarray(rng.integers(0, 8192, size=204800).astype(np.int32))

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

cases = {
  "j // 25":        lambda j: (j // 25).sum(),
  "j // 32 (pow2)": lambda j: (j // 32).sum(),
  "f32 div trick":  lambda j: ((j.astype(jnp.float32) * (1.0/25.0)).astype(jnp.int32)).sum(),
  "gather s0f[j]":  lambda j: s0f[j].sum(),
}
for name, fn in cases.items():
    print(f"{name:>16}: {timeit(fn, (j,))*1e3:7.2f} ms")
