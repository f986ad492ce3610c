#!/usr/bin/env python
"""A/B experiment: sym-kernel reductions on the VPU (jnp.sum) vs on the
MXU (dot-with-ones).  The pair-symmetric kernel spends ~2-3 of its ~13
effective VPU slots per interaction on the i/j-side sums; the MXU is
otherwise idle, so contracting against a ones vector could overlap those
sums with the pair arithmetic.  Measures correctness (vs the VPU path)
and difference-timed rate at several N on the attached chip.

Run: python scripts/exp_mxu_reduce.py [N ...]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main(sizes):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from nbody_tpu.init import make_state
    from nbody_tpu.ops import pallas_sym

    for n in sizes:
        st = make_state(n, pad_multiple=1024)
        pos, mass = st.pos, st.mass

        rates = {}
        for mode in (False, True):
            fn = jax.jit(
                lambda p, m, mode=mode: pallas_sym.accelerations(
                    p, m, mxu_reduce=mode
                )
            )
            acc = fn(pos, mass)
            a_np = np.asarray(acc)  # sync
            if mode is False:
                ref = a_np
            else:
                rel = np.linalg.norm(a_np - ref) / np.linalg.norm(ref)
                print(f"N={n} mxu-vs-vpu rel L2 {rel:.3e}", flush=True)

            def run(loops, fn=fn):
                @jax.jit
                def many(p, m):
                    def body(_, p):
                        a = fn(p, m)
                        return p + jnp.float32(1e-12) * a

                    return lax.fori_loop(0, loops, body, p)

                r = many(pos, mass)
                t0 = time.perf_counter()
                float(r[0, 0])
                # warm: time a second call fully
                t0 = time.perf_counter()
                r = many(pos, mass)
                float(r[0, 0])
                return time.perf_counter() - t0

            loops = max(1, int(3e11 // (n * n)))
            t1, t2 = run(loops), run(2 * loops)
            per = max(t2 - t1, 1e-9) / loops
            rate = n * n / per / 1e9
            rates[mode] = rate
            print(
                f"N={n} {'mxu' if mode else 'vpu'}-reduce: "
                f"{per*1e6:.1f} us/sweep = {rate:.1f} Gpairs/s",
                flush=True,
            )
        print(f"N={n} speedup mxu/vpu = {rates[True]/rates[False]:.3f}",
              flush=True)


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [65536, 262144])
