#!/usr/bin/env python
"""Differentiable simulation demo: recover initial velocities by gradient
descent through the rollout.

A capability the reference architecture cannot express: the entire
force + integrate trajectory is differentiable (analytic custom VJP,
ops/grad.py), so inverse problems — fitting initial conditions to hit a
target state — are a few lines of optimization.

Usage: python examples/fit_velocities.py [N] [steps] [iters] [kernel]

``kernel`` defaults to the exact `naive` tier; pass `p3m` to fit
through the differentiable O(N log N) mesh tier instead (the
static-bound short-range sweep, ops/pm.py).
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 60
    kernel = sys.argv[4] if len(sys.argv) > 4 else "naive"

    import jax
    import jax.numpy as jnp

    from nbody_tpu.init import reference_init_arrays
    from nbody_tpu.models.gravity import make_accel_fn

    pos0_np, vel_true_np, mass_np = reference_init_arrays(n)
    pos0 = jnp.asarray(pos0_np)
    vel_true = jnp.asarray(vel_true_np)
    mass = jnp.asarray(mass_np)
    opts = dict(grid=32, capacity=64) if kernel in ("pm", "p3m") else {}
    accel = make_accel_fn(kernel, differentiable=True, **opts)
    dt = jnp.float32(0.1)

    def rollout(vel):
        p, v = pos0, vel
        for _ in range(steps):
            a = accel(p, mass)
            v = v + a * dt
            p = p + v * dt
        return p

    target = rollout(vel_true)  # "observed" final positions

    @jax.jit
    def loss_and_grad(vel):
        def loss(v):
            d = rollout(v) - target
            return jnp.sum(d * d)

        return jax.value_and_grad(loss)(vel)

    vel = jnp.zeros_like(vel_true)
    # d(final pos)/d(vel) ~ steps*dt to leading order, so this step size
    # contracts the velocity error by ~0.6 per iteration.
    lr = jnp.float32(0.4 / (steps * 0.1) ** 2)
    for it in range(iters):
        l, g = loss_and_grad(vel)
        vel = vel - lr * g
        if it % 10 == 0 or it == iters - 1:
            err = float(jnp.linalg.norm(vel - vel_true)
                        / jnp.linalg.norm(vel_true))
            print(f" iter {it:4d}: loss={float(l):.3e}  vel rel err={err:.3e}")

    final_err = float(
        jnp.linalg.norm(vel - vel_true) / jnp.linalg.norm(vel_true)
    )
    print(f" recovered initial velocities to {final_err:.2%} relative error")
    return 0 if final_err < 0.05 else 1


if __name__ == "__main__":
    sys.exit(main())
