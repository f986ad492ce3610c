"""Particle-mesh (PM) force solver — the O(N log N) scaling tier above
the exact all-pairs kernels.

The reference is exact O(N^2) everywhere (ver0/GSimulation.cpp:130-150);
this module adds the standard mesh-based far-field solver as one more
entry in the kernel registry (the ver5_all backend seam, ops/registry.py)
so huge-N runs can trade bounded force error for an asymptotic win:

    a(x_i) = G * sum_j m_j * f(x_j - x_i),   f(r) = r / (|r|^2 + eps^2)^{3/2}

is a convolution of the mass field with the fixed Plummer-softened force
kernel f.  The method (Hockney & Eastwood's isolated-boundary PM):

1. **CIC deposit** — trilinear (cloud-in-cell) scatter of particle masses
   onto an ``ng^3`` grid spanning the particles' bounding box.
2. **FFT convolution on a doubled grid** — zero-pad to ``(2 ng)^3`` so the
   circular convolution equals the open-boundary one (vacuum boundaries,
   like the reference — NOT periodic), multiply the mass spectrum by the
   spectra of the three antisymmetric force-kernel components sampled on
   the same grid, and inverse-transform to per-axis acceleration grids.
3. **CIC gather** — trilinear interpolation of the acceleration grids
   back at each particle position.

Why this is a good fit for the reference's force law: the softening
eps = sqrt(1e-3) ~ 0.032 is LARGE compared to a 128-grid spacing of the
unit initial box (h ~ 0.008), so the pair force is smooth on the grid
scale and the only error source is the CIC smoothing of sub-cell
positions — measured 8.5e-4 relative L2 force error at ng=128 (see
tests/test_pm.py and docs/DESIGN.md "Particle-mesh tier").

Structural properties (tested in tests/test_pm.py):
* **Exact momentum conservation and exactly zero self-force — when every
  particle is inside the mesh box** (the whole-distribution case for
  compact ICs): deposit and gather share the CIC weights and the sampled
  kernel is exactly antisymmetric, so each cloud-cell pair cancels its
  reaction, and a particle's own symmetric cloud convolved with the
  antisymmetric kernel is zero at the particle (same reason the
  reference's unmasked diagonal is zero).  When heavy-tail OUTLIERS
  exist, their per-octant monopole far field is approximate: momentum
  closes only to the outlier mass fraction, and an outlier sharing an
  octant with others feels a small self-term (a LONE outlier still has
  exactly zero self-force — its octant monopole sits at its own
  position).
* **Zero-mass padding is force- and energy-neutral** (weight 0, and
  excluded from the box like any massless particle).

TPU mapping: the whole step is jnp — XLA batches the 8-corner scatter
(deposit) and gather, and the seven full-complex ``fftn``/``ifftn``
transforms run as native XLA FFTs (full-complex on purpose: this
backend's ``irfftn`` is non-deterministic and inaccurate — see
_force_kernel_spectra); there is nothing for a hand-written Pallas
kernel to beat here since FFT butterflies and scatters are memory-bound
host-library territory, not VPU pair math.  The kernel spectra depend
on the current bounding box, so they are rebuilt inside the same jit
(3 extra forward FFTs) — no host round-trip, no dynamic shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..types import G_NEWTON, SOFTENING_SQUARED

DEFAULT_GRID = 128


def _cic_weights(pos, lo, inv_h, ng):
    """Grid coordinates and trilinear corner weights for pos (3, N).

    Returns (i0 (3,N) int32 lower-corner indices in [0, ng-2],
    frac (3,N) f32 in [0,1])."""
    # Clip in FLOAT first: far-away padding particles (state.pad_state's
    # 1e6 diagonal) produce grid coords way past int32 range, and
    # float->int conversion of out-of-range values is undefined in XLA.
    g = jnp.clip((pos - lo) * inv_h, 0.0, float(ng - 1))
    i0 = jnp.clip(jnp.floor(g).astype(jnp.int32), 0, ng - 2)
    frac = jnp.clip(g - i0.astype(jnp.float32), 0.0, 1.0)
    return i0, frac


def _corner_iter(i0, frac):
    """The 8 CIC corners: yields (flat-ish index triple, weight (N,))."""
    for cx in (0, 1):
        wx = frac[0] if cx else 1.0 - frac[0]
        for cy in (0, 1):
            wy = frac[1] if cy else 1.0 - frac[1]
            for cz in (0, 1):
                wz = frac[2] if cz else 1.0 - frac[2]
                yield (i0[0] + cx, i0[1] + cy, i0[2] + cz), wx * wy * wz


def _deposit(pos, mass, lo, inv_h, ng):
    """CIC scatter of masses onto an (ng, ng, ng) f32 grid."""
    i0, frac = _cic_weights(pos, lo, inv_h, ng)
    grid = jnp.zeros((ng, ng, ng), jnp.float32)
    for (ix, iy, iz), w in _corner_iter(i0, frac):
        grid = grid.at[ix, iy, iz].add(mass * w)
    return grid


def _gather(grids, pos, lo, inv_h, ng):
    """CIC interpolation of 3 (ng,ng,ng) grids at pos (3,N) -> (3,N).

    Gathers through FLAT 1-D indices: measured 1.6x over 3-D advanced
    indexing on v5e at N=1M (54 vs 87 ms — XLA lowers the 1-D form to a
    cheaper gather; the same trick does nothing for the scatter side)."""
    i0, frac = _cic_weights(pos, lo, inv_h, ng)
    flat = grids.reshape(3, ng * ng * ng)
    out = jnp.zeros((3, pos.shape[1]), jnp.float32)
    for (ix, iy, iz), w in _corner_iter(i0, frac):
        out = out + w * flat[:, (ix * ng + iy) * ng + iz]
    return out


def _force_kernel_spectra(h, ng):
    """fftn spectra of the three Plummer-softened force-kernel components
    sampled on the doubled (2ng)^3 grid with signed wraparound
    displacements (Hockney open-boundary convolution kernel).

    ``h`` is the (3,) per-axis grid spacing (traced — the kernel follows
    the particles' bounding box).

    Full-complex transforms on purpose: this TPU backend's ``irfftn`` is
    NON-DETERMINISTIC and ~0.17 off from CPU at these sizes (measured,
    run-to-run max diff 1.4e5 on a 4.2e9-scale grid), while
    ``fftn``/``ifftn`` agree with CPU to 2e-7 and are bit-stable.  The
    halved-spectrum saving is not worth a broken inverse."""
    m = 2 * ng
    idx = jnp.arange(m)
    # signed displacement in cells: 0..ng-1, then the negative half
    d = jnp.where(idx < ng, idx, idx - m).astype(jnp.float32)
    rx = (d * h[0])[:, None, None]
    ry = (d * h[1])[None, :, None]
    rz = (d * h[2])[None, None, :]
    r2 = rx * rx + ry * ry + rz * rz + jnp.float32(SOFTENING_SQUARED)
    u = jax.lax.rsqrt(r2)
    u3 = u * u * u  # 1 / (r^2 + eps^2)^{3/2}
    return (
        jnp.fft.fftn(rx * u3),
        jnp.fft.fftn(ry * u3),
        jnp.fft.fftn(rz * u3),
    )


def _robust_box(pos, mass):
    """Robust mesh box (lo (3,1), hi (3,1)) for the MASSIVE particles.

    Two failure modes shape this:

    * Zero-mass padding sits on a far diagonal (state.pad_state) — it is
      excluded entirely, or it would dilate the grid spacing by orders of
      magnitude and destroy the solve's resolution.
    * Heavy-tailed distributions (e.g. Plummer) put a few massive
      particles at many core-radii; an exact bounding box over them
      under-resolves the core just as badly (measured: 0.96 rel force
      error on Plummer ICs with an exact box).  The box is therefore the
      inner-99% percentile span per axis, expanded by one span on each
      side and clipped to the exact extent: for compact distributions it
      IS the exact bounding box (nothing changes), while tail particles
      fall outside and are handled analytically by the monopole far
      field (see accelerations_between).
    """
    real = mass[None, :] > 0
    big = jnp.float32(3e38)
    lo_exact = jnp.min(jnp.where(real, pos, big), axis=1, keepdims=True)
    hi_exact = jnp.max(jnp.where(real, pos, -big), axis=1, keepdims=True)
    # Percentiles on a strided subsample: a 0.5% quantile needs only
    # ~64k samples, and full-N sorts cost ~11 ms/step at N=1M (measured).
    # The box is expanded by a whole span and clipped to the exact
    # extent, so subsampling noise in the quantile estimate is harmless.
    stride = max(1, pos.shape[1] // 65536)
    nanpos = jnp.where(real[:, ::stride], pos[:, ::stride], jnp.nan)
    q = jnp.nanpercentile(nanpos, jnp.asarray([0.5, 99.5]), axis=1)  # (2,3)
    q_lo, q_hi = q[0][:, None], q[1][:, None]
    span_q = q_hi - q_lo
    lo = jnp.maximum(lo_exact, q_lo - span_q)
    hi = jnp.minimum(hi_exact, q_hi + span_q)
    return lo, jnp.maximum(hi, lo + jnp.float32(1e-6))


def _inside(pos, lo, hi):
    """(N,) f32 mask: 1 where the particle is inside the mesh box."""
    ok = jnp.all((pos >= lo) & (pos <= hi), axis=0)
    return ok.astype(jnp.float32)


def _monopole(pos_tgt, m_tot, com):
    """Softened point-mass force field of (m_tot, com) at the targets
    (3, N); the analytic far-field for particles outside the mesh box."""
    d = com - pos_tgt
    r2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2] + jnp.float32(
        SOFTENING_SQUARED)
    u = jax.lax.rsqrt(r2)
    return m_tot * d * (u * u * u)


def accelerations_between(
    pos_tgt: jax.Array,
    pos_src: jax.Array,
    mass_src: jax.Array,
    grid: int = DEFAULT_GRID,
    **_opts,
) -> jax.Array:
    """Mesh-solved accelerations of targets due to sources.

    pos_tgt (3, Nt), pos_src (3, Ns), mass_src (Ns,) -> (3, Nt) f32.
    The mesh covers the robust (inner-99%, 3x-expanded) box of the
    MASSIVE sources (zero-mass padding and heavy-tail outliers excluded
    — see _robust_box); the few particles outside it are handled
    analytically:

    * outlier SOURCES contribute their combined monopole (M_out,
      com_out) to every target — they are genuinely far, so the
      point-mass field is accurate;
    * outlier TARGETS receive the in-box sources' monopole (M_in,
      com_in) instead of a mesh gather.

    For compact distributions the box equals the exact bounding box and
    both monopole terms vanish — the solve is pure mesh.  Extra registry
    options (tiles, interpret, dist_dtype) are accepted and ignored —
    the solver is fp32 and has no Pallas tiling."""
    ng = int(grid)
    if ng < 8:
        # ng - 3 usable cells must be positive (ng <= 3 divides by zero
        # -> all-NaN output); anything below 8 is physically useless.
        raise ValueError(f"pm grid must be >= 8, got {ng}")
    f32 = jnp.float32
    pos_tgt = pos_tgt.astype(f32)
    pos_src = pos_src.astype(f32)
    mass_src = mass_src.astype(f32)
    lo_box, hi_box = _robust_box(pos_src, mass_src)
    span = hi_box - lo_box
    in_src = _inside(pos_src, lo_box, hi_box)  # (Ns,) f32
    in_tgt = _inside(pos_tgt, lo_box, hi_box)  # (Nt,) f32
    m_in = mass_src * in_src
    m_out = mass_src - m_in
    tiny = f32(1e-30)
    M_in = jnp.sum(m_in)
    com_in = (pos_src * m_in).sum(axis=1, keepdims=True) / jnp.maximum(
        M_in, tiny)
    # Outlier sources, grouped PER OCTANT around the box center: a single
    # collective monopole would misplace outliers that straddle the box
    # (two heavy bodies on opposite sides average to a phantom central
    # mass); one monopole per direction octant keeps each group far AND
    # on its own side.  A lone outlier gets its own octant, so its
    # self-force is exactly zero (d = 0 under softening).
    ctr = 0.5 * (lo_box + hi_box)  # (3, 1)
    side = (pos_src > ctr).astype(jnp.int32)
    oct_id = side[0] * 4 + side[1] * 2 + side[2]  # (Ns,)
    oct_masses, oct_coms = [], []
    for k in range(8):
        m_k = m_out * (oct_id == k).astype(f32)
        M_k = jnp.sum(m_k)
        oct_masses.append(M_k)
        oct_coms.append(
            (pos_src * m_k).sum(axis=1, keepdims=True)
            / jnp.maximum(M_k, tiny)
        )

    # ng-3 usable cells: one margin cell each side plus the CIC upper corner.
    h = (span / f32(ng - 3))[:, 0]  # (3,)
    inv_h = 1.0 / h[:, None]
    lo = lo_box - h[:, None]  # one-cell margin

    rho = _deposit(pos_src, m_in, lo, inv_h, ng)
    m = 2 * ng
    # Full-complex transforms — see _force_kernel_spectra for why
    # (this backend's irfftn is non-deterministic and inaccurate).
    rho_hat = jnp.fft.fftn(rho, s=(m, m, m))
    kx, ky, kz = _force_kernel_spectra(h, ng)
    # a(c) = sum_{c'} rho(c') f(c' - c) = -(rho * f)(c) for antisymmetric f
    acc_grids = jnp.stack([
        -jnp.fft.ifftn(rho_hat * kx).real[:ng, :ng, :ng],
        -jnp.fft.ifftn(rho_hat * ky).real[:ng, :ng, :ng],
        -jnp.fft.ifftn(rho_hat * kz).real[:ng, :ng, :ng],
    ])
    acc = _gather(acc_grids, pos_tgt, lo, inv_h, ng)
    acc = jnp.where(in_tgt > 0, acc, _monopole(pos_tgt, M_in, com_in))
    for M_k, com_k in zip(oct_masses, oct_coms):
        acc = acc + _monopole(pos_tgt, M_k, com_k)
    return (acc * f32(G_NEWTON)).astype(f32)


def accelerations(
    pos: jax.Array, mass: jax.Array, grid: int = DEFAULT_GRID, **_opts
) -> jax.Array:
    """All-source mesh accelerations. pos (3,N), mass (N,) -> (3,N)."""
    return accelerations_between(pos, pos, mass, grid=grid)


@functools.partial(jax.jit, static_argnums=(2,))
def force_error_vs_exact(pos, mass, grid: int = DEFAULT_GRID):
    """Relative L2 force error of the mesh solve vs the exact all-pairs
    kernel (diagnostic used by tests and docs measurements)."""
    from . import naive

    a_pm = accelerations(pos, mass, grid=grid)
    a_ref = naive.accelerations(pos, mass)
    num = jnp.sqrt(jnp.sum((a_pm - a_ref) ** 2))
    den = jnp.sqrt(jnp.sum(a_ref ** 2))
    return num / jnp.maximum(den, 1e-30)
