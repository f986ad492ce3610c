"""Device-derived capacity constants.

Round 2 baked v5e geometry into several modules (128 MB VMEM residency
caps, the pair-rate-based executable budget, the fused block's particle
ceiling).  The reference parameterizes per-target capacities in its
build matrix (ver5_all/Makefile:1-100 — one ARCH per backend build);
the TPU-native analog is to derive them at runtime from the attached
device's kind.  Everything funnels through :class:`DeviceCaps` so a
v5p/v4/v6e sizes correctly on first contact, with the measured v5e
values as the documented fallback.

The derivations keep the measured v5e anchor points exact:

* ``max_sym_n``        — the pair-symmetric kernel holds one (8,N) input
  and one (8,N) f32 output resident: 64*N bytes.  Residency is capped at
  half of VMEM (the rest feeds the (B,B) pair intermediates), i.e.
  vmem/128 particles → 1 048 576 on a 128 MB v5e (measured: compiles and
  runs at full rate under a 100 MB scoped limit).
* ``sym_auto_block``   — b=1024's pair intermediates spill ~64 MB, so the
  block drops to 512 once residency passes 3/8 of VMEM (48 MB on v5e —
  the measured boundary, docs/DESIGN.md "Pair-symmetry kernel").
* ``two_sided_block``  — the two-sided kernel holds four (8,·) buffers;
  b=1024 (the measured 1.30x lever) is kept while residency stays under
  5/8 of VMEM (80 MB on v5e).
* ``max_fused_n``      — the fused block's lane-padded (N,8) state
  buffers cost N*512 B each; the measured v5e ceiling N=8192 corresponds
  to vmem/16384.
* ``max_pairs_per_exec`` — one XLA executable must stay well under the
  ~1 min runtime watchdog; the budget is ~6 s of pair work at the
  device's conservative streaming pair rate (v5e: 1.9e11 pairs/s
  measured → ~2^40 pairs, the round-2 constant).
"""

from __future__ import annotations

import dataclasses
import functools

_MIB = 1024 * 1024

# kind-substring -> (vmem_bytes, conservative streaming pair rate [pairs/s]).
# VMEM sizes are the public per-core figures (jax-ml.github.io/scaling-book);
# pair rates are measured on v5e and scaled by peak-throughput ratios for
# kinds we have not run on (they only size the ~6 s executable budget, so
# rough is fine — smaller is safer).
_KIND_TABLE = (
    ("v5 lite", 128 * _MIB, 1.9e11),   # v5e (measured)
    ("v5e", 128 * _MIB, 1.9e11),
    ("v5p", 128 * _MIB, 4.4e11),       # ~2.3x v5e peak
    ("v6 lite", 128 * _MIB, 6.0e11),   # v6e/Trillium
    ("v6e", 128 * _MIB, 6.0e11),
    ("v4", 128 * _MIB, 2.6e11),        # ~1.4x v5e peak
    ("v3", 16 * _MIB, 1.0e11),
    ("v2", 16 * _MIB, 6.0e10),
)
_FALLBACK = ("TPU v5 lite (assumed)", 128 * _MIB, 1.9e11)


@dataclasses.dataclass(frozen=True)
class DeviceCaps:
    device_kind: str
    vmem_bytes: int
    pair_rate: float

    @property
    def max_sym_n(self) -> int:
        """VMEM-residency ceiling for the pair-symmetric self kernel
        (64*N bytes resident, capped at vmem/2), lane-aligned."""
        return (self.vmem_bytes // 128) // 1024 * 1024

    def sym_auto_block(self, n: int) -> int:
        """Block size for the resident sym kernel at padded count n."""
        return 1024 if 64 * n <= (3 * self.vmem_bytes) // 8 else 512

    def two_sided_block(self, nt: int, ns: int) -> int:
        """Block size for the two-sided (action/reaction) kernel."""
        return 1024 if 64 * (nt + ns) <= (5 * self.vmem_bytes) // 8 else 512

    @property
    def max_fused_n(self) -> int:
        """Particle ceiling for the COLUMNS-layout fused sample block
        (explicit rectangular tilings): its (N,8) state buffers are
        lane-padded 8->128, costing N*512 bytes each."""
        return (self.vmem_bytes // 16384) // 512 * 512

    @property
    def max_fused_rows_n(self) -> int:
        """Particle ceiling for the ROWS-layout (pair-symmetric) fused
        sample block — the default path.  Residency is five (8,N) fp32
        buffers (pos in/out, vel in/out, acc scratch) = 160*N bytes, no
        lane padding; capped at 3/8 of VMEM so the b=1024 (B,B) pair
        intermediates (~28 MB) and compiler slack fit beside it.
        v5e: 314368 (vs 8192 for the lane-padded columns layout)."""
        return ((3 * self.vmem_bytes) // 8 // 160) // 1024 * 1024

    @property
    def max_pairs_per_exec(self) -> int:
        """Pair budget per XLA executable (~6 s at the streaming rate,
        well under the ~1 min runtime watchdog)."""
        return int(self.pair_rate * 6.0)

    @property
    def vmem_limit_bytes(self) -> int:
        """Scoped-vmem limit for the resident Pallas kernels (the
        physical per-core VMEM; the 16 MB Mosaic default kills them)."""
        return self.vmem_bytes


@functools.lru_cache(maxsize=None)
def caps_for_kind(kind: str) -> DeviceCaps:
    """Resolve a jax ``device_kind`` string to capacities (pure; the
    unit-testable seam).  Unknown kinds get the measured v5e values."""
    low = kind.lower()
    for sub, vmem, rate in _KIND_TABLE:
        if sub in low:
            return DeviceCaps(kind, vmem, rate)
    return DeviceCaps(kind, _FALLBACK[1], _FALLBACK[2])


def caps(device=None) -> DeviceCaps:
    """Capacities of ``device`` (default: the first default-backend
    device).  Non-TPU backends (the CPU test mesh, interpret mode) get
    the v5e fallback so size decisions are deterministic everywhere."""
    if device is None:
        return _default_caps()
    return caps_for_kind(getattr(device, "device_kind", ""))


@functools.lru_cache(maxsize=1)
def _default_caps() -> DeviceCaps:
    import jax

    try:
        if jax.default_backend() == "tpu":
            return caps_for_kind(jax.devices()[0].device_kind)
    except Exception:  # backend init failure — fall through to v5e
        pass
    return caps_for_kind(_FALLBACK[0])
