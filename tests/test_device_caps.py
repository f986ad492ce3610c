"""Device-derived capacity constants (utils/device_caps.py): the v5e
anchor values must be reproduced exactly, other device kinds must scale,
and unknown kinds must fall back to v5e — all without touching hardware
(caps_for_kind is the pure seam)."""

from nbody_tpu.utils.device_caps import DeviceCaps, caps, caps_for_kind

MIB = 1024 * 1024


def test_v5e_anchor_values():
    c = caps_for_kind("TPU v5 lite")
    assert c.vmem_bytes == 128 * MIB
    # the measured round-2 v5e constants, now derived
    assert c.max_sym_n == 1048576
    assert c.max_fused_n == 8192
    assert c.sym_auto_block(65536) == 1024
    assert c.sym_auto_block(786432) == 1024  # 64*N == 48 MB boundary
    assert c.sym_auto_block(786432 + 512) == 512
    assert c.two_sided_block(524288, 524288) == 1024  # 64 MB <= 80 MB
    assert c.two_sided_block(786432, 786432) == 512
    assert c.vmem_limit_bytes == 128 * MIB
    # ~6 s at the measured streaming rate, the round-2 2^40 ballpark
    assert 0.8 * (1 << 40) <= c.max_pairs_per_exec <= 1.3 * (1 << 40)


def test_v5p_scales_budget_not_vmem():
    v5e = caps_for_kind("TPU v5 lite")
    v5p = caps_for_kind("TPU v5p")
    assert v5p.vmem_bytes == v5e.vmem_bytes  # both 128 MB parts
    assert v5p.max_sym_n == v5e.max_sym_n
    # faster chip -> bigger per-executable pair budget
    assert v5p.max_pairs_per_exec > 1.5 * v5e.max_pairs_per_exec


def test_small_vmem_kind_shrinks_residency_caps():
    v3 = caps_for_kind("TPU v3")
    assert v3.vmem_bytes == 16 * MIB
    assert v3.max_sym_n == 131072  # vmem/128
    assert v3.max_fused_n == 1024
    assert v3.sym_auto_block(131072) == 512  # residency past 3/8 of 16 MB
    assert v3.vmem_limit_bytes == 16 * MIB


def test_unknown_kind_falls_back_to_v5e():
    c = caps_for_kind("TPU v99 hyperdrive")
    assert c.max_sym_n == 1048576 and c.max_fused_n == 8192


def test_caps_resolution_and_alignment():
    # Default resolution works off-hardware (CPU backend -> v5e fallback)
    c = caps()
    assert isinstance(c, DeviceCaps)
    assert c.max_sym_n % 1024 == 0
    assert c.max_fused_n % 512 == 0

    class FakeDev:
        device_kind = "TPU v4"

    assert caps(FakeDev()).vmem_bytes == 128 * MIB


def test_consumers_wired_to_caps():
    """The round-2 hardwired constants now resolve through device_caps."""
    from nbody_tpu.models.gravity import max_pairs_per_exec
    from nbody_tpu.ops.fused_block import max_fused_n
    from nbody_tpu.ops.pallas_sym import auto_block, max_sym_n

    c = caps()
    assert max_sym_n() == c.max_sym_n
    assert max_fused_n() == c.max_fused_n
    assert max_pairs_per_exec() == c.max_pairs_per_exec
    assert auto_block(65536) == c.sym_auto_block(65536)

def test_fused_rows_cap_values():
    """The rows-layout fused block has no lane padding (160*N bytes of
    (8,N) residency), lifting the cap ~38x over the columns layout."""
    c = caps_for_kind("TPU v5 lite")
    assert c.max_fused_rows_n == 314368  # 3/8 * 128 MB / 160, 1k-aligned
    assert c.max_fused_rows_n % 1024 == 0
    assert caps_for_kind("TPU v3").max_fused_rows_n == 38912
