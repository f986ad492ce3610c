"""Interpret-mode correctness guard for the exp_sym_headroom kernel
variants (the VERDICT r2 item-4 levers).

The variants live in scripts/exp_sym_headroom.py and are measured only
on hardware (scripts/hw_contact.sh step 4); this test pins their
NUMERICS in the pytest suite so a hardware session only ever measures
— any refactor that breaks a variant is caught here on CPU first."""

import importlib.util
import pathlib

import pytest

_spec = importlib.util.spec_from_file_location(
    "exp_sym_headroom",
    pathlib.Path(__file__).resolve().parents[1]
    / "scripts" / "exp_sym_headroom.py",
)
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)

VARIANTS = ("base", "acc", "accs", "jbatch2", "acc+jb2", "jstack",
            "unroll2", "unroll4", "rsqrt6")


@pytest.mark.parametrize("variant", VARIANTS)
def test_headroom_variant_correct(variant):
    err = _mod.check_correct(variant, n=1024, block=128)
    assert err < 1e-5, (variant, err)
