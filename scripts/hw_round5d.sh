#!/bin/bash
# Round-5 fourth hardware queue (one TPU chip — strictly serial):
# the controlled _sr_pack formulation race, the FIXED periodic
# in-context ablation (env as jit argument), the steadier periodic
# A/B, the 4M approximate-tier rows, and the final production
# re-stress (scatter pack, >=4-step protocol) that feeds BASELINE.md.
# Usage: bash scripts/hw_round5d.sh [stage...]
set -u
cd "$(dirname "$0")/.."
L=logs/hw_contact
stages="${*:-packab perablate perab3 stress4m restress3}"

for s in $stages; do
  echo "=== stage $s: $(date -u +%H:%M:%S) ==="
  case $s in
    packab)
      timeout 3600 python scripts/exp_pack_ab.py \
        > $L/pack_ab_r5.log 2>&1 ;;
    perablate)
      timeout 5400 python scripts/exp_p3m_ablate.py --boundary periodic \
        --sizes 1048576 --dists reference --reps 2 \
        > $L/periodic_ablate_r5.log 2>&1 ;;
    perab3)
      timeout 3600 python scripts/exp_periodic_ab.py --steps 8 \
        > $L/periodic_ab3_r5.log 2>&1 ;;
    stress4m)
      timeout 3600 python scripts/exp_p3m_stress.py --skip-collapse \
        --sizes 4194304 --tiers pm,p3m > $L/p3m_4m_r5b.log 2>&1 ;;
    restress3)
      timeout 7200 python scripts/exp_p3m_stress.py --skip-collapse \
        > $L/p3m_stress_r5d.log 2>&1 ;;
    *) echo "unknown stage $s" ;;
  esac
  echo "--- stage $s exit=$? $(date -u +%H:%M:%S)"
done
echo "ALL DONE"
