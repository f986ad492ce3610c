#!/bin/bash
# Round-5 hardware evidence queue (one TPU chip — strictly serial).
# Usage: bash scripts/hw_round5.sh [stage...]   (default: all)
set -u
cd "$(dirname "$0")/.."
L=logs/hw_contact
stages="${*:-cross131k ablate1m periodic headroom ensemble bf16}"

for s in $stages; do
  echo "=== stage $s: $(date -u +%H:%M:%S) ==="
  case $s in
    cross131k)
      timeout 2400 python scripts/exp_p3m_stress.py --skip-collapse \
        --sizes 131072 > $L/p3m_cross131k_r5.log 2>&1 ;;
    ablate1m)
      timeout 5400 python scripts/exp_p3m_ablate.py --sizes 1048576 \
        --dists reference,plummer --reps 2 \
        > $L/p3m_ablate_1m_r5.log 2>&1 ;;
    periodic)
      timeout 3600 python scripts/exp_periodic_ab.py \
        > $L/periodic_ab_r5.log 2>&1 ;;
    headroom)
      timeout 3600 python scripts/exp_sym_headroom.py \
        --variants base,unroll2,pipe2,dbuf --sizes 262144 \
        > $L/sym_headroom_r5.log 2>&1 ;;
    ensemble)
      timeout 1800 python scripts/exp_ensemble.py \
        > $L/ensemble_r5.log 2>&1 ;;
    bf16)
      timeout 3600 python scripts/exp_bf16_pack.py \
        > $L/bf16_pack_r5.log 2>&1 ;;
    *) echo "unknown stage $s" ;;
  esac
  echo "--- stage $s exit=$? $(date -u +%H:%M:%S)"
done
echo "ALL DONE"
