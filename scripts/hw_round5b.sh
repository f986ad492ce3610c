#!/bin/bash
# Round-5 follow-up hardware queue (one TPU chip — strictly serial):
# the periodic-P3M ghost-fix A/B + in-context ablation, the 4M
# approximate-tier rows, and the final-code re-stress that feeds
# BASELINE.md.  Usage: bash scripts/hw_round5b.sh [stage...]
set -u
cd "$(dirname "$0")/.."
L=logs/hw_contact
stages="${*:-perab2 perablate stress4m restress}"

for s in $stages; do
  echo "=== stage $s: $(date -u +%H:%M:%S) ==="
  case $s in
    perab2)
      timeout 3600 python scripts/exp_periodic_ab.py \
        > $L/periodic_ab2_r5.log 2>&1 ;;
    perablate)
      timeout 5400 python scripts/exp_p3m_ablate.py --boundary periodic \
        --sizes 1048576 --dists reference --reps 2 \
        > $L/periodic_ablate_r5.log 2>&1 ;;
    stress4m)
      timeout 3600 python scripts/exp_p3m_stress.py --skip-collapse \
        --sizes 4194304 --tiers pm,p3m > $L/p3m_4m_r5.log 2>&1 ;;
    restress)
      timeout 5400 python scripts/exp_p3m_stress.py --skip-collapse \
        > $L/p3m_stress_r5b.log 2>&1 ;;
    gate)
      timeout 3600 python bench.py --gate > $L/bench_gate_r5.log 2>&1 ;;
    suite)
      timeout 3600 python bench.py --suite > $L/bench_suite_r5.log 2>&1 ;;
    *) echo "unknown stage $s" ;;
  esac
  echo "--- stage $s exit=$? $(date -u +%H:%M:%S)"
done
echo "ALL DONE"
