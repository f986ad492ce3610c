#!/bin/bash
# Round-5 third hardware queue (one TPU chip — strictly serial):
# the gate under the committed round-5 floors, the fresh suite that
# feeds README/BASELINE, the FIXED periodic-P3M in-context ablation
# (eager periodic env build is now jitted — pm._make_periodic_env),
# a steadier periodic A/B, and the re-stress under the >=4-step
# timing protocol.  Usage: bash scripts/hw_round5c.sh [stage...]
set -u
cd "$(dirname "$0")/.."
L=logs/hw_contact
stages="${*:-gate suite perablate perab3 restress2 stress4m2}"

for s in $stages; do
  echo "=== stage $s: $(date -u +%H:%M:%S) ==="
  case $s in
    gate)
      timeout 3600 python bench.py --gate > $L/bench_gate_r5.log 2>&1 ;;
    suite)
      timeout 5400 python bench.py --suite > $L/bench_suite_r5.log 2>&1 ;;
    perablate)
      timeout 5400 python scripts/exp_p3m_ablate.py --boundary periodic \
        --sizes 1048576 --dists reference --reps 2 \
        > $L/periodic_ablate_r5.log 2>&1 ;;
    perab3)
      timeout 3600 python scripts/exp_periodic_ab.py --steps 8 \
        > $L/periodic_ab3_r5.log 2>&1 ;;
    restress2)
      timeout 7200 python scripts/exp_p3m_stress.py --skip-collapse \
        > $L/p3m_stress_r5c.log 2>&1 ;;
    stress4m2)
      timeout 3600 python scripts/exp_p3m_stress.py --skip-collapse \
        --sizes 4194304 --tiers pm,p3m > $L/p3m_4m_r5b.log 2>&1 ;;
    *) echo "unknown stage $s" ;;
  esac
  echo "--- stage $s exit=$? $(date -u +%H:%M:%S)"
done
echo "ALL DONE"
