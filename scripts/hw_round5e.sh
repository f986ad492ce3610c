#!/bin/bash
# Round-5 final hardware queue (one TPU chip — strictly serial): the
# periodic A/B under the implicit-ghost-candidate build + no-env
# engine default, then the gate and suite on the FINAL round-5 code
# (hybrid pack, implicit ghosts).  Usage: bash scripts/hw_round5e.sh
set -u
cd "$(dirname "$0")/.."
L=logs/hw_contact
stages="${*:-perab4 gate suite}"

for s in $stages; do
  echo "=== stage $s: $(date -u +%H:%M:%S) ==="
  case $s in
    perab4)
      timeout 2700 python scripts/exp_periodic_ab.py --steps 8 \
        > $L/periodic_ab4_r5.log 2>&1 ;;
    gate)
      timeout 3600 python bench.py --gate > $L/bench_gate_r5b.log 2>&1 ;;
    suite)
      timeout 5400 python bench.py --suite > $L/bench_suite_r5b.log 2>&1 ;;
    *) echo "unknown stage $s" ;;
  esac
  echo "--- stage $s exit=$? $(date -u +%H:%M:%S)"
done
echo "ALL DONE"
