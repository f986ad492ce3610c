#!/usr/bin/env bash
# One-shot hardware-contact runner for the ROADMAP.md checklist: runs
# every pending TPU measurement in dependency order, teeing each step's
# output to logs/hw_contact/<step>.log so a dropped tunnel mid-way
# loses nothing.  Steps are independent past the acceptance check —
# rerun any that failed individually.
#
# Usage: bash scripts/hw_contact.sh [logdir]   (default logs/hw_contact)
#        HW_CONTINUE=1 ... to keep measuring past a failed acceptance
#        check (step 1) — by default a tpu_check failure stops the run
#        so hours of measurements aren't taken on a broken config.
set -uo pipefail
cd "$(dirname "$0")/.."
LOG="${1:-logs/hw_contact}"
mkdir -p "$LOG"
rm -f "$LOG/FAILED"   # stale failures from a previous run don't carry over

step() {
    local name="$1"; shift
    echo "=============================================================="
    echo "== STEP $name: $*"
    echo "== log: $LOG/$name.log"
    local t0=$SECONDS
    if "$@" 2>&1 | tee "$LOG/$name.log"; then
        echo "== STEP $name OK ($((SECONDS - t0)) s)"
    else
        echo "== STEP $name FAILED ($((SECONDS - t0)) s) — continuing"
        echo "$name" >> "$LOG/FAILED"
    fi
}

# 1. Acceptance: golden traces, p3m accuracy, compiled sweep parity for
#    ALL layout variants (first Mosaic contact happens here; if the
#    flush-runs accumulator is rejected, set pm.SR_FLUSH_RUNS=False and
#    rerun — see ROADMAP.md fallbacks).
step tpu_check bash scripts/tpu_check.sh
if [ -f "$LOG/FAILED" ] && [ "${HW_CONTINUE:-0}" != "1" ]; then
    echo "hw_contact: acceptance check failed — fix it (ROADMAP.md"
    echo "fallbacks) and rerun, or HW_CONTINUE=1 to measure anyway."
    exit 1
fi

# 2. SR sweep A/B: xla / pallas / flushless / symmetric / paired /
#    pair-sym / SLAB=128 probe, isolated + full p3m solve.
step sr_pallas python scripts/exp_sr_pallas.py

# 3. P3M crossover + collapse stress refresh (DESIGN.md "P3M" tables).
step p3m_stress python scripts/exp_p3m_stress.py

# 4. Exact-kernel headroom variants (VERDICT r2 item 4 levers).
step sym_headroom python scripts/exp_sym_headroom.py \
    --variants base,acc,accs,jbatch2,acc+jb2,jstack,unroll2,unroll4,rsqrt6

# 5. Headline + per-config floors + full suite rates.
step bench_gate python bench.py --gate
step bench_suite python bench.py --suite
step bench python bench.py

echo "=============================================================="
if [ -f "$LOG/FAILED" ]; then
    echo "FAILED steps: $(tr '\n' ' ' < "$LOG/FAILED")"
    exit 1
fi
echo "hw_contact: all steps OK — update BASELINE.md, DESIGN.md, ROADMAP.md"
echo "and flip pm.SR_* / pallas_sym knobs per the winners."
