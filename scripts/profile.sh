#!/usr/bin/env bash
# Profiling wrapper — the analog of the reference's VTune scripts
# (run.sh: uarch-exploration on ver7/ver8 at N=5000, 2000 steps).
# Dumps a jax.profiler trace viewable in XProf/TensorBoard.
set -euo pipefail

N="${1:-5000}"
STEPS="${2:-2000}"
OUT="${3:-/tmp/nbody_trace}"

echo "profiling N=$N steps=$STEPS -> $OUT"
python -m nbody_tpu "$N" "$STEPS" --kernel pallas --profile-dir "$OUT"
echo "trace written to $OUT (open with xprof / tensorboard --logdir)"
