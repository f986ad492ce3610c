#!/usr/bin/env bash
# Regenerates the golden fixtures under tests/golden/ from first principles:
#   1. builds the C++ reference (ver0) with g++ (IEEE semantics, no fast-math)
#      and captures its stdout for the standard configs;
#   2. builds and runs the RNG fixture generator (std::mt19937 +
#      uniform_real_distribution<float> draw dumps).
#
# Requires the reference checkout (default /root/reference) and g++.
# The committed fixtures were produced exactly this way; rerun to audit.
set -euo pipefail

REF="${1:-/root/reference}"
OUT="$(cd "$(dirname "$0")/.." && pwd)/tests/golden"
WORK="$(mktemp -d)"

echo "building reference ver0 from $REF"
g++ -O2 -std=c++11 -I"$REF/ver0" "$REF/ver0/main.cpp" "$REF/ver0/GSimulation.cpp" \
    -o "$WORK/nbody_ver0.x"

for cfg in "128 50" "256 100" "512 100" "1024 200" "2000 50" "2000 500"; do
    set -- $cfg
    echo "running ver0 N=$1 steps=$2"
    "$WORK/nbody_ver0.x" "$1" "$2" > "$OUT/ver0_n${1}_s${2}.txt"
done

echo "building RNG fixture generator"
g++ -O2 -std=c++17 "$(dirname "$0")/rng_fixture_gen.cpp" -o "$WORK/rng_gen"
"$WORK/rng_gen" 12000 "$OUT"

rm -rf "$WORK"
echo "fixtures regenerated in $OUT"
