#!/bin/sh
# Builds the reference-engine oracle (golden-trace generator for parity
# tests). Compiles /root/reference's RocketSim in place (read-only).
set -e
cd "$(dirname "$0")"
mkdir -p build
cd build
cmake -G Ninja .. >/dev/null
ninja
# Chaos-control twin (sh tools/oracle/build.sh fma): identical sources,
# -march=native enables FMA contraction — a second, equally valid f32
# rounding of the same program, used to measure the reference's own
# self-divergence on the 10k replay gate (PARITY.md "chaos control").
if [ "$1" = "fma" ]; then
  cd ..
  mkdir -p build-fma
  cd build-fma
  cmake -G Ninja -DRS_EXTRA_FLAGS="-march=native -ffp-contract=fast" .. >/dev/null
  ninja rs_oracle
fi
