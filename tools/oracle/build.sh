#!/bin/sh
# Builds the reference-engine oracle (golden-trace generator for parity
# tests). Compiles /root/reference's RocketSim in place (read-only).
set -e
cd "$(dirname "$0")"
mkdir -p build
cd build
cmake -G Ninja .. >/dev/null
ninja
