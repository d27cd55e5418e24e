#!/bin/sh
# TPU gate: Mosaic-compile + fuzz the Pallas kernels, run jax + sharded
# engines end-to-end on the real chip, write TPU_GATE.json (see tpu_gate.py).
# Must run with the axon platform active (the environment default).
cd "$(dirname "$0")/.." && exec python3 scripts/tpu_gate.py "$@"
