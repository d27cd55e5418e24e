#!/bin/sh
# Round-5 follow-up chip chain: waits for the primary watchdog chain to
# exit, then (most-valuable-first, everything warm-cache by now):
#   1. roundprof northstar, 2 reps/variant — clean paired attribution
#      (the first pass had the fresh compile inside baseline run_s)
#   2. scaling curve (small/mid/big crossover; mid pays one compile)
#   3. gate northstar section refresh (2 reps, honest warm number)
#   4. sort microbench (1D vs batched lanes: columnsort decision data)
REPO=$(cd "$(dirname "$0")/.." && pwd)
LOG=${TPU_CHAIN_LOG:-/tmp/chain_r5b.log}
say() { echo "[chain-b] $1 $(date -u +%H:%M:%S)" >> "$LOG"; }
say "waiting for primary chain"
while grep -sq "tpu_gate_watchdog" /proc/[0-9]*/cmdline 2>/dev/null; do
    sleep 120
done
say "primary chain done; starting"
PYTHONPATH="$REPO:$PYTHONPATH" timeout 7200 \
    python3 "$REPO/scripts/tpu_microbench.py" >> "$LOG" 2>&1 \
    && say "microbench OK" || say "microbench FAILED"
PYTHONPATH="$REPO:$PYTHONPATH" timeout 14400 \
    python3 "$REPO/scripts/tpu_roundprof.py" northstar >> "$LOG" 2>&1 \
    && say "roundprof northstar (paired) OK" || say "roundprof northstar FAILED"
PYTHONPATH="$REPO:$PYTHONPATH" timeout 14400 \
    python3 "$REPO/scripts/tpu_scaling_curve.py" >> "$LOG" 2>&1 \
    && say "scaling curve OK" || say "scaling curve FAILED"
PANGENE_TPU_NORTHSTAR=1 PANGENE_TPU_BIG=0 \
    PYTHONPATH="$REPO:$PYTHONPATH" timeout 10800 \
    python3 "$REPO/scripts/tpu_gate.py" >> "$LOG" 2>&1 \
    && say "gate northstar refresh OK" || say "gate northstar FAILED"
say "chain-b done"
