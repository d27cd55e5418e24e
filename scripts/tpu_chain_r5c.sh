#!/bin/sh
# Round-5 chain-c: after chain-b, run the colsort/parallel-transfer A/B
# (pays one fresh big-shape compile for the colsort variant).
REPO=$(cd "$(dirname "$0")/.." && pwd)
LOG=${TPU_CHAIN_LOG:-/tmp/chain_r5c.log}
say() { echo "[chain-c] $1 $(date -u +%H:%M:%S)" >> "$LOG"; }
say "waiting for chain-b"
while grep -sq "tpu_chain_r5b" /proc/[0-9]*/cmdline 2>/dev/null; do
    sleep 120
done
say "chain-b done; colsort A/B"
PYTHONPATH="$REPO:$PYTHONPATH" timeout 14400 \
    python3 "$REPO/scripts/tpu_colsort_ab.py" >> "$LOG" 2>&1 \
    && say "colsort A/B OK" || say "colsort A/B FAILED"
say "chain-c done"
