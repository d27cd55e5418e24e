#!/bin/sh
# Retry wrapper for the TPU gate: the axon tunnel has multi-hour outage
# phases (measured round 4: backend init UNAVAILABLE after 50 min of
# retries). Probe client init with a bounded subprocess; run the full
# gate only when the tunnel answers. Stops after the gate succeeds.
REPO=$(cd "$(dirname "$0")/.." && pwd)
LOG=${TPU_GATE_LOG:-/tmp/gate_r4.log}
while :; do
    if timeout 300 python3 -c "import jax; jax.devices()" >/dev/null 2>&1
    then
        echo "[watchdog] tunnel up $(date -u +%H:%M:%S); running gate" >> "$LOG"
        if PANGENE_TPU_NORTHSTAR=${PANGENE_TPU_NORTHSTAR:-1} \
           PYTHONPATH="$REPO:$PYTHONPATH" \
           python3 "$REPO/scripts/tpu_gate.py" >> "$LOG" 2>&1; then
            echo "[watchdog] gate OK $(date -u +%H:%M:%S)" >> "$LOG"
            exit 0
        fi
        echo "[watchdog] gate FAILED $(date -u +%H:%M:%S); will retry" >> "$LOG"
    else
        echo "[watchdog] tunnel down $(date -u +%H:%M:%S)" >> "$LOG"
    fi
    sleep 600
done
