#!/bin/sh
# Retry wrapper for the real-chip evidence chain: the axon tunnel has
# multi-hour outage phases (measured round 4: backend init UNAVAILABLE
# after 50 min of retries). Probe client init with a bounded subprocess;
# when the tunnel answers, run the full chain in one phase:
#   1. tpu_gate.py   (small + big [+ northstar] end-to-end, md5-pinned)
#   2. tpu_roundprof.py small   (on-chip block attribution, warm cache)
#   3. tpu_utilization.py small (busy fraction + roofline -> TPU_GATE)
#   4. compile_split.py small   (fresh-compile wall split; disables the
#      persistent cache, so it runs LAST)
# Stops after the gate succeeds (later steps are best-effort).
REPO=$(cd "$(dirname "$0")/.." && pwd)
LOG=${TPU_GATE_LOG:-/tmp/gate_r4.log}
say() { echo "[watchdog] $1 $(date -u +%H:%M:%S)" >> "$LOG"; }
while :; do
    if timeout 300 python3 -c "import jax; jax.devices()" >/dev/null 2>&1
    then
        say "tunnel up; running gate"
        if PANGENE_TPU_NORTHSTAR=${PANGENE_TPU_NORTHSTAR:-1} \
           PYTHONPATH="$REPO:$PYTHONPATH" \
           python3 "$REPO/scripts/tpu_gate.py" >> "$LOG" 2>&1; then
            say "gate OK; roundprof"
            PYTHONPATH="$REPO:$PYTHONPATH" timeout 7200 \
                python3 "$REPO/scripts/tpu_roundprof.py" small \
                >> "$LOG" 2>&1 && say "roundprof OK" || say "roundprof FAILED"
            say "utilization"
            PYTHONPATH="$REPO:$PYTHONPATH" timeout 7200 \
                python3 "$REPO/scripts/tpu_utilization.py" small \
                >> "$LOG" 2>&1 && say "utilization OK" || say "utilization FAILED"
            say "roundprof big (block attribution at the scale that matters)"
            PANGENE_ROUNDPROF_OUT="$REPO/TPU_ROUNDPROF_big.json" \
                PYTHONPATH="$REPO:$PYTHONPATH" timeout 10800 \
                python3 "$REPO/scripts/tpu_roundprof.py" big \
                >> "$LOG" 2>&1 && say "roundprof big OK" || say "roundprof big FAILED"
            say "compile split (fresh compile, last)"
            PYTHONPATH="$REPO:$PYTHONPATH" timeout 7200 \
                python3 "$REPO/scripts/compile_split.py" small \
                >> "$LOG" 2>&1 && say "compile_split OK" || say "compile_split FAILED"
            say "chain done"
            exit 0
        fi
        say "gate FAILED; will retry"
    else
        say "tunnel down"
    fi
    sleep 600
done
