#!/bin/sh
# Retry wrapper for the real-chip evidence chain: the axon tunnel has
# multi-hour outage phases (measured round 4: backend init UNAVAILABLE
# after 50 min of retries) and mid-run FAILED_PRECONDITION flakes.
# Probe client init with a bounded subprocess; when the tunnel answers,
# run the round-5 chain in one phase (most-valuable-evidence-first; every
# script dumps its artifact incrementally):
#   1. tpu_gate.py           (big corpus >=3 reps w/ median + small, md5)
#   2. tpu_roundprof.py northstar  (VERDICT r4 #1: attribute the 3.9M-
#      record blowup on chip; ~6 pipeline runs, hours)
#   3. tpu_utilization.py small + big (fixed interval-union busy_frac)
#   4. tpu_roundprof.py big  (refresh block attribution, warm cache)
#   5. compile_split.py small (disables the persistent cache => LAST)
# Stops after the gate succeeds (later steps are best-effort).
REPO=$(cd "$(dirname "$0")/.." && pwd)
LOG=${TPU_GATE_LOG:-/tmp/gate_r5.log}
say() { echo "[watchdog] $1 $(date -u +%H:%M:%S)" >> "$LOG"; }
while :; do
    if timeout 300 python3 -c "import jax; jax.devices()" >/dev/null 2>&1
    then
        say "tunnel up; running gate"
        if PANGENE_TPU_NORTHSTAR=${PANGENE_TPU_NORTHSTAR:-0} \
           PANGENE_TPU_BIG_REPS=${PANGENE_TPU_BIG_REPS:-4} \
           PYTHONPATH="$REPO:$PYTHONPATH" \
           python3 "$REPO/scripts/tpu_gate.py" >> "$LOG" 2>&1; then
            say "gate OK; roundprof northstar (VERDICT #1)"
            PYTHONPATH="$REPO:$PYTHONPATH" timeout 28800 \
                python3 "$REPO/scripts/tpu_roundprof.py" northstar \
                >> "$LOG" 2>&1 && say "roundprof northstar OK" \
                || say "roundprof northstar FAILED"
            for sc in small big; do
                say "utilization $sc"
                PYTHONPATH="$REPO:$PYTHONPATH" timeout 7200 \
                    python3 "$REPO/scripts/tpu_utilization.py" "$sc" \
                    >> "$LOG" 2>&1 && say "utilization $sc OK" \
                    || say "utilization $sc FAILED"
            done
            say "roundprof big (refresh, warm cache)"
            PYTHONPATH="$REPO:$PYTHONPATH" timeout 10800 \
                python3 "$REPO/scripts/tpu_roundprof.py" big \
                >> "$LOG" 2>&1 && say "roundprof big OK" \
                || say "roundprof big FAILED"
            say "compile split (fresh compile, last)"
            PYTHONPATH="$REPO:$PYTHONPATH" timeout 7200 \
                python3 "$REPO/scripts/compile_split.py" small \
                >> "$LOG" 2>&1 && say "compile_split OK" \
                || say "compile_split FAILED"
            say "chain done"
            exit 0
        fi
        say "gate FAILED; will retry"
    else
        say "tunnel down"
    fi
    sleep 600
done
