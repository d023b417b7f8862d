#!/bin/bash
# Tunnel-safe gate runner: the axon TPU tunnel can wedge (a fresh process
# connecting right after another job finishes sometimes hangs on a device
# RPC at ~0% CPU — docs/STATUS.md "Known gaps").  This wrapper (1) polls
# the chip with a tiny jitted matmul until it answers, (2) runs the gate,
# (3) detects a startup hang (no log growth) and retries.
#
#   scripts/run_gate.sh <logfile> <train_synthetic.py args...>
set -u
LOG="$1"; shift
cd "$(dirname "$0")/.."

probe() {
    timeout 150 python -c "
import jax, jax.numpy as jnp, numpy as np
np.asarray(jnp.ones((128,128)) @ jnp.ones((128,128)))
print('probe ok')" >/dev/null 2>&1
}

for attempt in 1 2 3; do
    until probe; do
        echo "[run_gate] chip probe failed; waiting 180s" >> "$LOG"
        sleep 180
    done
    echo "[run_gate] attempt $attempt" >> "$LOG"
    PYTHONPATH="$PWD:${PYTHONPATH:-}" python examples/train_synthetic.py \
        "$@" >> "$LOG" 2>&1 &
    PID=$!
    # startup-hang detector: if the log stops growing for 10 min while
    # the process burns no CPU, kill and retry
    while kill -0 "$PID" 2>/dev/null; do
        SIZE1=$(wc -c < "$LOG")
        sleep 600
        kill -0 "$PID" 2>/dev/null || break
        SIZE2=$(wc -c < "$LOG")
        if [ "$SIZE1" = "$SIZE2" ]; then
            echo "[run_gate] no log progress in 10 min - killing $PID" \
                >> "$LOG"
            kill "$PID" 2>/dev/null; sleep 8; kill -9 "$PID" 2>/dev/null
            sleep 240
            continue 2
        fi
    done
    wait "$PID"
    RC=$?
    echo "[run_gate] exit=$RC" >> "$LOG"
    exit $RC
done
echo "[run_gate] giving up after 3 attempts" >> "$LOG"
exit 75
