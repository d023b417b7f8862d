#!/bin/bash
# Tunnel-safe gate runner: the axon TPU tunnel can wedge (a fresh process
# connecting right after another job finishes sometimes hangs on a device
# RPC at ~0% CPU — docs/STATUS.md "Known gaps").  This wrapper (1) polls
# the chip with a tiny jitted matmul until it answers, (2) runs the gate,
# (3) detects a startup hang (no log growth AND no CPU burn across the
# gate's whole process group) and retries.  The CPU check is what keeps a
# healthy-but-quiet phase (a long XLA compile writes no log output for
# many minutes) from being killed as a wedge.
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

# Sum utime+stime (jiffies) over the process group $1 — the gate runs
# under setsid, so its pgid == its pid and covers any subprocess it
# spawns (e.g. the real CLI).  /proc/<pid>/stat after the ')' of comm:
# field 1=state 2=ppid 3=pgrp ... 12=utime 13=stime.
group_cpu() {
    # capture the pgid before `set --` replaces the positional parameters
    local pg=$1 total=0 stat rest
    for stat in /proc/[0-9]*/stat; do
        rest=$(cut -d')' -f2- "$stat" 2>/dev/null) || continue
        set -- $rest
        if [ "${3:-}" = "$pg" ]; then
            total=$((total + ${12:-0} + ${13:-0}))
        fi
    done
    echo "$total"
}

for attempt in 1 2 3; do
    until probe; do
        echo "[run_gate] chip probe failed; waiting 180s" >> "$LOG"
        sleep 180
    done
    echo "[run_gate] attempt $attempt" >> "$LOG"
    PYTHONPATH="$PWD:${PYTHONPATH:-}" setsid python \
        examples/train_synthetic.py "$@" >> "$LOG" 2>&1 &
    PID=$!
    # hang detector: kill only if BOTH the log is static for 10 min AND
    # the process group burned <6s of CPU in that window (a wedged device
    # RPC spins at ~0%; a quiet compile runs at ~100%)
    while kill -0 "$PID" 2>/dev/null; do
        SIZE1=$(wc -c < "$LOG"); CPU1=$(group_cpu "$PID")
        # 600s window, sliced so a finished run is noticed within 30s
        for _ in $(seq 20); do
            sleep 30
            kill -0 "$PID" 2>/dev/null || break 2
        done
        SIZE2=$(wc -c < "$LOG"); CPU2=$(group_cpu "$PID")
        if [ "$SIZE1" = "$SIZE2" ] && [ $((CPU2 - CPU1)) -lt 600 ]; then
            echo "[run_gate] no log or CPU progress in 10 min - killing $PID" \
                >> "$LOG"
            kill -- "-$PID" 2>/dev/null; sleep 8
            kill -9 -- "-$PID" 2>/dev/null
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
