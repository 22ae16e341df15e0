#!/bin/bash
# Round-3 wave D: profiling decomposition for the last greedy-RTF push +
# closing defaults.  Waits for wave C with a deadline.
#   nohup setsid bash scripts/run_tpu_queue_r3d.sh > /tmp/tpu_queue_r3d.log 2>&1 &
set -u
cd /root/repo
mkdir -p bench_results/r3

deadline=$((SECONDS + 18000))
until grep -q "\[queue3c\] all done" /tmp/tpu_queue_r3c.log 2>/dev/null; do
    if [ $SECONDS -ge $deadline ]; then
        echo "[queue3d] TIMEOUT waiting for wave C; proceeding anyway"; break
    fi
    sleep 60
done
echo "[queue3d] starting"; date

run() {
    local label="$1"; shift
    echo "[queue3d] === $label ==="; date
    timeout 3000 "$@" > "bench_results/r3/$label.log" 2>&1
    echo "[queue3d] exit $? — tail:"
    tail -n 8 "bench_results/r3/$label.log" | grep -av "xla_bridge"
}

export PYTHONPATH=/root/repo:${PYTHONPATH:-}

run prof_step_parts   python scripts/bench_step_parts.py
run prof_synth        python scripts/bench_synth.py
run prof_overhead     python scripts/measure_overhead.py

echo "[queue3d] all done"; date
