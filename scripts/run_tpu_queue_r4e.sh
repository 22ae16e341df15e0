#!/bin/bash
# Round-4 wave E: the SERVER-entry-point bench (no env vars — measures what
# `serving/app.py` actually serves under the default profile).  Waits for
# wave D.
#   nohup setsid bash scripts/run_tpu_queue_r4e.sh > /tmp/tpu_queue_r4e.log 2>&1 &
set -u
cd /root/repo
mkdir -p bench_results/r4

deadline=$((SECONDS + 18000))
until grep -q "\[queue4d\] all done" /tmp/tpu_queue_r4d.log 2>/dev/null; do
    if [ $SECONDS -ge $deadline ]; then
        echo "[queue4e] TIMEOUT waiting for wave D; proceeding anyway"; break
    fi
    sleep 60
done
echo "[queue4e] starting"; date

run() {
    local label="$1"; shift
    echo "[queue4e] === $label ==="; date
    timeout 4800 "$@" > "bench_results/r4/$label.log" 2>&1
    echo "[queue4e] exit $? — tail:"
    tail -n 6 "bench_results/r4/$label.log" | grep -av "xla_bridge"
}

run server_default_bench     python scripts/bench_server_e2e.py --port 8031

echo "[queue4e] all done"; date
