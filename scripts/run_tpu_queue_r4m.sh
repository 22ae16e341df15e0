#!/bin/bash
# Round-4 wave M: server-entry bench rerun with the boot-warmup fix (the
# wave-L run 504'd: final-profile cold-cache compile exceeded the 300 s
# request window — now absorbed at boot before /health goes ready).
#   nohup setsid bash scripts/run_tpu_queue_r4m.sh > /tmp/tpu_queue_r4m.log 2>&1 &
set -u
cd /root/repo
mkdir -p bench_results/r4
deadline=$((SECONDS + 7200))
until grep -q "\[queue4l\] all done" /tmp/tpu_queue_r4l.log 2>/dev/null; do
    if [ $SECONDS -ge $deadline ]; then echo "[queue4m] TIMEOUT"; break; fi
    sleep 60
done
echo "[queue4m] starting"; date
run() {
    local label="$1"; shift
    echo "[queue4m] === $label ==="; date
    timeout 4800 "$@" > "bench_results/r4/$label.log" 2>&1
    echo "[queue4m] exit $? — tail:"
    tail -n 6 "bench_results/r4/$label.log" | grep -av "xla_bridge"
}
run server_default_bench_v2  python scripts/bench_server_e2e.py --port 8033
echo "[queue4m] all done"; date
