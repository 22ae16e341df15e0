#!/bin/bash
# Round-4 wave I: final-default headline benches + server-entry rerun at
# the landed round-4 profile.
#   nohup setsid bash scripts/run_tpu_queue_r4i.sh > /tmp/tpu_queue_r4i.log 2>&1 &
set -u
cd /root/repo
mkdir -p bench_results/r4
echo "[queue4i] starting"; date

run() {
    local label="$1"; shift
    echo "[queue4i] === $label ==="; date
    timeout 4800 "$@" > "bench_results/r4/$label.log" 2>&1
    echo "[queue4i] exit $? — tail:"
    tail -n 6 "bench_results/r4/$label.log" | grep -av "xla_bridge"
}

# headline at the new engine/bench defaults (plain bench.py = driver's run)
run bench_final_defaults     python bench.py
run long_final_defaults      env BENCH_LONG=1 INT8_KV=1 python bench.py
run serving_fb_final         env FUSED_BATCH=1 python bench_serving.py --concurrency 16 --requests 32

# server entry point with the FULL round-4 profile (rofold + bf16 cond +
# release_master_trees + compile cache)
run server_default_bench_v2  python scripts/bench_server_e2e.py --port 8032

echo "[queue4i] all done"; date
