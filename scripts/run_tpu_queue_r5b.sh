#!/bin/bash
# Round-5 wave B: the server-entry proof (c16 burst at the production
# default behind request-batched beam + workload warmup), the beam quality
# study, the full-request overhead decomposition (roofline), and the
# staggered-arrival grouped-vs-continuous A/B (VERDICT item 7).
#   nohup setsid bash scripts/run_tpu_queue_r5b.sh > /tmp/tpu_queue_r5b.log 2>&1 &
set -u
cd /root/repo
mkdir -p bench_results/r5
echo "[queue5b] starting"; date

run() {
    local label="$1"; shift
    echo "[queue5b] === $label ==="; date
    timeout 5400 "$@" > "bench_results/r5/$label.log" 2>&1
    echo "[queue5b] exit $? — tail:"
    tail -n 6 "bench_results/r5/$label.log" | grep -av "xla_bridge"
}

# THE round-5 number: HTTP server entry point, production default config,
# workload warmup, request-batched beam — single + c16 burst
run server_r5            python scripts/bench_server_e2e.py --port 8033 --server-log bench_results/r5/server_r5_serverside.log

# beam-vs-sampling quality study (VERDICT item 6)
run beam_quality         python scripts/beam_quality.py --out bench_results/r5/beam_quality.json

# full-request decomposition for the roofline table (VERDICT item 3)
run measure_overhead     python scripts/measure_overhead.py

# staggered arrivals: grouped vs continuous at the serving fast paths
run arr15_grouped        env FUSED_BATCH=1 INT8_KV=1 python bench_serving.py --concurrency 16 --requests 32 --arrival-rate 1.5
run arr15_cont           env FUSED_BATCH=1 INT8_KV=1 CONT_BATCH=1 python bench_serving.py --concurrency 16 --requests 32 --arrival-rate 1.5
run arr3_grouped         env FUSED_BATCH=1 INT8_KV=1 python bench_serving.py --concurrency 16 --requests 32 --arrival-rate 3
run arr3_cont            env FUSED_BATCH=1 INT8_KV=1 CONT_BATCH=1 python bench_serving.py --concurrency 16 --requests 32 --arrival-rate 3

echo "[queue5b] all done"; date
