#!/bin/bash
# Round-5 wave C: server rerun behind the ADAPTIVE decode-cap learning
# (warmup learns observed lengths so the doomed low-cap attempt stops
# repeating), full gate refresh incl. the b12-long kernel, bench repeat,
# fixed beam-quality/overhead runs, and DOUBLE-RUN arrival A/Bs (first
# run compiles, second run is the clean number).
set -u
cd /root/repo
mkdir -p bench_results/r5
echo "[queue5c] starting"; date

run() {
    local label="$1"; shift
    echo "[queue5c] === $label ==="; date
    timeout 5400 "$@" > "bench_results/r5/$label.log" 2>&1
    echo "[queue5c] exit $? — tail:"
    tail -n 4 "bench_results/r5/$label.log" | grep -av "xla_bridge"
}

run gate_full_v2         python scripts/compile_gate.py --out COMPILE_GATE.json
run bench_default_repeat python bench.py
run server_r5_v2         python scripts/bench_server_e2e.py --port 8034 --server-log bench_results/r5/server_r5_v2_serverside.log
run beam_quality_v2      python scripts/beam_quality.py --out bench_results/r5/beam_quality.json
run measure_overhead_v2  env PYTHONPATH=/root/repo python scripts/measure_overhead.py
run arr15_grouped_w      env FUSED_BATCH=1 INT8_KV=1 python bench_serving.py --concurrency 16 --requests 32 --arrival-rate 1.5
run arr15_grouped_v2     env FUSED_BATCH=1 INT8_KV=1 python bench_serving.py --concurrency 16 --requests 32 --arrival-rate 1.5
run arr15_cont_w         env FUSED_BATCH=1 INT8_KV=1 CONT_BATCH=1 python bench_serving.py --concurrency 16 --requests 32 --arrival-rate 1.5
run arr15_cont_v2        env FUSED_BATCH=1 INT8_KV=1 CONT_BATCH=1 python bench_serving.py --concurrency 16 --requests 32 --arrival-rate 1.5

echo "[queue5c] all done"; date
