#!/bin/bash
# Round-4 wave H (closing): flagship-dims quality gate (now incl.
# int8_rofold) + the FULL live compile gate refresh -> COMPILE_GATE.json.
# Waits for wave G.
#   nohup setsid bash scripts/run_tpu_queue_r4h.sh > /tmp/tpu_queue_r4h.log 2>&1 &
set -u
cd /root/repo
mkdir -p bench_results/r4

deadline=$((SECONDS + 28800))
until grep -q "\[queue4g\] all done" /tmp/tpu_queue_r4g.log 2>/dev/null; do
    if [ $SECONDS -ge $deadline ]; then
        echo "[queue4h] TIMEOUT waiting for wave G; proceeding anyway"; break
    fi
    sleep 60
done
echo "[queue4h] starting"; date

run() {
    local label="$1"; shift
    echo "[queue4h] === $label ==="; date
    timeout 4800 "$@" > "bench_results/r4/$label.log" 2>&1
    echo "[queue4h] exit $? — tail:"
    tail -n 8 "bench_results/r4/$label.log" | grep -av "xla_bridge"
}

run int4_quality_r4          python scripts/int4_quality.py --steps 96 --prompts 3 --out bench_results/r4/int4_quality.json
run compile_gate_full        python scripts/compile_gate.py --out COMPILE_GATE.json

# server-entry bench rerun with the FINAL round-4 profile (rofold +
# bf16 conditioning + cfm_unroll=5 defaults landed after wave E started)
run server_default_bench_v2  python scripts/bench_server_e2e.py --port 8032

# headline at the new engine defaults (plain bench.py = the driver's run)
run bench_final_defaults     python bench.py
run long_final_defaults      env BENCH_LONG=1 INT8_KV=1 python bench.py
run serving_fb_final         env FUSED_BATCH=1 python bench_serving.py --concurrency 16 --requests 32

echo "[queue4h] all done"; date
