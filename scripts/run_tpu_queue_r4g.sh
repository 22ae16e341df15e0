#!/bin/bash
# Round-4 wave G: rerun the wave-C bf16-conditioning cases that crashed
# (dtype fix landed) + unique-speaker serving with the full cold-path fix
# stack (batched conditioning + bf16).  Waits for wave F.
#   nohup setsid bash scripts/run_tpu_queue_r4g.sh > /tmp/tpu_queue_r4g.log 2>&1 &
set -u
cd /root/repo
mkdir -p bench_results/r4

deadline=$((SECONDS + 21600))
until grep -q "\[queue4f\] all done" /tmp/tpu_queue_r4f.log 2>/dev/null; do
    if [ $SECONDS -ge $deadline ]; then
        echo "[queue4g] TIMEOUT waiting for wave F; proceeding anyway"; break
    fi
    sleep 60
done
echo "[queue4g] starting"; date

run() {
    local label="$1"; shift
    echo "[queue4g] === $label ==="; date
    timeout 3000 "$@" > "bench_results/r4/$label.log" 2>&1
    echo "[queue4g] exit $? — tail:"
    tail -n 8 "bench_results/r4/$label.log" | grep -av "xla_bridge"
}

run bench_cold_bf16cond_v2   env COND_BF16=1 python bench.py --mode cold
run bench_int8_bf16cond_v2   env COND_BF16=1 python bench.py
run serving_unique_bf16_v2   env FUSED_BATCH=1 COND_BF16=1 python bench_serving.py --concurrency 16 --requests 32 --unique-speakers

echo "[queue4g] all done"; date
