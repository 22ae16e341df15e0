#!/bin/bash
# Round-3 wave F (final): the A/Bs wave C mislabeled + a sub-saturation
# arrival-rate pair (wave C ran 3 req/s = ~97% utilization, where queueing
# dominates any scheduler).  Waits for wave E with a deadline.
#   nohup setsid bash scripts/run_tpu_queue_r3f.sh > /tmp/tpu_queue_r3f.log 2>&1 &
set -u
cd /root/repo
mkdir -p bench_results/r3

deadline=$((SECONDS + 21600))
until grep -q "\[queue3e\] all done" /tmp/tpu_queue_r3e.log 2>/dev/null; do
    if [ $SECONDS -ge $deadline ]; then
        echo "[queue3f] TIMEOUT waiting for wave E; proceeding anyway"; break
    fi
    sleep 60
done
echo "[queue3f] starting"; date

run() {
    local label="$1"; shift
    echo "[queue3f] === $label ==="; date
    timeout 3000 "$@" > "bench_results/r3/$label.log" 2>&1
    echo "[queue3f] exit $? — tail:"
    tail -n 6 "bench_results/r3/$label.log" | grep -av "xla_bridge"
}

# the int4 group-width A/B wave C meant to run (INT4_DECODE was left off)
run bench_int4_g128_real     env INT4_DECODE=1 python bench.py
run bench_int4_g640_real     env INT4_DECODE=1 INT4_GROUP=640 python bench.py

# sub-saturation arrivals (1.5 req/s ~ 48% util): the latency regime
run serving_arrv15_grouped   env FUSED_BATCH=1 python bench_serving.py --concurrency 16 --requests 24 --arrival-rate 1.5
run serving_arrv15_cont      env CONT_BATCH=1 CHUNK_STEPS=32 python bench_serving.py --concurrency 16 --requests 24 --arrival-rate 1.5

echo "[queue3f] all done"; date
