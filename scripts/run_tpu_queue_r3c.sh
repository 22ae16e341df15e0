#!/bin/bash
# Round-3 wave C: react to wave A2/B results.
#  - beam-3 re-measure with the vectorized scorer (union top-k pool update)
#  - int4 wide-group A/B (INT4_GROUP=640: full-rate MXU sub-dots)
#  - serving: grouped-fused + int8 KV; continuous with bigger chunks; the
#    staggered-arrival workload continuous batching is FOR (Poisson 3 req/s)
# Waits for wave B's marker with a deadline.
#   nohup setsid bash scripts/run_tpu_queue_r3c.sh > /tmp/tpu_queue_r3c.log 2>&1 &
set -u
cd /root/repo
mkdir -p bench_results/r3

deadline=$((SECONDS + 14400))
until grep -q "\[queue3b\] all done" /tmp/tpu_queue_r3b.log 2>/dev/null; do
    if [ $SECONDS -ge $deadline ]; then
        echo "[queue3c] TIMEOUT waiting for wave B; proceeding anyway"; break
    fi
    sleep 60
done
echo "[queue3c] starting"; date

run() {
    local label="$1"; shift
    echo "[queue3c] === $label ==="; date
    timeout 3000 "$@" > "bench_results/r3/$label.log" 2>&1
    echo "[queue3c] exit $? — tail:"
    tail -n 6 "bench_results/r3/$label.log" | grep -av "xla_bridge"
}

# beam with the vectorized scorer
run beam3_fused_int8_v2      env INT4_DECODE=0 FUSED_BEAM=1 BEAMS=3 python bench.py
run beam3_fused_int8_kv8_v2  env INT4_DECODE=0 INT8_KV=1 FUSED_BEAM=1 BEAMS=3 python bench.py

# int4 wide-group (G=2) greedy
run bench_int4_g640          env INT4_GROUP=640 python bench.py
run bench_int4_g640_m6       env INT4_GROUP=640 MERGE_STAGES=6 python bench.py

# serving follow-ups
run serving_fb_kv8           env FUSED_BATCH=1 INT8_KV=1 python bench_serving.py --concurrency 16 --requests 32
run serving_cont_fb_c64      env CONT_BATCH=1 CHUNK_STEPS=64 python bench_serving.py --concurrency 16 --requests 32
run serving_arrv3_grouped    env FUSED_BATCH=1 python bench_serving.py --concurrency 16 --requests 32 --arrival-rate 3
run serving_arrv3_cont       env CONT_BATCH=1 CHUNK_STEPS=32 python bench_serving.py --concurrency 16 --requests 32 --arrival-rate 3

echo "[queue3c] all done"; date
