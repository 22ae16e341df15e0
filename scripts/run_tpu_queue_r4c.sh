#!/bin/bash
# Round-4 wave C: bf16 conditioning cold-prompt A/B + long-form TTFA
# (short-form text fits one segment, so TTFA needs BENCH_LONG) + the
# unique-speaker serving A/B with bf16 conditioning.  Waits for wave B.
#   nohup setsid bash scripts/run_tpu_queue_r4c.sh > /tmp/tpu_queue_r4c.log 2>&1 &
set -u
cd /root/repo
mkdir -p bench_results/r4

deadline=$((SECONDS + 14400))
until grep -q "\[queue4b\] all done" /tmp/tpu_queue_r4b.log 2>/dev/null; do
    if [ $SECONDS -ge $deadline ]; then
        echo "[queue4c] TIMEOUT waiting for wave B; proceeding anyway"; break
    fi
    sleep 60
done
echo "[queue4c] starting"; date

run() {
    local label="$1"; shift
    echo "[queue4c] === $label ==="; date
    timeout 3000 "$@" > "bench_results/r4/$label.log" 2>&1
    echo "[queue4c] exit $? — tail:"
    tail -n 8 "bench_results/r4/$label.log" | grep -av "xla_bridge"
}

# cold-prompt conditioning: f32 (wave A: 0.2437s prepare) vs bf16
run bench_cold_bf16cond      env COND_BF16=1 python bench.py --mode cold
# warm headline must not regress with bf16 conditioning on
run bench_int8_bf16cond      env COND_BF16=1 python bench.py

# TTFA on long-form text (2-3 segments of <=120 tokens)
run ttfa_long_q0             env BENCH_LONG=1 python bench.py --mode ttfa
run ttfa_long_q20            env BENCH_LONG=1 QUICK_TOKENS=20 python bench.py --mode ttfa

# unique-speaker serving with bf16 conditioning (wave A = f32 reference)
run serving_fb_unique_bf16   env FUSED_BATCH=1 COND_BF16=1 python bench_serving.py --concurrency 16 --requests 32 --unique-speakers

echo "[queue4c] all done"; date
