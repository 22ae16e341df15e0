#!/bin/bash
# Round-4 wave D: readout-fold compile gate + e2e A/B; batched-conditioning
# unique-speaker serving; beam profiler rerun (path-fix).  Waits for wave C.
#   nohup setsid bash scripts/run_tpu_queue_r4d.sh > /tmp/tpu_queue_r4d.log 2>&1 &
set -u
cd /root/repo
mkdir -p bench_results/r4

deadline=$((SECONDS + 14400))
until grep -q "\[queue4c\] all done" /tmp/tpu_queue_r4c.log 2>/dev/null; do
    if [ $SECONDS -ge $deadline ]; then
        echo "[queue4d] TIMEOUT waiting for wave C; proceeding anyway"; break
    fi
    sleep 60
done
echo "[queue4d] starting"; date

run() {
    local label="$1"; shift
    echo "[queue4d] === $label ==="; date
    timeout 3000 "$@" > "bench_results/r4/$label.log" 2>&1
    echo "[queue4d] exit $? — tail:"
    tail -n 8 "bench_results/r4/$label.log" | grep -av "xla_bridge"
}

# readout-fold kernels must lower on real libtpu before anything else
run gate_rofold              python scripts/compile_gate.py --only rofold --out bench_results/r4/GATE_ROFOLD.json

# e2e A/B: folded readout (int8 mel_head through the kernel pipeline)
run bench_rofold             env FOLD_READOUT=1 python bench.py
run bench_rofold_kv8         env FOLD_READOUT=1 INT8_KV=1 python bench.py

# beam-step decomposition (path-fixed)
run prof_beam_legacy2        python scripts/prof_beam_parts.py --legacy
run prof_beam_new2           python scripts/prof_beam_parts.py

# unique-speaker serving with the batched conditioning warm (+ bf16 cond)
run serving_fb_unique_batchcond      env FUSED_BATCH=1 python bench_serving.py --concurrency 16 --requests 32 --unique-speakers
run serving_fb_unique_batchcond_bf16 env FUSED_BATCH=1 COND_BF16=1 python bench_serving.py --concurrency 16 --requests 32 --unique-speakers

echo "[queue4d] all done"; date
