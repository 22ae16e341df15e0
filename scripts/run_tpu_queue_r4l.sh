#!/bin/bash
# Round-4 wave L: rerun everything the machine restart ate —
# final-default headline benches, the server-entry rerun at the landed
# round-4 profile, the final c16 serving number, the wave-J long-form
# rofold A/B + short-form noise-band repeats, and the wave-K int8
# merge_stages=6 A/B.
#   nohup setsid bash scripts/run_tpu_queue_r4l.sh > /tmp/tpu_queue_r4l.log 2>&1 &
set -u
cd /root/repo
mkdir -p bench_results/r4
echo "[queue4l] starting"; date

run() {
    local label="$1"; shift
    echo "[queue4l] === $label ==="; date
    timeout 3600 "$@" > "bench_results/r4/$label.log" 2>&1
    echo "[queue4l] exit $? — tail:"
    tail -n 6 "bench_results/r4/$label.log" | grep -av "xla_bridge"
}

# headline at the new engine/bench defaults (plain bench.py = driver's run)
run bench_final_defaults     python bench.py
run long_final_defaults      env BENCH_LONG=1 INT8_KV=1 python bench.py

# server entry point with the FULL round-4 profile (rofold + bf16 cond +
# release_master_trees + compile cache)
run server_default_bench_v2  python scripts/bench_server_e2e.py --port 8032

run serving_fb_final         env FUSED_BATCH=1 python bench_serving.py --concurrency 16 --requests 32

# wave J: long-form rofold A/B + short-form repeats for the noise band
run long_norofold_ab         env BENCH_LONG=1 INT8_KV=1 FOLD_READOUT=0 python bench.py
run bench_norofold_repeat    env FOLD_READOUT=0 python bench.py

# wave K: int8 merge_stages=6 A/B (64 MiB VMEM now admits the block)
run bench_int8_m6            env MERGE_STAGES=6 python bench.py
run bench_int8_m6_norofold   env MERGE_STAGES=6 FOLD_READOUT=0 python bench.py

echo "[queue4l] all done"; date
