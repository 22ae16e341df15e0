#!/bin/bash
# Round-4 wave F: batched readout fold A/Bs (beam-3 default path + grouped
# serving) + the candidate serving-profile composition (rofold + kv8 +
# cfm_unroll=5 + bf16 cond).  Waits for wave E.
#   nohup setsid bash scripts/run_tpu_queue_r4f.sh > /tmp/tpu_queue_r4f.log 2>&1 &
set -u
cd /root/repo
mkdir -p bench_results/r4

deadline=$((SECONDS + 21600))
until grep -q "\[queue4e\] all done" /tmp/tpu_queue_r4e.log 2>/dev/null; do
    if [ $SECONDS -ge $deadline ]; then
        echo "[queue4f] TIMEOUT waiting for wave E; proceeding anyway"; break
    fi
    sleep 60
done
echo "[queue4f] starting"; date

run() {
    local label="$1"; shift
    echo "[queue4f] === $label ==="; date
    timeout 3000 "$@" > "bench_results/r4/$label.log" 2>&1
    echo "[queue4f] exit $? — tail:"
    tail -n 8 "bench_results/r4/$label.log" | grep -av "xla_bridge"
}

# gate the new batched rofold kernels first
run gate_rofold_batch        python scripts/compile_gate.py --only rofold --out bench_results/r4/GATE_ROFOLD_B.json

# beam-3 with the folded readout (on top of the sort-free candidates)
run beam3_rofold_kv8         env FUSED_BEAM=1 BEAMS=3 INT8_KV=1 FOLD_READOUT=1 python bench.py

# the full composition candidate for the round-4 serving profile
run bench_composed           env FOLD_READOUT=1 INT8_KV=1 CFM_UNROLL=5 COND_BF16=1 python bench.py
run long_composed            env BENCH_LONG=1 FOLD_READOUT=1 INT8_KV=1 CFM_UNROLL=5 COND_BF16=1 python bench.py
run long_beam3_composed      env BENCH_LONG=1 FUSED_BEAM=1 BEAMS=3 INT8_KV=1 FOLD_READOUT=1 CFM_UNROLL=5 python bench.py

# grouped serving with the folded readout
run serving_fb_rofold        env FUSED_BATCH=1 FOLD_READOUT=1 python bench_serving.py --concurrency 16 --requests 32

echo "[queue4f] all done"; date
