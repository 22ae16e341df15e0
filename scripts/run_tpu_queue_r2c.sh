#!/bin/bash
# Round-2 wave C: runs AFTER run_tpu_queue_r2b.sh (waits for its
# "[queue2b] all done" marker).  Profiles where the remaining wall time
# lives at the final defaults (int4 + merge=3) and A/Bs the unmeasured
# synthesis levers.  Logs to /tmp/q2c_*.log.  Launch detached:
#   nohup setsid bash scripts/run_tpu_queue_r2c.sh > /tmp/tpu_queue_r2c.log 2>&1 &
set -u
cd /root/repo

echo "[queue2c] waiting for queue2b to finish..."; date
while ! grep -q "\[queue2b\] all done" /tmp/tpu_queue_r2b.log 2>/dev/null; do
    sleep 60
done
echo "[queue2c] queue2b done"; date

run() {  # run <label> <cmd...>
    local label="$1"; shift
    echo "[queue2c] === $label ==="; date
    timeout 3000 "$@" > "/tmp/q2c_$label.log" 2>&1
    echo "[queue2c] exit $? — tail:"
    tail -n 8 "/tmp/q2c_$label.log"
}

# 1. stage split at final defaults: where do the 333 ms actually go?
run profile_split env FUSE_PIPELINE=0 python bench.py

# 2. int4 per-tile strategy table (kernel sits at ~55% of its DMA floor;
#    the table says which unpack scheme closes the gap)
run micro_int4 python scripts/micro_int4.py

# 3. merge=6 grid with the nibble-packed int4 tiles (fits VMEM only at int4)
run bench_merge6 env MERGE_STAGES=6 python bench.py

# 4. fused resblock-stage Pallas vocoder kernels (never e2e-A/B'd)
run bench_fused_voc env FUSED_VOC=1 python bench.py

# 5. shared-act vocoder retry at the final defaults (r2 A/B was vs the
#    int8/merge0 base; interaction with int4+merge3 unmeasured)
run bench_shared_act env SHARED_ACT_VOC=1 python bench.py

# 6. bf16 s2mel at final defaults (was neutral pre-int4; re-check)
run bench_s2mel_bf16 env S2MEL_BF16=1 python bench.py

echo "[queue2c] all done"; date
