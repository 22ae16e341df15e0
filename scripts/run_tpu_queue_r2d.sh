#!/bin/bash
# Round-2 wave D: runs AFTER run_tpu_queue_r2c.sh (waits for its
# "[queue2c] all done" marker).  A/Bs the i8sh int4 unpack scheme e2e,
# the non-fused beam-3 path, and serving with the int4 batched pack.
# Logs to /tmp/q2d_*.log.  Launch detached:
#   nohup setsid bash scripts/run_tpu_queue_r2d.sh > /tmp/tpu_queue_r2d.log 2>&1 &
set -u
cd /root/repo

echo "[queue2d] waiting for queue2c to finish..."; date
deadline=$((SECONDS + 10800))   # don't spin forever if queue2c died
while ! grep -q "\[queue2c\] all done" /tmp/tpu_queue_r2c.log 2>/dev/null; do
    if [ $SECONDS -ge $deadline ]; then
        echo "[queue2d] TIMEOUT waiting for queue2c; proceeding anyway"; break
    fi
    sleep 60
done
echo "[queue2d] queue2c done (or timed out)"; date

run() {  # run <label> <cmd...>
    local label="$1"; shift
    echo "[queue2d] === $label ==="; date
    timeout 3000 "$@" > "/tmp/q2d_$label.log" 2>&1
    echo "[queue2d] exit $? — tail:"
    tail -n 8 "/tmp/q2d_$label.log"
}

# 1. i8sh unpack scheme e2e (identical numerics to the default mask unpack)
run bench_i8sh env INT4_SCHEME=i8sh python bench.py

# 2. i8sh + merge=6 (if merge6 won in queue2c this is the combined candidate)
run bench_i8sh_m6 env INT4_SCHEME=i8sh MERGE_STAGES=6 python bench.py

# 3. beam-3 WITHOUT the fused batched kernel (XLA beam path A/B vs 0.2388)
run bench_beam3_xla env BEAMS=3 FUSED_BEAM=0 python bench.py

# 4. serving with continuous batching + int8 KV + batched megakernel
#    (the full stack: queue2b measured them separately)
run serving_cont_fb_kv8 env CONT_BATCH=1 FUSED_BATCH=1 INT8_KV=1 python bench_serving.py

echo "[queue2d] all done"; date
