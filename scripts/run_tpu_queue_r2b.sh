#!/bin/bash
# Round-2 finals: re-run the serving A/Bs that died on the batched-kernel
# Mosaic shape-cast bug (now fixed), plus the final-defaults bench numbers.
# Logs to /tmp/q2b_*.log.  Launch detached:
#   nohup setsid bash scripts/run_tpu_queue_r2b.sh > /tmp/tpu_queue_r2b.log 2>&1 &
set -u
cd /root/repo

probe() {
    timeout 300 python - <<'EOF'
import os, time, traceback
try:
    import jax, jax.numpy as jnp
    t0 = time.time()
    d = jax.devices()
    print("devices:", d, "init_s:", round(time.time() - t0, 1), flush=True)
    print("sum:", float(jnp.sum(jnp.ones((8, 128)))), flush=True)
except Exception:
    traceback.print_exc()
    os._exit(1)
os._exit(0)
EOF
}

echo "[queue2b] waiting for TPU tunnel..." ; date
until probe; do
    echo "[queue2b] tunnel not ready, retrying in 120 s"; date
    sleep 120
done
echo "[queue2b] tunnel up"; date

run() {  # run <label> <cmd...>
    local label="$1"; shift
    echo "[queue2b] === $label ==="; date
    timeout 3000 "$@" > "/tmp/q2b_$label.log" 2>&1
    echo "[queue2b] exit $? — tail:"
    tail -n 8 "/tmp/q2b_$label.log"
}

# 0. batched-kernel compile smoke (the Mosaic fix, on-chip)
run batch_smoke python scripts/batch_smoke.py

# 1. final-defaults single-request bench (int4 + merge=3 + 448 prompt bucket)
run bench_final python bench.py

# 2. beam-3 at final defaults through the (fixed) batched megakernel
run bench_beam3_fused_b env BEAMS=3 FUSED_BEAM=1 python bench.py

# 3. serving A/Bs with the fixed batched kernel (int8 weights: the batched
#    pack is int8/int4-agnostic, keep the same class as serving_base)
run serving_fb_b env FUSED_BATCH=1 python bench_serving.py
run serving_cont_b env CONT_BATCH=1 python bench_serving.py
run serving_cont_kv8_b env CONT_BATCH=1 INT8_KV=1 python bench_serving.py
run serving_final python bench_serving.py

# 4. long-form at final defaults (+ int8 KV A/B at 1536 ctx)
run bench_long_b env BENCH_LONG=1 python bench.py --repeats 3
run bench_long_kv8_b env BENCH_LONG=1 INT8_KV=1 python bench.py --repeats 3

echo "[queue2b] all done"; date
