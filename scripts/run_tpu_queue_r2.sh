#!/bin/bash
# Priority-ordered trim of run_tpu_queue.sh for a short round: highest-value
# A/Bs first so partial completion still yields decisions.  Logs to
# /tmp/q2_*.log (round-specific prefix so round-1 /tmp/q_*.log survives).
# Launch detached:
#   nohup setsid bash scripts/run_tpu_queue_r2.sh > /tmp/tpu_queue_r2.log 2>&1 &
set -u
cd /root/repo

probe() {
    # match bench.py's wait_for_backend budget (up to 240 s per probe): a
    # cold backend init over the tunnel can legitimately take minutes
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

echo "[queue] waiting for TPU tunnel..." ; date
until probe; do
    echo "[queue] tunnel not ready, retrying in 120 s"; date
    sleep 120
done
echo "[queue] tunnel up"; date

run() {  # run <label> <cmd...>
    local label="$1"; shift   # capture before shift — $1 changes
    echo "[queue] === $label ==="; date
    timeout 3000 "$@" > "/tmp/q2_$label.log" 2>&1
    echo "[queue] exit $? — tail:"
    tail -n 12 "/tmp/q2_$label.log"
}

# 1. baseline on this machine (fresh cache)
run bench_base python bench.py

# 2. shared-activation vocoder: e2e A/B (the dominant vocoder cost is AA
#    op overhead; this cuts 18 calls/stage to 6)
run bench_shared env SHARED_ACT_VOC=1 python bench.py

# 3. merged megakernel grid (fixed per-tile cost x 288 tiles)
run bench_merge env MERGE_STAGES=3 python bench.py

# 4. int4 weight-only decode (halves the DMA floor) — both dequant schemes
run bench_int4 env INT4_DECODE=1 python bench.py
run bench_int4x env INT4_DECODE=1 INT4_EXPAND=1 python bench.py
run bench_int4m env INT4_DECODE=1 MERGE_STAGES=3 python bench.py

# 5. serving: grouped baseline vs batched megakernel vs continuous batching
run serving_base python bench_serving.py
run serving_fb env FUSED_BATCH=1 python bench_serving.py
run serving_cont env CONT_BATCH=1 python bench_serving.py
run serving_cont_kv8 env CONT_BATCH=1 INT8_KV=1 python bench_serving.py

# 6. long-form multi-segment bench (segment batching + int8 KV at scale)
run bench_long env BENCH_LONG=1 python bench.py --repeats 3
run bench_long_kv8 env BENCH_LONG=1 INT8_KV=1 python bench.py --repeats 3

# 7. beam-3 (reference default) fused path
run bench_beam3 env BEAMS=3 python bench.py
run bench_beam3_fused env BEAMS=3 FUSED_BEAM=1 python bench.py

# 8. micros if time remains
run voc_ab python scripts/bench_packed_vocoder.py
run micro_int4 python scripts/micro_int4.py

echo "[queue] all done"; date
