#!/bin/bash
# Round-3 measurement queue, wave A: the on-chip numbers VERDICT demands —
# beam-3 via the ancestor-table megakernel (reference default config),
# the continuous-serving stack (first time the batched kernel compiles on
# libtpu), i8sh, and long-form.  Logs land in bench_results/r3/ (COMMITTED —
# round-2 lesson: no measurement may exist only in /tmp).
# Launch detached:
#   nohup setsid bash scripts/run_tpu_queue_r3.sh > /tmp/tpu_queue_r3.log 2>&1 &
set -u
cd /root/repo
mkdir -p bench_results/r3

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

echo "[queue3] waiting for TPU tunnel..." ; date
until probe; do
    echo "[queue3] tunnel not ready, retrying in 120 s"; date
    sleep 120
done
echo "[queue3] tunnel up"; date

run() {  # run <label> <cmd...>
    local label="$1"; shift
    echo "[queue3] === $label ==="; date
    timeout 3000 "$@" > "bench_results/r3/$label.log" 2>&1
    echo "[queue3] exit $? — tail:"
    tail -n 6 "bench_results/r3/$label.log" | grep -av "xla_bridge"
}

# --- single-request RTF: current default + the new-kernel A/Bs ---
run bench_default            python bench.py
run bench_i8sh               env INT4_SCHEME=i8sh python bench.py
# reference DEFAULT decode config (num_beams=3) through the ancestor-table
# fused beam path: int8, int8+kv8, int4
run beam3_fused_int8         env INT4_DECODE=0 FUSED_BEAM=1 BEAMS=3 python bench.py
run beam3_fused_int8_kv8     env INT4_DECODE=0 INT8_KV=1 FUSED_BEAM=1 BEAMS=3 python bench.py
run beam3_fused_int4         env FUSED_BEAM=1 BEAMS=3 python bench.py
# XLA beam reference point (physical reorder) for the speedup claim
run beam3_xla                env INT4_DECODE=0 FUSED_BEAM=0 BEAMS=3 python bench.py

# --- served workload (c16): grouped baseline then the continuous stack ---
run serving_grouped          python bench_serving.py --concurrency 16 --requests 32
run serving_fb               env FUSED_BATCH=1 python bench_serving.py --concurrency 16 --requests 32
run serving_cont_fb          env CONT_BATCH=1 python bench_serving.py --concurrency 16 --requests 32
run serving_cont_fb_kv8      env CONT_BATCH=1 INT8_KV=1 python bench_serving.py --concurrency 16 --requests 32

# --- long-form (240 chars, ~1500 codes/segment) ---
run long_int8_kv8            env BENCH_LONG=1 INT4_DECODE=0 INT8_KV=1 python bench.py
run long_beam3_fused_kv8     env BENCH_LONG=1 INT4_DECODE=0 INT8_KV=1 FUSED_BEAM=1 BEAMS=3 python bench.py

echo "[queue3] all done"; date
