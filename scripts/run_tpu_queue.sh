#!/bin/bash
# Serial TPU measurement queue for the axon-tunneled chip (one client at a
# time).  Waits for the tunnel to accept a backend init, then runs the
# queued A/Bs, logging to /tmp/q_*.log.  Launch detached:
#   nohup setsid bash scripts/run_tpu_queue.sh > /tmp/tpu_queue.log 2>&1 &
set -u
cd /root/repo

probe() {
    timeout 1800 python - <<'EOF'
import os, time, traceback
# the axon client leaves non-daemon threads behind on a failed claim, so a
# plain exception would hang the interpreter until the outer timeout —
# force the exit code either way
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
    timeout 3000 "$@" > "/tmp/q_$label.log" 2>&1
    echo "[queue] exit $? — tail:"
    tail -n 12 "/tmp/q_$label.log"
}

# 1. shared-act vocoder vs module vs grouped at full scale
run voc_ab python scripts/bench_packed_vocoder.py

# 2. e2e bench A/B: shared-act vocoder off/on
run bench_base python bench.py
run bench_shared env SHARED_ACT_VOC=1 python bench.py

# 3. int4 unpack-strategy micro (several new Pallas kernel compiles — slow)
run micro_int4 python scripts/micro_int4.py

# 4. e2e int4 A/B: group sub-dots vs MXU-expanded whole-tile dequant
run bench_int4 env INT4_DECODE=1 python bench.py
run bench_int4x env INT4_DECODE=1 INT4_EXPAND=1 python bench.py

# 4b. merged-grid megakernel: int8 at 3 tiles/step, int4 at 3 and 6
run bench_merge env MERGE_STAGES=3 python bench.py
run bench_int4m env INT4_DECODE=1 MERGE_STAGES=3 python bench.py
run bench_int4m6 env INT4_DECODE=1 MERGE_STAGES=6 python bench.py

# 5. serving A/B: int8 KV cache on the batched XLA path
run serving_base python bench_serving.py
run serving_kv8 env INT8_KV=1 python bench_serving.py

echo "[queue] all done"; date

# 6. batched decode megakernel A/B (appended while the queue waited out the
# 2026-08-18 tunnel outage; new Pallas kernel -> first compile can be slow)
run serving_fb env FUSED_BATCH=1 python bench_serving.py
run serving_fb_kv8 env FUSED_BATCH=1 INT8_KV=1 python bench_serving.py
echo "[queue] appended runs done"; date

# 7. slot-based continuous batching A/B (vs grouped infer_batch)
run serving_cont env CONT_BATCH=1 python bench_serving.py
run serving_cont_kv8 env CONT_BATCH=1 INT8_KV=1 python bench_serving.py
echo "[queue] continuous-batching runs done"; date

# 8. fused beam decode A/B at the reference default num_beams=3
run bench_beam3 env BEAMS=3 python bench.py
run bench_beam3_fused env BEAMS=3 FUSED_BEAM=1 python bench.py
echo "[queue] beam runs done"; date

# 9. CFM velocity-eval scaling probe (fixed-overhead vs traffic bound)
run micro_cfm python scripts/micro_cfm_scaling.py
echo "[queue] cfm scaling done"; date

# 10. long-form (~240-char, multi-segment) bench: segment batching and the
# int8 KV cache at the reference-scale max_mel_tokens context
run bench_long env BENCH_LONG=1 python bench.py --repeats 3
run bench_long_kv8 env BENCH_LONG=1 INT8_KV=1 python bench.py --repeats 3
run bench_long_seq env BENCH_LONG=1 BATCH_SEGMENTS=0 python bench.py --repeats 3
echo "[queue] long-form runs done"; date
