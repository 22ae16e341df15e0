#!/bin/bash
# Round-3 wave A2: the wave-A jobs from beam3 onward, re-run after fixing the
# ancestor-table kernel's i1-reshape Mosaic failure (the original wave-A beam
# jobs ran the broken import).  Appends the wave-A done marker so wave B
# (run_tpu_queue_r3b.sh) triggers.
#   nohup setsid bash scripts/run_tpu_queue_r3a2.sh > /tmp/tpu_queue_r3a2.log 2>&1 &
set -u
cd /root/repo
mkdir -p bench_results/r3

run() {
    local label="$1"; shift
    echo "[queue3] === $label ==="; date
    timeout 3000 "$@" > "bench_results/r3/$label.log" 2>&1
    echo "[queue3] exit $? — tail:"
    tail -n 6 "bench_results/r3/$label.log" | grep -av "xla_bridge"
}

run beam3_fused_int8         env INT4_DECODE=0 FUSED_BEAM=1 BEAMS=3 python bench.py
run beam3_fused_int8_kv8     env INT4_DECODE=0 INT8_KV=1 FUSED_BEAM=1 BEAMS=3 python bench.py
run beam3_fused_int4         env FUSED_BEAM=1 BEAMS=3 python bench.py
run beam3_xla                env INT4_DECODE=0 FUSED_BEAM=0 BEAMS=3 python bench.py

run serving_grouped          python bench_serving.py --concurrency 16 --requests 32
run serving_fb               env FUSED_BATCH=1 python bench_serving.py --concurrency 16 --requests 32
run serving_cont_fb          env CONT_BATCH=1 python bench_serving.py --concurrency 16 --requests 32
run serving_cont_fb_kv8      env CONT_BATCH=1 INT8_KV=1 python bench_serving.py --concurrency 16 --requests 32

run long_int8_kv8            env BENCH_LONG=1 INT4_DECODE=0 INT8_KV=1 python bench.py
run long_beam3_fused_kv8     env BENCH_LONG=1 INT4_DECODE=0 INT8_KV=1 FUSED_BEAM=1 BEAMS=3 python bench.py

echo "[queue3] all done" >> /tmp/tpu_queue_r3.log
echo "[queue3] all done"; date
