#!/bin/bash
# Round-5 wave A: compile gate (incl. the new request-batched beam kernel
# cases), headline regression checks, and the engine-level request-batched
# beam serving A/B (BEAM_BATCH_ROWS 3 = r4 sequential / 6 / 12).
#   nohup setsid bash scripts/run_tpu_queue_r5a.sh > /tmp/tpu_queue_r5a.log 2>&1 &
set -u
cd /root/repo
mkdir -p bench_results/r5
echo "[queue5a] starting"; date

run() {
    local label="$1"; shift
    echo "[queue5a] === $label ==="; date
    timeout 3600 "$@" > "bench_results/r5/$label.log" 2>&1
    echo "[queue5a] exit $? — tail:"
    tail -n 6 "bench_results/r5/$label.log" | grep -av "xla_bridge"
}

# full compile gate (47 cases incl. 5 new beam_k variants)
run gate_full            python scripts/compile_gate.py --out COMPILE_GATE.json

# headline regression checks at the new engine defaults (auto decode caps)
run bench_final_default  python bench.py
run beam3_single         env BEAMS=3 FUSED_BEAM=1 INT8_KV=1 python bench.py
run long_final           env BENCH_LONG=1 INT8_KV=1 python bench.py

# engine-level request-batched beam serving A/B (c16, 32 requests)
run serving_beam3_rows3  env BEAMS=3 FUSED_BEAM=1 FUSED_BATCH=1 INT8_KV=1 BEAM_BATCH_ROWS=3 python bench_serving.py --concurrency 16 --requests 32
run serving_beam3_rows6  env BEAMS=3 FUSED_BEAM=1 FUSED_BATCH=1 INT8_KV=1 BEAM_BATCH_ROWS=6 python bench_serving.py --concurrency 16 --requests 32
run serving_beam3_rows12 env BEAMS=3 FUSED_BEAM=1 FUSED_BATCH=1 INT8_KV=1 BEAM_BATCH_ROWS=12 python bench_serving.py --concurrency 16 --requests 32

# sampling serving reference point (the r4 0.0628 config)
run serving_fb_sampling  env FUSED_BATCH=1 python bench_serving.py --concurrency 16 --requests 32

echo "[queue5a] all done"; date
