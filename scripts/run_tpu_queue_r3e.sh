#!/bin/bash
# Round-3 wave E: self-speculative decode A/Bs (the ≤0.05 push) + closing
# default confirmation.  Waits for wave D with a deadline.
#   nohup setsid bash scripts/run_tpu_queue_r3e.sh > /tmp/tpu_queue_r3e.log 2>&1 &
set -u
cd /root/repo
mkdir -p bench_results/r3

deadline=$((SECONDS + 21600))
until grep -q "\[queue3d\] all done" /tmp/tpu_queue_r3d.log 2>/dev/null; do
    if [ $SECONDS -ge $deadline ]; then
        echo "[queue3e] TIMEOUT waiting for wave D; proceeding anyway"; break
    fi
    sleep 60
done
echo "[queue3e] starting"; date

run() {
    local label="$1"; shift
    echo "[queue3e] === $label ==="; date
    timeout 3000 "$@" > "bench_results/r3/$label.log" 2>&1
    echo "[queue3e] exit $? — tail:"
    tail -n 6 "bench_results/r3/$label.log" | grep -av "xla_bridge"
}

# int8 baseline at the new bench default (INT4 off) for the round headline
run bench_int8_default       python bench.py
# speculative decode: K sweep, draft scheme variants
run bench_spec_k4            env SPEC_DECODE=4 python bench.py
run bench_spec_k6            env SPEC_DECODE=6 python bench.py
run bench_spec_k4_g640       env SPEC_DECODE=4 INT4_GROUP=640 python bench.py
run bench_spec_k6_g640       env SPEC_DECODE=6 INT4_GROUP=640 python bench.py
# long-form speculative (drafting pays MORE where steps are many)
run long_spec_k6             env BENCH_LONG=1 SPEC_DECODE=6 python bench.py
# long-form beam-3 after the sequential-fused routing fix
run long_beam3_fused_v2      env BENCH_LONG=1 INT4_DECODE=0 INT8_KV=1 FUSED_BEAM=1 BEAMS=3 python bench.py

echo "[queue3e] all done"; date
