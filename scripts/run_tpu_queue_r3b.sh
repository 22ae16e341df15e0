#!/bin/bash
# Round-3 queue wave B: int4 quality gate at flagship dims + the final
# compile-gate run (includes the beam ancestor-table cases).  Waits for wave
# A to finish — with a DEADLINE (ADVICE r2: a missing marker must not hang
# the wave forever).
#   nohup setsid bash scripts/run_tpu_queue_r3b.sh > /tmp/tpu_queue_r3b.log 2>&1 &
set -u
cd /root/repo
mkdir -p bench_results/r3

deadline=$((SECONDS + 10800))   # 3 h cap on waiting for wave A
until grep -q "\[queue3\] all done" /tmp/tpu_queue_r3.log 2>/dev/null; do
    if [ $SECONDS -ge $deadline ]; then
        echo "[queue3b] TIMEOUT waiting for wave A; proceeding anyway"; break
    fi
    sleep 60
done
echo "[queue3b] starting"; date

run() {
    local label="$1"; shift
    echo "[queue3b] === $label ==="; date
    timeout 3000 "$@" > "bench_results/r3/$label.log" 2>&1
    echo "[queue3b] exit $? — tail:"
    tail -n 6 "bench_results/r3/$label.log" | grep -av "xla_bridge"
}

run int4_quality python scripts/int4_quality.py --steps 96 --prompts 3 \
    --out bench_results/r3/int4_quality.json
run compile_gate python scripts/compile_gate.py --out COMPILE_GATE.json

echo "[queue3b] all done"; date
