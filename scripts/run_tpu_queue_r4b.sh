#!/bin/bash
# Round-4 wave B: beam-step decomposition + sort-free beam candidates A/B
# (VERDICT r4 item 4) + CFM scan-unroll A/B (item 3c).  Waits for wave A.
#   nohup setsid bash scripts/run_tpu_queue_r4b.sh > /tmp/tpu_queue_r4b.log 2>&1 &
set -u
cd /root/repo
mkdir -p bench_results/r4

deadline=$((SECONDS + 14400))
until grep -q "\[queue4a\] all done" /tmp/tpu_queue_r4a.log 2>/dev/null; do
    if [ $SECONDS -ge $deadline ]; then
        echo "[queue4b] TIMEOUT waiting for wave A; proceeding anyway"; break
    fi
    sleep 60
done
echo "[queue4b] starting"; date

run() {
    local label="$1"; shift
    echo "[queue4b] === $label ==="; date
    timeout 3000 "$@" > "bench_results/r4/$label.log" 2>&1
    echo "[queue4b] exit $? — tail:"
    tail -n 8 "bench_results/r4/$label.log" | grep -av "xla_bridge"
}

# where does the beam step's extra ~1 ms/token live?
run prof_beam_parts_legacy   python scripts/prof_beam_parts.py --legacy
run prof_beam_parts_new      python scripts/prof_beam_parts.py

# e2e beam-3 with the sort-free candidate pipeline (r3 best: 0.1243)
run beam3_fused_int8_kv8_v3  env FUSED_BEAM=1 BEAMS=3 INT8_KV=1 python bench.py
run beam3_fused_int8_v3      env FUSED_BEAM=1 BEAMS=3 python bench.py
run long_beam3_fused_v3      env BENCH_LONG=1 FUSED_BEAM=1 BEAMS=3 INT8_KV=1 python bench.py

# CFM Euler-scan unroll A/B (exact numerics; r3: 25-step CFM 57.6 ms)
run bench_cfm_unroll5        env CFM_UNROLL=5 python bench.py
run bench_cfm_unroll25       env CFM_UNROLL=25 python bench.py

echo "[queue4b] all done"; date
