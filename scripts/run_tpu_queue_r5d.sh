#!/bin/bash
# Round-5 wave D: server bench v3 behind the warm-burst fix (steady-state
# c16 headline), and the bf16-s2mel long-form A/B (synthesis dominates the
# long-code burst batches; DiT attention is quadratic there).
set -u
cd /root/repo
mkdir -p bench_results/r5
echo "[queue5d] starting"; date
run() {
    local label="$1"; shift
    echo "[queue5d] === $label ==="; date
    timeout 5400 "$@" > "bench_results/r5/$label.log" 2>&1
    echo "[queue5d] exit $? — tail:"
    tail -n 4 "bench_results/r5/$label.log" | grep -av "xla_bridge"
}
run beam_quality_v3     python scripts/beam_quality.py --out bench_results/r5/beam_quality.json
run measure_overhead_v3 env PYTHONPATH=/root/repo:/root/.axon_site python scripts/measure_overhead.py
run server_r5_v3        python scripts/bench_server_e2e.py --port 8035 --server-log bench_results/r5/server_r5_v3_serverside.log
run long_s2mel_bf16     env BENCH_LONG=1 INT8_KV=1 S2MEL_BF16=1 python bench.py
echo "[queue5d] all done"; date
