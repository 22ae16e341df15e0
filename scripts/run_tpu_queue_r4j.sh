#!/bin/bash
# Round-4 wave J: long-form rofold A/B (is the batched readout fold a loss
# at B=2-3 long-context?) + short-form repeat for the noise band.
set -u
cd /root/repo
mkdir -p bench_results/r4
deadline=$((SECONDS + 14400))
until grep -q "\[queue4i\] all done" /tmp/tpu_queue_r4i.log 2>/dev/null; do
    if [ $SECONDS -ge $deadline ]; then echo "[queue4j] TIMEOUT"; break; fi
    sleep 60
done
echo "[queue4j] starting"; date
run() {
    local label="$1"; shift
    echo "[queue4j] === $label ==="; date
    timeout 3000 "$@" > "bench_results/r4/$label.log" 2>&1
    echo "[queue4j] exit $? — tail:"
    tail -n 4 "bench_results/r4/$label.log" | grep -av "xla_bridge"
}
run long_norofold_ab         env BENCH_LONG=1 INT8_KV=1 FOLD_READOUT=0 python bench.py
run long_rofold_ab           env BENCH_LONG=1 INT8_KV=1 FOLD_READOUT=1 python bench.py
run bench_rofold_repeat      python bench.py
run bench_norofold_repeat    env FOLD_READOUT=0 python bench.py
echo "[queue4j] all done"; date
