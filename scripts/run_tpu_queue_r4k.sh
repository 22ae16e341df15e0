#!/bin/bash
# Round-4 wave K: int8 merge_stages=6 A/B (the 64 MiB VMEM budget now
# admits the ~19.7 MB double-buffered block; only int4 m6 was ever
# measured) +/- rofold.
set -u
cd /root/repo
mkdir -p bench_results/r4
deadline=$((SECONDS + 14400))
until grep -q "\[queue4j\] all done" /tmp/tpu_queue_r4j.log 2>/dev/null; do
    if [ $SECONDS -ge $deadline ]; then echo "[queue4k] TIMEOUT"; break; fi
    sleep 60
done
echo "[queue4k] starting"; date
run() {
    local label="$1"; shift
    echo "[queue4k] === $label ==="; date
    timeout 3000 "$@" > "bench_results/r4/$label.log" 2>&1
    echo "[queue4k] exit $? — tail:"
    tail -n 4 "bench_results/r4/$label.log" | grep -av "xla_bridge"
}
run bench_int8_m6            env MERGE_STAGES=6 python bench.py
run bench_int8_m6_norofold   env MERGE_STAGES=6 FOLD_READOUT=0 python bench.py
echo "[queue4k] all done"; date
