#!/bin/bash
# Round-4 wave A: the two never-measured latencies (VERDICT r4 item 2) +
# the SHARED_ACT_VOC re-run under round-3 defaults (item 3b) + a served
# unique-speaker workload.  Run:
#   nohup setsid bash scripts/run_tpu_queue_r4a.sh > /tmp/tpu_queue_r4a.log 2>&1 &
set -u
cd /root/repo
mkdir -p bench_results/r4
echo "[queue4a] starting"; date

run() {
    local label="$1"; shift
    echo "[queue4a] === $label ==="; date
    timeout 3000 "$@" > "bench_results/r4/$label.log" 2>&1
    echo "[queue4a] exit $? — tail:"
    tail -n 6 "bench_results/r4/$label.log" | grep -av "xla_bridge"
}

# warm headline at the round-4 serving-default flags (int8+m3; also
# re-validates nothing regressed from the profile/mean-branch changes)
run bench_int8_default       python bench.py

# cold-prompt conditioning cost (new speaker per request)
run bench_cold_int8          python bench.py --mode cold

# streaming time-to-first-audio (A/B quick_streaming_tokens)
run bench_ttfa_q0            python bench.py --mode ttfa
run bench_ttfa_q20           env QUICK_TOKENS=20 python bench.py --mode ttfa

# SHARED_ACT_VOC re-run under the round-3 winner defaults (its only
# measurement predates merge_stages=3; VERDICT r4 item 3b)
run bench_sharedact_v2       env SHARED_ACT_VOC=1 python bench.py

# served c16: unique speakers (32 cold conditionings) vs the r3 mixed-3
run serving_fb_unique        env FUSED_BATCH=1 python bench_serving.py --concurrency 16 --requests 32 --unique-speakers
run serving_fb_mixed_ref     env FUSED_BATCH=1 python bench_serving.py --concurrency 16 --requests 32

echo "[queue4a] all done"; date
