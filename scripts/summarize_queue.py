"""Summarize the TPU measurement queue's logs (/tmp/q_*.log).

Pulls the one-line JSON results out of bench runs, the summary lines out of
bench_serving runs, and the tail of micro/probe runs, so a glance shows
which A/B won.  Run any time; missing logs are listed as pending.
"""

import glob
import json
import os
import re

EXPECTED = [
    "voc_ab", "bench_base", "bench_shared", "micro_int4", "bench_int4",
    "bench_int4x", "bench_merge", "bench_int4m", "bench_int4m6",
    "serving_base", "serving_kv8", "serving_fb", "serving_fb_kv8",
    "serving_cont", "serving_cont_kv8", "bench_beam3", "bench_beam3_fused",
    "micro_cfm", "bench_long", "bench_long_kv8", "bench_long_seq",
]


def main():
    seen = {os.path.basename(p)[2:-4]: p for p in glob.glob("/tmp/q_*.log")}
    for name in EXPECTED + sorted(set(seen) - set(EXPECTED)):
        path = seen.get(name)
        if path is None:
            print(f"{name:18s}  — pending")
            continue
        lines = open(path, errors="replace").read().splitlines()
        picks = []
        for ln in lines:
            s = ln.strip()
            if s.startswith("{"):
                try:
                    d = json.loads(s)
                except json.JSONDecodeError:
                    continue
                if "metric" in d:
                    picks.append(f"{d['metric']}={d['value']} "
                                 f"(x{d.get('vs_baseline')})"
                                 + (f" ERR {d['error']}" if "error" in d
                                    else ""))
            elif re.search(r"aggregate|p50|rtf|ms|exit", s, re.I) and \
                    len(picks) < 8:
                picks.append(s)
        tail = picks[-4:] if picks else [ln for ln in lines[-3:] if ln]
        print(f"{name:18s}  " + (" | ".join(tail) if tail else "(empty)"))


if __name__ == "__main__":
    main()
