"""Summarize round-4 measurement logs (bench_results/r4/*.log) into a
COMMITTED artifact, bench_results/r4/SUMMARY.md — round-2 lesson (VERDICT
item 6): no measured number may exist only in /tmp.

Run after each queue wave:  python scripts/summarize_r4.py
"""

import glob
import json
import os
import re

DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "bench_results", "r4")


def pick_lines(path):
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
                picks.append(f"`{d['metric']}` = **{d['value']}** "
                             f"(x{d.get('vs_baseline')} vs baseline)"
                             + (f" — ERROR {d['error']}" if "error" in d
                                else ""))
        elif re.search(r"aggregate|p50|p90|throughput|Mosaic|Error",
                       s) and len(picks) < 10:
            picks.append(s.replace("|", "/"))
    return picks


def main():
    out = ["# Round-4 measurement summary",
           "",
           "One section per queue log in `bench_results/r4/` "
           "(`scripts/run_tpu_queue_r4*.sh`).  All runs: one v5e chip via "
           "the axon tunnel, random flagship weights.", ""]
    for path in sorted(glob.glob(os.path.join(DIR, "*.log"))):
        name = os.path.basename(path)[:-4]
        picks = pick_lines(path)
        out.append(f"## {name}")
        out.append("")
        if picks:
            out.extend(f"- {p}" for p in picks[-6:])
        else:
            tail = [ln for ln in open(path, errors="replace").read()
                    .splitlines()[-3:] if ln.strip()]
            out.extend(f"- `{t[:160]}`" for t in tail)
        out.append("")
    path = os.path.join(DIR, "SUMMARY.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print("wrote", path)


if __name__ == "__main__":
    main()
