#!/usr/bin/env python
"""Isolating A/B for the r6 headline slowdown (VERDICT r6 item 1).

Interleaves HEAD and r5-commit legs (H,R,H,R) in ONE session on ONE box,
each leg a fresh subprocess running tools/ab_leg.py from that checkout,
and reports min-per-side for the three rows the verdict flagged.  Ratios
≈1.0 head-to-head prove box drift; a reproducible gap is a code cost.
"""
import json
import subprocess
import sys

HEAD = "/root/repo"
R5 = "/root/repo/.ab_r5"
LEG = "/root/repo/tools/ab_leg.py"
ROUNDS = 2


def run_leg(cwd: str, label: str) -> dict:
    p = subprocess.run(
        [sys.executable, LEG, label], cwd=cwd,
        capture_output=True, text=True, timeout=3600,
    )
    for line in p.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    sys.stderr.write(p.stdout[-3000:] + "\n" + p.stderr[-5000:] + "\n")
    raise RuntimeError(f"leg {label} in {cwd} produced no ABRESULT")


def main() -> None:
    legs = {"head": [], "r5": []}
    for i in range(ROUNDS):
        legs["head"].append(run_leg(HEAD, f"head{i}"))
        print(f"head leg {i}: {legs['head'][-1]}", flush=True)
        legs["r5"].append(run_leg(R5, f"r5_{i}"))
        print(f"r5 leg {i}: {legs['r5'][-1]}", flush=True)
    rows = ["pipeline_routed_full", "sink_write_parquet",
            "pipeline_sf1_replicated"]
    out = {"legs": legs, "min": {}, "ratio_head_over_r5": {}}
    for row in rows:
        h = min(l[row] for l in legs["head"])
        r = min(l[row] for l in legs["r5"])
        out["min"][row] = {"head": h, "r5": r}
        out["ratio_head_over_r5"][row] = round(h / r, 3)
    print("ABFINAL " + json.dumps(out))


if __name__ == "__main__":
    main()
