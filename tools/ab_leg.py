#!/usr/bin/env python
"""One A/B leg: run the headline bench rows from the repo at CWD.

Run as `python /root/repo/tools/ab_leg.py <label>` with cwd set to either
the HEAD checkout or the r5 worktree — it imports THAT repo's bench.py and
d1_log_aggregation_spark package, times pipeline_routed_full,
sink_write_parquet and the sf1-replicated pipeline, and prints one JSON
line prefixed ABRESULT.  The interleaving driver (tools/ab_headline.py)
alternates legs so box drift cannot fall on one side (VERDICT r6 item 1).
"""
import json
import os
import sys

sys.path.insert(0, os.getcwd())
import bench  # noqa: E402  (the repo-at-cwd's bench.py)

label = sys.argv[1] if len(sys.argv) > 1 else "leg"
master = f"local[{bench.CPUS}]"
shuffle = int(bench.CPUS) if bench.CPUS.isdigit() else 32

r = bench.run_once(master, shuffle)  # full: routed_full + sink_write
sf1 = bench.run_once(master, shuffle, replicate=10, tag="_sf1",
                     pipeline_only=True)
print("ABRESULT " + json.dumps({
    "label": label,
    "pipeline_routed_full": r["queries"]["pipeline_routed_full"],
    "sink_write_parquet": r["queries"]["sink_write_parquet"],
    "pipeline_sf1_replicated": sf1["pipeline_sec"],
    "sf1_throughput": sf1["throughput_turns_per_sec"],
    "rep_times": {
        "pipeline_routed_full": r["rep_times"]["pipeline_routed_full"],
        "sink_write_parquet": r["rep_times"]["sink_write_parquet"],
        "pipeline_sf1_replicated": sf1["rep_times"]["pipeline_routed_full"],
    },
}))
