"""10^7-row frontier stress round (VERDICT r3 #5).

One event-log-profiled bulk round over the ``stress`` tier (~10.1M
pages; the two hot hosts carry ~2M rows each, 40x the salting
threshold) at local[32]: the 100x claim as measurement, not plan shape.

Receipts emitted to BENCH/stress_10m.json:
- wall / throughput / per-stage task-CPU-GC table (same schema as
  profile_scaling.py);
- the [phase] wall breakdown from the runner's own stderr;
- auto-switch validation: the frontier/host row counts vs the config
  thresholds they trip (materialize+distributed-rank, hot-host salting,
  bucketed fetch join), so "the switches engage at this scale" is data.

Row-linearity is judged against the benchxxl (2.5M-row) local[32] legs
of BENCH/scaling_8to32.json: a ~4x-rows round should cost ~4x wall at
equal width (per-core urls/s flat).

    python tools/stress_run.py
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    env = dict(os.environ)
    env["SPARK_GRAFT_SCALING_TIER"] = "stress"
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "profile_scaling.py"),
         "32"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=7200,
    )
    idx = p.stdout.rfind("\n{")
    blob = p.stdout[idx + 1:] if idx >= 0 else p.stdout[p.stdout.find("{"):]
    try:
        prof = json.loads(blob)
    except (json.JSONDecodeError, ValueError):
        raise SystemExit(f"stress profile produced no JSON:\n{p.stderr[-3000:]}")

    phases = re.findall(r"\[phase\] ([^:]+): ([0-9.]+)s", p.stderr)
    # the timed round is the LAST occurrence of each phase label
    # (bootstrap emits its own phases first)
    phase_walls: dict[str, float] = {}
    for name, secs in phases:
        phase_walls[name.strip()] = float(secs)

    # auto-switch receipts: thresholds from the engine config vs the
    # corpus this round actually ran on
    sys.path.insert(0, REPO)
    from newscrawler_spark.config import CrawlConfig
    from newscrawler_spark.sources.fixtures import TIERS, page_plan

    cfg = CrawlConfig()
    tier = TIERS["stress"]
    plan_rows = len(page_plan(tier))
    hot_rows = int(plan_rows * tier.hot_share / tier.hot_hosts)
    switches = {
        "frontier_rows": plan_rows,
        "materialize_candidates_rows": cfg.materialize_candidates_rows,
        "materialize_and_distributed_rank_engaged":
            plan_rows > cfg.materialize_candidates_rows,
        "hot_host_rows_each": hot_rows,
        "hot_host_threshold": cfg.hot_host_threshold,
        "salting_engaged": hot_rows > cfg.hot_host_threshold,
        "bucketed_fetch_join": "bulk mode co-buckets corpus+candidates "
                               "(runner.py bucket strategy)",
    }

    # row-linearity vs benchxxl at the same width, if the 8->32 pair
    # has been measured
    linearity = None
    pair = os.path.join(REPO, "BENCH", "scaling_8to32.json")
    if os.path.exists(pair):
        with open(pair) as f:
            p32 = json.load(f)
        if p32.get("large_cores") == 32:
            linearity = {
                "benchxxl_local32_throughput": p32["throughput_large"],
                "stress_local32_throughput": prof["throughput"],
                "throughput_ratio_stress_over_benchxxl": round(
                    prof["throughput"] / p32["throughput_large"], 3),
                "note": "ratio ~1.0 = wall linear in rows at equal width",
            }

    out = {
        "tier": "stress",
        "pages": plan_rows,
        "profile": prof,
        "phase_walls_s": phase_walls,
        "auto_switches": switches,
        "row_linearity_vs_benchxxl": linearity,
    }
    path = os.path.join(REPO, "BENCH", "stress_10m.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"out": path, "wall_s": prof["wall_s"],
                      "throughput": prof["throughput"],
                      "linearity": linearity}))


if __name__ == "__main__":
    main()
