"""Engine-version A/B of the scaling job's wide leg (round 4).

The clean-epoch stage decomposition measured local[8] bulk-crawl
throughput ~35% below the round-3 scaling measurement while local[2]
got FASTER — either the round-4 engine regressed the wide leg, or the
box's wide-parallelism ceiling moved between epochs. This settles it:
the SAME job (bulk crawl, benchxxl, AQE off, shuffle=16, 64m partition
bytes — bench_scaling's exact config) at local[8], interleaved per rep
across two checkouts, per-leg /proc/stat steal.

Arms: A = the round-3 scaling-evidence commit (worktree, caller
creates; AB8_OLD_DIR, default .ab/r3scale), B = current HEAD.

    python tools/ab_bulk8.py        # writes BENCH/ab_bulk8.json
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LEG_SRC = r"""
import sys, os, json
cwd = sys.argv[1]
sys.path.insert(0, cwd)
from newscrawler_spark.session import get_spark
spark = get_spark(master="local[8]", shuffle_partitions=16,
                  app_name="ab-bulk8",
                  extra_conf={
                      "spark.sql.adaptive.enabled": "false",
                      "spark.sql.files.maxPartitionBytes": "64m",
                      "spark.python.worker.faulthandler.enabled": "true",
                      "spark.task.maxFailures": "3",
                  })
spark.range(10**6).selectExpr("sum(id)").collect()
from bench import bulk_crawl_throughput
r = bulk_crawl_throughput(spark, "benchxxl")
print("ABRESULT " + json.dumps(r))
spark.stop()
"""


def cpu_ticks() -> tuple[int, int]:
    with open("/proc/stat") as f:
        vals = [int(v) for v in f.readline().split()[1:]]
    return (vals[7] if len(vals) > 7 else 0), sum(vals)


def run_leg(arm: str, cwd: str) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = cwd
    s0, t0 = cpu_ticks()
    p = subprocess.run([sys.executable, "-c", LEG_SRC, cwd],
                       cwd=cwd, env=env, capture_output=True, text=True,
                       timeout=1800)
    s1, t1 = cpu_ticks()
    out = {"arm": arm, "rc": p.returncode,
           "steal_pct": round(100.0 * (s1 - s0) / max(1, t1 - t0), 2)}
    for line in reversed(p.stdout.strip().splitlines()):
        if line.startswith("ABRESULT "):
            out.update(json.loads(line[len("ABRESULT "):]))
            break
    else:
        out["stderr_tail"] = p.stderr[-800:]
    return out


def main() -> None:
    reps = int(os.environ.get("AB8_REPS", "3"))
    old_dir = os.environ.get("AB8_OLD_DIR", os.path.join(REPO, ".ab", "r3scale"))
    arms = [("A_r3scale", old_dir), ("B_head", REPO)]
    legs = []
    for rep in range(reps):
        for arm, cwd in arms:
            leg = run_leg(arm, cwd)
            leg["rep"] = rep
            legs.append(leg)
            print(json.dumps(leg), flush=True)
    th = {a: [leg.get("throughput_urls_per_s") for leg in legs
              if leg["arm"] == a and leg.get("throughput_urls_per_s")]
          for a, _ in arms}
    paired = [round(b / a, 3) for a, b in zip(th["A_r3scale"], th["B_head"])]
    out = {
        "config": "local[8], AQE off, shuffle=16, 64m maxPartitionBytes, benchxxl",
        "legs": legs,
        "throughput_by_arm": th,
        "paired_B_over_A": paired,
        "median_B_over_A": round(statistics.median(paired), 3) if paired else None,
        "measured_at": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    with open(os.path.join(REPO, "BENCH", "ab_bulk8.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"median_B_over_A": out["median_B_over_A"],
                      "throughput_by_arm": th}))


if __name__ == "__main__":
    main()
