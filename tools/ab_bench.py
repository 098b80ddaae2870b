"""Interleaved A/B of bench.py across engine versions (VERDICT r3 #1).

The round-3 driver bench showed crawl −8% and q35/q37 ~2× vs round 2,
while the builder's (contaminated-epoch) A/B showed the opposite. This
harness settles it the only way that works on a shared box: run
``bench.py`` ITSELF — the exact artifact the driver times — from each
arm's checkout, interleaved A,B,C within every rep so all arms sample
the same machine epoch, with per-leg host-steal recorded from
/proc/stat.

Arms (worktrees are created by the caller, see __main__):
  A  r2 commit 7cbe4e9, its own session defaults (ZGC at local[32])
  B  current HEAD, default session (ParallelGC)
  C  current HEAD with SPARK_GRAFT_GC=-XX:+UseZGC  — isolates the GC
     flag, the one session knob that changed r2→r3

Output: BENCH/ab_r2r3.jsonl (one line per leg) and BENCH/ab_r2r3.json
(summary: per-arm medians + per-rep paired ratios B/A and C/B for the
crawl and each regressed query).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH_DIR = os.path.join(REPO, "BENCH")
WATCH = ["crawl_3rounds", "q35_ann_topk", "q37_langid", "q36_quality_stats",
         "q23_seen_dedup", "q41_ann_lsh_topk", "q31_ngram_jaccard"]


def cpu_ticks() -> tuple[int, int]:
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    vals = [int(v) for v in parts]
    return (vals[7] if len(vals) > 7 else 0), sum(vals)


def run_leg(arm: str, cwd: str, env_extra: dict[str, str]) -> dict:
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_GC", None)
    env.update(env_extra)
    env["PYTHONPATH"] = cwd
    s0, t0 = cpu_ticks()
    w0 = time.monotonic()
    p = subprocess.run(
        [sys.executable, os.path.join(cwd, "bench.py")],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=1800,
    )
    wall = time.monotonic() - w0
    s1, t1 = cpu_ticks()
    out: dict = {"arm": arm, "rc": p.returncode,
                 "leg_wall_s": round(wall, 1),
                 "steal_pct": round(100.0 * (s1 - s0) / max(1, t1 - t0), 2)}
    for line in reversed(p.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                parsed = json.loads(line)
            except json.JSONDecodeError:
                continue
            out["value"] = parsed.get("value")
            out["queries"] = parsed.get("queries", {})
            break
    if "queries" not in out:
        out["stderr_tail"] = p.stderr[-500:]
    return out


def main() -> None:
    reps = int(os.environ.get("AB_REPS", "4"))
    r2_dir = os.environ.get("AB_R2_DIR", os.path.join(REPO, ".ab", "r2"))
    arms = [
        ("A_r2", r2_dir, {}),
        ("B_head", REPO, {}),
        ("C_head_zgc", REPO, {"SPARK_GRAFT_GC": "-XX:+UseZGC"}),
    ]
    os.makedirs(BENCH_DIR, exist_ok=True)
    jsonl = os.path.join(BENCH_DIR, "ab_r2r3.jsonl")
    legs: list[dict] = []
    with open(jsonl, "w") as f:
        for rep in range(reps):
            for arm, cwd, env_extra in arms:
                leg = run_leg(arm, cwd, env_extra)
                leg["rep"] = rep
                legs.append(leg)
                f.write(json.dumps(leg) + "\n")
                f.flush()
                print(json.dumps({k: leg.get(k) for k in
                                  ("arm", "rep", "rc", "steal_pct")} |
                                 {"crawl": leg.get("queries", {}).get(
                                     "crawl_3rounds")}), flush=True)

    def series(arm: str, q: str) -> list[float]:
        return [leg["queries"][q] for leg in legs
                if leg["arm"] == arm and leg.get("queries", {}).get(q)]

    summary: dict = {"reps": reps, "watch": {},
                     "steal_by_arm": {
                         a: [leg["steal_pct"] for leg in legs
                             if leg["arm"] == a] for a, _, _ in arms},
                     "measured_at": time.strftime("%Y-%m-%d %H:%M:%S")}
    for q in WATCH:
        a, b, c = series("A_r2", q), series("B_head", q), series("C_head_zgc", q)
        paired_ba = [round(x / y, 3) for x, y in zip(b, a)]
        paired_cb = [round(x / y, 3) for x, y in zip(c, b)]
        summary["watch"][q] = {
            "A_r2": a, "B_head": b, "C_head_zgc": c,
            "median_A": round(statistics.median(a), 3) if a else None,
            "median_B": round(statistics.median(b), 3) if b else None,
            "median_C": round(statistics.median(c), 3) if c else None,
            # paired within a rep = same epoch; <1.0 means HEAD faster
            "paired_B_over_A": paired_ba,
            "median_B_over_A": round(statistics.median(paired_ba), 3)
            if paired_ba else None,
            "paired_C_over_B": paired_cb,
            "median_C_over_B": round(statistics.median(paired_cb), 3)
            if paired_cb else None,
        }
    with open(os.path.join(BENCH_DIR, "ab_r2r3.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({"done": True,
                      "crawl_median_B_over_A":
                      summary["watch"]["crawl_3rounds"]["median_B_over_A"]}))


if __name__ == "__main__":
    main()
