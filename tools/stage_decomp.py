"""Per-stage scaling decomposition (VERDICT r3 #4): back the 2->8
end-to-end claim with stage-level receipts.

Runs tools/profile_scaling.py (event-logged single bulk round, benchxxl)
at local[2] and local[8], matches stages by name, and emits a table of
task-s / CPU-s / GC-s per named stage at both widths. For a linearly
scaling stage the TOTAL task-seconds and CPU-seconds are flat across
widths (the same work spread over 4x the cores); a stage whose task_s
or cpu_s inflates >10% at 4x width is named with the likely cause.

    python tools/stage_decomp.py          # writes BENCH/stage_decomp_2v8.json
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def profile(cores: int) -> dict:
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_SCALING_TIER", "benchxxl")
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "profile_scaling.py"),
         str(cores)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=3600,
    )
    idx = p.stdout.rfind("\n{")
    blob = p.stdout[idx + 1:] if idx >= 0 else p.stdout[p.stdout.find("{"):]
    try:
        return json.loads(blob)
    except (json.JSONDecodeError, ValueError):
        raise SystemExit(
            f"profile at {cores} produced no JSON:\n{p.stderr[-2000:]}")


def main() -> None:
    # narrow leg first: the 2-core run is the long one, give it the
    # freshest part of the epoch; both legs run back-to-back (same epoch)
    r2 = profile(2)
    r8 = profile(8)

    rows = []
    k2 = r2.get("top_stages_norm", r2["top_stages"])
    k8 = r8.get("top_stages_norm", r8["top_stages"])
    names = list(dict.fromkeys(list(k2) + list(k8)))
    for nm in names:
        a = k2.get(nm)
        b = k8.get(nm)
        row = {"stage": nm, "at2": a, "at8": b}
        if a and b and a["task_s"] > 1.0:
            row["task_ratio_8over2"] = round(b["task_s"] / a["task_s"], 3)
            if a["cpu_s"] > 1.0:
                row["cpu_ratio_8over2"] = round(b["cpu_s"] / a["cpu_s"], 3)
        rows.append(row)

    flagged = [
        {"stage": r["stage"],
         "task_ratio": r.get("task_ratio_8over2"),
         "cpu_ratio": r.get("cpu_ratio_8over2")}
        for r in rows
        if (r.get("task_ratio_8over2") or 0) > 1.10
        or (r.get("cpu_ratio_8over2") or 0) > 1.10
    ]
    out = {
        "tier": os.environ.get("SPARK_GRAFT_SCALING_TIER", "benchxxl"),
        "summary_at2": {k: r2[k] for k in
                        ("cores", "wall_s", "throughput", "total_task_s",
                         "total_cpu_s", "utilization", "gc_s")},
        "summary_at8": {k: r8[k] for k in
                        ("cores", "wall_s", "throughput", "total_task_s",
                         "total_cpu_s", "utilization", "gc_s")},
        "per_core_throughput": {"at2": round(r2["throughput"] / 2, 1),
                                "at8": round(r8["throughput"] / 8, 1)},
        "stages": rows,
        "flagged_over_1p10": flagged,
    }
    path = os.path.join(REPO, "BENCH", "stage_decomp_2v8.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"out": path,
                      "per_core_throughput": out["per_core_throughput"],
                      "flagged": flagged}))


if __name__ == "__main__":
    main()
