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
    # measure the SAME session config as the scaling pair it backs
    # (bench_scaling.SCALING_CONF): AQE off — the job is statically
    # sized and AQE's per-exchange barrier weighs 4x more at 4x width.
    # Without this the decomp profiles a different plan than the claim.
    conf = json.dumps({
        "spark.sql.adaptive.enabled": "false",
        "spark.python.worker.faulthandler.enabled": "true",
        "spark.task.maxFailures": "3",
    })
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "profile_scaling.py"),
         str(cores), conf],
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

    # PRIMARY table: operator-class aggregation (profile_scaling's
    # stage_classes) — classes join across widths BY CONSTRUCTION, so
    # no row is ever unmatched. cpu_s is the load-bearing column: for a
    # linearly scaling stage the total CPU-seconds are flat at 4x width
    # (same work, more cores); task_s additionally absorbs GC pauses and
    # blocked time, so it inflates with epoch contamination (steal is
    # recorded per leg to make that auditable).
    classes = []
    c2 = r2.get("stage_classes", {})
    c8 = r8.get("stage_classes", {})
    for cls in dict.fromkeys(list(c2) + list(c8)):
        a, b = c2.get(cls), c8.get(cls)
        row = {"class": cls, "at2": a, "at8": b}
        if a and b and a["cpu_s"] > 1.0:
            row["cpu_ratio_8over2"] = round(b["cpu_s"] / a["cpu_s"], 3)
            row["task_ratio_8over2"] = round(
                b["task_s"] / a["task_s"], 3) if a["task_s"] > 1.0 else None
        classes.append(row)
    flagged = [
        {"class": r["class"],
         "cpu_ratio": r.get("cpu_ratio_8over2"),
         "task_ratio": r.get("task_ratio_8over2")}
        for r in classes
        if (r.get("cpu_ratio_8over2") or 0) > 1.10
    ]

    # appendix: normalized per-stage rows (best-effort name matching —
    # AQE scopes stages differently per width, so unmatched rows are
    # expected; the class table above is the evidence surface)
    rows = []
    k2 = r2.get("top_stages_norm", r2["top_stages"])
    k8 = r8.get("top_stages_norm", r8["top_stages"])
    for nm in dict.fromkeys(list(k2) + list(k8)):
        rows.append({"stage": nm, "at2": k2.get(nm), "at8": k8.get(nm)})

    out = {
        "tier": os.environ.get("SPARK_GRAFT_SCALING_TIER", "benchxxl"),
        "summary_at2": {k: r2.get(k) for k in
                        ("cores", "wall_s", "throughput", "total_task_s",
                         "total_cpu_s", "utilization", "gc_s", "steal_pct")},
        "summary_at8": {k: r8.get(k) for k in
                        ("cores", "wall_s", "throughput", "total_task_s",
                         "total_cpu_s", "utilization", "gc_s", "steal_pct")},
        "per_core_throughput": {"at2": round(r2["throughput"] / 2, 1),
                                "at8": round(r8["throughput"] / 8, 1)},
        "stage_classes": classes,
        "flagged_cpu_over_1p10": flagged,
        "stages_appendix": rows,
    }
    path = os.path.join(REPO, "BENCH", "stage_decomp_2v8.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"out": path,
                      "per_core_throughput": out["per_core_throughput"],
                      "flagged": flagged}))


if __name__ == "__main__":
    main()
