"""Re-aggregate two profile event logs per NORMALIZED stage name.

stage_decomp.py's first pass matched stages by raw name, which embeds
session-scoped bucket-table identifiers (bkt_<md5>_<appid>) and codegen
ids — so the big stages paired as None across widths. This re-reads the
same event logs with names normalized (bucket hashes and codegen ids
stripped) and rewrites the per-stage table in
BENCH/stage_decomp_2v8.json. Aggregation covers the WHOLE app
(bootstrap + timed round — identical work at both widths), which is
valid for the flat-task-seconds comparison; the summary_at{2,8} blocks
(timed-region walls/throughput) are kept from the first pass.

    python tools/stage_reagg.py <events_dir_small> <events_dir_large>
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def norm(name: str) -> str:
    name = re.sub(r"bkt_[0-9a-f]+(_[0-9a-f]+)?", "bkt", name)
    name = re.sub(r"WholeStageCodegen \(\d+\)", "WholeStageCodegen", name)
    name = re.sub(r"spark_catalog\.default\.", "", name)
    name = re.sub(r"\$anonfun\$\w+\$\d+", "collectAsync", name)
    return name


def aggregate(ev_dir: str) -> dict[str, dict]:
    task_ms: dict[int, dict] = {}
    names: dict[int, str] = {}
    for path in glob.glob(f"{ev_dir}/*"):
        if "appstatus" in path:
            continue
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                e = ev.get("Event")
                if e == "SparkListenerTaskEnd":
                    m = ev.get("Task Metrics") or {}
                    sid = ev["Stage ID"]
                    agg = task_ms.setdefault(
                        sid, {"task_s": 0.0, "gc_s": 0.0, "cpu_s": 0.0})
                    agg["task_s"] += m.get("Executor Run Time", 0) / 1000
                    agg["gc_s"] += m.get("JVM GC Time", 0) / 1000
                    agg["cpu_s"] += m.get("Executor CPU Time", 0) / 1e9
                elif e == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    scopes = []
                    for rdd in si.get("RDD Info", []):
                        sc = rdd.get("Scope")
                        if sc:
                            try:
                                scopes.append(json.loads(sc).get("name", ""))
                            except json.JSONDecodeError:
                                pass
                    uniq = list(dict.fromkeys(scopes))[:6]
                    names[si["Stage ID"]] = norm(
                        si["Stage Name"].split(" at ")[0] + " | " + ">".join(uniq)
                    )
    by: dict[str, dict] = {}
    for sid, v in task_ms.items():
        nm = names.get(sid, f"stage{sid}")
        agg = by.setdefault(nm, {"task_s": 0.0, "gc_s": 0.0, "cpu_s": 0.0})
        for k in agg:
            agg[k] += v[k]
    return {k: {kk: round(vv, 1) for kk, vv in v.items()} for k, v in by.items()}


def main() -> None:
    small_dir, large_dir = sys.argv[1], sys.argv[2]
    a, b = aggregate(small_dir), aggregate(large_dir)
    rows = []
    for nm in sorted(set(a) | set(b), key=lambda n: -(a.get(n, {}).get("task_s", 0.0))):
        ra, rb = a.get(nm), b.get(nm)
        row = {"stage": nm, "at2": ra, "at8": rb}
        if ra and rb and ra["task_s"] > 2.0:
            row["task_ratio_8over2"] = round(rb["task_s"] / ra["task_s"], 3)
            if ra["cpu_s"] > 2.0:
                row["cpu_ratio_8over2"] = round(rb["cpu_s"] / ra["cpu_s"], 3)
        rows.append(row)
    flagged = [
        {"stage": r["stage"], "task_ratio": r.get("task_ratio_8over2"),
         "cpu_ratio": r.get("cpu_ratio_8over2")}
        for r in rows
        if (r.get("task_ratio_8over2") or 0) > 1.10
    ]
    path = os.path.join(REPO, "BENCH", "stage_decomp_2v8.json")
    with open(path) as f:
        out = json.load(f)
    out["stages_note"] = (
        "normalized-name re-aggregation over the WHOLE app event log "
        "(bootstrap + timed round, identical work both widths); "
        "summary_at2/at8 blocks are the timed-region first pass"
    )
    out["stages"] = [r for r in rows
                     if (r["at2"] or {}).get("task_s", 0) > 1.0
                     or (r["at8"] or {}).get("task_s", 0) > 1.0]
    out["flagged_over_1p10"] = flagged
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"stages": len(out["stages"]), "flagged": flagged}))


if __name__ == "__main__":
    main()
