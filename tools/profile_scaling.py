"""Scaling diagnosis: run the bulk crawl at N cores with event logging,
then aggregate per-stage executor run/CPU/GC time vs wall clock for the
TIMED region only (bootstrap excluded by event timestamps).

    python tools/profile_scaling.py <cores> [extra_conf_json]
"""

from __future__ import annotations

import glob
import json
import os
import re
import shutil
import sys
import tempfile
import time


def norm_stage(name: str) -> str:
    """Width-stable stage key: strip session-scoped bucket-table hashes,
    codegen ids, lambda counters, and collapse repeated scopes — AQE
    shapes the scope chain differently per width, so cross-width
    matching needs the coarse form."""
    name = re.sub(r"bkt_[0-9a-f]+(_[0-9a-f]+)?", "bkt", name)
    name = re.sub(r"WholeStageCodegen \(\d+\)", "WSC", name)
    name = re.sub(r"spark_catalog\.default\.", "", name)
    name = re.sub(r"\$anonfun\$\w+\$\d+", "action", name)
    parts = [p for p in name.split(" | ", 1)[-1].split(">")
             if p not in ("WSC", "AdaptiveSparkPlan", "Project", "Filter")]
    head = name.split(" | ", 1)[0]
    return head + " | " + ">".join(list(dict.fromkeys(parts))[:3])

_CLASS_MARKERS = [
    # (marker substring in the raw stage name/scopes, class key) —
    # first match wins. Classes are width-stable BY CONSTRUCTION (no
    # name matching across runs), so the 2-vs-8 table always joins.
    ("FlatMapCoGroupsInPandas", "arrow_cogroup"),
    ("InPandas", "arrow_map"),
    ("ArrowEval", "arrow_map"),
    ("WindowGroupLimit", "window_rank"),
    ("Window", "window_rank"),
    ("WriteFiles", "write"),
    ("BroadcastExchange", "broadcast"),
    ("Exchange", "shuffle"),
    ("Scan parquet", "scan"),
]


def stage_class(name: str) -> str:
    for marker, cls in _CLASS_MARKERS:
        if marker in name:
            return cls
    return "misc"


def _steal_snapshot() -> tuple[int, int]:
    with open("/proc/stat") as f:
        vals = [int(v) for v in f.readline().split()[1:]]
    return (vals[7] if len(vals) > 7 else 0), sum(vals)


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from newscrawler_spark.config import CrawlConfig  # noqa: E402
from newscrawler_spark.session import get_spark  # noqa: E402


def main() -> None:
    spec = sys.argv[1]
    extra = json.loads(sys.argv[2]) if len(sys.argv) > 2 else {}
    cfg_over = json.loads(sys.argv[3]) if len(sys.argv) > 3 else {}
    tier = os.environ.get("SPARK_GRAFT_SCALING_TIER", "benchxl")
    ev_dir = f"/tmp/spark-events-{spec.replace('x', '_')}-{int(time.time())}"
    os.makedirs(ev_dir, exist_ok=True)
    conf = {
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": ev_dir,
        "spark.eventLog.compress": "false",
        "spark.eventLog.rolling.enabled": "false",
        "spark.sql.files.maxPartitionBytes": "64m",
    }
    conf.update(extra)
    if "x" in spec:
        # "<n_executors>x<cores_per_executor>" → local-cluster: separate
        # executor JVMs (own heap/GC/python pool), the N-vs-4N proxy
        n_exec, exec_cores = (int(v) for v in spec.split("x"))
        cores = n_exec * exec_cores
        mem_mb = int(os.environ.get("SPARK_GRAFT_EXEC_MEM_MB", "6144"))
        conf.setdefault("spark.executor.memory", f"{mem_mb}m")
        conf.setdefault("spark.executorEnv.PYTHONPATH", "/root/repo")
        master = f"local-cluster[{n_exec},{exec_cores},{mem_mb}]"
    else:
        cores = int(spec)
        master = f"local[{cores}]"
    spark = get_spark(master=master,
                      shuffle_partitions=max(cores, 16),
                      app_name=f"profile-{spec}", extra_conf=conf)
    spark.range(10**6).selectExpr("sum(id)").collect()  # warmup

    from bench import bulk_crawl_throughput  # noqa: E402
    from newscrawler_spark.contract import FIXTURES
    from newscrawler_spark.operators.sinks import download_list_frontier
    from newscrawler_spark.runner import run_crawl

    d = os.path.join(FIXTURES, tier)
    if not os.path.exists(os.path.join(d, "_CORPUS_COMPLETE")):
        bulk_crawl_throughput(spark, tier)  # builds corpus; throwaway run
    pages = spark.read.parquet(f"{d}/pages.parquet")
    seeds = spark.read.parquet(f"{d}/seeds.parquet")
    base_cfg = dict(per_host_budget=10**9, max_depth=3, round_seconds=10**9,
                    batch_size=None, hot_host_threshold=100_000)
    base_cfg.update(cfg_over)
    cfg = CrawlConfig(**base_cfg)
    extra_fr = download_list_frontier(pages.select("url"))
    state_dir = tempfile.mkdtemp(prefix="profile_bulk_")
    try:
        run_crawl(spark, pages, seeds, state_dir, cfg, max_rounds=0,
                  use_bloom=True, extra_frontier=extra_fr)
        t0_epoch_ms = time.time() * 1000
        s0, tot0 = _steal_snapshot()
        t0 = time.monotonic()
        res = run_crawl(spark, pages, seeds, state_dir, cfg,
                        max_rounds=1, use_bloom=True)
        wall = time.monotonic() - t0
        s1, tot1 = _steal_snapshot()
        steal_pct = round(100.0 * (s1 - s0) / max(1, tot1 - tot0), 2)
        counters = res.state.read_counters().collect()
        scheduled = sum(r.urls_scheduled for r in counters)
        extracted = sum(r.articles_extracted for r in counters)
    finally:
        shutil.rmtree(state_dir, ignore_errors=True)
    spark.stop()

    files = [p for p in glob.glob(f"{ev_dir}/**", recursive=True)
             if os.path.isfile(p) and "appstatus" not in p
             and not p.endswith(".zstd")]

    task_ms, gc_by, names, cpu_ms = {}, {}, {}, {}
    full_names = {}
    total_task_ms = total_gc_ms = total_cpu_ms = 0
    for path in files:
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                e = ev.get("Event")
                if e == "SparkListenerTaskEnd":
                    ti = ev.get("Task Info") or {}
                    if ti.get("Finish Time", 0) < t0_epoch_ms:
                        continue
                    m = ev.get("Task Metrics") or {}
                    sid = ev["Stage ID"]
                    rt = m.get("Executor Run Time", 0)
                    gc = m.get("JVM GC Time", 0)
                    cpu = m.get("Executor CPU Time", 0) // 1_000_000
                    task_ms[sid] = task_ms.get(sid, 0) + rt
                    gc_by[sid] = gc_by.get(sid, 0) + gc
                    cpu_ms[sid] = cpu_ms.get(sid, 0) + cpu
                    total_task_ms += rt
                    total_gc_ms += gc
                    total_cpu_ms += cpu
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
                    uniq = list(dict.fromkeys(scopes))
                    names[si["Stage ID"]] = (
                        si["Stage Name"].split(" at ")[0] + " | " + ">".join(uniq[:6])
                    )
                    # class markers must see EVERY scope: AQE groups
                    # scopes into stages differently per width, so a
                    # truncated chain can drop the marker (e.g. InPandas
                    # past position 6) at one width only — that's
                    # exactly the cross-width class flapping the 2-vs-8
                    # table exists to rule out.
                    full_names[si["Stage ID"]] = (
                        si["Stage Name"].split(" at ")[0] + " | " + ">".join(uniq)
                    )

    by_name = {}
    by_norm = {}
    by_class = {}
    for sid, ms in task_ms.items():
        nm = names.get(sid, f"stage{sid}")
        cls = stage_class(full_names.get(sid, nm))
        for key, bucket in ((nm, by_name), (norm_stage(nm), by_norm),
                            (cls, by_class)):
            agg = bucket.setdefault(
                key, {"task_s": 0.0, "gc_s": 0.0, "cpu_s": 0.0})
            agg["task_s"] += ms / 1000
            agg["gc_s"] += gc_by.get(sid, 0) / 1000
            agg["cpu_s"] += cpu_ms.get(sid, 0) / 1000
    top = sorted(by_name.items(), key=lambda kv: -kv[1]["task_s"])[:18]
    top_norm = sorted(by_norm.items(), key=lambda kv: -kv[1]["task_s"])[:24]
    print(json.dumps({
        "cores": cores,
        "wall_s": round(wall, 2),
        "throughput": round((scheduled + extracted) / wall, 1),
        "total_task_s": round(total_task_ms / 1000, 1),
        "total_cpu_s": round(total_cpu_ms / 1000, 1),
        "utilization": round(total_task_ms / 1000 / (wall * cores), 3),
        "gc_s": round(total_gc_ms / 1000, 1),
        "steal_pct": steal_pct,
        "stage_classes": {k: {kk: round(vv, 1) for kk, vv in v.items()}
                          for k, v in sorted(
                              by_class.items(),
                              key=lambda kv: -kv[1]["task_s"])},
        "top_stages": {k: {kk: round(vv, 1) for kk, vv in v.items()}
                       for k, v in top},
        "top_stages_norm": {k: {kk: round(vv, 1) for kk, vv in v.items()}
                            for k, v in top_norm},
    }, indent=1))


if __name__ == "__main__":
    main()
