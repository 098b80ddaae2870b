"""Complete an interrupted tools/ab_bench.py run and write its summary.

The r4 session's A/B (3 arms x 4 reps of bench.py, interleaved) was
killed two legs short of rep 3. This loads BENCH/ab_r2r3.jsonl, runs
only the missing (arm, rep) legs, appends them, and writes the
BENCH/ab_r2r3.json summary with pairing done BY REP (same-epoch legs
paired even if the file order is ragged).
"""

from __future__ import annotations

import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ab_bench import BENCH_DIR, REPO, WATCH, run_leg  # noqa: E402


def main() -> None:
    reps = int(os.environ.get("AB_REPS", "4"))
    r2_dir = os.environ.get("AB_R2_DIR", os.path.join(REPO, ".ab", "r2"))
    arms = [
        ("A_r2", r2_dir, {}),
        ("B_head", REPO, {}),
        ("C_head_zgc", REPO, {"SPARK_GRAFT_GC": "-XX:+UseZGC"}),
    ]
    jsonl = os.path.join(BENCH_DIR, "ab_r2r3.jsonl")
    legs: list[dict] = []
    with open(jsonl) as f:
        for line in f:
            legs.append(json.loads(line))
    have = {(leg["arm"], leg["rep"]) for leg in legs}

    with open(jsonl, "a") as f:
        for rep in range(reps):
            for arm, cwd, env_extra in arms:
                if (arm, rep) in have:
                    continue
                leg = run_leg(arm, cwd, env_extra)
                leg["rep"] = rep
                legs.append(leg)
                f.write(json.dumps(leg) + "\n")
                f.flush()
                print(json.dumps({"arm": arm, "rep": rep,
                                  "rc": leg.get("rc"),
                                  "steal_pct": leg.get("steal_pct"),
                                  "crawl": leg.get("queries", {}).get(
                                      "crawl_3rounds")}), flush=True)

    by = {(leg["arm"], leg["rep"]): leg for leg in legs}

    def val(arm: str, rep: int, q: str):
        return by.get((arm, rep), {}).get("queries", {}).get(q)

    summary: dict = {
        "reps": reps,
        "watch": {},
        "steal_by_rep": {
            str(rep): {a: by.get((a, rep), {}).get("steal_pct")
                       for a, _, _ in arms}
            for rep in range(reps)
        },
    }
    for q in WATCH:
        a = [val("A_r2", r, q) for r in range(reps)]
        b = [val("B_head", r, q) for r in range(reps)]
        c = [val("C_head_zgc", r, q) for r in range(reps)]
        paired_ba = [round(x / y, 3) for x, y in zip(b, a) if x and y]
        paired_cb = [round(x / y, 3) for x, y in zip(c, b) if x and y]
        an = [v for v in a if v]
        bn = [v for v in b if v]
        cn = [v for v in c if v]
        summary["watch"][q] = {
            "A_r2": a, "B_head": b, "C_head_zgc": c,
            "median_A": round(statistics.median(an), 3) if an else None,
            "median_B": round(statistics.median(bn), 3) if bn else None,
            "median_C": round(statistics.median(cn), 3) if cn else None,
            # paired within a rep = same machine epoch; <1.0 = HEAD faster
            "paired_B_over_A": paired_ba,
            "median_B_over_A": round(statistics.median(paired_ba), 3)
            if paired_ba else None,
            "paired_C_over_B": paired_cb,
            "median_C_over_B": round(statistics.median(paired_cb), 3)
            if paired_cb else None,
        }
    out = os.path.join(BENCH_DIR, "ab_r2r3.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({
        "done": True,
        "crawl_median_B_over_A":
        summary["watch"]["crawl_3rounds"]["median_B_over_A"],
        "crawl_median_C_over_B":
        summary["watch"]["crawl_3rounds"]["median_C_over_B"],
    }))


if __name__ == "__main__":
    main()
