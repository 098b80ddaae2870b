"""Compare two bench.py JSON outputs per query.

Usage: python tools/bench_compare.py OLD.json NEW.json [--flag 1.3]

Prints one line per query — old wall, new wall, new/old ratio — plus the
crawl headline, and flags movers beyond the threshold in either
direction. Single-epoch walls on this box swing with invisible
co-tenant pressure (BENCH/BASELINE.md documents a 29-96 s same-binary
crawl spread), so treat flagged movers as *candidates* to confirm with
an interleaved A/B (the ab_* receipts), never as verdicts by themselves.
"""

from __future__ import annotations

import argparse
import json


def load(path: str) -> dict:
    with open(path) as f:
        body = f.read()
    try:
        d = json.loads(body)  # pretty-printed artifact
        # driver BENCH_r*.json wraps the bench line under "parsed"
        return d["parsed"] if "parsed" in d and "queries" not in d else d
    except json.JSONDecodeError:
        pass
    for line in body.splitlines():  # bench.py's one-line-JSON stdout
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    raise SystemExit(f"{path}: no JSON object found")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--flag", type=float, default=1.3,
                    help="flag ratios outside [1/x, x] (default 1.3)")
    args = ap.parse_args()
    old, new = load(args.old), load(args.new)
    oq, nq = old.get("queries", {}), new.get("queries", {})
    flagged = []
    print(f"{'query':32s} {'old':>8s} {'new':>8s} {'ratio':>7s}")
    for name in sorted(set(oq) | set(nq)):
        a, b = oq.get(name), nq.get(name)
        if a is None or b is None:
            print(f"{name:32s} {a if a is not None else '-':>8} "
                  f"{b if b is not None else '-':>8}   (only one side)")
            continue
        r = b / a if a else float("inf")
        mark = ""
        if r > args.flag or r < 1 / args.flag:
            mark = "  <-- flag"
            flagged.append((name, r))
        print(f"{name:32s} {a:8.3f} {b:8.3f} {r:7.3f}{mark}")
    ot, nt = old.get("value"), new.get("value")
    if ot and nt:
        print(f"\ncrawl throughput: {ot:.1f} -> {nt:.1f} urls/s "
              f"({nt / ot:.3f}x)")
    if flagged:
        print(f"\n{len(flagged)} flagged (confirm with an interleaved A/B "
              "before calling them regressions/wins):")
        for name, r in sorted(flagged, key=lambda x: x[1], reverse=True):
            print(f"  {name}: {r:.2f}x")


if __name__ == "__main__":
    main()
