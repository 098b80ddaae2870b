"""Local driver-mimic: run every queries() entry AND its oracle_sql()
side-by-side at sf0.01 (the driver's correctness tier) and compare
row count, column names, and a value hash with columns sorted by name —
the same comparison shape CORRECTNESS_r{N}.json records.

Usage:
    python tools/check_contract.py [query ...]    # default: all
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

VIEWS = ("region nation customer supplier part orders lineitem events "
         "documents embeddings").split()


def _norm(v):
    if v is None:
        return ""
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(_norm(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> None:
    only = set(sys.argv[1:])
    from newscrawler_spark.session import get_spark

    spark = get_spark()
    import importlib

    entry = importlib.import_module("__spark_entry__")
    queries = entry.queries()
    oracles = entry.oracle_sql()

    con = duckdb.connect()
    for t in VIEWS:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )

    results = {}
    fails = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            results[name] = {"err": f"spark: {e}"}
            fails.append(name)
            print(f"{name}: SPARK ERROR {e}")
            continue
        if name not in oracles:
            results[name] = {"spark_rows": len(srows), "err": "no_oracle"}
            print(f"{name}: rows={len(srows)} (no oracle)")
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            results[name] = {"err": f"oracle: {e}"}
            fails.append(name)
            print(f"{name}: ORACLE ERROR {e}")
            continue
        rows_match = len(srows) == len(orows)
        schema_match = sorted(scols) == sorted(ocols)
        hmatch = (
            value_hash(scols, srows) == value_hash(ocols, orows)
            if rows_match and schema_match else False
        )
        results[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hmatch, "spark_rows": len(srows),
            "oracle_rows": len(orows), "sec": round(time.monotonic() - t0, 2),
        }
        ok = rows_match and schema_match and hmatch
        if not ok:
            fails.append(name)
        print(f"{name}: rows {len(srows)}/{len(orows)} "
              f"schema={schema_match} hash={hmatch} "
              f"[{results[name]['sec']}s]" + ("" if ok else "  <-- FAIL"))
        if not hmatch and rows_match and schema_match:
            # show a few diffs to debug
            sset = {tuple(_norm(v) for v in r) for r in srows}
            oset = {tuple(_norm(v) for v in r) for r in orows}
            print("   spark-only:", list(sset - oset)[:3])
            print("   oracle-only:", list(oset - sset)[:3])

    with open("tools/check_contract_last.json", "w") as f:
        json.dump(results, f, indent=1)
    print(f"\n{len(results) - len(fails)}/{len(results)} green"
          + (f"; FAILS: {fails}" if fails else ""))
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
