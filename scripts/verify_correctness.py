#!/usr/bin/env python
"""Local twin of the driver's correctness gate: run every queries()
entry under Spark and its oracle_sql() under DuckDB at sf0.01, compare
row count, sorted column names, and the full sorted value multiset.

Usage: python scripts/verify_correctness.py [--json OUT] [sf_dir] [query ...]

With ``--json OUT`` the per-query verdicts (status ok / rows-only /
fail, row count, wall seconds, failure message) are also written as
one JSON object to OUT — the committed round artifact
(``bench_local/VERIFY_r{N}.json``) so the 200+ queries the driver's
50-row sample never touches carry a reproducible record per round.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
    except ImportError:
        pass
    import datetime

    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), x) for x in t))
    return [cols[i] for i in order], out


def approx_equal(a, b, tol=1e-9):
    if isinstance(a, float) and isinstance(b, float):
        if a == b:
            return True
        return abs(a - b) <= tol * max(1.0, abs(a), abs(b))
    return a == b


def main():
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as entry
    from margaret_spark.session import get_spark

    spark = get_spark(app_name="verify-correctness", cpus=8, shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    n_pass = n_fail = n_weak = 0
    failures = []
    report = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = list(sdf.columns)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            failures.append(name)
            report[name] = {
                "status": "fail", "rows": None,
                "wall_s": round(time.time() - t0, 2),
                "msg": f"spark error: {e}",
            }
            continue
        if name not in oracles:
            print(f"weak  {name}: rows={len(srows)} (no oracle; rows-only)  [{time.time()-t0:.1f}s]")
            n_weak += 1
            report[name] = {
                "status": "rows-only", "rows": len(srows),
                "wall_s": round(time.time() - t0, 2),
            }
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            failures.append(name)
            report[name] = {
                "status": "fail", "rows": len(srows),
                "wall_s": round(time.time() - t0, 2),
                "msg": f"oracle error: {e}",
            }
            continue
        sc, sr = norm_rows(scols, srows)
        oc, orr = norm_rows(ocols, orows)
        msg = None
        if sc != oc:
            msg = f"columns differ: spark={sc} oracle={oc}"
        elif len(sr) != len(orr):
            msg = f"row count differs: spark={len(sr)} oracle={len(orr)}"
        else:
            exact = sr == orr
            if not exact:
                for i, (x, y) in enumerate(zip(sr, orr)):
                    if not all(approx_equal(a, b) for a, b in zip(x, y)):
                        msg = f"values differ at sorted row {i}:\n  spark : {x}\n  oracle: {y}"
                        break
                else:
                    msg = "APPROX ONLY (within 1e-9 but not bit-equal — hash WILL mismatch)"
        if msg:
            print(f"FAIL  {name}: {msg}")
            n_fail += 1
            failures.append(name)
            report[name] = {
                "status": "fail", "rows": len(sr),
                "wall_s": round(time.time() - t0, 2), "msg": msg,
            }
        else:
            print(f"ok    {name}: rows={len(sr)}  [{time.time()-t0:.1f}s]")
            n_pass += 1
            report[name] = {
                "status": "ok", "rows": len(sr),
                "wall_s": round(time.time() - t0, 2),
            }

    print(f"\n{n_pass} ok, {n_weak} rows-only, {n_fail} FAIL")
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_ok": n_pass,
                    "n_rows_only": n_weak,
                    "n_fail": n_fail,
                    "queries": report,
                },
                f,
                indent=1,
                sort_keys=True,
            )
            f.write("\n")
        print(f"wrote {json_out}")
    if failures:
        print("failures:", " ".join(failures))
        sys.exit(1)


if __name__ == "__main__":
    main()
