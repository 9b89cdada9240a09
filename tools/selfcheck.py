"""Replicates the driver's correctness gate locally: run every
__spark_entry__ query on Spark AND its oracle SQL on DuckDB at sf0.01,
compare row count, schema (column names), and an order-insensitive value
hash. Usage: python tools/selfcheck.py [sf_dir] [only_query ...]

A FULL run (no query subset) also writes ``SELFCHECK_ALL.json`` at the
repo root — the committed companion to the driver's 50-entry
CORRECTNESS gate, proving the past-cap variant entries were
value-checked this round too.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in sorted(cols):
            v = row[c]
            if isinstance(v, float):
                v = f"{v:.6f}"
                if v in ("-0.000000",):
                    v = "0.000000"
            vals.append(str(v))
        out.append("|".join(vals))
    out.sort()
    return hashlib.md5("\n".join(out).encode()).hexdigest(), out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from wiki_search_engine_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    report: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [r.asDict() for r in sdf.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR {type(e).__name__}: {e}"))
            report[name] = {"status": "FAIL", "err": f"spark: {e}"[:300]}
            print(f"FAIL {name}: spark error {e}")
            continue
        if name not in oracles:
            report[name] = {"status": "rows-only", "rows": len(srows)}
            print(
                f"rows-only {name}: {len(srows)} rows, cols={scols} "
                f"({time.time() - t0:.1f}s)"
            )
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = rel.columns
            orows = [dict(zip(ocols, r)) for r in rel.fetchall()]
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            report[name] = {"status": "FAIL", "err": f"duckdb: {e}"[:300]}
            print(f"FAIL {name}: duckdb error {e}")
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"schema {sorted(scols)} vs {sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} vs {len(orows)}")
        if not problems:
            sh, snorm = normalize(srows, scols)
            oh, onorm = normalize(orows, ocols)
            if sh != oh:
                diffs = [
                    (a, b) for a, b in zip(snorm, onorm) if a != b
                ][:3]
                problems.append(f"value hash; first diffs: {diffs}")
        if problems:
            failures.append((name, "; ".join(problems)))
            report[name] = {
                "status": "FAIL", "err": "; ".join(problems)[:300],
            }
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            report[name] = {
                "status": "PASS",
                "rows": len(srows),
                "sec": round(time.time() - t0, 1),
            }
            print(
                f"PASS {name}: {len(srows)} rows ({time.time() - t0:.1f}s)"
            )
    print(f"\n{len(failures)} failures")
    for name, msg in failures:
        print(f"  {name}: {msg[:300]}")
    if not only:
        out = os.path.join(os.path.dirname(__file__), "..",
                           "SELFCHECK_ALL.json")
        with open(out, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "entries": len(report),
                    "failures": len(failures),
                    "results": report,
                },
                f, indent=1,
            )
        print(f"wrote {os.path.normpath(out)} ({len(report)} entries)")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
