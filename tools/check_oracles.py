"""Local stand-in for the driver's correctness gate.

Runs every `queries()` entry on Spark and its `oracle_sql()` twin on
DuckDB over the same parquet (default sf0.01), compares row count, sorted
column names, and order-insensitive values (exact string equality after
canonical formatting — stricter than the driver's value-hash).

Usage: python tools/check_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import sys
import time
from decimal import Decimal
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402
from jmdfane_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    # FULL-precision canonicalization: repr round-trips doubles exactly and
    # str(Decimal) keeps scale/width, so this gate is at least as strict as
    # any driver-side value hash. (The r1/r2 %.6f float canon masked
    # sub-1e-6 drift and Decimal .normalize() masked scale differences —
    # which is how tpch_pricing_summary passed locally but hash-failed on
    # the driver twice.)
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, float):
        return repr(v)
    return str(v)


def rowset(cols, rows, keep_order=False):
    # keep_order=True mirrors the DRIVER's hash lane: rows compared in
    # delivered order (every query now carries a deterministic orderBy and
    # every oracle the matching ORDER BY, so delivered order must agree)
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = [",".join(canon(r[i]) for i in idx) for r in rows]
    return lines if keep_order else sorted(lines)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(master="local[8]", app_name="oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            results[name] = f"SPARK ERROR: {type(e).__name__}: {str(e)[:200]}"
            continue
        if name not in oracles:
            results[name] = f"rows-only ({len(srows)} rows)"
            continue
        try:
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            results[name] = f"DUCKDB ERROR: {str(e)[:200]}"
            continue
        if sorted(scols) != sorted(dcols):
            results[name] = f"SCHEMA MISMATCH spark={sorted(scols)} duck={sorted(dcols)}"
            continue
        if len(srows) != len(drows):
            results[name] = f"ROWCOUNT MISMATCH spark={len(srows)} duck={len(drows)}"
            continue
        a = rowset(scols, [[r[c] for c in scols] for r in srows])
        b = rowset(dcols, drows)
        if a != b:
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            results[name] = f"VALUE MISMATCH ({len([1 for x, y in zip(a, b) if x != y])}/{len(a)} rows) e.g. {diffs[:2]}"
            continue
        ao = rowset(scols, [[r[c] for c in scols] for r in srows], keep_order=True)
        bo = rowset(dcols, drows, keep_order=True)
        if ao == bo:
            results[name] = f"OK ({len(srows)} rows, {time.time()-t0:.1f}s)"
        else:
            k = next(i for i, (x, y) in enumerate(zip(ao, bo)) if x != y)
            results[name] = (
                f"ROW-ORDER MISMATCH (values equal; first diff at row {k}: "
                f"spark={ao[k][:80]} duck={bo[k][:80]})"
            )

    width = max(len(k) for k in results)
    nok = 0
    for k, v in results.items():
        print(f"{k:<{width}}  {v}")
        nok += v.startswith("OK") or v.startswith("rows-only")
    print(f"\n{nok}/{len(results)} pass")


if __name__ == "__main__":
    main()
