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


def _norm_arrow(t) -> str:
    """Canonical arrow-type string; folds widths that hash identically."""
    s = str(t)
    if s.startswith("timestamp["):
        # driver-green events_windowed_agg proves tz-aware-vs-naive doesn't
        # affect the driver hash; fold to the bare unit
        s = s.split(", tz=")[0].rstrip("]") + "]"
    return {"large_string": "string", "large_binary": "binary"}.get(s, s)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(master="local[8]", app_name="oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    # The pinned VALUES oracles are regression tables generated at ONE
    # fixture scale — comparing them at any other sf_dir is a guaranteed
    # false mismatch. Downgrade them to rows-only when scales differ.
    pinned_names: set[str] = set()
    try:
        from tools.pinned_oracles import PINNED_SF_DIR, PINNED_SQL

        if Path(sf_dir).resolve() != Path(PINNED_SF_DIR).resolve():
            pinned_names = set(PINNED_SQL)
    except ImportError:
        pass
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name in pinned_names:
            try:
                n = fn(spark, sf_dir).count()
                results[name] = f"rows-only ({n} rows; pinned oracle is sf-specific, skipped)"
            except Exception as e:  # noqa: BLE001
                results[name] = f"SPARK ERROR: {type(e).__name__}: {str(e)[:200]}"
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
        # Arrow-type lane: the driver's value hash is TYPE-TAGGED, so a
        # DuckDB result that widens (e.g. sum(BIGINT) -> HUGEINT ->
        # decimal128(38,0)) hash-fails against Spark's int64 even with
        # equal values — exactly how tpch_pricing_summary/
        # join_orders_customer stayed red r1-r4 while this checker said OK.
        # Compare the arrow schema both engines would emit (binding only on
        # the DuckDB side via LIMIT 0 — no re-execution).
        tdiff = ""
        try:
            from pyspark.sql.pandas.types import to_arrow_type

            stypes = {f.name: _norm_arrow(to_arrow_type(f.dataType)) for f in sdf.schema.fields}
            dschema = con.sql(oracles[name]).limit(0).arrow().schema
            dtypes = {f.name: _norm_arrow(f.type) for f in dschema}
            bad = {c: (stypes[c], dtypes[c]) for c in stypes if c in dtypes and stypes[c] != dtypes[c]}
            if bad:
                tdiff = f" TYPE DIFF {bad}"
        except Exception as e:  # noqa: BLE001
            tdiff = f" (type lane unavailable: {type(e).__name__})"
        ao = rowset(scols, [[r[c] for c in scols] for r in srows], keep_order=True)
        bo = rowset(dcols, drows, keep_order=True)
        if ao == bo:
            if tdiff.startswith(" TYPE DIFF"):
                results[name] = f"ARROW-TYPE MISMATCH (values equal; driver hash will fail):{tdiff}"
            else:
                results[name] = f"OK ({len(srows)} rows, {time.time()-t0:.1f}s){tdiff}"
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
