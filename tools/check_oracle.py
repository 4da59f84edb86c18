"""Local differential checker — replicates the driver's t2 gate:
run every registry query on Spark AND its DuckDB oracle on the same
parquet tables, compare row count, column names, and (order-
insensitive) exact values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from vega_spark import registry  # noqa: E402
from vega_spark.session import get_session  # noqa: E402
from vega_spark.tables import TABLE_NAMES  # noqa: E402


def normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    """Sort columns by name, then rows; exact values (the driver
    hashes — any mismatch we see here would break its hash)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm_cell(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            # 12 significant digits: catches real mismatches, forgives
            # sub-rounding float repr noise that the rounded queries
            # should have eliminated anyway
            return f"{v:.12g}"
        if isinstance(v, bool):
            return str(v)
        return repr(v)

    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_session("oracle-check")

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, t)}.parquet'")

    failures = []
    attempted = 0
    for name, fn in registry.QUERIES.items():
        if only and name not in only:
            continue
        attempted += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {type(e).__name__}: {e}"))
            print(f"FAIL  {name:28s} spark error: {e}")
            continue
        if name not in registry.ORACLES:
            print(f"ok*   {name:28s} rows={len(srows):7d} (no oracle, rows-only) "
                  f"{time.time()-t0:5.1f}s")
            continue
        try:
            res = con.execute(registry.ORACLES[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL  {name:28s} duckdb error: {e}")
            continue

        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns spark={sorted(scols)} duckdb={sorted(dcols)}")
        if not problems:
            ns, nd = normalize(srows, scols), normalize(drows, dcols)
            if ns != nd:
                diff = [(a, b) for a, b in zip(ns, nd) if a != b][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL  {name:28s} {'; '.join(problems)[:300]}")
        else:
            print(f"ok    {name:28s} rows={len(srows):7d} {time.time()-t0:5.1f}s")

    print(f"\n{attempted - len(failures)}/{attempted} passed")
    for name, why in failures:
        print(f"  FAILED {name}: {why[:500]}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
