#!/usr/bin/env python
"""Local replica of the driver's t2 correctness gate: run every
registered query on Spark AND its DuckDB oracle on the same parquet,
compare row-count + schema + order-insensitive values.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df):
    """Sort columns by name, then rows; stringify for comparison."""
    import pandas as pd

    df = df[sorted(df.columns)].copy()

    def norm_val(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "<null>"
        if isinstance(v, float):
            return f"{v:.10g}"
        if hasattr(v, "isoformat"):
            return v.isoformat()
        return str(v)

    out = df.map(norm_val)
    rows = sorted(map(tuple, out.itertuples(index=False, name=None)))
    return rows


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    from ytspark import get_spark
    from ytspark.queries import registry

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    reg = registry()
    failures = []
    for name, q in sorted(reg.items()):
        if only and name not in only:
            continue
        try:
            sdf = q.fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"spark error: {str(e).splitlines()[0][:200]}"))
            print(f"FAIL  {name}: spark error")
            continue
        if q.oracle is None:
            print(f"rows  {name}: {len(sdf)} rows (no oracle — rows-only)")
            if len(sdf) == 0:
                failures.append((name, "no-oracle query returned 0 rows"))
            continue
        try:
            odf = con.execute(q.oracle).df()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"duckdb error: {str(e).splitlines()[0][:200]}"))
            print(f"FAIL  {name}: duckdb error: {str(e).splitlines()[0][:120]}")
            continue
        if len(sdf) != len(odf):
            failures.append((name, f"row count {len(sdf)} vs {len(odf)}"))
            print(f"FAIL  {name}: rows {len(sdf)} vs {len(odf)}")
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            failures.append(
                (name, f"columns {sorted(sdf.columns)} vs {sorted(odf.columns)}")
            )
            print(f"FAIL  {name}: column mismatch {sorted(sdf.columns)} vs {sorted(odf.columns)}")
            continue
        a, b = normalize(sdf), normalize(odf)
        if a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            failures.append((name, f"value mismatch, first diffs: {diff}"))
            print(f"FAIL  {name}: value mismatch; e.g. {diff[:1]}")
            continue
        print(f"ok    {name}: {len(sdf)} rows hash-match")

    print()
    if failures:
        print(f"{len(failures)} FAILURES:")
        for n, msg in failures:
            print(f"  {n}: {msg}")
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
