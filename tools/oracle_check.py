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


def dtype_family(series):
    """Coarse numeric-type family of a pandas column.

    The driver's value-hash is type-sensitive: DuckDB ``SUM(BIGINT)``
    comes back as HUGEINT (pandas float64) while Spark's ``sum`` is
    BIGINT (pandas int64), and ``122`` vs ``122.0`` hash differently
    even though every value is numerically identical.  All six round-1
    driver failures were exactly this, and the old ``%.10g`` float
    normalization below masked it locally.  Families: bool < int <
    float are distinct; datetimes, strings, decimals likewise.
    """
    from pandas.api import types as ptypes

    if ptypes.is_bool_dtype(series):
        return "bool"
    if ptypes.is_integer_dtype(series):
        return "int"
    if ptypes.is_float_dtype(series):
        return "float"
    if ptypes.is_datetime64_any_dtype(series):
        return "datetime"
    # object columns: peek at the first non-null value
    import datetime
    import decimal

    for v in series:
        if v is None or (isinstance(v, float) and math.isnan(v)):
            continue
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, decimal.Decimal):
            return "decimal"
        if isinstance(v, int):
            return "int"
        if isinstance(v, float):
            return "float"
        if isinstance(v, datetime.datetime):
            return "datetime"
        if isinstance(v, datetime.date):
            return "date"
        if isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
            return "array"
        return type(v).__name__
    return "all-null"


def dtype_mismatches(sdf, odf):
    """Per-column (family_fail, width_warn) report between two frames."""
    fails, warns = [], []
    for c in sorted(sdf.columns):
        sf, of = dtype_family(sdf[c]), dtype_family(odf[c])
        if "all-null" in (sf, of):
            continue
        if sf != of:
            fails.append(f"{c}: spark={sf}/{sdf[c].dtype} oracle={of}/{odf[c].dtype}")
        elif sf == "datetime":
            # datetime64[ns] vs [us] is pandas' internal unit, not an
            # engine type difference — both sides are TIMESTAMP and the
            # value compare uses isoformat; never a width warn
            continue
        elif str(sdf[c].dtype) != str(odf[c].dtype):
            warns.append(f"{c}: spark={sdf[c].dtype} oracle={odf[c].dtype}")
    return fails, warns


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
    warnings: list[tuple[str, str]] = []
    results: dict[str, dict] = {}

    def record(name, status, rows=None, err=None):
        results[name] = {"status": status, "spark_rows": rows, "err": err}

    for name, q in sorted(reg.items()):
        if only and name not in only:
            continue
        try:
            sdf = q.fn(spark, sf_dir).toPandas()
            # query fns persist() shared intermediates and, being lazy,
            # cannot unpersist them before the action; drop them here so
            # cached blocks don't accumulate over the 200+-query run
            spark.catalog.clearCache()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"spark error: {str(e).splitlines()[0][:200]}"))
            record(name, "fail", err=f"spark error: {str(e).splitlines()[0][:200]}")
            print(f"FAIL  {name}: spark error")
            continue
        if q.oracle is None:
            print(f"rows  {name}: {len(sdf)} rows (no oracle — rows-only)")
            if len(sdf) == 0:
                failures.append((name, "no-oracle query returned 0 rows"))
                record(name, "fail", rows=0, err="no-oracle query returned 0 rows")
            else:
                record(name, "rows_only", rows=len(sdf))
            continue
        try:
            odf = con.execute(q.oracle).df()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"duckdb error: {str(e).splitlines()[0][:200]}"))
            record(name, "fail", err=f"duckdb error: {str(e).splitlines()[0][:200]}")
            print(f"FAIL  {name}: duckdb error: {str(e).splitlines()[0][:120]}")
            continue
        if len(sdf) != len(odf):
            failures.append((name, f"row count {len(sdf)} vs {len(odf)}"))
            record(name, "fail", rows=len(sdf), err=f"row count {len(sdf)} vs {len(odf)}")
            print(f"FAIL  {name}: rows {len(sdf)} vs {len(odf)}")
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            failures.append(
                (name, f"columns {sorted(sdf.columns)} vs {sorted(odf.columns)}")
            )
            record(name, "fail", rows=len(sdf), err="column mismatch")
            print(f"FAIL  {name}: column mismatch {sorted(sdf.columns)} vs {sorted(odf.columns)}")
            continue
        type_fails, type_warns = dtype_mismatches(sdf, odf)
        if type_fails:
            failures.append((name, f"dtype family mismatch: {type_fails}"))
            record(name, "fail", rows=len(sdf), err=f"dtype family mismatch: {type_fails}")
            print(f"FAIL  {name}: dtype family mismatch: {type_fails}")
            continue
        if type_warns:
            warnings.append((name, f"dtype width differs: {type_warns}"))
            print(f"warn  {name}: dtype width differs (values compare ok): {type_warns}")
        a, b = normalize(sdf), normalize(odf)
        if a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            failures.append((name, f"value mismatch, first diffs: {diff}"))
            record(name, "fail", rows=len(sdf), err="value mismatch")
            print(f"FAIL  {name}: value mismatch; e.g. {diff[:1]}")
            continue
        record(name, "hash_match", rows=len(sdf))
        print(f"ok    {name}: {len(sdf)} rows hash-match")

    # Persist the uncapped run so the external gate's 50-query window is
    # auditable against the full registry (ADVICE r2: publish the full
    # local oracle_check results alongside the curated window).
    # A NAMED run (only=...) merges its results into the existing
    # artifact — registering a query and certifying it in one step
    # keeps ORACLE_LOCAL.json fresh without a full sweep (the r5
    # VERDICT's artifact-freshness race, fixed structurally). Entries
    # for queries no longer in the registry are pruned on merge.
    import json

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ORACLE_LOCAL.json",
    )
    if only and results:
        if not os.path.exists(path):
            # ADVICE r6: with the artifact absent (fresh clone, deleted
            # file), a named run must NOT write a subset that presents
            # itself with full-sweep semantics — skip, like the
            # sf_dir-mismatch branch, and require a full sweep first
            print(
                f"note: not writing {path} (artifact absent; a named "
                f"run would record only {len(results)} queries with "
                f"full-sweep semantics — run a full sweep first)"
            )
            results = {}
        else:
            with open(path) as fh:
                prev = json.load(fh)
            merged = {
                n: r for n, r in prev.get("results", {}).items() if n in reg
            }
            merged.update(results)
            if prev.get("sf_dir") == sf_dir:
                results = dict(sorted(merged.items()))
            else:
                print(
                    f"note: not merging into {path} (it was recorded at "
                    f"{prev.get('sf_dir')}, this run used {sf_dir})"
                )
                results = {}
    if results:
        out = {
            "sf_dir": sf_dir,
            "n_queries": len(results),
            "n_hash_match": sum(
                1 for r in results.values() if r["status"] == "hash_match"
            ),
            "n_rows_only": sum(
                1 for r in results.values() if r["status"] == "rows_only"
            ),
            "n_fail": sum(1 for r in results.values() if r["status"] == "fail"),
            "results": results,
        }
        with open(path, "w") as fh:
            json.dump(out, fh, indent=1)
        print(f"wrote {path}")
        # one compact machine-parseable summary line for round logs —
        # the uncapped full-registry counts, externally recorded even
        # when only the log tail survives
        print(
            json.dumps(
                {
                    "metric": "oracle_local_summary",
                    "sf_dir": out["sf_dir"],
                    "n_queries": out["n_queries"],
                    "n_hash_match": out["n_hash_match"],
                    "n_rows_only": out["n_rows_only"],
                    "n_fail": out["n_fail"],
                }
            )
        )

    print()
    if failures:
        print(f"{len(failures)} FAILURES:")
        for n, msg in failures:
            print(f"  {n}: {msg}")
        return 1
    if warnings:
        # green-means-green (r4 judge item 7): dtype-width drift exits
        # non-zero so it can't silently accumulate between rounds
        print(f"{len(warnings)} WARNINGS (values match, dtype width drifted):")
        for n, msg in warnings:
            print(f"  {n}: {msg}")
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
