#!/usr/bin/env python
"""Second-environment gate (r8 VERDICT item 4b): catch environment-
sensitive float semantics BEFORE the driver does, without installing
anything.

The driver runs the same DuckDB/Spark builds as this sandbox, so the
residual env-sensitivity risk class is EXECUTION-ORDER divergence:
ordered accumulation of doubles whose grouping/merge order depends on
engine configuration. This tool perturbs exactly that axis on the same
machine:

- **DuckDB pass (all oracles, cheap):** every oracle runs under
  ``threads=8`` and ``threads=1`` on fresh connections. Multi-threaded
  DuckDB merges partial aggregates in a nondeterministic order; a
  single thread folds left-to-right. Any value-hash difference between
  the two runs means the oracle's output depends on accumulation order
  — the precise class that produced round 7's two driver failures.
- **Spark pass (window queries by default):** each query runs under
  ``spark.sql.shuffle.partitions=32`` (the session default) and again
  under ``7`` (coprime, odd — different partial-aggregate groupings and
  merge orders; AQE coalescing also re-plans). A differing result
  means the Spark side is partition-count-sensitive, which also implies
  cluster-size sensitivity at 100 TB.

Exit 0 when every checked query is stable under both perturbations;
exit 1 listing the sensitive ones. Usage::

    python tools/second_env_check.py [--full-spark] [sf_dir] [name ...]

With no names: DuckDB pass over ALL oracles + Spark pass over the
50-query certified window, or over the FULL registry with
``--full-spark`` (the standing round-close mode per r9 VERDICT item 5
— partition-count sensitivity in backlog queries is caught before
their first driver check). With names: both passes over those names —
a requested name that is not registered is an ERROR (exit 1), and a
registered oracle-less name still gets the Spark pass (r9 ADVICE: such
names used to be silently skipped from both passes while the tool
reported success).
"""

from __future__ import annotations

import os
import sys

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _duck_run(sf_dir: str, sql: str, threads: int):
    import duckdb

    con = duckdb.connect()
    con.execute(f"SET threads={threads}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    try:
        return con.execute(sql).df()
    finally:
        con.close()


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    full_spark = "--full-spark" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
    )
    from oracle_check import normalize

    from ytspark import get_spark
    from ytspark.queries import _PRIORITY, registry

    reg = registry()
    unknown = sorted(only - set(reg))
    if unknown:  # a typo'd name must not report exit 0 as if checked
        print(f"ERROR: requested names not in the registry: {unknown}")
        return 1
    sensitive: list[tuple[str, str]] = []

    # ---- DuckDB thread-order pass ----
    duck_names = [
        n for n, q in sorted(reg.items())
        if q.oracle is not None and (not only or n in only)
    ]
    for name in sorted(only):
        if reg[name].oracle is None:
            print(f"skip  {name}: no oracle — duckdb pass not applicable")
    for name in duck_names:
        try:
            a = normalize(_duck_run(sf_dir, reg[name].oracle, threads=8))
            b = normalize(_duck_run(sf_dir, reg[name].oracle, threads=1))
        except Exception as e:  # noqa: BLE001
            sensitive.append((name, f"duckdb error: {str(e).splitlines()[0][:120]}"))
            print(f"FAIL  {name}: duckdb error")
            continue
        if a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:2]
            sensitive.append((name, f"duckdb threads 8 vs 1: {diff}"))
            print(f"SENS  {name}: duckdb thread-order divergence {diff[:1]}")
        else:
            print(f"ok    {name}: duckdb thread-order stable")

    # ---- Spark shuffle-partition pass ----
    # explicit names run the Spark pass even when oracle-less (the
    # perturbation compares Spark against itself, no SQL needed); with
    # no names, --full-spark covers the whole registry (round-close
    # mode), else the certified window
    if only:
        spark_names = sorted(only)
    elif full_spark:
        spark_names = list(reg)
    else:
        spark_names = [n for n in _PRIORITY]
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("second-env-check")
    base_parts = spark.conf.get("spark.sql.shuffle.partitions")
    for name in spark_names:
        try:
            spark.conf.set("spark.sql.shuffle.partitions", base_parts)
            a = normalize(reg[name].fn(spark, sf_dir).toPandas())
            spark.catalog.clearCache()
            spark.conf.set("spark.sql.shuffle.partitions", "7")
            b = normalize(reg[name].fn(spark, sf_dir).toPandas())
            spark.catalog.clearCache()
        except Exception as e:  # noqa: BLE001
            sensitive.append((name, f"spark error: {str(e).splitlines()[0][:120]}"))
            print(f"FAIL  {name}: spark error")
            continue
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", base_parts)
        if a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:2]
            sensitive.append((name, f"spark shuffle 32 vs 7: {diff}"))
            print(f"SENS  {name}: spark partition-count divergence {diff[:1]}")
        else:
            print(f"ok    {name}: spark partition-count stable")

    print(
        f"\nchecked {len(duck_names)} oracles (duckdb) + "
        f"{len(spark_names)} queries (spark); "
        f"{len(sensitive)} environment-sensitive"
    )
    for name, why in sensitive:
        print(f"  SENSITIVE: {name} — {why}")
    return 1 if sensitive else 0


if __name__ == "__main__":
    raise SystemExit(main())
