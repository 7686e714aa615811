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

- **Alt-build pass (``--alt-build``, r10 VERDICT item 8):** the float
  queries the env-sensitivity audit flagged-and-adjudicated (the
  PINNED list) re-run under the closest available proxies for a
  DIFFERENT BUILD of each engine, and each result is compared to the
  same engine's default-build result. Spark: whole-stage codegen OFF
  (interpreted expression evaluation — a different compiled path for
  every scalar expression) plus Arrow ``maxRecordsPerBatch`` dropped
  10000 → 1000 (different pandas_udf kernel batch boundaries, so any
  batch-order accumulation diverges). DuckDB: the expression-rewriter
  and statistics-propagation optimizers disabled (constant folding and
  plan choices move from optimize-time to run-time — a different
  evaluation path for the same SQL). A PINNED verdict claims the value
  is a deterministic scalar expression tree over exact inputs; these
  flips exercise exactly the paths a real build change would.

Exit 0 when every checked query is stable under both perturbations;
exit 1 listing the sensitive ones. Usage::

    python tools/second_env_check.py [--full-spark] [--alt-build] [--alt-only] [sf_dir] [name ...]

``--alt-build`` adds the alt-build pass to the standard two;
``--alt-only`` runs JUST the alt-build pass (the standalone receipt).

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


def _duck_run(sf_dir: str, sql: str, threads: int, alt_build: bool = False):
    import duckdb

    con = duckdb.connect()
    con.execute(f"SET threads={threads}")
    if alt_build:
        # different-build proxy: constant folding and stats-based plan
        # choices move from optimize-time to run-time evaluation paths
        con.execute(
            "SET disabled_optimizers="
            "'expression_rewriter,statistics_propagation'"
        )
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
    alt_build = "--alt-build" in sys.argv[1:] or "--alt-only" in sys.argv[1:]
    alt_only = "--alt-only" in sys.argv[1:]
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
    ] if not alt_only else []
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
    if alt_only:
        spark_names = []
    elif only:
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

    # ---- Alt-build pass over the adjudicated (PINNED) float list ----
    n_alt = 0
    if alt_build:
        from env_sensitivity_audit import ADJUDICATED

        alt_names = sorted(
            n for n in ADJUDICATED
            if n in reg and (not only or n in only)
        )
        n_alt = len(alt_names)
        for name in alt_names:
            q = reg[name]
            # DuckDB: default build vs optimizer-path flip
            if q.oracle is not None:
                try:
                    a = normalize(_duck_run(sf_dir, q.oracle, threads=8))
                    b = normalize(
                        _duck_run(sf_dir, q.oracle, threads=8, alt_build=True)
                    )
                except Exception as e:  # noqa: BLE001
                    sensitive.append(
                        (name, f"duckdb alt-build error: "
                               f"{str(e).splitlines()[0][:120]}")
                    )
                    print(f"FAIL  {name}: duckdb alt-build error")
                    a = b = None
                if a is not None and a != b:
                    diff = [(x, y) for x, y in zip(a, b) if x != y][:2]
                    sensitive.append(
                        (name, f"duckdb alt-build (optimizers off): {diff}")
                    )
                    print(f"SENS  {name}: duckdb alt-build divergence")
                elif a is not None:
                    print(f"ok    {name}: duckdb alt-build stable")
            # Spark: default build vs interpreted + small-Arrow-batch
            alt_confs = {
                "spark.sql.codegen.wholeStage": "false",
                "spark.sql.execution.arrow.maxRecordsPerBatch": "1000",
            }
            saved = {k: spark.conf.get(k) for k in alt_confs}
            try:
                a = normalize(q.fn(spark, sf_dir).toPandas())
                spark.catalog.clearCache()
                for k, v in alt_confs.items():
                    spark.conf.set(k, v)
                b = normalize(q.fn(spark, sf_dir).toPandas())
                spark.catalog.clearCache()
            except Exception as e:  # noqa: BLE001
                sensitive.append(
                    (name, f"spark alt-build error: "
                           f"{str(e).splitlines()[0][:120]}")
                )
                print(f"FAIL  {name}: spark alt-build error")
                continue
            finally:
                for k, v in saved.items():
                    spark.conf.set(k, v)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:2]
                sensitive.append(
                    (name, f"spark alt-build (no codegen, arrow 1k): {diff}")
                )
                print(f"SENS  {name}: spark alt-build divergence")
            else:
                print(f"ok    {name}: spark alt-build stable")

    print(
        f"\nchecked {len(duck_names)} oracles (duckdb) + "
        f"{len(spark_names)} queries (spark)"
        + (f" + {n_alt} alt-build (both engines)" if alt_build else "")
        + f"; {len(sensitive)} environment-sensitive"
    )
    for name, why in sensitive:
        print(f"  SENSITIVE: {name} — {why}")
    return 1 if sensitive else 0


if __name__ == "__main__":
    raise SystemExit(main())
