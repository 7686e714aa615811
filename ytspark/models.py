"""SQL model-DAG runner (SURVEY §2 O4): the reference's dbt execution
model — SQL files with ``{{ ref('...') }}``/``{{ source('...') }}``
edges, topologically ordered, each materialized as a view or table —
re-expressed over the Spark catalog.

Reference mechanics this mirrors: Cosmos expands the dbt project into
one dependency-ordered task per model (``dags/extract.py:211-215``,
``dags/dbt_dag.py:17-26``); staging models are views, the mart is a
table (``dags/dbt/dbt_ytanalytics/dbt_project.yml:33-41``); the model
graph derives from ``ref()``/``source()`` Jinja calls (e.g.
``models/marts/YT_Facts_stg.sql:14,29,44,58,73,87,100``).

Spark-first differences: there is no subprocess per model — each model
renders to SQL and runs in-session; views land in the catalog as temp
views (Catalyst inlines them into downstream plans, the same effect
Snowflake view expansion gave the reference), tables via
``saveAsTable``. Execution order is a topological sort of the ref
graph, exactly dbt's contract; cycles are detected and rejected.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

_REF = re.compile(r"\{\{\s*ref\(\s*['\"]([A-Za-z0-9_]+)['\"]\s*\)\s*\}\}")
_SOURCE = re.compile(
    r"\{\{\s*source\(\s*['\"][A-Za-z0-9_]+['\"]\s*,\s*['\"]([A-Za-z0-9_]+)['\"]\s*\)\s*\}\}"
)


@dataclass(frozen=True)
class Model:
    """One SQL model: ``sql`` may reference other models with
    ``{{ ref('name') }}`` and registered inputs with
    ``{{ source('group', 'table') }}`` (group is documentation-only;
    the table must already be resolvable in the session catalog)."""

    name: str
    sql: str
    materialized: str = "view"  # "view" | "table"
    tags: tuple[str, ...] = field(default_factory=tuple)


def model_deps(m: Model) -> set[str]:
    return set(_REF.findall(m.sql))


def topo_order(models: list[Model]) -> list[Model]:
    """Dependency-ordered models (Kahn); raises on unknown refs and
    cycles — the moral equivalent of dbt's manifest validation."""
    by_name = {m.name: m for m in models}
    deps = {m.name: model_deps(m) for m in models}
    for name, ds in deps.items():
        unknown = ds - set(by_name)
        if unknown:
            raise ValueError(f"model '{name}' refs unknown models: {sorted(unknown)}")
    ordered: list[Model] = []
    ready = sorted(n for n, ds in deps.items() if not ds)
    done: set[str] = set()
    while ready:
        n = ready.pop(0)
        done.add(n)
        ordered.append(by_name[n])
        newly = sorted(
            m
            for m, ds in deps.items()
            if m not in done and m not in ready and ds <= done
        )
        ready.extend(newly)
    if len(ordered) != len(models):
        cyclic = sorted(set(by_name) - {m.name for m in ordered})
        raise ValueError(f"model cycle involving: {cyclic}")
    return ordered


def render(sql: str) -> str:
    """Resolve ref()/source() Jinja calls to catalog names."""
    return _SOURCE.sub(r"\1", _REF.sub(r"\1", sql))


def run_models(spark: SparkSession, models: list[Model]) -> dict[str, DataFrame]:
    """Execute the model DAG in dependency order; returns each model's
    DataFrame keyed by name. Views become temp views (inlined by
    Catalyst downstream); tables are persisted via saveAsTable and
    re-read from the catalog."""
    out: dict[str, DataFrame] = {}
    for m in topo_order(models):
        df = spark.sql(render(m.sql))
        if m.materialized == "table":
            df.write.mode("overwrite").saveAsTable(m.name)
            out[m.name] = spark.table(m.name)
        else:
            df.createOrReplaceTempView(m.name)
            out[m.name] = spark.table(m.name)
    return out


# ---------------------------------------------------------------------------
# O5: retry / failure scaffolding for the model DAG
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ModelResult:
    """Outcome of one model in a resilient run."""

    name: str
    status: str  # "success" | "failed" | "skipped_upstream"
    attempts: int
    error: str | None = None


def run_models_resilient(
    spark: SparkSession,
    models: list[Model],
    *,
    max_retries: int = 2,
    backoff_s: float = 0.0,
    sleeper=None,
    attempt_hook=None,
) -> tuple[dict[str, DataFrame], list[ModelResult]]:
    """``run_models`` with the reference's Airflow-level resilience
    (SURVEY §2 O5: per-task ``retries``/``retry_delay`` in
    ``default_args`` — ``dags/extract.py:178-183``,
    ``dags/example_dag_advanced.py:125``) folded into the engine:

    - each model gets ``1 + max_retries`` attempts with exponential
      backoff (``backoff_s * 2^attempt``; ``sleeper`` injectable so
      tests never sleep),
    - a model that exhausts its attempts FAILS the node but not the
      run: its transitive dependents are recorded as
      ``skipped_upstream`` (Airflow's upstream_failed), while
      independent branches keep executing,
    - every attempt is idempotent by construction — views re-resolve,
      tables overwrite — so a retry after a transient failure cannot
      double-apply (the replay-safety the streaming pipeline already
      guarantees per batch).

    Returns (dataframes of successful models, per-model results in
    execution order). ``attempt_hook(name, attempt)`` runs before
    each attempt — the test seam for injecting transient failures.
    """
    import time

    sleep = sleeper if sleeper is not None else time.sleep
    out: dict[str, DataFrame] = {}
    results: list[ModelResult] = []
    failed: set[str] = set()
    deps = {m.name: model_deps(m) for m in models}
    for m in topo_order(models):
        bad_upstream = deps[m.name] & failed
        if bad_upstream:
            failed.add(m.name)
            results.append(
                ModelResult(
                    m.name,
                    "skipped_upstream",
                    0,
                    f"upstream failed: {sorted(bad_upstream)}",
                )
            )
            continue
        err: str | None = None
        for attempt in range(1 + max_retries):
            if attempt_hook is not None:
                attempt_hook(m.name, attempt)
            try:
                df = spark.sql(render(m.sql))
                if m.materialized == "table":
                    df.write.mode("overwrite").saveAsTable(m.name)
                else:
                    df.createOrReplaceTempView(m.name)
                out[m.name] = spark.table(m.name)
                err = None
                break
            except Exception as e:  # noqa: BLE001 — retry boundary
                err = str(e).splitlines()[0][:200]
                if attempt < max_retries and backoff_s:
                    sleep(backoff_s * (2**attempt))
        if err is None:
            results.append(ModelResult(m.name, "success", attempt + 1))
        else:
            failed.add(m.name)
            results.append(
                ModelResult(m.name, "failed", attempt + 1, err)
            )
    return out, results
