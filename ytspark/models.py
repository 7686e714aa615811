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
