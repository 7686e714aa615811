"""Grouped-map batch operators (``groupBy().applyInPandas``).

This rounds out the engine's Python-kernel surface alongside
``mapInPandas`` (ytspark/operators/multimodal.py — stateless batch
flatMap) and ``applyInPandasWithState`` (ytspark/streaming/queries.py —
streaming state machine): ``applyInPandas`` is the batch grouped-map
shape — one Arrow-backed pandas frame per group key, for per-entity
kernels that genuinely need the whole group in memory (model scoring,
per-entity curve fitting). The reference has no such operator (its only
Python transforms are row flattening, SURVEY §2.10 "UDF surface"); this
is part of the engine's large-scale-pipeline charter.

Scale notes:

- The grouped-map shuffle is one exchange on the group key; each group
  must fit in one task's memory — per-user event history here, bounded
  by per-entity activity, not corpus size. A group that can't fit
  (celebrity-user skew) is exactly the case to pre-aggregate or salt.
- Anything expressible as window/aggregate built-ins should be (they
  stay JVM-side); the pandas kernel is for logic that isn't. The
  min-max normalization below IS window-expressible — it doubles as the
  oracle-checkable proof that the grouped-map plumbing (schema, Arrow
  batches, group iteration) is correct, the same pattern the multimodal
  module uses for its stubbed decode kernels.
- Determinism contract: the kernel uses only exact selections (min/max)
  and per-row IEEE arithmetic on identical operands, so results are
  bit-identical to the SQL window formulation — no rounding slop in the
  cross-engine hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ytspark.queries import register
from ytspark.session import load_tables


def minmax_normalize(
    df: DataFrame, key_cols: list[str], value_col: str, out_col: str
) -> DataFrame:
    """Per-group min-max normalization via ``applyInPandas``.

    norm = (v - min) / (max - min), 0.5 when the group is constant
    (min == max — avoids ANSI divide-by-zero and is symmetric).
    """
    import pandas as pd

    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = f"{out_fields}, {out_col} double"

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col]
        lo, hi = v.min(), v.max()
        pdf[out_col] = (v - lo) / (hi - lo) if hi > lo else 0.5
        return pdf

    return df.groupBy(*key_cols).applyInPandas(kernel, schema=schema)


@register(
    "events_user_minmax_norm",
    oracle="""
SELECT event_id, user_id, value,
       CASE WHEN MAX(value) OVER w > MIN(value) OVER w
            THEN (value - MIN(value) OVER w)
                 / (MAX(value) OVER w - MIN(value) OVER w)
            ELSE 0.5 END AS norm_value
FROM events
WINDOW w AS (PARTITION BY user_id)
""",
    doc="Per-user min-max normalization of event values through the "
        "grouped-map applyInPandas path; the SQL-window equivalent is "
        "the oracle, proving the Arrow group-iteration plumbing exact.",
    tags=("udf", "applyinpandas", "normalize"),
)
def events_user_minmax_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    return minmax_normalize(
        ev.select("event_id", "user_id", "value"),
        key_cols=["user_id"],
        value_col="value",
        out_col="norm_value",
    ).select("event_id", "user_id", "value", "norm_value")
