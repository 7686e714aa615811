"""Schema-driven JSON flattening (SURVEY §2 T1–T4).

The reference flattens nested API JSON two ways:

- v1: ``pd.json_normalize`` + rename every dotted column to its **leaf**
  path segment, then keep-first dedup of the resulting duplicate names
  (reference ``dags/extract.py:92-99,112``).
- v2: recursive dict walk where list values become positional scalar
  columns ``key_0, key_1, …`` (reference ``dags/optimized_extract.py:25-39``).

Here flattening is pure **metadata work over ``df.schema``** producing a
single ``select`` of column expressions — no Python UDF, execution stays
in Tungsten, and Catalyst sees a plain projection it can prune/push
through. At 100 TB this matters: the flatten is zero-cost at runtime
beyond reading the referenced leaves.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# List policies (SURVEY §7.4 "list policy divergence"):
#   drop        — v1: array-typed leaves are omitted (dags/extract.py:113)
#   positional  — v2: array leaf `k` becomes `k_0 … k_{width-1}` scalars
#                 (dags/optimized_extract.py:32-35)
#   keep        — engine extension: preserve ArrayType column
LIST_POLICIES = ("drop", "positional", "keep")


@dataclass(frozen=True)
class FlatField:
    """One output column of a flatten: full dotted path + leaf name."""

    path: str  # e.g. "snippet.thumbnails.default.url"
    leaf: str  # e.g. "url"
    dtype: T.DataType


def flatten_fields(
    schema: T.StructType, prefix: str = ""
) -> list[FlatField]:
    """Depth-first, declaration-order walk of a StructType.

    Field order is preserved deterministically — keep-first dedup depends
    on it (SURVEY §7.4 "duplicate-name dedup order").
    """
    out: list[FlatField] = []
    for field in schema.fields:
        path = f"{prefix}{field.name}"
        if isinstance(field.dataType, T.StructType):
            out.extend(flatten_fields(field.dataType, prefix=f"{path}."))
        else:
            out.append(FlatField(path=path, leaf=field.name, dtype=field.dataType))
    return out


def _quote(path: str) -> Column:
    """Column ref for a dotted struct path with per-segment backticks."""
    return F.col(".".join(f"`{seg}`" for seg in path.split(".")))


def flatten(
    df: DataFrame,
    *,
    list_policy: str = "drop",
    list_width: int = 2,
    dedup: bool = True,
) -> DataFrame:
    """Flatten all nested structs into top-level columns named by their
    **leaf** path segment, with first-occurrence-wins dedup.

    ``snippet.title`` beats ``snippet.localized.title``;
    ``thumbnails.default.url`` beats medium/high — exactly the
    reference's `~new_df.columns.duplicated()` semantics
    (``dags/extract.py:112``).
    """
    if list_policy not in LIST_POLICIES:
        raise ValueError(f"list_policy must be one of {LIST_POLICIES}")

    cols: list[Column] = []
    seen: set[str] = set()
    for f in flatten_fields(df.schema):
        if isinstance(f.dtype, T.ArrayType):
            if list_policy == "drop":
                continue
            if list_policy == "positional":
                for i in range(list_width):
                    name = f"{f.leaf}_{i}"
                    if dedup and name in seen:
                        continue
                    seen.add(name)
                    # try_element_at: 1-indexed, NULL past the end (ANSI-safe;
                    # matches v2 writing only as many columns as items — a
                    # static schema needs the NULL-fill).
                    cols.append(F.try_element_at(_quote(f.path), F.lit(i + 1)).alias(name))
                continue
            # "keep" falls through to scalar handling below
        if dedup and f.leaf in seen:
            continue
        seen.add(f.leaf)
        cols.append(_quote(f.path).alias(f.leaf))
    return df.select(*cols)


def flat_column_names(
    schema: T.StructType, *, list_policy: str = "drop", list_width: int = 2
) -> list[str]:
    """The output column names `flatten` would produce for ``schema``."""
    names: list[str] = []
    seen: set[str] = set()
    for f in flatten_fields(schema):
        if isinstance(f.dtype, T.ArrayType):
            if list_policy == "drop":
                continue
            if list_policy == "positional":
                for i in range(list_width):
                    name = f"{f.leaf}_{i}"
                    if name not in seen:
                        seen.add(name)
                        names.append(name)
                continue
        if f.leaf not in seen:
            seen.add(f.leaf)
            names.append(f.leaf)
    return names
