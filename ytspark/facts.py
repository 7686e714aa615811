"""Typed mart construction: cast projection + UNION ALL (SURVEY §2 T9/T11/T13).

Reference: dbt mart ``models/marts/YT_Facts_stg.sql`` — 7 per-channel
CTEs each casting 10 columns (``::varchar(n)/datetime/int/Boolean``,
lines 3-12) stacked with ``UNION ALL`` (lines 103-115).

Spark-first translation: the per-channel CTEs are slices of ONE
partitioned bronze DataFrame, so the cast+union collapses into a single
projection over the whole table — Catalyst's CollapseProject +
partition pruning make the 7-way union shape unnecessary. Both forms
are provided; they are semantically identical and the single-projection
form is the one that scales (no 7× plan duplication, one scan).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cast_long(col: Column, lenient: bool) -> Column:
    # Snowflake `::int` is 38-digit NUMBER; LongType avoids int32
    # overflow on real view counts (SURVEY §7.4).
    return col.try_cast("long") if lenient else col.cast("long")


def cast_projection(df: DataFrame, *, lenient: bool = False) -> DataFrame:
    """The reference's 10-column typed cast list (YT_Facts_stg.sql:3-12).

    ``lenient=False`` matches Snowflake semantics under ANSI mode
    (bad cast → error); ``lenient=True`` uses ``try_cast`` (bad → NULL).
    Renames per reference: ``url``→``url_``, ``country``→``Country``,
    ``viewCount``→``view_count``, ``publishedAt``→``PublishedAt``.
    """
    ts = (lambda c: c.try_cast("timestamp")) if lenient else (lambda c: c.cast("timestamp"))
    return df.select(
        F.col("title").cast("string").alias("title"),
        F.col("customUrl").cast("string").alias("customUrl"),
        ts(F.col("publishedAt")).alias("PublishedAt"),
        F.col("url").cast("string").alias("url_"),
        F.col("country").cast("string").alias("Country"),
        _cast_long(F.col("viewCount"), lenient).alias("view_count"),
        _cast_long(F.col("subscriberCount"), lenient).alias("subscriberCount"),
        _cast_long(F.col("videoCount"), lenient).alias("videoCount"),
        F.col("madeForKids").cast("boolean").alias("madeForKids"),
        F.col("timestamp").cast("timestamp").alias("timestamp"),
    )


def union_all(dfs: list[DataFrame], *, by_name: bool = True) -> DataFrame:
    """7-way bag union (T11). Reference uses positional UNION ALL with
    identical column lists, so by-name == positional; ``unionByName``
    is the safer default and tolerates column-order drift upstream."""
    op = (lambda a, b: a.unionByName(b)) if by_name else DataFrame.unionAll
    return reduce(op, dfs)


def build_mart(bronze: DataFrame, *, lenient: bool = False) -> DataFrame:
    """Single-scan mart: cast projection over the whole partitioned
    bronze table. Logically identical to the reference's
    slice→cast→UNION ALL; physically one scan + one projection."""
    return cast_projection(bronze, lenient=lenient)


def build_mart_union(
    bronze: DataFrame, channel_keys: list[str], *, lenient: bool = False
) -> DataFrame:
    """Faithful 7-CTE shape: per-channel filter slices, cast each, union.

    Kept for parity demonstration; ``build_mart`` is the production
    path. With bronze partitioned by ``channel_key`` each slice is
    partition-pruned, so even this shape reads each partition once.
    """
    slices = [
        cast_projection(
            bronze.where(F.col("channel_key") == k), lenient=lenient
        )
        for k in channel_keys
    ]
    return union_all(slices)


# ---------------------------------------------------------------------------
# varchar(n) length enforcement (SURVEY §7.4)
# ---------------------------------------------------------------------------

# Reference column widths: YT_Facts_stg.sql:3-7 ("title"::varchar(50),
# "customUrl"::varchar(50), "url"::varchar(300), "country"::varchar(10)).
MART_VARCHAR_WIDTHS = {
    "title": 50,
    "customUrl": 50,
    "url_": 300,
    "Country": 10,
}

# Mart DDL with the reference's bounded string types. Snowflake
# enforces these on INSERT (over-length -> error); Spark's native
# CHAR/VARCHAR handling does the same when the table is created with
# this DDL (spark.sql.legacy.charVarcharAsString defaults to false).
MART_DDL = (
    "title varchar(50), customUrl varchar(50), PublishedAt timestamp, "
    "url_ varchar(300), Country varchar(10), view_count bigint, "
    "subscriberCount bigint, videoCount bigint, madeForKids boolean, "
    "`timestamp` timestamp"
)

# DDL column order, the positional contract for insertInto writes —
# four adjacent string columns (title, customUrl, url_, Country) mean
# a reordered caller frame would silently column-swap, so writers
# MUST re-select by name against this list first.
MART_COLUMN_ORDER = tuple(
    c.strip().split()[0].strip("`") for c in MART_DDL.split(",")
)


def enforce_varchar_lengths(df: DataFrame, *, mode: str = "error") -> DataFrame:
    """Apply the reference's varchar(n) bounds to a mart projection.

    ``mode='error'`` reproduces Snowflake INSERT semantics: any
    over-length value raises (engine-side ``raise_error``, so the check
    runs distributed where the data lives). ``mode='truncate'`` is the
    documented lenient alternative: values clip to the declared width.
    Columns outside ``MART_VARCHAR_WIDTHS`` pass through untouched.
    """
    if mode not in ("error", "truncate"):
        raise ValueError(f"mode must be 'error' or 'truncate', got {mode!r}")
    cols = []
    for field in df.columns:
        n = MART_VARCHAR_WIDTHS.get(field)
        if n is None:
            cols.append(F.col(field))
        elif mode == "truncate":
            cols.append(F.substring(F.col(field), 1, n).alias(field))
        else:
            cols.append(
                F.when(
                    F.length(F.col(field)) > n,
                    F.raise_error(
                        F.concat(
                            F.lit(
                                f"varchar({n}) overflow in column "
                                f"'{field}': "
                            ),
                            F.col(field),
                        )
                    ),
                )
                .otherwise(F.col(field))
                .alias(field)
            )
    return df.select(*cols)
