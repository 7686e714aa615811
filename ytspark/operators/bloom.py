"""Bloom-filter semi-join reduction — the runtime-filter pattern.

The single biggest shuffle saver for selective dim->fact joins at
100 TB: instead of shuffling the whole fact table into the join, build
an m-bit Bloom filter over the (filtered) dim keys, broadcast it, and
drop ineligible fact rows AT THE SCAN — only candidate rows (true
matches + a bounded false-positive fraction) reach the join's
exchange. Spark's own engine applies this idea implicitly (runtime
row-group filters / dynamic partition pruning); this operator makes it
an explicit, certifiable building block usable on any keyed pair.

Spark-first shape: the filter state is a FIXED-SIZE bitmap — M_BITS/64
longs packed as a word->mask map, independent of key count — built by
one aggregate over the dim side (explode k probe positions, bit_or per
word), broadcast via a one-row crossJoin, and probed map-side with
pure bit arithmetic (no Python, whole-stage codegen). The k probe
hashes are the engine's overflow-safe Knuth multiplicative hash with
distinct salts, so the DuckDB oracle replays the identical positions;
the oracle checks set-membership semantically (IN over the set-bit
table) — same semantics, different representation, which is exactly
what the certification proves.

False-positive accounting: with n keys, m bits, k hashes the expected
fp rate is (1 - e^{-kn/m})^k; the query reports the realized counts
(pass-bloom vs true matches) per order priority so the bound is
auditable. A Bloom pass can never drop a true match — asserted by
construction (every dim key's probe bits are set) and re-proven per
run by the n_match <= n_pass_bloom accounting the oracle hash-checks.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ytspark.queries import register
from ytspark.session import load_tables
from ytspark.operators.text import (
    knuth_hash_col,
    knuth_hash_spark_sql,
    knuth_hash_sql,
)

M_BITS = 4096  # filter width (64 packed longs)
N_HASHES = 3  # probes per key
BLOOM_SALT = 999_983  # prime stride separating the k hash functions


def _probe_cols(key: F.Column) -> list[F.Column]:
    """The k probe positions of ``key`` — Knuth hash under k salts."""
    return [
        F.pmod(
            knuth_hash_col(key + F.lit(i * BLOOM_SALT)), F.lit(M_BITS)
        ).alias(f"h{i}")
        for i in range(N_HASHES)
    ]


def bloom_build(dim_keys: DataFrame, key: str) -> DataFrame:
    """One-row DataFrame holding the packed bitmap (word -> mask map).

    The aggregate is two shuffles over AT MOST k*|keys| tiny rows
    (positions, then <= M_BITS/64 words) regardless of dim width —
    the state a 1000-executor broadcast can always afford.
    """
    pos = (
        dim_keys.select(
            F.explode(F.array(*_probe_cols(F.col(key)))).alias("pos")
        )
        .distinct()
    )
    words = pos.select(
        F.expr("CAST(pos DIV 64 AS BIGINT)").alias("w"),
        F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("m"),
    )
    packed = words.groupBy("w").agg(F.expr("bit_or(m)").alias("mask"))
    return packed.agg(
        F.map_from_entries(
            F.collect_list(F.struct("w", "mask"))
        ).alias("bloom")
    )


def bloom_might_contain(key_sql: str) -> F.Column:
    """Probe predicate over a ``bloom`` map column already in scope.

    Pure bit arithmetic (div/mod/shift/AND) — stays inside
    whole-stage codegen; an absent word means bit unset (coalesce 0).
    """
    checks = []
    for i in range(N_HASHES):
        khash = knuth_hash_spark_sql(f"({key_sql}) + {i * BLOOM_SALT}")
        h = f"pmod({khash}, {M_BITS})"
        checks.append(
            f"(coalesce(element_at(bloom, CAST(({h}) DIV 64 AS BIGINT)), 0L)"
            f" & shiftleft(1L, CAST(({h}) % 64 AS INT))) <> 0"
        )
    return F.expr(" AND ".join(checks))


def bloom_filter_fact(
    fact: DataFrame, bloom: DataFrame, key_sql: str
) -> DataFrame:
    """Reduce ``fact`` to rows whose key might be in the filter."""
    return fact.crossJoin(F.broadcast(bloom)).where(
        bloom_might_contain(key_sql)
    )


def _hash_sql(i: int, key: str) -> str:
    # plain % suffices in the oracle: the Knuth hash is nonnegative
    return f"(({knuth_hash_sql(f'({key}) + {i * BLOOM_SALT}')}) % {M_BITS})"


_BLOOM_ORACLE = f"""
WITH dim AS (
  SELECT DISTINCT c_custkey AS key FROM customer WHERE c_acctbal < 0
),
bits AS (
  {" UNION ".join(f"SELECT DISTINCT {_hash_sql(i, 'key')} AS pos FROM dim" for i in range(N_HASHES))}
),
flags AS (
  SELECT o_orderpriority,
         ({" AND ".join(f"{_hash_sql(i, 'o_custkey')} IN (SELECT pos FROM bits)" for i in range(N_HASHES))}
         ) AS pass_bloom,
         o_custkey IN (SELECT key FROM dim) AS matched
  FROM orders
)
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CASE WHEN pass_bloom THEN 1 ELSE 0 END) AS BIGINT)
         AS n_pass_bloom,
       CAST(SUM(CASE WHEN matched THEN 1 ELSE 0 END) AS BIGINT)
         AS n_match,
       CAST(SUM(CASE WHEN pass_bloom AND NOT matched THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_pos
FROM flags
GROUP BY o_orderpriority
"""


@register(
    "bloom_semijoin_reduction",
    oracle=_BLOOM_ORACLE,
    doc="Bloom-filter semi-join reduction — the explicit runtime-"
        "filter pattern that makes selective dim->fact joins scale: "
        "an m=4096-bit filter over negative-balance customer keys is "
        "built as ONE aggregate (k=3 Knuth-salted probe positions -> "
        "bit_or-packed 64-bit words -> a word->mask map), broadcast, "
        "and probed at the orders scan with pure bit arithmetic "
        "inside whole-stage codegen — ineligible fact rows die "
        "map-side and never reach a join exchange. At 100 TB the "
        "filter state is CONSTANT-SIZE (m/64 longs) no matter how "
        "many keys, the property that distinguishes a Bloom filter "
        "from a broadcast hash set. The query reports per-priority "
        "pass/match/false-positive accounting (a Bloom filter never "
        "drops a true match; expected fp rate (1-e^(-kn/m))^k); the "
        "DuckDB oracle replays the identical salted positions but "
        "checks membership via IN over the set-bit table — same "
        "semantics through a different representation, which is what "
        "the hash match certifies.",
    tags=("bloom", "join", "scale", "aggregate", "filter"),
)
def bloom_semijoin_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders")
    dim = (
        t["customer"]
        .where(F.col("c_acctbal") < 0)
        .select(F.col("c_custkey").alias("key"))
        .distinct()
    )
    bloom = bloom_build(dim, "key")
    flagged = (
        t["orders"]
        .crossJoin(F.broadcast(bloom))
        .withColumn("pass_bloom", bloom_might_contain("o_custkey"))
        .join(
            F.broadcast(dim.withColumn("hit", F.lit(1))),
            F.col("o_custkey") == F.col("key"),
            "left",
        )
    )
    return flagged.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("pass_bloom").cast("long")).alias("n_pass_bloom"),
        F.sum(F.col("hit").isNotNull().cast("long")).alias("n_match"),
        F.sum(
            (F.col("pass_bloom") & F.col("hit").isNull()).cast("long")
        ).alias("n_false_pos"),
    )


# ---------------------------------------------------------------------------
# Bloom false-positive-rate calibration against the analytic bound
# ---------------------------------------------------------------------------


@register(
    "bloom_fpr_calibration",
    oracle=f"""
WITH dim AS (
  SELECT DISTINCT c_custkey AS key FROM customer WHERE c_acctbal < 0
),
bits AS (
  {" UNION ".join(f"SELECT DISTINCT {_hash_sql(i, 'key')} AS pos FROM dim" for i in range(N_HASHES))}
),
probes AS (
  SELECT DISTINCT c_custkey AS key FROM customer WHERE c_acctbal >= 0
),
hits AS (
  SELECT p.key
  FROM probes p
  WHERE {" AND ".join(f"{_hash_sql(i, 'p.key')} IN (SELECT pos FROM bits)" for i in range(N_HASHES))}
),
stats AS (
  SELECT (SELECT COUNT(*) FROM dim) AS n_keys,
         (SELECT COUNT(*) FROM probes) AS n_probes,
         (SELECT COUNT(*) FROM hits) AS n_false_pos,
         (SELECT COUNT(*) FROM bits) AS n_set_bits
)
SELECT CAST(n_keys AS BIGINT) AS n_keys,
       CAST(n_set_bits AS BIGINT) AS n_set_bits,
       CAST(n_probes AS BIGINT) AS n_probes,
       CAST(n_false_pos AS BIGINT) AS n_false_pos,
       CAST(n_false_pos * 1000000 // n_probes AS BIGINT)
         AS realized_fpr_ppm,
       CAST(ROUND(POW(CAST(n_set_bits AS DOUBLE) / {M_BITS},
                      {N_HASHES}) * 1000000) AS BIGINT)
         AS expected_fpr_ppm,
       n_false_pos * 1000000 // n_probes
         <= 4 * ROUND(POW(CAST(n_set_bits AS DOUBLE) / {M_BITS},
                          {N_HASHES}) * 1000000) + 1000
         AS within_bound
FROM stats
""",
    doc=f"BLOOM FALSE-POSITIVE CALIBRATION — the measurement that "
        f"decides whether a runtime filter is worth its broadcast: "
        f"the {M_BITS}-bit/{N_HASHES}-hash filter is built over the "
        f"delinquent-customer keys (the bloom_semijoin_reduction "
        f"filter), probed with every key KNOWN to be outside the set, "
        f"and the realized false-positive rate (exact integer ppm) "
        f"is certified against the occupancy-based analytic "
        f"expectation (set-bit fraction ^ k — computed from the "
        f"MEASURED n_set_bits, so the bound is exact, not the e^-kn/m "
        f"approximation). A realized rate far above the bound means "
        f"correlated hash positions — the failure mode that silently "
        f"turns a semi-join reducer into a no-op. All counts exact; "
        f"the expectation is a deterministic scalar tree over "
        f"integers. Scale: the filter build is O(k x keys) tiny "
        f"rows; the probe side is one map-side predicate.",
    tags=("bloom", "sketch", "evaluation", "aggregate"),
)
def bloom_fpr_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_tables(spark, sf_dir, "customer")["customer"]
    dim = cust.where(F.col("c_acctbal") < 0).select(
        F.col("c_custkey").alias("key")
    ).distinct()
    bloom = bloom_build(dim, "key").persist()
    probes = cust.where(F.col("c_acctbal") >= 0).select(
        F.col("c_custkey").alias("key")
    ).distinct()
    n_keys = dim.count()
    n_probes = probes.count()
    n_false = bloom_filter_fact(probes, bloom, "key").count()
    n_set_bits = bloom.select(
        F.aggregate(
            F.map_values(F.col("bloom")),
            F.lit(0),
            lambda acc, w: acc + F.bit_count(w),
        ).alias("b")
    ).collect()[0]["b"]
    bloom.unpersist()
    # half-UP rounding (math.floor(x + 0.5), value always positive) to
    # match DuckDB's half-away-from-zero ROUND — Python round() is
    # banker's and would flip the cross-engine hash on an exact .5
    expected_ppm = math.floor(
        (n_set_bits / M_BITS) ** N_HASHES * 1_000_000 + 0.5
    )
    realized_ppm = n_false * 1_000_000 // n_probes
    return spark.createDataFrame(
        [
            (
                n_keys,
                n_set_bits,
                n_probes,
                n_false,
                realized_ppm,
                expected_ppm,
                realized_ppm <= 4 * expected_ppm + 1000,
            )
        ],
        "n_keys long, n_set_bits long, n_probes long, n_false_pos long, "
        "realized_fpr_ppm long, expected_fpr_ppm long, "
        "within_bound boolean",
    )
