"""Scale patterns: shuffle-elimination and skew-mitigation utilities.

These are the plan-shaping tools the 100 TB deployment leans on; each
has a test asserting the PLAN property (no exchange / balanced keys),
not just the result.

- **Bucketing** pre-shuffles a table ONCE at write time: two tables
  bucketed by the same key into the same bucket count join with NO
  exchange on either side (Spark's bucketed scan exposes the hash
  distribution to the planner). For a fact table joined on the same key
  by every query — lineitem ⨝ orders on the order key here, or the
  per-channel snapshot fact on channel_key — this converts the
  per-query shuffle into a one-time write cost.
- **Salting** splits a skewed key across N sub-keys: the skewed side
  gets a deterministic salt derived from a high-cardinality column, the
  other side is replicated N ways. AQE's skew-join splitting
  (spark.sql.adaptive.skewJoin, on in ytspark.session) handles
  moderate skew automatically; explicit salting is for the pathological
  key that exceeds a single executor regardless of split factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 32,
    *,
    sort: bool = True,
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by ``key``.

    Joins/aggregations on ``key`` between tables written with the same
    bucket spec run shuffle-free (and sort-free when sorted).

    Replay-idempotent against orphaned locations: a managed-table
    directory can survive a dead writer (crash mid-write, or a
    pid-reused scratch name) while the fresh session's catalog has no
    such table — ``saveAsTable`` then fails with
    LOCATION_ALREADY_EXISTS instead of overwriting. If the name is
    absent from the catalog but its default warehouse location exists,
    drop the orphan first (Hadoop FS API, so any scheme works).
    """
    spark = df.sparkSession
    if not spark.catalog.tableExists(table):
        jvm = spark._jvm
        path = jvm.org.apache.hadoop.fs.Path(
            spark.conf.get("spark.sql.warehouse.dir"), table.lower()
        )
        fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(path):
            fs.delete(path, True)
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-spec bucketed tables on their bucket key — planner
    emits SortMergeJoin with no Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on=key, how=how)


def maybe_broadcast(df: DataFrame, max_bytes: int | None = None) -> DataFrame:
    """Size-gated broadcast hint.

    An explicit ``F.broadcast()`` hint is FORCED: neither
    ``autoBroadcastJoinThreshold`` nor AQE demotes it (verified on this
    Spark: with threshold=-1 the hinted join still plans
    BroadcastHashJoin). That is correct for catalog-known-small dims
    (region/nation) and catastrophic for a dim that outgrows executor
    memory at scale. This helper applies the hint only while the
    optimized plan's estimated size is under ``max_bytes`` (default:
    the session's autoBroadcastJoinThreshold); above it, the planner's
    own strategy (shuffle join, or AQE's runtime broadcast if the TRUE
    size turns out small) decides. Use for borderline dims — customer /
    part / supplier here — keeping the hint a physical choice, never a
    semantic dependency.
    """
    if max_bytes is None:
        thresh = df.sparkSession.conf.get(
            "spark.sql.autoBroadcastJoinThreshold", "10485760"
        )
        t = thresh[:-1] if thresh.endswith("b") else thresh
        try:
            max_bytes = int(t)
        except ValueError:  # e.g. "10m"/"64m" suffix forms
            unit = t[-1].lower()
            max_bytes = int(t[:-1]) * {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30}[unit]
    if max_bytes < 0:
        return df  # broadcasting disabled session-wide
    est = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    return F.broadcast(df) if est <= max_bytes else df


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    *,
    salt_col: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: ``left`` (the skewed side) is salted
    deterministically from ``salt_col``; ``right`` is replicated
    ``n_salts`` ways. Result is row-identical to the plain join.

    The salt must derive from a column (not rand()) so retries/AQE
    re-execution stay deterministic.
    """
    salted_l = left.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salts)).cast("int")
    )
    replicated_r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = salted_l.join(replicated_r, on=[key, "__salt"], how=how)
    return joined.drop("__salt")


def finish(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Materialize a BOUNDED query result and release its cached inputs.

    Query functions that ``persist()`` a multi-consumer intermediate
    (a signature table feeding both sides of a self-join, an edge list
    read by every unrolled iteration) would leak those cached blocks
    for the life of the session if they returned the lazy plan and
    never unpersisted — and unpersisting *before* the caller collects
    would silently recompute the intermediate once per consumer,
    defeating the persist. ``finish`` resolves the tension: an EAGER
    ``localCheckpoint`` computes ``result`` now (one materialization,
    caches hot), truncates its lineage so it no longer references the
    intermediates, then drops every cached input.

    Scale note: the checkpoint pins the RESULT partitions
    (MEMORY_AND_DISK, spillable), so this is for bounded query outputs
    — top-k lists, per-group aggregates, per-document labels — not for
    full-table transforms, which should stream to a sink instead.
    Harnesses call :func:`release_all_cached` between queries to drop
    the checkpoint blocks themselves once results are consumed.
    """
    out = result.localCheckpoint(eager=True)
    for df in cached:
        df.unpersist()
    return out


def concurrent_jobs(*thunks) -> list:
    """Run independent driver-blocking Spark actions concurrently
    (guide §2.6 "overlap independent jobs"): actions are only
    sequential because driver code calls them sequentially, so N
    mutually independent writes/counts submitted from a small thread
    pool let the scheduler back-fill executors freed by one job's tail
    with the next job's tasks. Results are returned in thunk order;
    the first exception (if any) propagates after all threads finish,
    so a failure cannot leave a concurrent write racing the caller's
    cleanup. Use ONLY for actions with no data dependency between
    them — e.g. the two store appends of an incremental-dedup tick,
    or a store bootstrap beside a stage write."""
    from concurrent.futures import ThreadPoolExecutor

    if len(thunks) == 1:
        return [thunks[0]()]
    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(t) for t in thunks]
        done = [f.exception() or f for f in futures]
    for d in done:
        if isinstance(d, BaseException):
            raise d
    return [f.result() for f in futures]


def release_all_cached(spark: SparkSession) -> int:
    """Drop every cached DataFrame and persistent RDD block in the
    session; return how many RDDs were released.

    The between-queries hygiene hook for long sessions (the bench
    harness runs 250 queries in one JVM): per-query ``persist()`` sites
    release their own blocks via ``finish``/``unpersist``, and this
    sweeps what remains — eager localCheckpoint blocks (whose lifetime
    is intentionally "until the caller is done") and any cache a future
    operator forgets. Safe between queries because every registered
    query re-derives its inputs from parquet, never from session state.
    """
    jsc = spark.sparkContext._jsc
    n = jsc.getPersistentRDDs().size()  # count BEFORE clearCache drops DF caches
    spark.catalog.clearCache()
    # py4j exposes the java map dict-like; sweep whatever clearCache
    # left behind (localCheckpoint blocks, raw RDD persists)
    for rdd in list(jsc.getPersistentRDDs().values()):
        rdd.unpersist(False)
    return n
