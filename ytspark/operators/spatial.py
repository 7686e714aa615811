"""Spatial distance join via grid-cell blocking: all point pairs
within a radius, certified against a brute-force haversine oracle.

The spatial twin of the fuzzy ER join (``operators/fuzzy.py``): a
pairwise distance scan is O(n²) — blocking must generate a complete
candidate set cheaply, then exact verification prunes it. Points are
bucketed into 1°x1° grid cells; a candidate pair is any two points
whose cells are within the 3x3 neighborhood, with the longitude
neighbor WRAPPED modulo 360 so pairs straddling the ±180° antimeridian
are still candidates (haversine itself is periodic in Δlon — the
half-angle sine makes sin²(Δλ/2) identical for Δλ and 360−Δλ — so
only the blocking needed the wrap; latitude needs none since
|lat| <= 60). With |lat| <= 60° (a longitude degree is >= 55.6 km)
and radius 50 km, any qualifying pair differs by < 0.46° latitude and
< 0.91° wrapped longitude — strictly inside one cell step — so
neighborhood blocking has recall 1.0 BY CONSTRUCTION, and the DuckDB
oracle (the brute-force quadratic haversine join) re-proves it on
every gate run.

Scale shape: each point emits 9 probe cells on ONE side of the join
(the other side keeps its home cell), so candidates are an equi-join
on cell id — shuffle volume follows cell occupancy, never n². At
100 TB the points table persists partitioned by cell and a radius
query prunes to the probe cells, the same bucket-once/prune-forever
shape as the LSH index.

Coordinates are synthesized deterministically from the overflow-safe
cross-engine Knuth hash (the container has no real geo data), so both
engines derive identical points; haversine is evaluated with the same
operation order and rounded to 6 dp before the threshold compare.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ytspark.operators.text import SPLIT_MOD, knuth_hash_col, knuth_hash_sql
from ytspark.plans.scale import finish
from ytspark.queries import register
from ytspark.session import load_tables

RADIUS_KM = 50.0
EARTH_R_KM = 6371.0


def synth_points(cust: DataFrame) -> DataFrame:
    """Deterministic (point_id, lat, lon): lat in [-60, 60), lon in
    [-180, 180), both pure functions of c_custkey."""
    lat = (
        F.pmod(knuth_hash_col(F.col("c_custkey")), F.lit(120000)) / 1000.0
        - 60.0
    )
    lon = (
        F.pmod(knuth_hash_col(F.col("c_custkey") * 3 + 1), F.lit(360000))
        / 1000.0
        - 180.0
    )
    return cust.select(
        F.col("c_custkey").alias("point_id"),
        lat.alias("lat"),
        lon.alias("lon"),
    )


def _haversine(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km, same operation order as the SQL
    twin (radians -> half-angle sines -> asin)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon) * F.sin(dlon)
    )
    return F.lit(2.0 * EARTH_R_KM) * F.asin(F.sqrt(a))


_HAVERSINE_SQL = (
    f"2.0 * {EARTH_R_KM} * ASIN(SQRT("
    " SIN(RADIANS(b.lat - a.lat) / 2) * SIN(RADIANS(b.lat - a.lat) / 2)"
    " + COS(RADIANS(a.lat)) * COS(RADIANS(b.lat))"
    "   * SIN(RADIANS(b.lon - a.lon) / 2) * SIN(RADIANS(b.lon - a.lon) / 2)))"
)

_SPATIAL_ORACLE = f"""
WITH pts AS (
  SELECT c_custkey AS point_id,
         ({knuth_hash_sql("c_custkey")} % 120000) / 1000.0 - 60.0 AS lat,
         ({knuth_hash_sql("c_custkey * 3 + 1")} % 360000) / 1000.0 - 180.0
           AS lon
  FROM customer
)
SELECT * FROM (
  SELECT a.point_id AS point_a, b.point_id AS point_b,
         ROUND({_HAVERSINE_SQL}, 6) AS dist_km
  FROM pts a JOIN pts b ON a.point_id < b.point_id
) WHERE dist_km <= {RADIUS_KM}
"""


@register(
    "spatial_radius_join",
    oracle=_SPATIAL_ORACLE,
    doc=f"All point pairs within {RADIUS_KM:.0f} km via 1-degree grid-"
        "cell blocking: one side explodes to its 3x3 cell "
        "neighborhood (lon neighbors wrapped modulo 360 so "
        "antimeridian-straddling pairs stay candidates), the other "
        "keeps its home cell, candidates equi-join on cell id and "
        "verify with one haversine — recall 1.0 by construction for "
        "|lat| <= 60 (a qualifying pair can never span more than one "
        "wrapped cell step). The oracle IS "
        "the brute-force quadratic haversine join, so the driver "
        "hash-compare re-proves the blocking's completeness on every "
        "run — the spatial twin of the SymSpell fuzzy join.",
    tags=("join", "spatial", "blocking", "scale"),
)
def spatial_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_tables(spark, sf_dir, "customer")["customer"]
    return radius_join(synth_points(cust), RADIUS_KM)


def radius_join(points: DataFrame, radius_km: float) -> DataFrame:
    """All (point_a, point_b, dist_km) pairs within ``radius_km`` from a
    (point_id, lat, lon) frame; grid-cell blocked, antimeridian-safe."""
    pts = points.select(
        "point_id",
        "lat",
        "lon",
        F.floor("lat").cast("long").alias("cy"),
        F.floor("lon").cast("long").alias("cx"),
    )
    probes = pts.select(
        F.col("point_id").alias("point_a"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("cy") + dy).alias("py"),
                        # Wrap the lon neighbor across the antimeridian:
                        # floor(lon) is in [-180, 179], so cx+dx spans
                        # [-181, 180] and pmod(.+180, 360)-180 folds both
                        # overflow cells onto their wrapped twins while
                        # leaving every in-range cell unchanged.
                        (
                            F.pmod(F.col("cx") + dx + 180, F.lit(360)) - 180
                        ).alias("px"),
                    )
                    for dy in (-1, 0, 1)
                    for dx in (-1, 0, 1)
                ]
            )
        ).alias("p"),
    ).select("point_a", "lat_a", "lon_a", "p.py", "p.px")
    cand = probes.join(
        pts.select(
            F.col("point_id").alias("point_b"),
            F.col("lat").alias("lat_b"),
            F.col("lon").alias("lon_b"),
            F.col("cy").alias("py"),
            F.col("cx").alias("px"),
        ),
        ["py", "px"],
    ).where(F.col("point_a") < F.col("point_b"))
    return (
        cand.select(
            "point_a",
            "point_b",
            F.round(
                _haversine(
                    F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b")
                ),
                6,
            ).alias("dist_km"),
        )
        .where(F.col("dist_km") <= radius_km)
        .distinct()
    )


# ---------------------------------------------------------------------------
# DBSCAN core/border/noise census over the radius-join neighborhood
# ---------------------------------------------------------------------------

DBSCAN_MINPTS = 3  # core = at least this many neighbors within RADIUS_KM


@register(
    "dbscan_core_census",
    oracle=f"""
WITH pairs AS ({_SPATIAL_ORACLE}),
sym AS (
  SELECT point_a AS p, point_b AS q FROM pairs
  UNION ALL SELECT point_b, point_a FROM pairs
),
deg AS (SELECT p, COUNT(*) AS k FROM sym GROUP BY p),
pts AS (SELECT c_custkey AS p FROM customer),
labeled AS (
  SELECT pts.p,
         COALESCE(deg.k, 0) AS k,
         CASE WHEN COALESCE(deg.k, 0) >= {DBSCAN_MINPTS} THEN 'core'
              WHEN EXISTS (
                SELECT 1 FROM sym
                JOIN deg d2 ON d2.p = sym.q
                WHERE sym.p = pts.p AND d2.k >= {DBSCAN_MINPTS})
                THEN 'border'
              ELSE 'noise' END AS label
  FROM pts LEFT JOIN deg ON deg.p = pts.p
)
SELECT label,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(SUM(k) AS BIGINT) AS degree_sum,
       CAST(MIN(p) AS BIGINT) AS min_point,
       CAST(MAX(p) AS BIGINT) AS max_point
FROM labeled GROUP BY label
""",
    doc=f"DBSCAN POINT CLASSIFICATION (eps = {RADIUS_KM:.0f} km, "
        f"minPts = {DBSCAN_MINPTS}) over the certified radius-join "
        f"neighborhood: CORE points have >= minPts neighbors within "
        f"eps, BORDER points are non-core within eps of a core, the "
        f"rest is NOISE — the density-based clustering primitive "
        f"whose cluster expansion is a connected-components pass over "
        f"core-core edges (the MinHash-CC operator, reusable as-is); "
        f"this query certifies the classification layer with exact "
        f"integer degree sums and per-label key-range fingerprints. "
        f"Scale: neighbor degrees come from the grid-blocked radius "
        f"join (never all-pairs in the engine plan); the census is "
        f"one aggregate.",
    # clustering-first: the window gate keys families off the FIRST
    # tag, and the spatial tag keeps riding on spatial_radius_join
    tags=("clustering", "spatial", "join", "aggregate"),
)
def dbscan_core_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_tables(spark, sf_dir, "customer")["customer"]
    pts = synth_points(cust)
    pairs = radius_join(pts, RADIUS_KM).select("point_a", "point_b")
    sym = pairs.select(
        F.col("point_a").alias("p"), F.col("point_b").alias("q")
    ).unionAll(
        pairs.select(F.col("point_b").alias("p"), F.col("point_a").alias("q"))
    ).persist()
    deg = sym.groupBy("p").agg(F.count(F.lit(1)).alias("k"))
    core = deg.where(F.col("k") >= DBSCAN_MINPTS).select(
        F.col("p").alias("core_p")
    )
    near_core = (
        sym.join(core, F.col("q") == F.col("core_p"))
        .select("p")
        .distinct()
        .withColumn("nc", F.lit(1))
    )
    labeled = (
        pts.select(F.col("point_id").alias("p"))
        .join(deg, "p", "left")
        .join(near_core, "p", "left")
        .select(
            "p",
            F.coalesce(F.col("k"), F.lit(0)).alias("k"),
            F.when(
                F.coalesce(F.col("k"), F.lit(0)) >= DBSCAN_MINPTS, "core"
            )
            .when(F.col("nc") == 1, "border")
            .otherwise("noise")
            .alias("label"),
        )
    )
    out = labeled.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.sum("k").cast("long").alias("degree_sum"),
        F.min("p").cast("long").alias("min_point"),
        F.max("p").cast("long").alias("max_point"),
    )
    return finish(out, sym)
