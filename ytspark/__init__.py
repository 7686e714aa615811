"""ytspark — a PySpark-native analytics engine with the query and
data-processing capabilities of ``azar01j/YoutubeAnalyticsProject``.

The reference is an Airflow + pandas + S3 + Snowflake + dbt ELT pipeline
(see SURVEY.md). This package re-expresses that capability surface as an
idiomatic Spark engine:

- ``schemas``    — explicit StructTypes for the YouTube API payload and
                   typed fact table (SURVEY §1.3/§1.4).
- ``flatten``    — schema-driven JSON flatten: leaf-rename + first-wins
                   dedup + list policy (SURVEY §2 T1–T4).
- ``ingest``     — source → flatten → drop → timestamp → channel key
                   (T5–T7).
- ``storage``    — bronze append / full-refresh parquet layout (T8, S3–S5).
- ``staging``    — per-channel staging views (T10).
- ``facts``      — typed cast projection + UNION ALL mart (T9, T11, T13).
- ``analytics``  — reporting layer over the mart (growth, rankings).
- ``queries``    — relational query library exercised against the driver
                   testdata (joins/aggregations/windows — SURVEY §2.10).
- ``operators``  — large-scale pipeline operators: dedup (exact, MinHash
                   LSH + clustering, SimHash, n-gram Jaccard,
                   embedding-cosine), similarity search (brute force,
                   hyperplane LSH, IVF), temporal joins (as-of, range),
                   text analysis, multimodal column plumbing.
- ``plans``      — scale patterns: bucketed co-located joins,
                   deterministic skew salting.
- ``sources``    — YouTube channel API: fixture payloads and the
                   PySpark 4 Python DataSource (format("youtube")).
- ``streaming``  — Structured Streaming micro-batch mode (O1–O3) and
                   streaming queries (windows, sessions, stateful ops).

Everything is DataFrame-first: logical plans are declared with the
DataFrame/SQL API and Catalyst/Tungsten pick the physical strategy.
"""

from ytspark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
