"""Iterative graph operators expressed as DataFrame joins.

The engine already ships one iterative graph algorithm — min-label
connected components for dedup clustering (``dedup.py``); this module
adds weighted PageRank as a general operator plus a registered query
over the event-transition graph.

Spark-first shape: one PageRank iteration is exactly (join ranks to
edges on src) → (groupBy dst, sum) → (left join back to the node list)
— three relational ops whose physical plan Catalyst/AQE picks per
scale. At 100 TB the edge table and rank vector co-partition on the
join key, so every iteration reuses one hash partitioning; iterations
are unrolled into a single lineage with the edge table cached. Fixed
iteration counts (not convergence tests) keep the computation
deterministic and cross-engine checkable — the DuckDB oracle replays
the same unrolled iterations as chained CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ytspark.queries import register
from ytspark.session import load_tables

PR_DAMPING = 0.85
PR_ITERS = 3
PR_ROUND = 8  # decimal places in reported scores (see pagerank())


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iters: int = PR_ITERS,
    damping: float = PR_DAMPING,
) -> DataFrame:
    """Weighted PageRank over an edge DataFrame → (node, pr).

    PR_{t+1}(v) = (1-d)/N + d · Σ_{u→v} PR_t(u) · w(u,v)/outw(u),
    started from the uniform vector 1/N. Dangling nodes (no out-edges)
    leak their mass — the standard simplification; both the Spark and
    oracle sides compute it identically. Scores are rounded to
    ``PR_ROUND`` decimals so cross-engine float-summation order cannot
    flip the last bit of a reported value.
    """
    w = F.col(weight) if weight else F.lit(1.0)
    # transition probability per edge: weight / total outgoing weight
    out_w = Window.partitionBy(src)
    p = edges.select(
        F.col(src).alias("src"),
        F.col(dst).alias("dst"),
        (w * 1.0 / F.sum(w).over(out_w)).alias("p"),
    )
    # edge probabilities and the node list feed every unrolled
    # iteration — persist both so N iterations read one materialization
    # instead of re-running the upstream scan/shuffle N times
    p = p.persist()
    nodes = (
        p.select(F.col("src").alias("node"))
        .union(p.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    # scalar N via a broadcast one-row aggregate (no driver collect)
    n_df = nodes.agg(F.count(F.lit(1)).alias("n"))
    ranks = nodes.crossJoin(F.broadcast(n_df)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("pr")
    )
    for _ in range(iters):
        contrib = (
            p.join(ranks, p["src"] == ranks["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("pr") * F.col("p")).alias("c"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(n_df))
            .join(contrib, F.col("node") == contrib["dst"], "left")
            .select(
                "node",
                (
                    (1.0 - damping) / F.col("n")
                    + damping * F.coalesce(F.col("c"), F.lit(0.0))
                ).alias("pr"),
            )
        )
    return ranks.select("node", F.round("pr", PR_ROUND).alias("pr"))


def _pr_iter_sql(prev: str, out: str, damping: float) -> str:
    """One unrolled PageRank iteration as a CTE definition body."""
    return f"""{out} AS (
  SELECT n.node,
         (1 - {damping}) / nn.n
           + {damping} * COALESCE(t.c, 0) AS pr
  FROM nodes n CROSS JOIN nn
  LEFT JOIN (
    SELECT p.dst, SUM({prev}.pr * p.p) AS c
    FROM p JOIN {prev} ON {prev}.node = p.src
    GROUP BY p.dst
  ) t ON t.dst = n.node
)"""


_PAGERANK_ORACLE = f"""
WITH seq AS (
  SELECT event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
),
edges AS (
  SELECT prev_type AS src, event_type AS dst, COUNT(*) AS w
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
),
p AS (
  SELECT src, dst, w * 1.0 / SUM(w) OVER (PARTITION BY src) AS p
  FROM edges
),
nodes AS (
  SELECT src AS node FROM p UNION SELECT dst FROM p
),
nn AS (SELECT COUNT(*) AS n FROM nodes),
r0 AS (SELECT node, 1.0 / nn.n AS pr FROM nodes CROSS JOIN nn),
{_pr_iter_sql('r0', 'r1', PR_DAMPING)},
{_pr_iter_sql('r1', 'r2', PR_DAMPING)},
{_pr_iter_sql('r2', 'r3', PR_DAMPING)}
SELECT node, ROUND(pr, {PR_ROUND}) AS pr FROM r3
"""


@register(
    "events_pagerank",
    oracle=_PAGERANK_ORACLE,
    doc="PageRank over the first-order event-transition graph "
        "(edges = consecutive event-type pairs per user, weighted by "
        f"transition count), {PR_ITERS} unrolled iterations at damping "
        f"{PR_DAMPING}. The iterative update is pure join+aggregate — "
        "the same lineage shape at 5 nodes or 5 billion — and the "
        "fixed-iteration, hash-free formulation lets a DuckDB "
        "recursive-free chained-CTE oracle verify the exact scores, "
        "which convergence-tested or sampled implementations cannot "
        "offer.",
    tags=("graph", "pagerank", "iterative", "pipeline"),
)
def events_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("next_type"),
        F.lag("event_type").over(w).alias("prev_type"),
    )
    edges = (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("src"), F.col("next_type").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    return pagerank(edges, weight="w")


HIER_ROOT_LIMIT = 8  # custkeys below this are forest roots
PD_ROUNDS = 5  # pointer-doubling rounds: resolves depth <= 2^5 = 32
# (depth of node k is ~log2(k) - 2, so 5 rounds cover custkeys < 2^37
#  — raise by ONE round per doubling of log-scale, not per data size)


@register(
    "hierarchy_pointer_doubling",
    oracle=f"""
WITH RECURSIVE up AS (
  SELECT c_custkey AS node, c_custkey AS cur, 0 AS d FROM customer
  UNION ALL
  SELECT node, cur // 2, d + 1 FROM up WHERE cur >= {HIER_ROOT_LIMIT}
)
SELECT cur AS root, d AS depth, COUNT(*) AS n_nodes,
       MIN(node) AS min_node, MAX(node) AS max_node
FROM up WHERE cur < {HIER_ROOT_LIMIT}
GROUP BY 1, 2
""",
    doc="Hierarchy resolution by POINTER DOUBLING: a synthetic forest "
        "over customers (parent(k) = k div 2, roots below "
        f"{HIER_ROOT_LIMIT}) is resolved to (root, depth) per node in "
        f"O(log depth) self-joins — {PD_ROUNDS} rounds cover depth "
        "2^5 — instead of one join per level. Each round joins the "
        "state to itself (my ancestor's ancestor becomes mine, "
        "distances add; resolved nodes hold a self-pointer fixpoint) "
        "and is eagerly localCheckpoint'ed so the plan stays linear "
        "in rounds rather than exponential. This is how org charts / "
        "BOM explosions / thread ancestry resolve at 100 TB: a "
        "1000-level chain costs 10 co-partitioned joins. The oracle "
        "is the sequential WITH RECURSIVE walk, certifying the "
        "log-round shortcut against the step-by-step semantics.",
    tags=("graph", "hierarchy", "iterative", "join"),
)
def hierarchy_pointer_doubling(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_tables(spark, sf_dir, "customer")["customer"]
    node = F.col("node")
    state = cust.select(F.col("c_custkey").alias("node")).select(
        "node",
        F.when(node < HIER_ROOT_LIMIT, node)
        .otherwise(F.floor(node / 2).cast("long"))
        .alias("anc"),
        F.when(node < HIER_ROOT_LIMIT, F.lit(0)).otherwise(F.lit(1)).alias("d"),
    )
    for _ in range(PD_ROUNDS):
        hop = state.select(
            F.col("node").alias("j_node"),
            F.col("anc").alias("j_anc"),
            F.col("d").alias("j_d"),
        )
        state = (
            state.join(hop, state["anc"] == hop["j_node"])
            .select(
                "node",
                F.col("j_anc").alias("anc"),
                (F.col("d") + F.col("j_d")).alias("d"),
            )
            .localCheckpoint(eager=True)
        )
    return state.groupBy(
        F.col("anc").alias("root"), F.col("d").alias("depth")
    ).agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.min("node").alias("min_node"),
        F.max("node").alias("max_node"),
    )
