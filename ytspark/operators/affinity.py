"""Market-basket affinity: association rules with support/confidence/
lift — the co-occurrence analytics behind recommenders and placement.

A rule i -> j says "baskets containing part i also contain part j";
its strength is measured by support (P(i,j)), confidence (P(j|i)) and
lift (P(i,j)/(P(i)P(j))). The computation is the canonical two-level
aggregate: item frequencies (one groupBy), pair frequencies (the
per-basket self-join, bounded by basket size — never an all-pairs
across baskets), then pure ratio arithmetic. Every count is an exact
integer, every ratio an exactly-rounded IEEE division of those
integers, so the top-k ranking (over 6 dp-rounded lift with full
tiebreaks) is deterministic cross-engine.

At 100 TB: the pair join is per-basket (O(sum of basket^2), the same
shape the co-purchase triangle query bounds), item/pair tables shuffle
on their keys, and the min-support filter prunes the pair table before
the rule expansion; the final top-k is a partial TakeOrdered, not a
global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ytspark.plans.scale import finish
from ytspark.queries import register
from ytspark.session import load_tables

MIN_PAIR_SUPPORT = 2  # baskets; prunes the pair table before rules
RULES_TOP_K = 25


_RULES_ORACLE = f"""
WITH op AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
),
n AS (SELECT COUNT(DISTINCT o) AS n_baskets FROM op),
item AS (SELECT p, COUNT(*) AS ni FROM op GROUP BY p),
pair AS (
  SELECT a.p AS pi, b.p AS pj, COUNT(*) AS nij
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2 HAVING COUNT(*) >= {MIN_PAIR_SUPPORT}
),
rules AS (
  SELECT pi AS antecedent, pj AS consequent, nij FROM pair
  UNION ALL
  SELECT pj, pi, nij FROM pair
),
scored AS (
  SELECT r.antecedent, r.consequent, r.nij,
         ia.ni AS n_ante,
         ROUND(CAST(r.nij AS DOUBLE) / n.n_baskets, 6) AS support,
         ROUND(CAST(r.nij AS DOUBLE) / ia.ni, 6) AS confidence,
         ROUND(CAST(r.nij AS DOUBLE) * n.n_baskets / (ia.ni * ic.ni), 6)
           AS lift
  FROM rules r
  JOIN item ia ON r.antecedent = ia.p
  JOIN item ic ON r.consequent = ic.p
  CROSS JOIN n
)
SELECT antecedent, consequent,
       CAST(nij AS BIGINT) AS n_pair,
       CAST(n_ante AS BIGINT) AS n_ante,
       support, confidence, lift
FROM scored
ORDER BY lift DESC, support DESC, antecedent, consequent
LIMIT {RULES_TOP_K}
"""


@register(
    "market_basket_rules",
    oracle=_RULES_ORACLE,
    doc=f"Association rules over order baskets: pair frequencies from "
        "the per-basket self-join (bounded by basket size, never an "
        f"all-pairs across baskets), min-support {MIN_PAIR_SUPPORT} "
        "pruning BEFORE rule expansion, then support/confidence/lift "
        f"as exact-integer ratios; the top-{RULES_TOP_K} rules rank "
        "by 6 dp-rounded lift with (support, antecedent, consequent) "
        "tiebreaks so selection is total and cross-engine "
        "deterministic. Each undirected pair expands to both directed "
        "rules (confidence is asymmetric). The oracle replays the "
        "identical pipeline; counts are exact, ratios exactly-rounded "
        "IEEE divisions.",
    tags=("affinity", "rules", "join", "aggregate", "topk"),
)
def market_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    op = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct().persist()
    n = op.agg(F.count_distinct("o").alias("n_baskets"))
    item = op.groupBy("p").agg(F.count(F.lit(1)).alias("ni"))
    a, b = op.alias("a"), op.alias("b")
    pair = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("pi"), F.col("b.p").alias("pj"))
        .agg(F.count(F.lit(1)).alias("nij"))
        .where(F.col("nij") >= MIN_PAIR_SUPPORT)
        # both rule directions union this aggregate — persist, or the
        # basket self-join runs twice (r12, guide §1.2)
        .persist()
    )
    rules = pair.select(
        F.col("pi").alias("antecedent"),
        F.col("pj").alias("consequent"),
        "nij",
    ).unionByName(
        pair.select(
            F.col("pj").alias("antecedent"),
            F.col("pi").alias("consequent"),
            "nij",
        )
    )
    ia = item.select(F.col("p").alias("antecedent"), F.col("ni").alias("n_ante"))
    ic = item.select(F.col("p").alias("consequent"), F.col("ni").alias("n_cons"))
    scored = (
        rules.join(ia, "antecedent")
        .join(ic, "consequent")
        .crossJoin(F.broadcast(n))
        .select(
            "antecedent",
            "consequent",
            F.col("nij").cast("long").alias("n_pair"),
            F.col("n_ante").cast("long").alias("n_ante"),
            F.round(
                F.col("nij").cast("double") / F.col("n_baskets"), 6
            ).alias("support"),
            F.round(F.col("nij").cast("double") / F.col("n_ante"), 6).alias(
                "confidence"
            ),
            F.round(
                F.col("nij").cast("double")
                * F.col("n_baskets")
                / (F.col("n_ante") * F.col("n_cons")),
                6,
            ).alias("lift"),
        )
    )
    # top-k rules; release the basket-item cache (3 consumers) and the
    # two-direction pair cache
    return finish(
        scored.orderBy(
            F.col("lift").desc(),
            F.col("support").desc(),
            "antecedent",
            "consequent",
        ).limit(RULES_TOP_K),
        op,
        pair,
    )


# ---------------------------------------------------------------------------
# Item-item cosine neighbors: normalized co-occurrence recommendations
# ---------------------------------------------------------------------------

COSINE_MIN_COMMON = 2  # shared-basket support pruning the pair table
COSINE_TOP_K = 3  # neighbors kept per item

_ITEM_COSINE_ORACLE = f"""
WITH op AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
),
item AS (SELECT p, COUNT(*) AS ni FROM op GROUP BY p),
pair AS (
  SELECT a.p AS i, b.p AS j, COUNT(*) AS c
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  GROUP BY a.p, b.p
  HAVING COUNT(*) >= {COSINE_MIN_COMMON}
),
sym AS (
  SELECT i, j, c FROM pair
  UNION ALL
  SELECT j AS i, i AS j, c FROM pair
),
scored AS (
  SELECT sym.i, sym.j, sym.c,
         CAST(sym.c AS DOUBLE) / SQRT(CAST(ia.ni AS DOUBLE)
                                      * CAST(ja.ni AS DOUBLE)) AS cosine
  FROM sym
  JOIN item ia ON ia.p = sym.i
  JOIN item ja ON ja.p = sym.j
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY i
                               ORDER BY cosine DESC, j) AS rnk
  FROM scored
)
SELECT i AS part_key, CAST(rnk AS INTEGER) AS rnk, j AS neighbor,
       CAST(c AS BIGINT) AS n_common,
       ROUND(cosine, 6) AS cosine
FROM ranked WHERE rnk <= {COSINE_TOP_K}
"""


@register(
    "item_item_cosine_neighbors",
    oracle=_ITEM_COSINE_ORACLE,
    doc=f"Item-item collaborative filtering: each part's top-"
        f"{COSINE_TOP_K} neighbors by COSINE-normalized basket "
        "co-occurrence (c_ij / sqrt(c_i c_j)) with >= "
        f"{COSINE_MIN_COMMON} shared baskets — the memory-based "
        "recommender kernel, and the normalization that stops "
        "bestsellers from dominating raw co-counts (which is what "
        "the association-rules lift addresses multiplicatively; "
        "cosine is the geometric variant serving systems cache). "
        "Determinism: counts are exact integers and cosine is two "
        "IEEE correctly-rounded ops (multiply under sqrt, divide) "
        "on them, so the per-item (cosine DESC, j) ranking is "
        "bit-identical cross-engine — no epsilon anywhere. Scale: "
        "pair generation is per-basket (never across baskets), the "
        "support filter prunes before scoring, and the top-k is a "
        "per-item partitioned window — co-partitioned with the "
        "serving layout that reads it.",
    tags=("recommend", "affinity", "join", "window", "aggregate"),
)
def item_item_cosine_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    op = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    item = op.groupBy("p").agg(F.count(F.lit(1)).alias("ni"))
    a, b = op.alias("a"), op.alias("b")
    pair = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("i"), F.col("b.p").alias("j"))
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= COSINE_MIN_COMMON)
    )
    # NOT persisted (r12, measured): an interleaved A/B of persisting
    # op+pair here was a timing wash — the self-join's exchange is
    # already reused and the extra materialization cancels the saving
    # (unlike market_basket_rules, whose two-direction union re-ran a
    # support-filtered aggregate worth caching).
    sym = pair.unionAll(
        pair.select(F.col("j").alias("i"), F.col("i").alias("j"), "c")
    )
    ia = item.select(F.col("p").alias("i"), F.col("ni").alias("ni_i"))
    ja = item.select(F.col("p").alias("j"), F.col("ni").alias("ni_j"))
    scored = (
        sym.join(ia, "i")
        .join(ja, "j")
        .select(
            "i",
            "j",
            "c",
            (
                F.col("c").cast("double")
                / F.sqrt(
                    F.col("ni_i").cast("double") * F.col("ni_j").cast("double")
                )
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("i").orderBy(F.col("cosine").desc(), F.col("j"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= COSINE_TOP_K)
        .select(
            F.col("i").alias("part_key"),
            F.col("rnk").cast("int").alias("rnk"),
            F.col("j").alias("neighbor"),
            F.col("c").cast("long").alias("n_common"),
            F.round("cosine", 6).alias("cosine"),
        )
    )


# ---------------------------------------------------------------------------
# Brand-level affinity lift matrix
# ---------------------------------------------------------------------------

BAL_TOP = 10  # top pairs reported


@register(
    "brand_affinity_lift",
    oracle=f"""
WITH ob AS (
  SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS b
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
n AS (SELECT COUNT(DISTINCT o) AS n_orders FROM ob),
sup AS (SELECT b, COUNT(*) AS c FROM ob GROUP BY b),
pairs AS (
  SELECT a.b AS brand_a, c.b AS brand_b, COUNT(*) AS both_c
  FROM ob a JOIN ob c ON a.o = c.o AND a.b < c.b
  GROUP BY 1, 2
)
SELECT brand_a, brand_b,
       CAST(both_c AS BIGINT) AS n_both,
       CAST(sa.c AS BIGINT) AS n_a,
       CAST(sb.c AS BIGINT) AS n_b,
       ROUND(CAST(both_c AS DOUBLE) * n.n_orders / (sa.c * sb.c), 6)
         AS lift
FROM pairs
JOIN sup sa ON sa.b = brand_a
JOIN sup sb ON sb.b = brand_b
CROSS JOIN n
ORDER BY ROUND(CAST(both_c AS DOUBLE) * n.n_orders / (sa.c * sb.c), 6)
         DESC, brand_a, brand_b
LIMIT {BAL_TOP}
""",
    doc=f"BRAND AFFINITY LIFT — market-basket analysis lifted to the "
        f"brand grain where the support counts are dense enough to "
        f"rank: lift(a,b) = P(a,b)/(P(a)P(b)) over order baskets, "
        f"top-{BAL_TOP} pairs. Lift is an exact rational of integer "
        f"counts evaluated by one deterministic expression, ROUNDED "
        f"BEFORE the ranking with a pair tie-break (the "
        f"knn/bradley-terry rank discipline). Complements "
        f"market_basket_rules (part-grain support/confidence) with "
        f"the grain a merchandiser actually reads. Scale: basket "
        f"pairs at brand grain are bounded by |brands|^2 per order "
        f"after the DISTINCT projection; the pair aggregate carries "
        f"the only data-sized shuffle.",
    tags=("affinity", "join", "aggregate", "topk"),
)
def brand_affinity_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "part")
    ob = (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(F.col("l_orderkey").alias("o"), F.col("p_brand").alias("b"))
        .distinct()
        .persist()
    )
    n = ob.select("o").distinct().count()
    sup = ob.groupBy("b").agg(F.count(F.lit(1)).alias("c"))
    a, c = ob.alias("a"), ob.alias("c")
    pairs = (
        a.join(c, (F.col("a.o") == F.col("c.o")) & (F.col("a.b") < F.col("c.b")))
        .groupBy(F.col("a.b").alias("brand_a"), F.col("c.b").alias("brand_b"))
        .agg(F.count(F.lit(1)).alias("both_c"))
    )
    sa = sup.select(F.col("b").alias("brand_a"), F.col("c").alias("n_a"))
    sb = sup.select(F.col("b").alias("brand_b"), F.col("c").alias("n_b"))
    lift = F.round(
        F.col("both_c").cast("double") * n / (F.col("n_a") * F.col("n_b")), 6
    )
    out = (
        pairs.join(F.broadcast(sa), "brand_a")
        .join(F.broadcast(sb), "brand_b")
        .select(
            "brand_a",
            "brand_b",
            F.col("both_c").cast("long").alias("n_both"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            lift.alias("lift"),
        )
        .orderBy(F.desc("lift"), "brand_a", "brand_b")
        .limit(BAL_TOP)
    )
    return finish(out, ob)


# ---------------------------------------------------------------------------
# User top-N recommendations from item co-occurrence
# ---------------------------------------------------------------------------

REC_TOP_N = 3
REC_MIN_CO = 2
REC_USER_MOD = 100  # report users with custkey % MOD == 0 (bounded demo)


@register(
    "user_topn_recommendations",
    oracle=f"""
WITH up AS (
  SELECT DISTINCT o.o_custkey AS u, l.l_partkey AS p
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
co AS (
  SELECT a.p AS pa, b.p AS pb, COUNT(*) AS c
  FROM (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem) a
  JOIN (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem) b
    ON a.o = b.o AND a.p <> b.p
  GROUP BY 1, 2 HAVING COUNT(*) >= {REC_MIN_CO}
),
cand AS (
  SELECT up.u, co.pb AS rec, SUM(co.c) AS score
  FROM up JOIN co ON co.pa = up.p
  WHERE up.u % {REC_USER_MOD} = 0
  GROUP BY 1, 2
),
unseen AS (
  SELECT c.u, c.rec, c.score
  FROM cand c LEFT JOIN up ON up.u = c.u AND up.p = c.rec
  WHERE up.p IS NULL
)
SELECT u AS custkey, rec AS part_rec,
       CAST(score AS BIGINT) AS co_score,
       CAST(rk AS BIGINT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY u
                               ORDER BY score DESC, rec) AS rk
  FROM unseen
) WHERE rk <= {REC_TOP_N}
""",
    doc=f"ITEM-TO-USER TOP-{REC_TOP_N} RECOMMENDATIONS from basket "
        f"co-occurrence — the classic 'customers who bought X also "
        f"bought Y' recommender composed end to end: the item-item "
        f"co-occurrence matrix (support floor {REC_MIN_CO}) scores "
        f"every candidate next to a user's OWNED set, owned items "
        f"are anti-joined out (a recommender that recommends what "
        f"you already bought is a bug the test data would hide), "
        f"and the per-user top-{REC_TOP_N} ranks on the exact "
        f"integer score with an item tie-break. The 1-in-"
        f"{REC_USER_MOD} user sample bounds the demo output; at "
        f"scale the same plan serves every user. Scale: candidate "
        f"generation is one (user-items x co-matrix) equi-join on "
        f"the item key; the co-matrix support floor caps its size "
        f"(the hot-item df-cap discipline).",
    tags=("recommend", "affinity", "join", "topk"),
)
def user_topn_recommendations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir, "orders", "lineitem")
    op = (
        t["lineitem"]
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
        .persist()
    )
    up = (
        t["orders"]
        .select(F.col("o_orderkey").alias("o"), F.col("o_custkey").alias("u"))
        .join(op, "o")
        .select("u", "p")
        .distinct()
        .persist()
    )
    a, b = op.alias("a"), op.alias("b")
    co = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") != F.col("b.p")))
        .groupBy(F.col("a.p").alias("pa"), F.col("b.p").alias("pb"))
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= REC_MIN_CO)
    )
    sample = up.where(F.col("u") % REC_USER_MOD == 0)
    cand = (
        sample.join(co, F.col("p") == F.col("pa"))
        .groupBy("u", F.col("pb").alias("rec"))
        .agg(F.sum("c").alias("score"))
    )
    owned = up.select(F.col("u").alias("ou"), F.col("p").alias("op_"))
    unseen = cand.join(
        owned,
        (F.col("u") == F.col("ou")) & (F.col("rec") == F.col("op_")),
        "left_anti",
    )
    w = Window.partitionBy("u").orderBy(F.desc("score"), "rec")
    out = (
        unseen.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= REC_TOP_N)
        .select(
            F.col("u").alias("custkey"),
            F.col("rec").alias("part_rec"),
            F.col("score").cast("long").alias("co_score"),
            F.col("rk").cast("long").alias("rank"),
        )
    )
    return finish(out, op, up)
