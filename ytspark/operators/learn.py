"""Distributed model training ON the engine: fixed-iteration batch
gradient descent expressed as DataFrame aggregates.

A large-scale data pipeline doesn't just filter with hand-written
rules — it trains lightweight models (quality classifiers, language
scorers) over corpus features and applies them in the same engine.
This module implements the training loop Spark-first: one GD iteration
is ONE aggregate over the feature table (gradient components as
columns) combined with the previous weights via a broadcast one-row
cross join — no driver-side collect, no RDDs, no MLlib dependency.
Unrolling a fixed iteration count into a single lineage keeps the
computation deterministic, so the DuckDB oracle can replay the exact
same iterations as chained CTEs and the learned weights are
value-certified cross-engine — a property no sampled/early-stopping
trainer can offer.

At 100 TB: the feature table is the corpus scan; each iteration is one
map-side-combinable aggregate (a handful of doubles per partition), so
the shuffle per iteration is O(partitions), not O(rows). Weights stay
in the plan as a one-row broadcast. This is exactly how distributed
GD/L-BFGS outer loops are structured on Spark; fixed unrolled
iterations trade adaptive stopping for determinism and auditability.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ytspark.queries import register
from ytspark.session import load_tables

LR = 1.0  # learning rate (features are scaled to ~[0, 1])
GD_ITERS = 5
W_ROUND = 6  # decimals in reported weights (cross-engine float guard)


def logreg_train(
    feats: DataFrame,
    xs: list[str],
    y: str = "y",
    iters: int = GD_ITERS,
    lr: float = LR,
) -> DataFrame:
    """Batch-GD logistic regression → one row (n, b, w_<x1>, ...).

    ``feats`` holds double feature columns ``xs`` and a 0/1 double
    label ``y``. Weights start at zero; each iteration applies
    w ← w − lr · avg((σ(w·x) − y) · x) with σ the logistic function.
    The iteration count is fixed and unrolled into the lineage.
    """
    w_cols = ["b"] + [f"w_{x}" for x in xs]
    weights = feats.sparkSession.range(1).select(
        *[F.lit(0.0).alias(c) for c in w_cols]
    )
    for _ in range(iters):
        j = feats.crossJoin(F.broadcast(weights))
        z: Column = F.col("b")
        for x in xs:
            z = z + F.col(f"w_{x}") * F.col(x)
        err = F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) - F.col(y)
        # weights are constant across rows: MAX re-extracts the scalar
        weights = j.agg(
            (F.max("b") - lr * F.avg(err)).alias("b"),
            *[
                (F.max(f"w_{x}") - lr * F.avg(err * F.col(x))).alias(f"w_{x}")
                for x in xs
            ],
        )
    n = feats.agg(F.count(F.lit(1)).alias("n"))
    return n.crossJoin(F.broadcast(weights)).select(
        "n", *[F.round(c, W_ROUND).alias(c) for c in w_cols]
    )


# Cross-engine feature expressions (identical semantics to text_stats):
# x1 = tokens/100, x2 = type-token ratio; label: lang = 'en'.
_FEATS_SQL = """
  SELECT LEN(STRING_SPLIT(text, ' ')) / 100.0 AS x1,
         CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS DOUBLE)
           / LEN(STRING_SPLIT(text, ' ')) AS x2,
         CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
  FROM documents
"""


def _gd_iter_sql(prev: str, out: str) -> str:
    sig = "1.0 / (1.0 + EXP(-(w.b + w.w_x1 * f.x1 + w.w_x2 * f.x2)))"
    return f"""{out} AS (
  SELECT MAX(w.b) - {LR} * AVG({sig} - f.y) AS b,
         MAX(w.w_x1) - {LR} * AVG(({sig} - f.y) * f.x1) AS w_x1,
         MAX(w.w_x2) - {LR} * AVG(({sig} - f.y) * f.x2) AS w_x2
  FROM f CROSS JOIN {prev} w
)"""


_LOGREG_ORACLE = f"""
WITH f AS ({_FEATS_SQL}),
g0 AS (SELECT 0.0 AS b, 0.0 AS w_x1, 0.0 AS w_x2),
{",".join(_gd_iter_sql(f"g{i}", f"g{i + 1}") for i in range(GD_ITERS))}
SELECT (SELECT COUNT(*) FROM f) AS n,
       ROUND(b, {W_ROUND}) AS b,
       ROUND(w_x1, {W_ROUND}) AS w_x1,
       ROUND(w_x2, {W_ROUND}) AS w_x2
FROM g{GD_ITERS}
"""


_OLS_ORACLE = """
WITH daily AS (
  SELECT DATE_DIFF('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
           AS x,
         SUM(o_totalprice) / 1e6 AS y
  FROM orders
  GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
       ROUND(REGR_SLOPE(y, x), 6) AS slope_m_per_day,
       ROUND(REGR_INTERCEPT(y, x), 6) AS intercept_m,
       ROUND(REGR_R2(y, x), 6) AS r2,
       ROUND(REGR_INTERCEPT(y, x)
             + REGR_SLOPE(y, x) * (MAX(x) + 30), 6) AS forecast_30d_m
FROM daily
"""


@register(
    "revenue_trend_ols",
    oracle=_OLS_ORACLE,
    doc="Closed-form least-squares trend fit of daily revenue "
        "(millions) against the day index, plus a 30-day-ahead point "
        "forecast — the regression-as-aggregation pattern: slope = "
        "covar_pop/var_pop, so the whole fit is ONE map-side-"
        "combinable aggregate over the daily rollup, no iteration and "
        "no driver math. Both engines run their NATIVE regr_slope/"
        "regr_intercept/regr_r2 aggregates (identical population "
        "co-moment definitions; merge order sensitivity is ulp-level, "
        "absorbed by 6 dp rounding), so this certifies Spark's "
        "built-in regression aggregates against DuckDB's — not a "
        "replayed script. At 100 TB the daily rollup is the only "
        "shuffle; the fit itself reduces |days| rows to one.",
    tags=("learn", "regression", "aggregate", "time"),
)
def revenue_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    daily = orders.groupBy(
        F.datediff(
            F.to_date("o_orderdate"), F.lit("1992-01-01").cast("date")
        ).alias("x")
    ).agg((F.sum("o_totalprice") / F.lit(1e6)).alias("y"))
    return daily.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(F.regr_slope("y", "x"), 6).alias("slope_m_per_day"),
        F.round(F.regr_intercept("y", "x"), 6).alias("intercept_m"),
        F.round(F.regr_r2("y", "x"), 6).alias("r2"),
        F.round(
            F.regr_intercept("y", "x")
            + F.regr_slope("y", "x") * (F.max("x") + F.lit(30)),
            6,
        ).alias("forecast_30d_m"),
    )


@register(
    "quality_logreg_train",
    oracle=_LOGREG_ORACLE,
    doc="Train an is-English quality classifier (logistic regression "
        f"on token-count and type-token-ratio features) with {GD_ITERS} "
        "unrolled batch-GD iterations, entirely inside the engine: one "
        "map-side-combinable aggregate per iteration, weights carried "
        "as a broadcast one-row frame, no driver collect, no MLlib. "
        "The DuckDB oracle replays the identical iterations as chained "
        "CTEs, so the learned weights themselves are value-certified "
        "cross-engine.",
    tags=("learn", "logreg", "iterative", "text"),
)
def quality_logreg_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    toks = F.split(F.col("text"), " ")
    feats = docs.select(
        (F.array_size(toks) / F.lit(100.0)).alias("x1"),
        (
            F.array_size(F.array_distinct(toks)).cast("double")
            / F.array_size(toks)
        ).alias("x2"),
        F.when(F.col("lang") == "en", F.lit(1.0)).otherwise(F.lit(0.0)).alias("y"),
    )
    return logreg_train(feats, ["x1", "x2"])


NB_ROUND = 6  # decimals on log-scores before the argmax rank


_NB_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, lang, t AS tok
  FROM (SELECT doc_id, lang, UNNEST(STRING_SPLIT(text, ' ')) AS t
        FROM documents)
),
doc_tok AS (
  SELECT doc_id, tok, COUNT(*) AS k FROM tok GROUP BY doc_id, tok
),
doc_len AS (
  SELECT doc_id, lang, COUNT(*) AS n_d FROM tok GROUP BY doc_id, lang
),
class_tok AS (
  SELECT lang, tok, COUNT(*) AS cnt FROM tok GROUP BY lang, tok
),
class_stats AS (
  SELECT lang, COUNT(*) AS toks_c FROM tok GROUP BY lang
),
priors AS (
  SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
),
consts AS (
  SELECT (SELECT COUNT(DISTINCT tok) FROM tok) AS v,
         (SELECT COUNT(*) FROM documents) AS n
),
hits AS (
  SELECT d.doc_id, c.lang, SUM(d.k * LN(c.cnt + 1)) AS s1
  FROM doc_tok d JOIN class_tok c ON c.tok = d.tok
  GROUP BY d.doc_id, c.lang
),
scored AS (
  SELECT dl.doc_id, dl.lang AS true_lang, p.lang AS cand,
         ROUND(LN(CAST(p.n_docs AS DOUBLE) / k.n)
               - dl.n_d * LN(cs.toks_c + k.v)
               + COALESCE(h.s1, 0.0), {NB_ROUND}) AS score
  FROM doc_len dl
  CROSS JOIN priors p
  JOIN class_stats cs ON cs.lang = p.lang
  CROSS JOIN consts k
  LEFT JOIN hits h ON h.doc_id = dl.doc_id AND h.lang = p.lang
),
pred AS (
  SELECT doc_id, true_lang, cand AS pred_lang FROM (
    SELECT doc_id, true_lang, cand,
           ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY score DESC, cand) AS rk
    FROM scored
  ) WHERE rk = 1
)
SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
FROM pred GROUP BY true_lang, pred_lang
"""


@register(
    "lang_nb_classifier",
    oracle=_NB_ORACLE,
    doc="Multinomial Naive Bayes language classifier trained AND "
        "served entirely in the engine (Laplace alpha=1), reported as "
        "a confusion matrix against the gold lang label — the learned "
        "complement to lang_id_heuristic's rule-based ID. Training is "
        "three aggregates (class priors, per-class token totals, "
        "per-class token counts); scoring exploits the smoothing "
        "identity that unseen (token, class) pairs contribute "
        "ln(0+1) = 0, so the score join is doc-tokens INNER JOIN "
        "class-tokens (shuffles keyed on the token — vocabulary-"
        "distributed, nothing driver-side, no dense doc x vocab "
        "grid) plus a broadcast of the 5-row class stats. Scores "
        f"round to {NB_ROUND} dp before the (score, class) argmax "
        "rank, so the prediction — and the whole confusion matrix — "
        "is deterministic cross-engine.",
    tags=("learn", "classifier", "text", "aggregate"),
)
def lang_nb_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    tok = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("tok")
    )
    doc_tok = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("k"))
    doc_len = tok.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("n_d")
    )
    class_tok = tok.groupBy("lang", "tok").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    class_stats = tok.groupBy("lang").agg(F.count(F.lit(1)).alias("toks_c"))
    priors = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    consts = tok.agg(
        F.count_distinct("tok").alias("v")
    ).crossJoin(docs.agg(F.count(F.lit(1)).alias("n")))
    hits = (
        doc_tok.join(
            class_tok.select(
                F.col("lang").alias("cand"), "tok", "cnt"
            ),
            "tok",
        )
        .groupBy("doc_id", "cand")
        .agg(F.sum(F.col("k") * F.log(F.col("cnt") + 1)).alias("s1"))
    )
    classes = priors.join(class_stats, "lang").select(
        F.col("lang").alias("cand"), "n_docs", "toks_c"
    )
    scored = (
        doc_len.crossJoin(F.broadcast(classes))
        .crossJoin(F.broadcast(consts))
        .join(hits, ["doc_id", "cand"], "left")
        .select(
            "doc_id",
            F.col("lang").alias("true_lang"),
            "cand",
            F.round(
                F.log(F.col("n_docs").cast("double") / F.col("n"))
                - F.col("n_d") * F.log(F.col("toks_c") + F.col("v"))
                + F.coalesce(F.col("s1"), F.lit(0.0)),
                NB_ROUND,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "cand")
    pred = (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("true_lang", F.col("cand").alias("pred_lang"))
    )
    return pred.groupBy("true_lang", "pred_lang").agg(
        F.count(F.lit(1)).alias("n")
    )


# ---------------------------------------------------------------------------
# Multi-feature linear regression via distributed normal equations
# ---------------------------------------------------------------------------

# The Gram-matrix sums are computed over DECIMAL-cast inputs so both
# engines produce bit-identical exact sums regardless of aggregation
# order (float summation is order-dependent; decimal summation is
# exact). The tiny 3x3 solve then runs as the SAME textual expression
# chain on both sides — every op exactly-rounded IEEE on identical
# inputs — so the coefficients match to the last bit before the 6 dp
# reporting round.

# Cramer's rule on A = [[n,sx1,sx2],[sx1,s11,s12],[sx2,s12,s22]],
# t = (sy, s1y, s2y); same text evaluated by both engines.
_NE_DET = (
    "(n*(s11*s22 - s12*s12) - sx1*(sx1*s22 - s12*sx2)"
    " + sx2*(sx1*s12 - s11*sx2))"
)
_NE_DET0 = (
    "(sy*(s11*s22 - s12*s12) - sx1*(s1y*s22 - s12*s2y)"
    " + sx2*(s1y*s12 - s11*s2y))"
)
_NE_DET1 = (
    "(n*(s1y*s22 - s12*s2y) - sy*(sx1*s22 - s12*sx2)"
    " + sx2*(sx1*s2y - s1y*sx2))"
)
_NE_DET2 = (
    "(n*(s11*s2y - s1y*s12) - sx1*(sx1*s2y - s1y*sx2)"
    " + sy*(sx1*s12 - s11*sx2))"
)
_NE_FINAL = f"""
  CAST(n AS BIGINT) AS n_orders,
  ROUND({_NE_DET0} / {_NE_DET}, 6) AS beta0,
  ROUND({_NE_DET1} / {_NE_DET}, 6) AS beta1,
  ROUND({_NE_DET2} / {_NE_DET}, 6) AS beta2,
  ROUND(1 - (syy - ({_NE_DET0} / {_NE_DET}) * sy
                 - ({_NE_DET1} / {_NE_DET}) * s1y
                 - ({_NE_DET2} / {_NE_DET}) * s2y)
            / (syy - sy * sy / n), 6) AS r2
"""

_NE_ORACLE = f"""
WITH feats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS x1,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12, 2))) AS DOUBLE) AS x2,
         l_orderkey AS ok
  FROM lineitem GROUP BY l_orderkey
),
d AS (
  SELECT f.x1, f.x2,
         CAST(CAST(o.o_totalprice AS DECIMAL(18, 2)) AS DOUBLE) AS y
  FROM orders o JOIN feats f ON o.o_orderkey = f.ok
),
g AS (
  SELECT
    CAST(COUNT(*) AS DOUBLE) AS n,
    CAST(SUM(CAST(x1 AS DECIMAL(18, 2))) AS DOUBLE) AS sx1,
    CAST(SUM(CAST(x2 AS DECIMAL(18, 2))) AS DOUBLE) AS sx2,
    CAST(SUM(CAST(y AS DECIMAL(18, 2))) AS DOUBLE) AS sy,
    CAST(SUM(CAST(x1 AS DECIMAL(18, 2)) * CAST(x1 AS DECIMAL(18, 2)))
         AS DOUBLE) AS s11,
    CAST(SUM(CAST(x1 AS DECIMAL(18, 2)) * CAST(x2 AS DECIMAL(18, 2)))
         AS DOUBLE) AS s12,
    CAST(SUM(CAST(x2 AS DECIMAL(18, 2)) * CAST(x2 AS DECIMAL(18, 2)))
         AS DOUBLE) AS s22,
    CAST(SUM(CAST(x1 AS DECIMAL(18, 2)) * CAST(y AS DECIMAL(18, 2)))
         AS DOUBLE) AS s1y,
    CAST(SUM(CAST(x2 AS DECIMAL(18, 2)) * CAST(y AS DECIMAL(18, 2)))
         AS DOUBLE) AS s2y,
    CAST(SUM(CAST(y AS DECIMAL(18, 2)) * CAST(y AS DECIMAL(18, 2)))
         AS DOUBLE) AS syy
  FROM d
)
SELECT {_NE_FINAL} FROM g
"""


@register(
    "regression_normal_equations",
    oracle=_NE_ORACLE,
    doc="Multi-feature linear regression by DISTRIBUTED NORMAL "
        "EQUATIONS — predict order value from line count and total "
        "quantity: the Gram matrix X'X and moment vector X'y are ONE "
        "map-side-combinable aggregate (10 sums over DECIMAL-cast "
        "features, so the sums are EXACT and aggregation-order-free "
        "— the trick that makes the fit bit-reproducible across "
        "engines, retries, and partitionings, where float sums are "
        "not), and the 3x3 Cramer solve + R-squared run as the "
        "identical textual expression chain on both engines over "
        "those exact sums. This is the shape that trains linear "
        "models on 100 TB: feature count bounds the aggregate state "
        "(p^2 sums), data volume only adds map-side work, and no "
        "driver ever sees a row. Extends the single-feature "
        "regr_slope query (revenue_trend_ols) to the general p>1 "
        "case the native aggregates cannot express.",
    tags=("learn", "regression", "aggregate", "scale"),
)
def regression_normal_equations(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    feats = t["lineitem"].groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.count(F.lit(1)).cast("double").alias("x1"),
        F.sum(F.col("l_quantity").cast("decimal(12,2)"))
        .cast("double")
        .alias("x2"),
    )
    d = t["orders"].join(
        feats, F.col("o_orderkey") == F.col("ok")
    ).select(
        "x1",
        "x2",
        F.col("o_totalprice")
        .cast("decimal(18,2)")
        .cast("double")
        .alias("y"),
    )
    dec = "CAST({c} AS DECIMAL(18, 2))"
    g = d.selectExpr(
        *[
            f"{dec.format(c=c)} AS {c}"  # exact decimal sums below
            for c in ("x1", "x2", "y")
        ]
    ).selectExpr(
        "CAST(COUNT(*) AS DOUBLE) AS n",
        "CAST(SUM(x1) AS DOUBLE) AS sx1",
        "CAST(SUM(x2) AS DOUBLE) AS sx2",
        "CAST(SUM(y) AS DOUBLE) AS sy",
        "CAST(SUM(x1 * x1) AS DOUBLE) AS s11",
        "CAST(SUM(x1 * x2) AS DOUBLE) AS s12",
        "CAST(SUM(x2 * x2) AS DOUBLE) AS s22",
        "CAST(SUM(x1 * y) AS DOUBLE) AS s1y",
        "CAST(SUM(x2 * y) AS DOUBLE) AS s2y",
        "CAST(SUM(y * y) AS DOUBLE) AS syy",
    )
    return g.selectExpr(*[e.strip() for e in _NE_FINAL.split(",\n")])


# ---------------------------------------------------------------------------
# Per-group trend sweep (grouped closed-form OLS)
# ---------------------------------------------------------------------------

_GROUP_OLS_ORACLE = """
WITH daily AS (
  SELECT o_orderpriority AS pri,
         DATE_DIFF('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
           AS x,
         SUM(o_totalprice) / 1e6 AS y
  FROM orders GROUP BY 1, 2
)
SELECT pri,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       ROUND(REGR_SLOPE(y, x), 6) AS slope_m_per_day,
       ROUND(REGR_INTERCEPT(y, x), 6) AS intercept_m,
       ROUND(REGR_R2(y, x), 6) AS r2
FROM daily
GROUP BY pri
"""


@register(
    "trend_by_priority_ols",
    oracle=_GROUP_OLS_ORACLE,
    doc="GROUPED closed-form OLS — one trend line per order "
        "priority over its daily revenue series, the per-segment "
        "sweep that turns the single-series trend fit "
        "(revenue_trend_ols) into a model-per-key operator: both "
        "engines run their native regr_slope/intercept/r2 aggregates "
        "per group, so at 100 TB this is exactly two map-side-"
        "combinable aggregates (daily rollup, then per-group "
        "co-moments) and fitting a MILLION segment models costs the "
        "same plan as fitting five — the aggregate state per group "
        "is six co-moments, independent of data volume.",
    tags=("learn", "regression", "aggregate", "time"),
)
def trend_by_priority_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("pri"),
        F.datediff(
            F.to_date("o_orderdate"), F.lit("1992-01-01").cast("date")
        ).alias("x"),
    ).agg((F.sum("o_totalprice") / F.lit(1e6)).alias("y"))
    return daily.groupBy("pri").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(F.regr_slope("y", "x"), 6).alias("slope_m_per_day"),
        F.round(F.regr_intercept("y", "x"), 6).alias("intercept_m"),
        F.round(F.regr_r2("y", "x"), 6).alias("r2"),
    )


# ---------------------------------------------------------------------------
# Classifier evaluation battery (precision/recall/F1 over the NB matrix)
# ---------------------------------------------------------------------------


def _classifier_eval_oracle() -> str:
    return f"""
WITH cm AS (SELECT true_lang, pred_lang, n FROM ({_NB_ORACLE})),
act AS (SELECT true_lang AS lang, SUM(n) AS n_true FROM cm GROUP BY 1),
prd AS (SELECT pred_lang AS lang, SUM(n) AS n_pred FROM cm GROUP BY 1),
tp AS (SELECT true_lang AS lang, SUM(n) AS tp FROM cm
       WHERE true_lang = pred_lang GROUP BY 1),
tot AS (SELECT SUM(n) AS n_total,
               SUM(CASE WHEN true_lang = pred_lang THEN n ELSE 0 END) AS n_correct
        FROM cm)
SELECT act.lang,
       CAST(act.n_true AS BIGINT) AS n_true,
       CAST(COALESCE(prd.n_pred, 0) AS BIGINT) AS n_pred,
       CAST(COALESCE(tp.tp, 0) AS BIGINT) AS tp,
       CASE WHEN COALESCE(prd.n_pred, 0) > 0
            THEN ROUND(COALESCE(tp.tp, 0) * 1.0 / prd.n_pred, 6) END
         AS prec,
       ROUND(COALESCE(tp.tp, 0) * 1.0 / act.n_true, 6) AS recall,
       CASE WHEN COALESCE(tp.tp, 0) > 0
            THEN ROUND(2.0 * (tp.tp * 1.0 / prd.n_pred)
                           * (tp.tp * 1.0 / act.n_true)
                       / (tp.tp * 1.0 / prd.n_pred
                          + tp.tp * 1.0 / act.n_true), 6)
            ELSE 0.0 END AS f1,
       ROUND(tot.n_correct * 1.0 / tot.n_total, 6) AS accuracy
FROM act
LEFT JOIN prd ON prd.lang = act.lang
LEFT JOIN tp ON tp.lang = act.lang
CROSS JOIN tot
"""


def _register_classifier_eval() -> None:
    @register(
        "classifier_eval_metrics",
        oracle=_classifier_eval_oracle(),
        doc="CLASSIFIER EVALUATION battery — per-class precision, "
            "recall, F1 and overall accuracy derived from the in-engine "
            "Naive Bayes language classifier's confusion matrix (itself "
            "hash-certified): the model-eval step of an ML data "
            "pipeline, run where the data lives instead of exporting "
            "predictions. Composes the certified NB oracle as a nested "
            "CTE, so the metric VALUES — including the never-predicted-"
            "class NULL-precision edge and the tp=0 -> F1=0 convention "
            "— are cross-engine exact. Everything after the confusion "
            "matrix is |classes|-sized; the overall accuracy is a "
            "broadcast one-row scalar (allowlisted BNLJ).",
        tags=("learn", "evaluation", "classifier", "aggregate"),
    )
    def classifier_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
        cm = lang_nb_classifier(spark, sf_dir)
        act = cm.groupBy(F.col("true_lang").alias("lang")).agg(
            F.sum("n").alias("n_true")
        )
        prd = cm.groupBy(F.col("pred_lang").alias("lang")).agg(
            F.sum("n").alias("n_pred")
        )
        tp = (
            cm.where(F.col("true_lang") == F.col("pred_lang"))
            .groupBy(F.col("true_lang").alias("lang"))
            .agg(F.sum("n").alias("tp"))
        )
        tot = cm.agg(
            F.sum("n").alias("n_total"),
            F.sum(
                F.when(
                    F.col("true_lang") == F.col("pred_lang"), F.col("n")
                ).otherwise(0)
            ).alias("n_correct"),
        )
        tpc = F.coalesce(F.col("tp"), F.lit(0))
        npred = F.coalesce(F.col("n_pred"), F.lit(0))
        p = tpc * 1.0 / F.col("n_pred")
        r = tpc * 1.0 / F.col("n_true")
        return (
            act.join(prd, "lang", "left")
            .join(tp, "lang", "left")
            .crossJoin(F.broadcast(tot))
            .select(
                "lang",
                F.col("n_true").cast("long").alias("n_true"),
                npred.cast("long").alias("n_pred"),
                tpc.cast("long").alias("tp"),
                F.when(npred > 0, F.round(p, 6)).alias("prec"),
                F.round(r, 6).alias("recall"),
                F.when(tpc > 0, F.round(2.0 * p * r / (p + r), 6))
                .otherwise(F.lit(0.0))
                .alias("f1"),
                F.round(F.col("n_correct") * 1.0 / F.col("n_total"), 6).alias(
                    "accuracy"
                ),
            )
        )


_register_classifier_eval()


# ---------------------------------------------------------------------------
# Probability calibration report for the trained logistic classifier
# ---------------------------------------------------------------------------


def _calibration_oracle() -> str:
    return f"""
WITH f AS ({_FEATS_SQL}),
g0 AS (SELECT 0.0 AS b, 0.0 AS w_x1, 0.0 AS w_x2),
{",".join(_gd_iter_sql(f"g{i}", f"g{i + 1}") for i in range(GD_ITERS))},
w AS (SELECT ROUND(b, {W_ROUND}) AS b, ROUND(w_x1, {W_ROUND}) AS w_x1,
             ROUND(w_x2, {W_ROUND}) AS w_x2 FROM g{GD_ITERS}),
scored AS (
  SELECT ROUND(1.0 / (1.0 + EXP(-(w.b + w.w_x1 * f.x1 + w.w_x2 * f.x2))),
               6) AS p,
         f.y
  FROM f CROSS JOIN w
)
SELECT LEAST(CAST(FLOOR(p * 1000) AS BIGINT), 999) AS score_band,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(p), 6) AS mean_predicted,
       ROUND(AVG(y), 6) AS positive_rate,
       ROUND(AVG((p - y) * (p - y)), 6) AS brier
FROM scored
GROUP BY 1
"""


def _register_calibration() -> None:
    @register(
        "logreg_calibration_report",
        oracle=_calibration_oracle(),
        doc="PROBABILITY CALIBRATION report for the in-engine logistic "
            "classifier — the reliability-diagram companion of "
            "classifier_eval_metrics: every document is scored with "
            "the certified GD weights (rounded to the same 6 dp the "
            "train query reports, so scoring operands are bit-"
            "identical cross-engine), predictions bucket into "
            "milli-probability score bands (floor(p*1000) — fine "
            "enough to resolve a weakly-separating model's curve, "
            "bounded at 1000 bands at any scale), and each band "
            "reports its mean predicted probability vs the actual "
            "positive rate (their gap IS the calibration error) plus "
            "the Brier contribution — the "
            "check that decides whether a filter threshold on the "
            "model's scores means what it claims before the model "
            "gates a 100 TB corpus. Scoring is one broadcast of the "
            "one-row weight vector over the feature scan; the report "
            "is a 10-row aggregate.",
        tags=("learn", "evaluation", "calibration", "aggregate"),
    )
    def logreg_calibration_report(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        docs = load_tables(spark, sf_dir, "documents")["documents"]
        toks = F.split(F.col("text"), " ")
        feats = docs.select(
            (F.array_size(toks) / F.lit(100.0)).alias("x1"),
            (
                F.array_size(F.array_distinct(toks)).cast("double")
                / F.array_size(toks)
            ).alias("x2"),
            F.when(F.col("lang") == "en", F.lit(1.0))
            .otherwise(F.lit(0.0))
            .alias("y"),
        )
        w = quality_logreg_train(spark, sf_dir).select("b", "w_x1", "w_x2")
        z = F.col("b") + F.col("w_x1") * F.col("x1") + F.col("w_x2") * F.col("x2")
        p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
        scored = feats.crossJoin(F.broadcast(w)).select(p.alias("p"), "y")
        band = F.least(F.floor(F.col("p") * 1000).cast("long"), F.lit(999))
        return (
            scored.groupBy(band.alias("score_band"))
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.round(F.avg("p"), 6).alias("mean_predicted"),
                F.round(F.avg("y"), 6).alias("positive_rate"),
                F.round(
                    F.avg((F.col("p") - F.col("y")) * (F.col("p") - F.col("y"))),
                    6,
                ).alias("brier"),
            )
        )


_register_calibration()


# ---------------------------------------------------------------------------
# Split-conformal prediction intervals around the OLS revenue trend
# ---------------------------------------------------------------------------

CONFORMAL_ALPHA = 0.2  # target 80% coverage
CONFORMAL_HORIZON = 5  # days forecast beyond the observed window


@register(
    "conformal_trend_intervals",
    oracle=f"""
WITH daily AS (
  SELECT o_orderdate AS d,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS HUGEINT)
           AS cents
  FROM orders GROUP BY o_orderdate
),
mind AS (SELECT MIN(d) AS d0 FROM daily),
pts AS (
  SELECT DATE_DIFF('day', mind.d0, daily.d) AS x, cents
  FROM daily CROSS JOIN mind
),
train AS (SELECT * FROM pts WHERE x % 2 = 0),
fit AS (
  SELECT COUNT(*) AS n,
         SUM(CAST(x AS HUGEINT)) AS sx,
         SUM(cents) AS sy,
         SUM(CAST(x AS HUGEINT) * x) AS sxx,
         SUM(CAST(x AS HUGEINT) * cents) AS sxy
  FROM train
),
ab AS (
  SELECT (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b,
         CAST(n AS BIGINT) AS n_train
  FROM fit
),
ab2 AS (
  SELECT ab.b,
         (CAST(f.sy AS DOUBLE) - ab.b * CAST(f.sx AS DOUBLE))
           / CAST(f.n AS DOUBLE) AS a,
         ab.n_train
  FROM ab CROSS JOIN fit f
),
calib AS (
  SELECT x, ABS(CAST(cents AS DOUBLE) - (ab2.a + ab2.b * x)) AS r
  FROM pts CROSS JOIN ab2 WHERE x % 2 = 1
),
ncal AS (SELECT COUNT(*) AS n_cal FROM calib),
kq AS (
  SELECT n_cal,
         CAST(CEIL((n_cal + 1) * {1 - CONFORMAL_ALPHA}) AS BIGINT) AS k
  FROM ncal
),
ranked AS (
  SELECT r, ROW_NUMBER() OVER (ORDER BY r, x) AS rn FROM calib
),
q AS (
  SELECT kq.n_cal, kq.k,
         CASE WHEN kq.k > kq.n_cal
              THEN (SELECT MAX(r) FROM ranked)
              ELSE (SELECT r FROM ranked WHERE rn = kq.k) END AS qr
  FROM kq
),
maxx AS (SELECT MAX(x) AS xm FROM pts),
h(step) AS (SELECT UNNEST(RANGE(1, {CONFORMAL_HORIZON} + 1)))
SELECT CAST(h.step AS INTEGER) AS step,
       CAST(maxx.xm + h.step AS BIGINT) AS x,
       ab2.n_train, q.n_cal,
       ROUND(ab2.b / 100, 6) AS slope_dollars,
       ROUND((ab2.a + ab2.b * (maxx.xm + h.step)) / 100, 4) AS yhat,
       ROUND((ab2.a + ab2.b * (maxx.xm + h.step) - q.qr) / 100, 4) AS lo,
       ROUND((ab2.a + ab2.b * (maxx.xm + h.step) + q.qr) / 100, 4) AS hi
FROM h CROSS JOIN ab2 CROSS JOIN q CROSS JOIN maxx
""",
    doc=f"SPLIT-CONFORMAL prediction intervals around the daily-"
        "revenue OLS trend — distribution-free uncertainty "
        "quantification computed where the data lives: even day "
        "indices train the line (exact integer-cent sums, the "
        "normal-equations precedent), odd days are the calibration "
        "half, and the interval half-width is the k-th smallest "
        f"absolute calibration residual with k = ceil((n+1)·"
        f"{1 - CONFORMAL_ALPHA}) — the finite-sample guarantee "
        f"P(y in [lo, hi]) >= {1 - CONFORMAL_ALPHA} that holds with "
        "NO distributional assumption on the residuals. Output: the "
        f"{CONFORMAL_HORIZON}-day-ahead forecast band. Determinism: "
        "every sum is HUGEINT/DECIMAL-exact; a, b, residuals and the "
        "ranked quantile are identical fixed double expression trees "
        "in both engines (the residual rank tiebreaks on the day "
        "index). Scale: the daily rollup is the only data-sized "
        "shuffle; the residual rank runs over the O(days) calibration "
        "rollup (allowlisted bound).",
    tags=("learn", "conformal", "statistics", "aggregate", "window"),
)
def conformal_trend_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_tables(spark, sf_dir, "orders")["orders"]
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("decimal(38,0)")
        .alias("cents")
    )
    mind = daily.agg(F.min("d").alias("d0"))
    pts = daily.crossJoin(F.broadcast(mind)).select(
        F.datediff("d", "d0").alias("x"), "cents"
    )
    train = pts.where(F.col("x") % 2 == 0)
    xd = F.col("x").cast("decimal(38,0)")
    fit = train.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).alias("sx"),
        F.sum("cents").alias("sy"),
        F.sum(xd * F.col("x")).alias("sxx"),
        F.sum(xd * F.col("cents")).alias("sxy"),
    )
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    ab = fit.select(
        (
            (dbl("n") * dbl("sxy") - dbl("sx") * dbl("sy"))
            / (dbl("n") * dbl("sxx") - dbl("sx") * dbl("sx"))
        ).alias("b"),
        F.col("n").cast("long").alias("n_train"),
        "sx",
        "sy",
        "n",
    )
    ab2 = ab.select(
        "b",
        ((dbl("sy") - F.col("b") * dbl("sx")) / dbl("n")).alias("a"),
        "n_train",
    )
    calib = (
        pts.where(F.col("x") % 2 == 1)
        .crossJoin(F.broadcast(ab2))
        .select(
            "x",
            "a",
            "b",
            "n_train",
            F.abs(
                F.col("cents").cast("double")
                - (F.col("a") + F.col("b") * F.col("x"))
            ).alias("r"),
        )
    )
    ncal = calib.agg(F.count(F.lit(1)).alias("n_cal"))
    kq = ncal.select(
        "n_cal",
        F.ceil((F.col("n_cal") + 1) * (1 - CONFORMAL_ALPHA))
        .cast("long")
        .alias("k"),
    )
    # residual rank over the O(days) calibration rollup — bounded by
    # the time dimension, never data-sized (allowlisted)
    rw = Window.orderBy("r", "x")
    ranked = calib.select("r", "x").withColumn(
        "rn", F.row_number().over(rw)
    )
    qr = (
        ranked.crossJoin(F.broadcast(kq))
        .where(
            (F.col("rn") == F.least(F.col("k"), F.col("n_cal")))
        )
        .select("n_cal", "k", F.col("r").alias("qr"))
    )
    maxx = pts.agg(F.max("x").alias("xm"))
    h = spark.range(1, CONFORMAL_HORIZON + 1).select(
        F.col("id").cast("int").alias("step")
    )
    yhat = F.col("a") + F.col("b") * (F.col("xm") + F.col("step"))
    return (
        h.crossJoin(F.broadcast(ab2))
        .crossJoin(F.broadcast(qr))
        .crossJoin(F.broadcast(maxx))
        .select(
            "step",
            (F.col("xm") + F.col("step")).cast("long").alias("x"),
            "n_train",
            "n_cal",
            F.round(F.col("b") / 100, 6).alias("slope_dollars"),
            F.round(yhat / 100, 4).alias("yhat"),
            F.round((yhat - F.col("qr")) / 100, 4).alias("lo"),
            F.round((yhat + F.col("qr")) / 100, 4).alias("hi"),
        )
    )


# ---------------------------------------------------------------------------
# Exact decision-stump training (best information-gain split)
# ---------------------------------------------------------------------------

STUMP_BUCKET = 1000  # candidate thresholds = price-bucket boundaries
STUMP_ROUND = 6


_STUMP_ENT = (
    "CASE WHEN {p} <= 0 OR {p} >= 1 THEN 0.0 "
    "ELSE -({p}) * LN({p}) - (1 - ({p})) * LN(1 - ({p})) END"
)


def _stump_oracle() -> str:
    ent = _STUMP_ENT
    hl = ent.format(p="CAST(posl AS DOUBLE) / nl")
    hr = ent.format(p="CAST(post - posl AS DOUBLE) / (nt - nl)")
    h0 = ent.format(p="CAST(post AS DOUBLE) / nt")
    gain = (
        f"ROUND({h0} - (CAST(nl AS DOUBLE) / nt) * ({hl})"
        f" - (CAST(nt - nl AS DOUBLE) / nt) * ({hr}), {STUMP_ROUND})"
    )
    return f"""
WITH d AS (
  SELECT CAST(FLOOR(o_totalprice / {STUMP_BUCKET}) AS BIGINT) AS pb,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders
),
hist AS (
  SELECT pb, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS pos
  FROM d GROUP BY pb
),
cum AS (
  SELECT pb,
         SUM(n)   OVER (ORDER BY pb) AS nl,
         SUM(pos) OVER (ORDER BY pb) AS posl,
         SUM(n)   OVER () AS nt,
         SUM(pos) OVER () AS post
  FROM hist
),
scored AS (
  SELECT pb AS threshold_bucket, nl, posl, nt, post,
         {gain} AS gain
  FROM cum WHERE nl > 0 AND nl < nt
)
SELECT CAST(threshold_bucket AS BIGINT) AS threshold_bucket,
       CAST((threshold_bucket + 1) * {STUMP_BUCKET} AS DOUBLE)
         AS threshold_price,
       CAST(nl AS BIGINT) AS n_left,
       CAST(nt - nl AS BIGINT) AS n_right,
       CAST(posl AS BIGINT) AS pos_left,
       CAST(post - posl AS BIGINT) AS pos_right,
       gain,
       ROUND((CAST(GREATEST(posl, nl - posl)
              + GREATEST(post - posl, (nt - nl) - (post - posl)) AS DOUBLE))
             / nt, {STUMP_ROUND}) AS train_accuracy
FROM scored
ORDER BY gain DESC, threshold_bucket
LIMIT 1
"""


@register(
    "decision_stump_train",
    oracle=_stump_oracle(),
    doc="EXACT decision-stump training in-engine: the best "
        "information-gain threshold on order value for predicting "
        "order finality (o_orderstatus = 'F'), found by EXHAUSTIVE "
        "search over every candidate split — affordable at 100 TB "
        "because candidates are value-bucket boundaries: one "
        "map-side-combinable histogram aggregate reduces the data to "
        "|buckets| (count, positives) rows, cumulative sums over that "
        "tiny table give every split's left/right class counts, and "
        "the entropy gain is computed per candidate from exact "
        "integers (0·log0 handled; gain rounded before the argmax "
        "rank so the selection is a cross-engine total order with the "
        "bucket tiebreak). Reports the chosen threshold, its exact "
        "split counts, the gain, and the stump's majority-vote "
        "training accuracy — the baseline every fancier in-engine "
        "model (logreg, NB) must beat, and the building block of "
        "boosted-stump scorers for data curation. The cumulative "
        "window runs over the bounded bucket histogram, never data.",
    tags=("learn", "tree", "statistics", "aggregate", "scale"),
)
def decision_stump_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_tables(spark, sf_dir, "orders")["orders"]
    d = orders.select(
        F.floor(F.col("o_totalprice") / STUMP_BUCKET).cast("long").alias("pb"),
        (F.col("o_orderstatus") == "F").cast("int").alias("y"),
    )
    hist = d.groupBy("pb").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")
    )
    wc = Window.orderBy("pb").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy()
    cum = hist.select(
        "pb",
        F.sum("n").over(wc).alias("nl"),
        F.sum("pos").over(wc).alias("posl"),
        F.sum("n").over(wt).alias("nt"),
        F.sum("pos").over(wt).alias("post"),
    ).where((F.col("nl") > 0) & (F.col("nl") < F.col("nt")))

    def ent(p):
        return (
            F.when((p <= 0) | (p >= 1), F.lit(0.0))
            .otherwise(-p * F.log(p) - (1 - p) * F.log(1 - p))
        )

    pl = F.col("posl").cast("double") / F.col("nl")
    pr = (F.col("post") - F.col("posl")).cast("double") / (
        F.col("nt") - F.col("nl")
    )
    p0 = F.col("post").cast("double") / F.col("nt")
    gain = F.round(
        ent(p0)
        - (F.col("nl").cast("double") / F.col("nt")) * ent(pl)
        - ((F.col("nt") - F.col("nl")).cast("double") / F.col("nt")) * ent(pr),
        STUMP_ROUND,
    )
    acc = F.round(
        (
            F.greatest(F.col("posl"), F.col("nl") - F.col("posl"))
            + F.greatest(
                F.col("post") - F.col("posl"),
                (F.col("nt") - F.col("nl")) - (F.col("post") - F.col("posl")),
            )
        ).cast("double")
        / F.col("nt"),
        STUMP_ROUND,
    )
    return (
        cum.select(
            F.col("pb").alias("threshold_bucket"),
            ((F.col("pb") + 1) * STUMP_BUCKET).cast("double").alias(
                "threshold_price"
            ),
            F.col("nl").cast("long").alias("n_left"),
            (F.col("nt") - F.col("nl")).cast("long").alias("n_right"),
            F.col("posl").cast("long").alias("pos_left"),
            (F.col("post") - F.col("posl")).cast("long").alias("pos_right"),
            gain.alias("gain"),
            acc.alias("train_accuracy"),
        )
        .orderBy(F.col("gain").desc(), "threshold_bucket")
        .limit(1)
    )


# ---------------------------------------------------------------------------
# Out-of-fold target encoding (leakage-protected categorical feature)
# ---------------------------------------------------------------------------

TE_FOLDS = 3
TE_SMOOTH = 20  # prior pseudo-count for the smoothed encoding
TE_ROUND = 6


def _te_oracle() -> str:
    from ytspark.operators.text import knuth_hash_sql

    fold = f"({knuth_hash_sql('o_orderkey')} % {TE_FOLDS})"
    return f"""
WITH d AS (
  SELECT o_custkey % 100 AS cat,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
         {fold} AS fold
  FROM orders
),
folds AS (
  SELECT cat, fold,
         CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS pos
  FROM d GROUP BY cat, fold
),
tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(pos) AS BIGINT) AS post
  FROM folds
),
oof AS (
  SELECT f.cat, f.fold AS held_out_fold,
         CAST(SUM(o.n) AS BIGINT) AS n_in,
         CAST(SUM(o.pos) AS BIGINT) AS pos_in
  FROM (SELECT DISTINCT cat, fold FROM folds) f
  JOIN folds o ON o.cat = f.cat AND o.fold <> f.fold
  GROUP BY 1, 2
)
SELECT oof.cat, held_out_fold, n_in, pos_in,
       ROUND((pos_in + {TE_SMOOTH} * (CAST(post AS DOUBLE) / nt))
             / (n_in + {TE_SMOOTH}), {TE_ROUND}) AS te_smoothed
FROM oof CROSS JOIN tot
"""


@register(
    "target_encode_oof",
    oracle=_te_oracle(),
    doc=f"OUT-OF-FOLD target encoding — the leakage-protected "
        "categorical feature every tabular training pipeline needs: "
        "each (category, fold) cell's encoding is the smoothed "
        "positive rate computed from the OTHER folds only "
        f"(smoothing: {TE_SMOOTH} pseudo-counts of the global prior), "
        "so no row's own label leaks into its feature. Fold "
        "assignment is the deterministic cross-engine Knuth hash of "
        "the row key (reproducible across retries/engines — no RNG). "
        "Plan: one (category, fold) aggregate over data — map-side "
        "combinable, shuffle O(|cats| x folds) — then the "
        "leave-fold-out sums are a self-join over that TINY grid, "
        "never a second data pass. Exact integer counts; one "
        "exactly-rounded division. The encoded value would join back "
        "to rows by (cat, fold) at feature-build time — the grid IS "
        "the feature table.",
    tags=("learn", "features", "encoding", "aggregate", "scale"),
)
def target_encode_oof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ytspark.operators.text import knuth_hash_col

    orders = load_tables(spark, sf_dir, "orders")["orders"]
    d = orders.select(
        (F.col("o_custkey") % 100).alias("cat"),
        (F.col("o_orderstatus") == "F").cast("int").alias("y"),
        F.pmod(knuth_hash_col(F.col("o_orderkey")), F.lit(TE_FOLDS)).alias(
            "fold"
        ),
    )
    folds = d.groupBy("cat", "fold").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")
    ).localCheckpoint(eager=True)  # tiny grid read by 3 consumers
    tot = folds.agg(
        F.sum("n").alias("nt"), F.sum("pos").alias("post")
    )
    cells = folds.select("cat", F.col("fold").alias("held_out_fold")).distinct()
    oof = (
        cells.join(
            folds.select(
                F.col("cat"), F.col("fold").alias("of"),
                F.col("n"), F.col("pos"),
            ),
            "cat",
        )
        .where(F.col("of") != F.col("held_out_fold"))
        .groupBy("cat", "held_out_fold")
        .agg(F.sum("n").alias("n_in"), F.sum("pos").alias("pos_in"))
    )
    prior = F.col("post").cast("double") / F.col("nt")
    return oof.crossJoin(F.broadcast(tot)).select(
        "cat",
        "held_out_fold",
        F.col("n_in").cast("long").alias("n_in"),
        F.col("pos_in").cast("long").alias("pos_in"),
        F.round(
            (F.col("pos_in") + TE_SMOOTH * prior) / (F.col("n_in") + TE_SMOOTH),
            TE_ROUND,
        ).alias("te_smoothed"),
    )


# ---------------------------------------------------------------------------
# Huber robust trend fit via IRLS (iteratively reweighted least squares)
# ---------------------------------------------------------------------------

HUBER_DELTA = 1.0  # Huber threshold in revenue-millions units
HUBER_ITERS = 2
HUBER_FIT_ROUND = 9  # per-iteration fit rounding: pins cross-engine parity


def _huber_oracle() -> str:
    delta = HUBER_DELTA
    fits = []
    prev_a, prev_b = "a0", "b0"
    for k in range(1, HUBER_ITERS + 1):
        fits.append(f"""
w{k} AS (
  SELECT x, y,
         CASE WHEN ABS(y - ({prev_a} + {prev_b} * x)) <= {delta}
              THEN 1.0
              ELSE {delta} / ABS(y - ({prev_a} + {prev_b} * x)) END AS w
  FROM daily CROSS JOIN f{k - 1}
),
f{k} AS (
  SELECT ROUND((SUM(w) * SUM(w * x * y) - SUM(w * x) * SUM(w * y))
               / (SUM(w) * SUM(w * x * x) - SUM(w * x) * SUM(w * x)),
               {HUBER_FIT_ROUND}) AS b{k},
         ROUND((SUM(w * y)
                - (SUM(w) * SUM(w * x * y) - SUM(w * x) * SUM(w * y))
                  / (SUM(w) * SUM(w * x * x) - SUM(w * x) * SUM(w * x))
                  * SUM(w * x)) / SUM(w), {HUBER_FIT_ROUND}) AS a{k}
  FROM w{k}
)""")
        prev_a, prev_b = f"a{k}", f"b{k}"
    chain = ",".join(fits)
    K = HUBER_ITERS
    return f"""
WITH daily AS (
  SELECT DATEDIFF('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS x,
         SUM(o_totalprice) / 1e6 AS y
  FROM orders GROUP BY 1
),
f0 AS (
  SELECT ROUND(REGR_SLOPE(y, x), {HUBER_FIT_ROUND}) AS b0,
         ROUND(REGR_INTERCEPT(y, x), {HUBER_FIT_ROUND}) AS a0
  FROM daily
),{chain}
SELECT CAST((SELECT COUNT(*) FROM daily) AS BIGINT) AS n_days,
       ROUND(f0.b0, 6) AS slope_ols,
       ROUND(f{K}.b{K}, 6) AS slope_huber,
       ROUND(f{K}.a{K}, 6) AS intercept_huber,
       CAST((SELECT SUM(CASE WHEN ABS(y - (f{K}.a{K} + f{K}.b{K} * x))
                              > {delta} THEN 1 ELSE 0 END)
             FROM daily) AS BIGINT) AS n_downweighted
FROM f0 CROSS JOIN f{K}
"""


@register(
    "huber_trend_irls",
    oracle=_huber_oracle(),
    doc=f"HUBER robust trend fit of daily revenue by {HUBER_ITERS} "
        "IRLS rounds: start from the OLS fit, downweight days whose "
        f"residual exceeds {HUBER_DELTA}M (w = delta/|r|, the Huber "
        "psi), refit WEIGHTED least squares in closed form, repeat. "
        "Between Theil-Sen (50% breakdown, O(n^2) slope pairs) and "
        "plain OLS (zero robustness), Huber-IRLS is the practical "
        "middle: each round is ONE map-side-combinable aggregate of "
        "five weighted moments over the daily rollup — no pair "
        "explosion, no sort. Every fit is rounded to "
        f"{HUBER_FIT_ROUND} dp before feeding the next round's "
        "weights, which pins the iteration to a cross-engine-"
        "identical trajectory (the same per-iteration rounding "
        "discipline as the BPE merge fold); the oracle replays the "
        "rounds as chained CTEs. Reports OLS vs Huber slope and how "
        "many days the final fit downweighted.",
    tags=("learn", "regression", "robust", "aggregate", "time"),
)
def huber_trend_irls(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    daily = orders.groupBy(
        F.datediff(
            F.to_date("o_orderdate"), F.lit("1992-01-01").cast("date")
        ).alias("x")
    ).agg((F.sum("o_totalprice") / F.lit(1e6)).alias("y")).localCheckpoint(
        eager=True
    )  # read by every IRLS round; O(days) rows
    fit = daily.agg(
        F.round(F.regr_slope("y", "x"), HUBER_FIT_ROUND).alias("b"),
        F.round(F.regr_intercept("y", "x"), HUBER_FIT_ROUND).alias("a"),
    )
    ols = fit
    for _ in range(HUBER_ITERS):
        r = F.col("y") - (F.col("a") + F.col("b") * F.col("x"))
        w = F.when(F.abs(r) <= HUBER_DELTA, F.lit(1.0)).otherwise(
            F.lit(HUBER_DELTA) / F.abs(r)
        )
        wd = daily.crossJoin(F.broadcast(fit)).select("x", "y", w.alias("w"))
        sums = wd.agg(
            F.sum("w").alias("sw"),
            F.sum(F.col("w") * F.col("x")).alias("swx"),
            F.sum(F.col("w") * F.col("y")).alias("swy"),
            F.sum(F.col("w") * F.col("x") * F.col("x")).alias("swx2"),
            F.sum(F.col("w") * F.col("x") * F.col("y")).alias("swxy"),
        )
        b = (
            F.col("sw") * F.col("swxy") - F.col("swx") * F.col("swy")
        ) / (F.col("sw") * F.col("swx2") - F.col("swx") * F.col("swx"))
        fit = sums.select(
            F.round(b, HUBER_FIT_ROUND).alias("b"),
            F.round(
                (F.col("swy") - b * F.col("swx")) / F.col("sw"),
                HUBER_FIT_ROUND,
            ).alias("a"),
        )
    n = daily.agg(F.count(F.lit(1)).alias("n_days"))
    resid = F.col("y") - (F.col("a") + F.col("b") * F.col("x"))
    down = (
        daily.crossJoin(F.broadcast(fit))
        .agg(
            F.sum(
                (F.abs(resid) > HUBER_DELTA).cast("int")
            ).alias("n_downweighted")
        )
    )
    return (
        n.crossJoin(F.broadcast(ols.select(F.round("b", 6).alias("slope_ols"))))
        .crossJoin(
            F.broadcast(
                fit.select(
                    F.round("b", 6).alias("slope_huber"),
                    F.round("a", 6).alias("intercept_huber"),
                )
            )
        )
        .crossJoin(F.broadcast(down))
        .select(
            F.col("n_days").cast("long").alias("n_days"),
            "slope_ols",
            "slope_huber",
            "intercept_huber",
            F.col("n_downweighted").cast("long").alias("n_downweighted"),
        )
    )


# ---------------------------------------------------------------------------
# K-fold cross-validation of the Naive Bayes language classifier
# ---------------------------------------------------------------------------

CV_FOLDS = 3


def _nb_cv_oracle() -> str:
    from ytspark.operators.text import knuth_hash_sql

    fold = f"({knuth_hash_sql('doc_id')} % {CV_FOLDS})"
    return f"""
WITH base AS (
  SELECT doc_id, lang, text, {fold} AS fold FROM documents
),
folds AS (SELECT UNNEST(RANGE(0, {CV_FOLDS})) AS f),
tok AS (
  SELECT doc_id, lang, fold, t AS tok
  FROM (SELECT doc_id, lang, fold, UNNEST(STRING_SPLIT(text, ' ')) AS t
        FROM base)
),
doc_tok AS (
  SELECT doc_id, fold, tok, COUNT(*) AS k FROM tok GROUP BY 1, 2, 3
),
doc_len AS (
  SELECT doc_id, lang, fold, COUNT(*) AS n_d FROM tok GROUP BY 1, 2, 3
),
class_tok AS (
  SELECT f.f, t.lang, t.tok, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM folds f JOIN tok t ON t.fold <> f.f
  GROUP BY 1, 2, 3
),
class_stats AS (
  SELECT f.f, t.lang, CAST(COUNT(*) AS BIGINT) AS toks_c
  FROM folds f JOIN tok t ON t.fold <> f.f
  GROUP BY 1, 2
),
priors AS (
  SELECT f.f, b.lang, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM folds f JOIN base b ON b.fold <> f.f
  GROUP BY 1, 2
),
consts AS (
  SELECT f.f,
         CAST(COUNT(DISTINCT t.tok) AS BIGINT) AS v,
         CAST(COUNT(DISTINCT t.doc_id) AS BIGINT) AS n
  FROM folds f JOIN tok t ON t.fold <> f.f
  GROUP BY 1
),
hits AS (
  SELECT d.doc_id, d.fold, c.lang, SUM(d.k * LN(c.cnt + 1)) AS s1
  FROM doc_tok d JOIN class_tok c ON c.tok = d.tok AND c.f = d.fold
  GROUP BY 1, 2, 3
),
scored AS (
  SELECT dl.doc_id, dl.fold, dl.lang AS true_lang, p.lang AS cand,
         ROUND(LN(CAST(p.n_docs AS DOUBLE) / k.n)
               - dl.n_d * LN(cs.toks_c + k.v)
               + COALESCE(h.s1, 0.0), {NB_ROUND}) AS score
  FROM doc_len dl
  JOIN priors p ON p.f = dl.fold
  JOIN class_stats cs ON cs.f = dl.fold AND cs.lang = p.lang
  JOIN consts k ON k.f = dl.fold
  LEFT JOIN hits h ON h.doc_id = dl.doc_id AND h.fold = dl.fold
                   AND h.lang = p.lang
),
pred AS (
  SELECT doc_id, fold, true_lang, cand AS pred_lang FROM (
    SELECT doc_id, fold, true_lang, cand,
           ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY score DESC, cand) AS rk
    FROM scored
  ) WHERE rk = 1
)
SELECT CAST(fold AS BIGINT) AS fold,
       CAST(COUNT(*) AS BIGINT) AS n_test,
       CAST(SUM(CASE WHEN pred_lang = true_lang THEN 1 ELSE 0 END)
            AS BIGINT) AS n_correct,
       ROUND(CAST(SUM(CASE WHEN pred_lang = true_lang THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS accuracy
FROM pred GROUP BY fold
"""


@register(
    "nb_crossval_metrics",
    oracle=_nb_cv_oracle(),
    doc=f"{CV_FOLDS}-FOLD CROSS-VALIDATION of the in-engine Naive "
        "Bayes language classifier: deterministic Knuth-hash folds, "
        "per-fold training statistics (class token counts, priors, "
        "vocabulary) computed from the OTHER folds only, every "
        "held-out document scored against its fold's model, per-fold "
        "accuracy reported. This is the honest generalization "
        "estimate the single-split classifier_eval_metrics cannot "
        "give — and the k-fold shape is affordable in-engine because "
        "training IS aggregation: each fold's model is the same "
        "map-side-combinable count aggregate restricted by one fold "
        "predicate (a folds x tokens join, the standard (k-1)x "
        f"training cost), never k retrainings of an external model. "
        "Per-fold vocabularies and priors differ by construction "
        "(that is the point), and the score replay is the same "
        f"{NB_ROUND}-dp-rounded argmax as the parent classifier.",
    tags=("learn", "evaluation", "classifier", "aggregate", "scale"),
)
def nb_crossval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ytspark.operators.text import knuth_hash_col

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    base = docs.select(
        "doc_id",
        "lang",
        "text",
        F.pmod(knuth_hash_col(F.col("doc_id")), F.lit(CV_FOLDS)).alias("fold"),
    )
    folds = spark.range(CV_FOLDS).select(F.col("id").cast("int").alias("f"))
    tok = base.select(
        "doc_id", "lang", "fold", F.explode(F.split("text", " ")).alias("tok")
    )
    doc_tok = tok.groupBy("doc_id", "fold", "tok").agg(
        F.count(F.lit(1)).alias("k")
    )
    doc_len = tok.groupBy("doc_id", "lang", "fold").agg(
        F.count(F.lit(1)).alias("n_d")
    )
    trn = folds.join(tok, F.col("fold") != F.col("f"))
    class_tok = trn.groupBy("f", "lang", "tok").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    class_stats = trn.groupBy("f", "lang").agg(
        F.count(F.lit(1)).alias("toks_c")
    )
    priors = (
        folds.join(base, F.col("fold") != F.col("f"))
        .groupBy("f", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    consts = trn.groupBy("f").agg(
        F.count_distinct("tok").alias("v"),
        F.count_distinct("doc_id").alias("n"),
    )
    ct = class_tok.select(
        F.col("f").alias("hf"),
        F.col("lang").alias("cand"),
        F.col("tok").alias("tk"),
        "cnt",
    )
    hits = (
        doc_tok.join(
            ct,
            (F.col("hf") == F.col("fold")) & (F.col("tk") == F.col("tok")),
        )
        .groupBy("doc_id", "fold", "cand")
        .agg(F.sum(F.col("k") * F.log(F.col("cnt") + 1)).alias("s1"))
    )
    classes = priors.join(class_stats, ["f", "lang"]).select(
        "f", F.col("lang").alias("cand"), "n_docs", "toks_c"
    )
    kf = consts.select(
        F.col("f").alias("cf"), F.col("v"), F.col("n")
    )
    scored = (
        doc_len.join(F.broadcast(classes), F.col("fold") == F.col("f"))
        .join(F.broadcast(kf), F.col("fold") == F.col("cf"))
        .join(hits, ["doc_id", "fold", "cand"], "left")
        .select(
            "doc_id",
            "fold",
            F.col("lang").alias("true_lang"),
            "cand",
            F.round(
                F.log(F.col("n_docs").cast("double") / F.col("n"))
                - F.col("n_d") * F.log(F.col("toks_c") + F.col("v"))
                + F.coalesce(F.col("s1"), F.lit(0.0)),
                NB_ROUND,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "cand")
    pred = (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("fold", "true_lang", F.col("cand").alias("pred_lang"))
    )
    return pred.groupBy(F.col("fold").cast("long").alias("fold")).agg(
        F.count(F.lit(1)).alias("n_test"),
        F.sum(
            (F.col("pred_lang") == F.col("true_lang")).cast("int")
        ).cast("long").alias("n_correct"),
        F.round(
            F.sum((F.col("pred_lang") == F.col("true_lang")).cast("int"))
            .cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("accuracy"),
    )


# ---------------------------------------------------------------------------
# Exact isotonic regression (PAV) over binned scores — max-min identity
# ---------------------------------------------------------------------------

ISO_BINS = 20
ISO_BIN_WIDTH = 30000.0  # o_totalprice bin width -> <=20 occupied bins


@register(
    "isotonic_calibration_pav",
    oracle=f"""
WITH raw AS (
  SELECT LEAST(CAST(FLOOR(o_totalprice / {ISO_BIN_WIDTH}) AS BIGINT),
               {ISO_BINS - 1}) AS bin,
         CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1 ELSE 0 END AS y
  FROM orders
),
bins AS (
  SELECT bin, COUNT(*) AS n, SUM(y) AS pos FROM raw GROUP BY bin
),
cum AS (
  SELECT bin, n, pos,
         SUM(n) OVER (ORDER BY bin) AS cn,
         SUM(pos) OVER (ORDER BY bin) AS cp
  FROM bins
),
intervals AS (
  SELECT j.bin AS jb, k.bin AS kb,
         (k.cp - (j.cp - j.pos)) * 1.0 / (k.cn - (j.cn - j.n)) AS mean_jk
  FROM cum j JOIN cum k ON j.bin <= k.bin
),
minmax AS (
  SELECT i.bin, iv.jb, MIN(iv.mean_jk) AS min_k
  FROM cum i JOIN intervals iv ON iv.jb <= i.bin AND iv.kb >= i.bin
  GROUP BY i.bin, iv.jb
)
SELECT c.bin, CAST(c.n AS BIGINT) AS n, CAST(c.pos AS BIGINT) AS pos,
       ROUND(c.pos * 1.0 / c.n, 6) AS raw_rate,
       ROUND(m.iso, 6) AS iso_rate
FROM cum c JOIN (
  SELECT bin, MAX(min_k) AS iso FROM minmax GROUP BY bin
) m USING (bin)
""",
    doc="EXACT ISOTONIC REGRESSION (pool-adjacent-violators) of the "
        "urgent-order rate against the order-value score, the "
        "standard calibration step after training any scorer "
        "(complements logreg_calibration_report's reliability "
        "diagram): the PAV fit is computed by its closed-form max-min "
        "identity iso_i = max_{{j<=i}} min_{{k>=i}} mean(y, bins "
        "j..k), which needs no iteration and no driver state — ONE "
        f"binning aggregate reduces the fact table to <={ISO_BINS} "
        "(bin, n, pos) rows, cumulative sums run over that bounded "
        "bin table, and the max-min evaluates on the <=B^2 interval "
        "lattice with exact integer numerators/denominators (IEEE "
        "division of identical integers is bit-identical cross-"
        "engine; rounding is display-only). The fitted curve is the "
        "unique monotone least-squares calibration map — apply it at "
        "serving time as a broadcast lookup. Scale: the only "
        "data-sized pass is the binning aggregate; everything after "
        "is constant-size lattice math — the same envelope as the "
        "Shapley and bootstrap operators.",
    tags=("learn", "calibration", "statistics", "aggregate"),
)
def isotonic_calibration_pav(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_tables(spark, sf_dir, "orders")["orders"]
    raw = orders.select(
        F.least(
            F.floor(F.col("o_totalprice") / F.lit(ISO_BIN_WIDTH)).cast("long"),
            F.lit(ISO_BINS - 1),
        ).alias("bin"),
        F.col("o_orderpriority")
        .isin("1-URGENT", "2-HIGH")
        .cast("int")
        .alias("y"),
    )
    bins = raw.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")
    )
    # cumulative sums over the <=ISO_BINS-row bin table (bounded by
    # construction — EXPECTED_GLOBAL_WINDOW)
    ow = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = bins.select(
        "bin",
        "n",
        "pos",
        F.sum("n").over(ow).alias("cn"),
        F.sum("pos").over(ow).alias("cp"),
    ).localCheckpoint(eager=True)  # tiny; read 3x below
    j = cum.select(
        F.col("bin").alias("jb"),
        (F.col("cp") - F.col("pos")).alias("cp_before"),
        (F.col("cn") - F.col("n")).alias("cn_before"),
    )
    k = cum.select(
        F.col("bin").alias("kb"),
        F.col("cp").alias("cp_k"),
        F.col("cn").alias("cn_k"),
    )
    intervals = j.join(k, F.col("jb") <= F.col("kb")).select(
        "jb",
        "kb",
        (
            (F.col("cp_k") - F.col("cp_before"))
            * 1.0
            / (F.col("cn_k") - F.col("cn_before"))
        ).alias("mean_jk"),
    )
    i = cum.select(F.col("bin").alias("ib"))
    minmax = (
        i.join(
            intervals,
            (F.col("jb") <= F.col("ib")) & (F.col("kb") >= F.col("ib")),
        )
        .groupBy("ib", "jb")
        .agg(F.min("mean_jk").alias("min_k"))
        .groupBy("ib")
        .agg(F.max("min_k").alias("iso"))
    )
    return (
        cum.join(minmax, F.col("bin") == F.col("ib"))
        .select(
            "bin",
            F.col("n").cast("long").alias("n"),
            F.col("pos").cast("long").alias("pos"),
            F.round(F.col("pos") * 1.0 / F.col("n"), 6).alias("raw_rate"),
            F.round(F.col("iso"), 6).alias("iso_rate"),
        )
    )


# ---------------------------------------------------------------------------
# Leave-one-source-out NB data valuation (additive sufficient statistics)
# ---------------------------------------------------------------------------

_NBV_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, lang, source, t AS tok
  FROM (SELECT doc_id, lang, source,
               UNNEST(STRING_SPLIT(text, ' ')) AS t
        FROM documents)
),
doc_tok AS (
  SELECT doc_id, source, tok, COUNT(*) AS k
  FROM tok GROUP BY doc_id, source, tok
),
doc_meta AS (
  SELECT doc_id, lang, source, COUNT(*) AS n_d
  FROM tok GROUP BY doc_id, lang, source
),
ct AS (SELECT lang, tok, COUNT(*) AS cnt FROM tok GROUP BY lang, tok),
cts AS (
  SELECT source, lang, tok, COUNT(*) AS cnt_s
  FROM tok GROUP BY source, lang, tok
),
cs AS (SELECT lang, COUNT(*) AS toks_c FROM tok GROUP BY lang),
css AS (
  SELECT source, lang, COUNT(*) AS toks_s FROM tok GROUP BY source, lang
),
pr AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
prs AS (
  SELECT source, lang, COUNT(*) AS n_docs_s
  FROM documents GROUP BY source, lang
),
consts AS (
  SELECT (SELECT COUNT(DISTINCT tok) FROM tok) AS v,
         (SELECT COUNT(*) FROM documents) AS n,
         (SELECT COUNT(DISTINCT lang) FROM documents) AS l,
         (SELECT COUNT(DISTINCT source) FROM documents) AS n_src
),
src_n AS (SELECT source, COUNT(*) AS docs_s FROM documents GROUP BY source),
hits AS (
  SELECT d.doc_id, d.source, c.lang,
         SUM(d.k * LN(c.cnt + 1)) AS s1f,
         SUM(d.k * LN(c.cnt - COALESCE(x.cnt_s, 0) + 1)) AS s1l
  FROM doc_tok d
  JOIN ct c ON c.tok = d.tok
  LEFT JOIN cts x ON x.source = d.source AND x.lang = c.lang
                 AND x.tok = d.tok
  GROUP BY d.doc_id, d.source, c.lang
),
scored AS (
  SELECT dm.doc_id, dm.lang AS true_lang, dm.source, p.lang AS cand,
         ROUND(LN((p.n_docs + 1.0) / (k.n + k.l))
               - dm.n_d * LN(cs.toks_c + k.v)
               + COALESCE(h.s1f, 0.0), 6) AS score_f,
         ROUND(LN((p.n_docs - COALESCE(ps.n_docs_s, 0) + 1.0)
                  / (k.n - sn.docs_s + k.l))
               - dm.n_d * LN(cs.toks_c - COALESCE(xs.toks_s, 0) + k.v)
               + COALESCE(h.s1l, 0.0), 6) AS score_l
  FROM doc_meta dm
  CROSS JOIN pr p
  JOIN cs ON cs.lang = p.lang
  CROSS JOIN consts k
  JOIN src_n sn ON sn.source = dm.source
  LEFT JOIN prs ps ON ps.source = dm.source AND ps.lang = p.lang
  LEFT JOIN css xs ON xs.source = dm.source AND xs.lang = p.lang
  LEFT JOIN hits h ON h.doc_id = dm.doc_id AND h.lang = p.lang
),
pred2 AS (
  SELECT doc_id, true_lang, source,
         FIRST(cand ORDER BY score_f DESC, cand) AS pred_f,
         FIRST(cand ORDER BY score_l DESC, cand) AS pred_l
  FROM scored GROUP BY doc_id, true_lang, source
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN pred_f = true_lang THEN 1 ELSE 0 END) AS BIGINT)
         AS correct_full,
       CAST(SUM(CASE WHEN pred_l = true_lang THEN 1 ELSE 0 END) AS BIGINT)
         AS correct_logo,
       ROUND(SUM(CASE WHEN pred_f = true_lang THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 6) AS acc_full,
       ROUND(SUM(CASE WHEN pred_l = true_lang THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 6) AS acc_logo,
       ROUND((SUM(CASE WHEN pred_f = true_lang THEN 1 ELSE 0 END)
              - SUM(CASE WHEN pred_l = true_lang THEN 1 ELSE 0 END)) * 1.0
             / COUNT(*), 6) AS self_gain
FROM pred2 GROUP BY source
"""


@register(
    "nb_source_valuation",
    oracle=_NBV_ORACLE,
    doc="LEAVE-ONE-SOURCE-OUT DATA VALUATION of the Naive Bayes "
        "language classifier — the per-source contribution audit a "
        "corpus-mixing pipeline runs before pruning or reweighting "
        "sources: for every source, score its documents under the "
        "FULL model and under the model retrained WITHOUT that "
        "source, and report accuracy on the source's own docs both "
        "ways; the gap (self_gain) measures how much each source's "
        "presence in training explains its own predictions — the "
        "memorization-vs-generalization signal. The trick that makes "
        "20 'retrains' ONE pass: multinomial-NB sufficient statistics "
        "(class-token counts, class token totals, priors) are "
        "ADDITIVE, so the held-out model's parameters are the global "
        "tables minus the source's own (source, lang, tok) slice, "
        "joined in next to the global counts — no per-holdout "
        "training jobs, just one extra bounded side table per "
        "statistic. Both scores share one doc-token join; argmaxes "
        "are rank windows partitioned by doc with a candidate "
        "tiebreak, scores rounded to 6 dp first (the NB convention). "
        "The vocabulary smoothing constant V is held at the full-"
        "corpus vocabulary across holdouts (documented fixed-"
        "smoothing simplification; distinct counts are the one "
        "non-additive statistic). Priors are Laplace-smoothed so a "
        "lang concentrated in one source never hits ln(0). Scale: "
        "the data-sized work is the token explode + the doc_tok x "
        "class join, identical to lang_nb_classifier; every "
        "valuation-specific table is bounded by |sources| x |langs| "
        "x |vocab|.",
    tags=("learn", "evaluation", "text", "aggregate"),
)
def nb_source_valuation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    tok = docs.select(
        "doc_id",
        "lang",
        "source",
        F.explode(F.split(F.col("text"), " ")).alias("tok"),
    )
    doc_tok = tok.groupBy("doc_id", "source", "tok").agg(
        F.count(F.lit(1)).alias("k")
    )
    doc_meta = tok.groupBy("doc_id", "lang", "source").agg(
        F.count(F.lit(1)).alias("n_d")
    )
    ct = tok.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    cts = tok.groupBy("source", "lang", "tok").agg(
        F.count(F.lit(1)).alias("cnt_s")
    )
    cs = tok.groupBy("lang").agg(F.count(F.lit(1)).alias("toks_c"))
    css = tok.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("toks_s")
    )
    pr = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    prs = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs_s")
    )
    src_n = docs.groupBy("source").agg(F.count(F.lit(1)).alias("docs_s"))
    consts = docs.crossJoin(
        tok.agg(F.countDistinct("tok").alias("v"))
    ).agg(
        F.any_value("v").alias("v"),
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("lang").alias("l"),
    )
    hits = (
        doc_tok.join(ct, "tok")
        .join(
            cts.withColumnRenamed("cnt_s", "cnt_s_x"),
            ["source", "lang", "tok"],
            "left",
        )
        .groupBy("doc_id", "source", "lang")
        .agg(
            F.sum(F.col("k") * F.log(F.col("cnt") + 1)).alias("s1f"),
            F.sum(
                F.col("k")
                * F.log(
                    F.col("cnt") - F.coalesce(F.col("cnt_s_x"), F.lit(0)) + 1
                )
            ).alias("s1l"),
        )
    )
    cand = pr.join(cs, "lang").select(
        F.col("lang").alias("cand"), "n_docs", "toks_c"
    )
    scored = (
        doc_meta.crossJoin(F.broadcast(cand))
        .crossJoin(F.broadcast(consts))
        .join(F.broadcast(src_n), "source")
        .join(
            F.broadcast(
                prs.select(
                    "source", F.col("lang").alias("cand"), "n_docs_s"
                )
            ),
            ["source", "cand"],
            "left",
        )
        .join(
            F.broadcast(
                css.select("source", F.col("lang").alias("cand"), "toks_s")
            ),
            ["source", "cand"],
            "left",
        )
        .join(
            hits.select(
                "doc_id", F.col("lang").alias("cand"), "s1f", "s1l"
            ),
            ["doc_id", "cand"],
            "left",
        )
        .select(
            "doc_id",
            F.col("lang").alias("true_lang"),
            "source",
            "cand",
            F.round(
                F.log((F.col("n_docs") + 1.0) / (F.col("n") + F.col("l")))
                - F.col("n_d") * F.log(F.col("toks_c") + F.col("v"))
                + F.coalesce(F.col("s1f"), F.lit(0.0)),
                6,
            ).alias("score_f"),
            F.round(
                F.log(
                    (
                        F.col("n_docs")
                        - F.coalesce(F.col("n_docs_s"), F.lit(0))
                        + 1.0
                    )
                    / (F.col("n") - F.col("docs_s") + F.col("l"))
                )
                - F.col("n_d")
                * F.log(
                    F.col("toks_c")
                    - F.coalesce(F.col("toks_s"), F.lit(0))
                    + F.col("v")
                )
                + F.coalesce(F.col("s1l"), F.lit(0.0)),
                6,
            ).alias("score_l"),
        )
    )
    wf = Window.partitionBy("doc_id").orderBy(
        F.desc("score_f"), F.asc("cand")
    )
    wl = Window.partitionBy("doc_id").orderBy(
        F.desc("score_l"), F.asc("cand")
    )
    pred = (
        scored.withColumn("rf", F.row_number().over(wf))
        .withColumn("rl", F.row_number().over(wl))
        .groupBy("doc_id", "true_lang", "source")
        .agg(
            F.max(F.when(F.col("rf") == 1, F.col("cand"))).alias("pred_f"),
            F.max(F.when(F.col("rl") == 1, F.col("cand"))).alias("pred_l"),
        )
    )
    hit_f = (F.col("pred_f") == F.col("true_lang")).cast("long")
    hit_l = (F.col("pred_l") == F.col("true_lang")).cast("long")
    return pred.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(hit_f).alias("correct_full"),
        F.sum(hit_l).alias("correct_logo"),
        F.round(F.sum(hit_f) * 1.0 / F.count(F.lit(1)), 6).alias("acc_full"),
        F.round(F.sum(hit_l) * 1.0 / F.count(F.lit(1)), 6).alias("acc_logo"),
        F.round(
            (F.sum(hit_f) - F.sum(hit_l)) * 1.0 / F.count(F.lit(1)), 6
        ).alias("self_gain"),
    )


# ---------------------------------------------------------------------------
# Weight-of-evidence encoding + information value
# ---------------------------------------------------------------------------

WOE_SMOOTH = "0.5"  # Laplace half-count on both class shares
WOE_FEATURES = (("nation", "c_nationkey"), ("segment", "c_mktsegment"))


def _woe_oracle() -> str:
    parts = []
    for fname, col in WOE_FEATURES:
        parts.append(f"""
SELECT '{fname}' AS feature, CAST({col} AS VARCHAR) AS category,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(y) AS BIGINT) AS pos,
       ROUND(LN(((SUM(y) + {WOE_SMOOTH}) / (MAX(tp) + {WOE_SMOOTH}))
                / ((COUNT(*) - SUM(y) + {WOE_SMOOTH})
                   / (MAX(tn) + {WOE_SMOOTH}))), 6) AS woe,
       ROUND(((SUM(y) + {WOE_SMOOTH}) / (MAX(tp) + {WOE_SMOOTH})
              - (COUNT(*) - SUM(y) + {WOE_SMOOTH})
                / (MAX(tn) + {WOE_SMOOTH}))
             * LN(((SUM(y) + {WOE_SMOOTH}) / (MAX(tp) + {WOE_SMOOTH}))
                  / ((COUNT(*) - SUM(y) + {WOE_SMOOTH})
                     / (MAX(tn) + {WOE_SMOOTH}))), 6) AS iv_term
FROM (
  SELECT {col},
         CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END AS y,
         SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) OVER () AS tp,
         SUM(CASE WHEN c_acctbal < 0 THEN 0 ELSE 1 END) OVER () AS tn
  FROM customer
)
GROUP BY {col}
""")
    return " UNION ALL ".join(parts)


@register(
    "woe_encoding_iv",
    oracle=_woe_oracle(),
    doc="WEIGHT-OF-EVIDENCE encoding + INFORMATION VALUE — the "
        "credit-scoring-standard categorical encoder that complements "
        "target_encode_oof's mean encoding: per category, WOE = "
        "ln(share of positives / share of negatives), Laplace-"
        f"smoothed by {WOE_SMOOTH} on both shares so single-class "
        "categories stay finite, with the category's information-"
        "value term (pos_share - neg_share) * WOE — summing iv_term "
        "per feature gives the screening statistic (IV > 0.3 = "
        "strong predictor) a feature-selection pass ranks columns "
        "by. Target: delinquent account (balance < 0); features: "
        "customer nation and market segment, one report row per "
        "category. Scale shape: ONE aggregate per feature over the "
        "dim scan with the class totals as window-free broadcast "
        "scalars folded in as MAX of a constant column — no joins, "
        "no windows over data. All counts exact integers; the two "
        "log expressions round at 6 dp.",
    tags=("learn", "encoding", "statistics", "aggregate"),
)
def woe_encoding_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_tables(spark, sf_dir, "customer")["customer"]
    y = (F.col("c_acctbal") < 0).cast("int")
    tot = cust.agg(
        F.sum(y).alias("tp"), F.sum(1 - y).alias("tn")
    )
    sm = float(WOE_SMOOTH)
    out = None
    for fname, col in WOE_FEATURES:
        grp = (
            cust.select(F.col(col).cast("string").alias("category"), y.alias("y"))
            .groupBy("category")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos"))
            .crossJoin(F.broadcast(tot))
        )
        pos_share = (F.col("pos") + sm) / (F.col("tp") + sm)
        neg_share = (F.col("n") - F.col("pos") + sm) / (F.col("tn") + sm)
        woe = F.log(pos_share / neg_share)
        row = grp.select(
            F.lit(fname).alias("feature"),
            "category",
            F.col("n").cast("long").alias("n"),
            F.col("pos").cast("long").alias("pos"),
            F.round(woe, 6).alias("woe"),
            F.round((pos_share - neg_share) * woe, 6).alias("iv_term"),
        )
        out = row if out is None else out.unionByName(row)
    return out


# ---------------------------------------------------------------------------
# Empirical-Bayes shrinkage of per-group rates (beta-binomial MoM prior)
# ---------------------------------------------------------------------------


@register(
    "eb_shrunk_nation_rates",
    oracle="""
WITH g AS (
  SELECT c_nationkey AS nation, COUNT(*) AS n,
         SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS c
  FROM customer GROUP BY c_nationkey
),
mom AS (
  SELECT AVG(c * 1.0 / n) AS m,
         SUM((c * 1.0 / n - (SELECT AVG(c * 1.0 / n) FROM g))
             * (c * 1.0 / n - (SELECT AVG(c * 1.0 / n) FROM g)))
           / (COUNT(*) - 1) AS v
  FROM g
),
prior AS (
  SELECT m, v,
         GREATEST(m * (1 - m) / v - 1, 1.0) AS k
  FROM mom
)
SELECT CAST(g.nation AS BIGINT) AS nation,
       CAST(g.n AS BIGINT) AS n_customers,
       CAST(g.c AS BIGINT) AS n_delinquent,
       ROUND(g.c * 1.0 / g.n, 6) AS raw_rate,
       ROUND(p.m, 6) AS prior_mean,
       ROUND(p.k, 6) AS prior_strength,
       ROUND((g.c + p.m * p.k) / (g.n + p.k), 6) AS shrunk_rate
FROM g CROSS JOIN prior p
""",
    doc="EMPIRICAL-BAYES SHRINKAGE of per-nation delinquency rates — "
        "the small-area-estimation move every per-segment dashboard "
        "needs when some groups are tiny and their raw rates are "
        "noise: fit a beta-binomial prior by method of moments over "
        "the observed group rates (prior mean m = mean rate, prior "
        "strength k = m(1-m)/var - 1, floored at 1 so a degenerate "
        "variance cannot flip the sign), then report each group's "
        "posterior mean (c + m*k)/(n + k) next to its raw rate — "
        "small groups shrink hard toward the global mean, large "
        "groups barely move, and downstream ranking by shrunk_rate "
        "stops rewarding lucky small samples (the same machinery "
        "behind ratings shrinkage and CTR priors). ONE groupBy over "
        "the scan reduces to |groups| rows; the prior is two "
        "constant-size aggregates over that tiny table broadcast "
        "back as a one-row scalar. Deterministic: sample variance "
        "with the explicit (n-1) divisor written identically in "
        "both engines, everything else integer counts and 6-dp "
        "rounded ratios.",
    tags=("learn", "statistics", "aggregate", "quality"),
)
def eb_shrunk_nation_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_tables(spark, sf_dir, "customer")["customer"]
    g = cust.groupBy(F.col("c_nationkey").alias("nation")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("c_acctbal") < 0).cast("int")).alias("c"),
    )
    rate = F.col("c") * 1.0 / F.col("n")
    m_df = g.agg(F.avg(rate).alias("m"))
    mom = (
        g.crossJoin(F.broadcast(m_df))
        .agg(
            F.any_value("m").alias("m"),
            (
                F.sum((rate - F.col("m")) * (rate - F.col("m")))
                / (F.count(F.lit(1)) - 1)
            ).alias("v"),
        )
        .select(
            "m",
            "v",
            F.greatest(
                F.col("m") * (1 - F.col("m")) / F.col("v") - 1, F.lit(1.0)
            ).alias("k"),
        )
    )
    return g.crossJoin(F.broadcast(mom)).select(
        F.col("nation").cast("long").alias("nation"),
        F.col("n").cast("long").alias("n_customers"),
        F.col("c").cast("long").alias("n_delinquent"),
        F.round(rate, 6).alias("raw_rate"),
        F.round(F.col("m"), 6).alias("prior_mean"),
        F.round(F.col("k"), 6).alias("prior_strength"),
        F.round(
            (F.col("c") + F.col("m") * F.col("k")) / (F.col("n") + F.col("k")),
            6,
        ).alias("shrunk_rate"),
    )


# ---------------------------------------------------------------------------
# Ridge regression regularization path (closed form on centered moments)
# ---------------------------------------------------------------------------

RIDGE_LAMBDAS = (0.0, 1e2, 1e4, 1e6)

# centered second moments from the SAME 10 exact sums the normal-
# equations fit aggregates; identical expression text on both engines
_RIDGE_CENTER = """
  (s11 - sx1 * sx1 / n) AS c11,
  (s12 - sx1 * sx2 / n) AS c12,
  (s22 - sx2 * sx2 / n) AS c22,
  (s1y - sx1 * sy / n) AS c1y,
  (s2y - sx2 * sy / n) AS c2y,
  (syy - sy * sy / n) AS cyy,
  n AS n,
  sx1 AS sx1,
  sx2 AS sx2,
  sy AS sy
"""
_RIDGE_DET = "((c11 + lam) * (c22 + lam) - c12 * c12)"
_RIDGE_B1 = f"((c1y * (c22 + lam) - c12 * c2y) / {_RIDGE_DET})"
_RIDGE_B2 = f"((c2y * (c11 + lam) - c12 * c1y) / {_RIDGE_DET})"
_RIDGE_FINAL = f"""
  lam,
  ROUND({_RIDGE_B1}, 6) AS b1,
  ROUND({_RIDGE_B2}, 6) AS b2,
  ROUND(sy / n - {_RIDGE_B1} * sx1 / n - {_RIDGE_B2} * sx2 / n, 6)
    AS intercept,
  ROUND(1 - (cyy - 2 * ({_RIDGE_B1} * c1y + {_RIDGE_B2} * c2y)
                 + {_RIDGE_B1} * {_RIDGE_B1} * c11
                 + 2 * {_RIDGE_B1} * {_RIDGE_B2} * c12
                 + {_RIDGE_B2} * {_RIDGE_B2} * c22) / cyy, 6) AS train_r2
"""
_RIDGE_LAM_SQL = " UNION ALL ".join(
    f"SELECT CAST({v} AS DOUBLE) AS lam" for v in RIDGE_LAMBDAS
)


@register(
    "ridge_regression_path",
    oracle=f"""
WITH feats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS x1,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12, 2))) AS DOUBLE) AS x2,
         l_orderkey AS ok
  FROM lineitem GROUP BY l_orderkey
),
d AS (
  SELECT f.x1, f.x2,
         CAST(CAST(o.o_totalprice AS DECIMAL(18, 2)) AS DOUBLE) AS y
  FROM orders o JOIN feats f ON o.o_orderkey = f.ok
),
g AS (
  SELECT
    CAST(COUNT(*) AS DOUBLE) AS n,
    CAST(SUM(CAST(x1 AS DECIMAL(18, 2))) AS DOUBLE) AS sx1,
    CAST(SUM(CAST(x2 AS DECIMAL(18, 2))) AS DOUBLE) AS sx2,
    CAST(SUM(CAST(y AS DECIMAL(18, 2))) AS DOUBLE) AS sy,
    CAST(SUM(CAST(x1 AS DECIMAL(18, 2)) * CAST(x1 AS DECIMAL(18, 2)))
         AS DOUBLE) AS s11,
    CAST(SUM(CAST(x1 AS DECIMAL(18, 2)) * CAST(x2 AS DECIMAL(18, 2)))
         AS DOUBLE) AS s12,
    CAST(SUM(CAST(x2 AS DECIMAL(18, 2)) * CAST(x2 AS DECIMAL(18, 2)))
         AS DOUBLE) AS s22,
    CAST(SUM(CAST(x1 AS DECIMAL(18, 2)) * CAST(y AS DECIMAL(18, 2)))
         AS DOUBLE) AS s1y,
    CAST(SUM(CAST(x2 AS DECIMAL(18, 2)) * CAST(y AS DECIMAL(18, 2)))
         AS DOUBLE) AS s2y,
    CAST(SUM(CAST(y AS DECIMAL(18, 2)) * CAST(y AS DECIMAL(18, 2)))
         AS DOUBLE) AS syy
  FROM d
),
c AS (SELECT {_RIDGE_CENTER} FROM g),
lams AS ({_RIDGE_LAM_SQL})
SELECT {_RIDGE_FINAL} FROM c CROSS JOIN lams
""",
    doc="RIDGE REGRESSION REGULARIZATION PATH — the L2-penalized "
        "extension of regression_normal_equations, one row per "
        f"lambda in {RIDGE_LAMBDAS}: coefficients solve the CENTERED "
        "2x2 system (Sxx + lambda*I) b = Sxy (centering exempts the "
        "intercept from the penalty, the standard formulation), so "
        "the whole path derives from the SAME ten exact DECIMAL sums "
        "as the unpenalized fit — ONE data pass for every lambda, "
        "never a pass per hyperparameter; the path is a constant-"
        "size expression over the Gram moments, which is why ridge "
        "paths are cheap at 100 TB while lasso needs iteration. "
        "lambda=0 reproduces the OLS solution (cross-checked against "
        "regression_normal_equations by construction); train R^2 is "
        "computed from the centered moments via the quadratic-form "
        "identity, monotonically decreasing along the path. Both "
        "engines evaluate the identical Cramer/R^2 expression text "
        "over bit-identical sums.",
    tags=("learn", "regression", "aggregate", "scale"),
)
def ridge_regression_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    feats = t["lineitem"].groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.count(F.lit(1)).cast("double").alias("x1"),
        F.sum(F.col("l_quantity").cast("decimal(12,2)"))
        .cast("double")
        .alias("x2"),
    )
    d = t["orders"].join(feats, F.col("o_orderkey") == F.col("ok")).select(
        "x1",
        "x2",
        F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("y"),
    )
    dec = "CAST({c} AS DECIMAL(18, 2))"
    g = d.selectExpr(
        *[f"{dec.format(c=c)} AS {c}" for c in ("x1", "x2", "y")]
    ).selectExpr(
        "CAST(COUNT(*) AS DOUBLE) AS n",
        "CAST(SUM(x1) AS DOUBLE) AS sx1",
        "CAST(SUM(x2) AS DOUBLE) AS sx2",
        "CAST(SUM(y) AS DOUBLE) AS sy",
        "CAST(SUM(x1 * x1) AS DOUBLE) AS s11",
        "CAST(SUM(x1 * x2) AS DOUBLE) AS s12",
        "CAST(SUM(x2 * x2) AS DOUBLE) AS s22",
        "CAST(SUM(x1 * y) AS DOUBLE) AS s1y",
        "CAST(SUM(x2 * y) AS DOUBLE) AS s2y",
        "CAST(SUM(y * y) AS DOUBLE) AS syy",
    )
    c = g.selectExpr(*[e.strip() for e in _RIDGE_CENTER.split(",\n")])
    lams = F.broadcast(
        spark.createDataFrame([(float(v),) for v in RIDGE_LAMBDAS], "lam double")
    )
    return c.crossJoin(lams).selectExpr(
        *[e.strip() for e in _RIDGE_FINAL.split(",\n")]
    )


# ---------------------------------------------------------------------------
# Gradient-boosted stumps (squared loss, closed form on the histogram)
# ---------------------------------------------------------------------------

GBM_LR = "0.5"  # shrinkage (shared expression text)
GBM_ROUNDS = 2


def _gbm_oracle() -> str:
    lr = GBM_LR
    dec = "CAST(o_totalprice AS DECIMAL(18, 2))"
    return f"""
WITH hist AS (
  SELECT CAST(FLOOR(o_totalprice / {STUMP_BUCKET}) AS BIGINT) AS pb,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM({dec}) AS DOUBLE) AS s,
         CAST(SUM({dec} * {dec}) AS DOUBLE) AS s2
  FROM orders GROUP BY 1
),
tot AS (SELECT SUM(n) AS nt, SUM(s) AS st FROM hist),
r1 AS (
  SELECT pb, n, s, s2, s - n * (tot.st / tot.nt) AS rs, tot.st / tot.nt AS f0
  FROM hist CROSS JOIN tot
),
c1 AS (
  SELECT pb, rs, f0,
         SUM(n)  OVER (ORDER BY pb) AS nl,
         SUM(rs) OVER (ORDER BY pb) AS sl,
         SUM(n)  OVER () AS ntt,
         SUM(rs) OVER () AS stt
  FROM r1
),
t1 AS (
  SELECT pb AS t, sl / nl AS lv, (stt - sl) / (ntt - nl) AS rv
  FROM c1 WHERE nl > 0 AND nl < ntt
  ORDER BY ROUND(sl * sl / nl + (stt - sl) * (stt - sl) / (ntt - nl), 6)
           DESC, pb
  LIMIT 1
),
f1 AS (
  SELECT r1.pb, r1.n, r1.s, r1.s2,
         r1.f0 + {lr} * (CASE WHEN r1.pb <= t1.t THEN t1.lv ELSE t1.rv END)
           AS f
  FROM r1 CROSS JOIN t1
),
m0 AS (SELECT SUM(s2 - 2 * f0 * s + n * f0 * f0) / SUM(n) AS v0 FROM r1),
m1 AS (SELECT SUM(s2 - 2 * f * s + n * f * f) / SUM(n) AS mse FROM f1),
r2 AS (SELECT pb, n, s, s2, f, s - n * f AS rs FROM f1),
c2 AS (
  SELECT pb, rs,
         SUM(n)  OVER (ORDER BY pb) AS nl,
         SUM(rs) OVER (ORDER BY pb) AS sl,
         SUM(n)  OVER () AS ntt,
         SUM(rs) OVER () AS stt
  FROM r2
),
t2 AS (
  SELECT pb AS t, sl / nl AS lv, (stt - sl) / (ntt - nl) AS rv
  FROM c2 WHERE nl > 0 AND nl < ntt
  ORDER BY ROUND(sl * sl / nl + (stt - sl) * (stt - sl) / (ntt - nl), 6)
           DESC, pb
  LIMIT 1
),
f2 AS (
  SELECT r2.pb, r2.n, r2.s, r2.s2,
         r2.f + {lr} * (CASE WHEN r2.pb <= t2.t THEN t2.lv ELSE t2.rv END)
           AS f
  FROM r2 CROSS JOIN t2
),
m2 AS (SELECT SUM(s2 - 2 * f * s + n * f * f) / SUM(n) AS mse FROM f2)
SELECT CAST(1 AS BIGINT) AS round,
       CAST(t1.t AS BIGINT) AS threshold_bucket,
       ROUND({lr} * t1.lv, 4) AS left_add,
       ROUND({lr} * t1.rv, 4) AS right_add,
       -- O(1) ratio to the round-0 variance: the raw MSE is an
       -- engine-ordered double sum at ~1e10 magnitude where a 2 dp
       -- grain sits within one boundary-crossing of the cross-build
       -- error (env_sensitivity_audit class SIGDIG); the ratio's
       -- independent ulp errors cancel to ~1e-14 relative
       ROUND(m1.mse / m0.v0, 6) AS mse_ratio
FROM t1 CROSS JOIN m1 CROSS JOIN m0
UNION ALL
SELECT CAST(2 AS BIGINT), CAST(t2.t AS BIGINT),
       ROUND({lr} * t2.lv, 4), ROUND({lr} * t2.rv, 4),
       ROUND(m2.mse / m0.v0, 6)
FROM t2 CROSS JOIN m2 CROSS JOIN m0
"""


@register(
    "gradient_boosted_stumps",
    oracle=_gbm_oracle(),
    doc=f"GRADIENT-BOOSTED STUMPS (squared loss, {GBM_ROUNDS} rounds, "
        f"shrinkage {GBM_LR}) trained entirely in closed form: "
        f"because the feature is bucketed (value buckets of "
        f"{STUMP_BUCKET}), the boosted model is a function of the "
        f"bucket alone, so EVERY round's residuals reduce to the "
        f"same per-bucket (n, sum_y, sum_y2) histogram — ONE "
        f"map-side-combinable aggregate over the data, then the "
        f"entire boosting chain (variance-reduction argmax split per "
        f"round via cumulative sums, leaf values, shrinkage update, "
        f"exact MSE from the sum-of-squares identity) runs over the "
        f"bounded histogram with no second data pass and no driver "
        f"loop. This is why histogram-based GBMs (LightGBM's core "
        f"trick) are the 100 TB tree recipe; here the full recursion "
        f"is expressed relationally and certified value-exact "
        f"(train error reported as the O(1) ratio to round-0 "
        f"variance so no engine-ordered double sum is hashed at raw "
        f"magnitude). "
        f"Split scores round at 6 dp before the argmax (bucket "
        f"tiebreak) so both engines select identical trees; sums are "
        f"DECIMAL-exact before the double cast. Extends "
        f"decision_stump_train (one classification stump) to the "
        f"boosted regression ensemble.",
    tags=("learn", "tree", "boosting", "aggregate", "scale"),
)
def gradient_boosted_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_tables(spark, sf_dir, "orders")["orders"]
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    hist = orders.groupBy(
        F.floor(F.col("o_totalprice") / STUMP_BUCKET).cast("long").alias("pb")
    ).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(dec).cast("double").alias("s"),
        F.sum(dec * dec).cast("double").alias("s2"),
    )
    tot = F.broadcast(
        hist.agg(F.sum("n").alias("nt"), F.sum("s").alias("st"))
    )
    lr = float(GBM_LR)
    cur = hist.crossJoin(tot).select(
        "pb", "n", "s", "s2", (F.col("st") / F.col("nt")).alias("f")
    )
    # round-0 variance, the denominator of the scale-free mse_ratio
    v0 = F.broadcast(
        cur.agg(
            (
                F.sum(
                    F.col("s2")
                    - 2 * F.col("f") * F.col("s")
                    + F.col("n") * F.col("f") * F.col("f")
                )
                / F.sum("n")
            ).alias("v0")
        )
    )
    wc = Window.orderBy("pb").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy()
    out_rows = []
    for rnd in range(1, GBM_ROUNDS + 1):
        r = cur.select(
            "pb", "n", "s", "s2", "f",
            (F.col("s") - F.col("n") * F.col("f")).alias("rs"),
        )
        c = r.select(
            "pb",
            F.sum("n").over(wc).alias("nl"),
            F.sum("rs").over(wc).alias("sl"),
            F.sum("n").over(wt).alias("ntt"),
            F.sum("rs").over(wt).alias("stt"),
        ).where((F.col("nl") > 0) & (F.col("nl") < F.col("ntt")))
        score = F.round(
            F.col("sl") * F.col("sl") / F.col("nl")
            + (F.col("stt") - F.col("sl"))
            * (F.col("stt") - F.col("sl"))
            / (F.col("ntt") - F.col("nl")),
            6,
        )
        t = F.broadcast(
            c.select(
                F.col("pb").alias("t"),
                (F.col("sl") / F.col("nl")).alias("lv"),
                (
                    (F.col("stt") - F.col("sl"))
                    / (F.col("ntt") - F.col("nl"))
                ).alias("rv"),
                score.alias("score"),
            )
            .orderBy(F.desc("score"), "t")
            .limit(1)
            .drop("score")
        )
        cur = r.crossJoin(t).select(
            "pb", "n", "s", "s2", "t", "lv", "rv",
            (
                F.col("f")
                + lr
                * F.when(F.col("pb") <= F.col("t"), F.col("lv")).otherwise(
                    F.col("rv")
                )
            ).alias("f"),
        )
        mse = (
            F.sum(
                F.col("s2")
                - 2 * F.col("f") * F.col("s")
                + F.col("n") * F.col("f") * F.col("f")
            )
            / F.sum("n")
        )
        out_rows.append(
            cur.agg(
                F.lit(rnd).cast("long").alias("round"),
                F.max("t").cast("long").alias("threshold_bucket"),
                F.round(lr * F.max("lv"), 4).alias("left_add"),
                F.round(lr * F.max("rv"), 4).alias("right_add"),
                mse.alias("_mse"),
            )
            .crossJoin(v0)
            .select(
                "round",
                "threshold_bucket",
                "left_add",
                "right_add",
                F.round(F.col("_mse") / F.col("v0"), 6).alias("mse_ratio"),
            )
        )
        cur = cur.select("pb", "n", "s", "s2", "f")
    out = out_rows[0]
    for df in out_rows[1:]:
        out = out.unionByName(df)
    return out


# ---------------------------------------------------------------------------
# Cost-sensitive decision-threshold tuning (full operating curve)
# ---------------------------------------------------------------------------

COST_FP = 1  # cost of acting on a non-final order
COST_FN = 5  # cost of missing a final order


@register(
    "threshold_tuning_cost_curve",
    oracle=f"""
WITH d AS (
  SELECT CAST(FLOOR(o_totalprice / {STUMP_BUCKET}) AS BIGINT) AS pb,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders
),
hist AS (
  SELECT pb, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS pos
  FROM d GROUP BY pb
),
cum AS (
  SELECT pb,
         SUM(n)   OVER (ORDER BY pb) AS nl,
         SUM(pos) OVER (ORDER BY pb) AS posl,
         SUM(n)   OVER () AS nt,
         SUM(pos) OVER () AS post
  FROM hist
),
curve AS (
  SELECT pb AS threshold_bucket,
         CAST(post - posl AS BIGINT) AS tp,
         CAST((nt - nl) - (post - posl) AS BIGINT) AS fp,
         CAST(posl AS BIGINT) AS fn,
         CAST(nl - posl AS BIGINT) AS tn,
         CAST({COST_FP} * ((nt - nl) - (post - posl))
              + {COST_FN} * posl AS BIGINT) AS total_cost
  FROM cum
)
SELECT threshold_bucket, tp, fp, fn, tn, total_cost,
       total_cost = (SELECT MIN(total_cost) FROM curve) AS is_optimal
FROM curve
""",
    doc=f"COST-SENSITIVE THRESHOLD TUNING — the decision-analysis "
        f"layer the classifier family was missing: predicting 'act' "
        f"when order value exceeds a bucket threshold (predict final "
        f"when price > t), sweep EVERY candidate threshold and price "
        f"each operating point under an asymmetric cost matrix "
        f"(false positive = {COST_FP}, false negative = {COST_FN} — "
        f"missing a real case costs {COST_FN}x a false alarm), "
        f"emitting the full curve with exact integer confusion "
        f"counts and flagging the cost-minimal threshold. Same "
        f"bounded-histogram shape as decision_stump_train (one "
        f"map-side aggregate reduces 100 TB to |buckets| rows; "
        f"cumulative sums price every threshold at once); where the "
        f"stump maximizes information gain, this minimizes DOLLARS — "
        f"the quantity the on-call owner actually tunes.",
    tags=("learn", "evaluation", "statistics", "aggregate"),
)
def threshold_tuning_cost_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_tables(spark, sf_dir, "orders")["orders"]
    d = orders.select(
        F.floor(F.col("o_totalprice") / STUMP_BUCKET).cast("long").alias("pb"),
        (F.col("o_orderstatus") == "F").cast("int").alias("y"),
    )
    hist = d.groupBy("pb").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")
    )
    wc = Window.orderBy("pb").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy()
    cum = hist.select(
        "pb",
        F.sum("n").over(wc).alias("nl"),
        F.sum("pos").over(wc).alias("posl"),
        F.sum("n").over(wt).alias("nt"),
        F.sum("pos").over(wt).alias("post"),
    )
    curve = cum.select(
        F.col("pb").alias("threshold_bucket"),
        (F.col("post") - F.col("posl")).cast("long").alias("tp"),
        ((F.col("nt") - F.col("nl")) - (F.col("post") - F.col("posl")))
        .cast("long")
        .alias("fp"),
        F.col("posl").cast("long").alias("fn"),
        (F.col("nl") - F.col("posl")).cast("long").alias("tn"),
        (
            COST_FP
            * ((F.col("nt") - F.col("nl")) - (F.col("post") - F.col("posl")))
            + COST_FN * F.col("posl")
        )
        .cast("long")
        .alias("total_cost"),
    )
    best = F.broadcast(curve.agg(F.min("total_cost").alias("min_cost")))
    return curve.crossJoin(best).select(
        "threshold_bucket",
        "tp",
        "fp",
        "fn",
        "tn",
        "total_cost",
        (F.col("total_cost") == F.col("min_cost")).alias("is_optimal"),
    )


# ---------------------------------------------------------------------------
# Binary ranking metrics: ROC-AUC (midrank) + average precision
# ---------------------------------------------------------------------------


@register(
    "binary_ranking_metrics",
    oracle=f"""
WITH hist AS (
  SELECT CAST(FLOOR(o_totalprice / {STUMP_BUCKET}) AS BIGINT) AS pb,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
              AS BIGINT) AS pos
  FROM orders GROUP BY 1
),
asc_cum AS (
  SELECT pb, n, pos,
         COALESCE(SUM(n) OVER (ORDER BY pb
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before_n,
         SUM(n) OVER () AS nt,
         SUM(pos) OVER () AS post
  FROM hist
),
auc AS (
  SELECT SUM(pos * (before_n + (n + 1) / 2.0)) AS pos_ranksum,
         MAX(nt) AS nt, MAX(post) AS post
  FROM asc_cum
),
desc_cum AS (
  SELECT pb, n, pos,
         SUM(n)   OVER (ORDER BY pb DESC) AS cum_n,
         SUM(pos) OVER (ORDER BY pb DESC) AS cum_pos,
         SUM(pos) OVER () AS post
  FROM hist
),
ap AS (
  SELECT SUM((pos * 1.0 / post) * (cum_pos * 1.0 / cum_n)) AS ap
  FROM desc_cum
)
SELECT CAST(auc.post AS BIGINT) AS n_pos,
       CAST(auc.nt - auc.post AS BIGINT) AS n_neg,
       ROUND((auc.pos_ranksum - auc.post * (auc.post + 1) / 2.0)
             / (auc.post * (auc.nt - auc.post)), 6) AS roc_auc,
       ROUND(ap.ap, 6) AS average_precision
FROM auc CROSS JOIN ap
""",
    doc="BINARY RANKING METRICS — ROC-AUC and average precision for "
        "the order-value scorer of order finality, the two metrics "
        "the classifier battery (precision/recall/F1 at one "
        "threshold) cannot express because they integrate over ALL "
        "thresholds. Both computed EXACTLY on the bounded value-"
        "bucket histogram: AUC via the Mann-Whitney midrank identity "
        "(tied scores get the group midrank — the estimator is "
        "tie-correct, not tie-broken), AP as the threshold-level sum "
        "of delta-recall x precision over distinct score groups (the "
        "step-interpolation definition, which is tie-ORDER-FREE — "
        "no per-row ranking anywhere). One map-side histogram "
        "aggregate reduces 100 TB to |buckets| rows; every window "
        "runs over that bounded table (EXPECTED_GLOBAL_WINDOW).",
    tags=("learn", "evaluation", "statistics", "aggregate"),
)
def binary_ranking_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_tables(spark, sf_dir, "orders")["orders"]
    hist = orders.groupBy(
        F.floor(F.col("o_totalprice") / STUMP_BUCKET).cast("long").alias("pb")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("o_orderstatus") == "F").cast("int"))
        .cast("long")
        .alias("pos"),
    )
    w_before = Window.orderBy("pb").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wt = Window.partitionBy()
    asc_cum = hist.select(
        "pb",
        "n",
        "pos",
        F.coalesce(F.sum("n").over(w_before), F.lit(0)).alias("before_n"),
        F.sum("n").over(wt).alias("nt"),
        F.sum("pos").over(wt).alias("post"),
    )
    auc = asc_cum.agg(
        F.sum(
            F.col("pos") * (F.col("before_n") + (F.col("n") + 1) / 2.0)
        ).alias("pos_ranksum"),
        F.max("nt").alias("nt"),
        F.max("post").alias("post"),
    )
    w_desc = Window.orderBy(F.desc("pb")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    desc_cum = hist.select(
        "pb",
        "n",
        "pos",
        F.sum("n").over(w_desc).alias("cum_n"),
        F.sum("pos").over(w_desc).alias("cum_pos"),
        F.sum("pos").over(wt).alias("post"),
    )
    ap = desc_cum.agg(
        F.sum(
            (F.col("pos") * 1.0 / F.col("post"))
            * (F.col("cum_pos") * 1.0 / F.col("cum_n"))
        ).alias("ap")
    )
    return auc.crossJoin(F.broadcast(ap)).select(
        F.col("post").cast("long").alias("n_pos"),
        (F.col("nt") - F.col("post")).cast("long").alias("n_neg"),
        F.round(
            (F.col("pos_ranksum") - F.col("post") * (F.col("post") + 1) / 2.0)
            / (F.col("post") * (F.col("nt") - F.col("post"))),
            6,
        ).alias("roc_auc"),
        F.round("ap", 6).alias("average_precision"),
    )


# ---------------------------------------------------------------------------
# Fisher linear discriminant (closed-form 2-class LDA)
# ---------------------------------------------------------------------------

# fit expressions shared VERBATIM by the Spark selectExpr and the DuckDB
# oracle (the regression_normal_equations pattern): identical expression
# text over identical exact inputs => identical IEEE-754 doubles, so the
# per-row classification comparisons cannot diverge cross-engine.
_LDA_FIT = """
  c0_s1 / n0 AS m01,
  c0_s2 / n0 AS m02,
  c1_s1 / n1 AS m11,
  c1_s2 / n1 AS m12,
  (c0_s11 - c0_s1 * c0_s1 / n0) + (c1_s11 - c1_s1 * c1_s1 / n1) AS w11,
  (c0_s12 - c0_s1 * c0_s2 / n0) + (c1_s12 - c1_s1 * c1_s2 / n1) AS w12,
  (c0_s22 - c0_s2 * c0_s2 / n0) + (c1_s22 - c1_s2 * c1_s2 / n1) AS w22
""".strip()

_LDA_SOLVE = """
  (w22 * (m11 - m01) - w12 * (m12 - m02))
    / (w11 * w22 - w12 * w12) AS wt1,
  (w11 * (m12 - m02) - w12 * (m11 - m01))
    / (w11 * w22 - w12 * w12) AS wt2
""".strip()


@register(
    "fisher_lda_classifier",
    oracle=f"""
WITH d AS (
  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
         CAST(l_quantity AS DECIMAL(18,2)) AS x1,
         CAST(l_extendedprice AS DECIMAL(18,2)) AS x2
  FROM lineitem
),
cs AS (
  SELECT y, CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(x1) AS DOUBLE) AS s1,
         CAST(SUM(x2) AS DOUBLE) AS s2,
         CAST(SUM(x1 * x1) AS DOUBLE) AS s11,
         CAST(SUM(x1 * x2) AS DOUBLE) AS s12,
         CAST(SUM(x2 * x2) AS DOUBLE) AS s22
  FROM d GROUP BY y
),
p AS (
  SELECT MAX(CASE WHEN y = 0 THEN n END) AS n0,
         MAX(CASE WHEN y = 0 THEN s1 END) AS c0_s1,
         MAX(CASE WHEN y = 0 THEN s2 END) AS c0_s2,
         MAX(CASE WHEN y = 0 THEN s11 END) AS c0_s11,
         MAX(CASE WHEN y = 0 THEN s12 END) AS c0_s12,
         MAX(CASE WHEN y = 0 THEN s22 END) AS c0_s22,
         MAX(CASE WHEN y = 1 THEN n END) AS n1,
         MAX(CASE WHEN y = 1 THEN s1 END) AS c1_s1,
         MAX(CASE WHEN y = 1 THEN s2 END) AS c1_s2,
         MAX(CASE WHEN y = 1 THEN s11 END) AS c1_s11,
         MAX(CASE WHEN y = 1 THEN s12 END) AS c1_s12,
         MAX(CASE WHEN y = 1 THEN s22 END) AS c1_s22
  FROM cs
),
moments AS (SELECT n0, n1, {_LDA_FIT} FROM p),
fit AS (
  SELECT n0, n1, m01, m02, m11, m12, {_LDA_SOLVE} FROM moments
),
scored AS (
  SELECT SUM(CASE WHEN (wt1 * CAST(x1 AS DOUBLE) + wt2 * CAST(x2 AS DOUBLE)
                        > wt1 * (m01 + m11) / 2 + wt2 * (m02 + m12) / 2)
                       = (y = 1)
                  THEN 1 ELSE 0 END) AS n_correct
  FROM d CROSS JOIN fit
)
SELECT CAST(n0 AS BIGINT) AS n_class0,
       CAST(n1 AS BIGINT) AS n_class1,
       ROUND(m11 - m01, 6) AS mean_gap_x1,
       ROUND(m12 - m02, 6) AS mean_gap_x2,
       ROUND(wt1 * 1e6, 6) + 0 AS w1_scaled,
       ROUND(wt2 * 1e6, 6) + 0 AS w2_scaled,
       ROUND(wt1 * (m01 + m11) / 2 + wt2 * (m02 + m12) / 2, 9)
         AS threshold,
       ROUND((SELECT n_correct FROM scored) / (n0 + n1), 6)
         AS train_accuracy
FROM fit
""",
    doc="FISHER LINEAR DISCRIMINANT — the closed-form generative "
        "classifier beside the iterative logistic fit "
        "(quality_logreg_train) and the bucketed stumps: class = "
        "returned lineitem, features (quantity, extended price); "
        "w = S_w^-1 (mu1 - mu0) with the pooled within-class scatter "
        "inverted EXPLICITLY (2x2), so training is exactly TWELVE "
        "exact-DECIMAL sufficient statistics from one scan — the "
        "same shape regression_normal_equations uses, extended to "
        "per-class moments. The fit expressions are shared verbatim "
        "with the oracle (identical text over identical exact sums "
        "=> identical doubles), which is what makes the per-row "
        "classification comparison hash-certifiable. Scale: one "
        "map-side-combinable aggregate + one broadcast of the 1-row "
        "fit back onto the scan for training accuracy — no shuffle "
        "of the fact table at any width.",
    tags=("learn", "classifier", "aggregate"),
)
def fisher_lda_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    d = li.selectExpr(
        "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y",
        "CAST(l_quantity AS DECIMAL(18,2)) AS x1",
        "CAST(l_extendedprice AS DECIMAL(18,2)) AS x2",
    )
    cs = d.groupBy("y").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x1").cast("double").alias("s1"),
        F.sum("x2").cast("double").alias("s2"),
        F.sum(F.col("x1") * F.col("x1")).cast("double").alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).cast("double").alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).cast("double").alias("s22"),
    )
    p = cs.agg(
        *[
            F.max(F.when(F.col("y") == cls, F.col(c))).alias(
                f"c{cls}_{c}" if c != "n" else f"n{cls}"
            )
            for cls in (0, 1)
            for c in ("n", "s1", "s2", "s11", "s12", "s22")
        ]
    )
    moments = p.selectExpr("n0", "n1", *_LDA_FIT.split(",\n"))
    fit = moments.selectExpr(
        "n0", "n1", "m01", "m02", "m11", "m12", *_LDA_SOLVE.split(",\n")
    ).localCheckpoint(eager=True)
    scored = (
        d.crossJoin(F.broadcast(fit))
        .selectExpr(
            "CASE WHEN (wt1 * CAST(x1 AS DOUBLE) + wt2 * CAST(x2 AS DOUBLE)"
            " > wt1 * (m01 + m11) / 2 + wt2 * (m02 + m12) / 2)"
            " = (y = 1) THEN 1 ELSE 0 END AS ok"
        )
        .agg(F.sum("ok").cast("double").alias("n_correct"))
    )
    return fit.crossJoin(F.broadcast(scored)).selectExpr(
        "CAST(n0 AS BIGINT) AS n_class0",
        "CAST(n1 AS BIGINT) AS n_class1",
        "ROUND(m11 - m01, 6) AS mean_gap_x1",
        "ROUND(m12 - m02, 6) AS mean_gap_x2",
        # + 0 normalizes IEEE signed zero: a weight that rounds to
        # zero from below lands at -0.0 in DuckDB and +0.0 in Spark
        # (observed at sf0.1), and the %.10g hash sees "-0" vs "0"
        "ROUND(wt1 * 1e6, 6) + 0 AS w1_scaled",
        "ROUND(wt2 * 1e6, 6) + 0 AS w2_scaled",
        "ROUND(wt1 * (m01 + m11) / 2 + wt2 * (m02 + m12) / 2, 9)"
        " AS threshold",
        "ROUND(n_correct / (n0 + n1), 6) AS train_accuracy",
    )


# ---------------------------------------------------------------------------
# OLS residual diagnostics (Durbin-Watson, Breusch-Pagan, R^2)
# ---------------------------------------------------------------------------

_OLS_CHI2_1_CRIT = 3.841459  # 5% chi-squared critical value, df=1


@register(
    "ols_residual_diagnostics",
    oracle=f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
              AS DOUBLE) AS y
  FROM orders GROUP BY 1
),
idx AS (
  SELECT y, CAST(ROW_NUMBER() OVER (ORDER BY day) AS DOUBLE) AS t,
         day
  FROM daily
),
fit AS (
  SELECT COUNT(*) AS n,
         (COUNT(*) * SUM(t * y) - SUM(t) * SUM(y))
           / (COUNT(*) * SUM(t * t) - SUM(t) * SUM(t)) AS beta,
         (SUM(y) - (COUNT(*) * SUM(t * y) - SUM(t) * SUM(y))
           / (COUNT(*) * SUM(t * t) - SUM(t) * SUM(t)) * SUM(t))
           / COUNT(*) AS alpha,
         AVG(y) AS ybar
  FROM idx
),
res AS (
  SELECT t, day, y, y - (alpha + beta * t) AS e, ybar
  FROM idx CROSS JOIN fit
),
lagd AS (
  SELECT t, e, ybar, y,
         LAG(e) OVER (ORDER BY day) AS ep
  FROM res
),
agg AS (
  SELECT COUNT(*) AS n,
         SUM(e * e) AS sse,
         SUM((y - ybar) * (y - ybar)) AS sst,
         SUM(CASE WHEN ep IS NOT NULL THEN (e - ep) * (e - ep)
                  ELSE 0 END) AS sdd,
         SUM(CASE WHEN ep IS NOT NULL THEN e * ep ELSE 0 END) AS sce,
         -- Breusch-Pagan auxiliary: regress e^2 on t, LM = n * R2_aux
         SUM(t) AS st, SUM(t * t) AS stt,
         SUM(e * e * t) AS set_, SUM(e * e * e * e) AS se4,
         SUM(e * e) AS se2
  FROM lagd
),
diag AS (
  SELECT n, 1 - sse / sst AS r2, sdd / sse AS dw,
         sce / sse AS rho1,
         n * POW(n * set_ - st * se2, 2)
           / ((n * stt - st * st) * (n * se4 - se2 * se2)) AS bp_lm
  FROM agg
)
SELECT CAST(n AS BIGINT) AS n_days,
       ROUND(r2, 6) AS r_squared,
       ROUND(dw, 6) AS durbin_watson,
       ROUND(rho1, 6) AS resid_lag1_autocorr,
       ROUND(bp_lm, 6) AS breusch_pagan_lm,
       CASE WHEN dw < 1.5 THEN 'positive_autocorr'
            WHEN dw > 2.5 THEN 'negative_autocorr'
            ELSE 'ok' END AS dw_verdict,
       bp_lm > {_OLS_CHI2_1_CRIT} AS heteroscedastic
FROM diag
""",
    doc="OLS RESIDUAL DIAGNOSTICS — the checks that decide whether "
        "the trend fits (revenue_trend_ols, trend_by_priority_ols, "
        "conformal intervals) can be TRUSTED: R^2, the Durbin-Watson "
        "statistic sum (e_t - e_(t-1))^2 / sum e^2 with its "
        "autocorrelation verdict (DW < 1.5 means the i.i.d. residual "
        "assumption is violated and OLS standard errors are wrong), "
        "the lag-1 residual autocorrelation, and the Breusch-Pagan "
        "LM test (n x R^2 of regressing e^2 on the regressor — "
        "heteroscedasticity flag at the df=1 chi-squared 5% level). "
        "Everything is closed-form power sums over the calendar-"
        "bounded daily rollup: one data-sized aggregate, one "
        "broadcast 1-row fit, one O(days) lag window, one final "
        "aggregate — all doubles derived from exact DECIMAL sums "
        "with identical expression text cross-engine.",
    tags=("learn", "statistics", "time", "aggregate"),
)
def ols_residual_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_tables(spark, sf_dir, "orders")["orders"]
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .cast("double")
        .alias("y")
    )
    idx = daily.select(
        "y",
        F.row_number().over(Window.orderBy("day")).cast("double").alias("t"),
        "day",
    ).localCheckpoint(eager=True)
    n = F.count(F.lit(1))
    beta = (n * F.sum(F.col("t") * F.col("y")) - F.sum("t") * F.sum("y")) / (
        n * F.sum(F.col("t") * F.col("t")) - F.sum("t") * F.sum("t")
    )
    fit = idx.agg(
        beta.alias("beta"),
        ((F.sum("y") - beta * F.sum("t")) / n).alias("alpha"),
        F.avg("y").alias("ybar"),
    )
    res = idx.crossJoin(F.broadcast(fit)).select(
        "t",
        "day",
        "y",
        (F.col("y") - (F.col("alpha") + F.col("beta") * F.col("t"))).alias(
            "e"
        ),
        "ybar",
    )
    lagd = res.select(
        "t",
        "e",
        "ybar",
        "y",
        F.lag("e").over(Window.orderBy("day")).alias("ep"),
    )
    agg = lagd.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("e") * F.col("e")).alias("sse"),
        F.sum(
            (F.col("y") - F.col("ybar")) * (F.col("y") - F.col("ybar"))
        ).alias("sst"),
        F.sum(
            F.when(
                F.col("ep").isNotNull(),
                (F.col("e") - F.col("ep")) * (F.col("e") - F.col("ep")),
            ).otherwise(0.0)
        ).alias("sdd"),
        F.sum(
            F.when(
                F.col("ep").isNotNull(), F.col("e") * F.col("ep")
            ).otherwise(0.0)
        ).alias("sce"),
        F.sum("t").alias("st"),
        F.sum(F.col("t") * F.col("t")).alias("stt"),
        F.sum(F.col("e") * F.col("e") * F.col("t")).alias("set_"),
        F.sum(
            F.col("e") * F.col("e") * F.col("e") * F.col("e")
        ).alias("se4"),
        F.sum(F.col("e") * F.col("e")).alias("se2"),
    )
    dw = F.col("sdd") / F.col("sse")
    bp = (
        F.col("n")
        * F.pow(
            F.col("n") * F.col("set_") - F.col("st") * F.col("se2"), 2
        )
        / (
            (F.col("n") * F.col("stt") - F.col("st") * F.col("st"))
            * (F.col("n") * F.col("se4") - F.col("se2") * F.col("se2"))
        )
    )
    return agg.select(
        F.col("n").cast("long").alias("n_days"),
        F.round(1 - F.col("sse") / F.col("sst"), 6).alias("r_squared"),
        F.round(dw, 6).alias("durbin_watson"),
        F.round(F.col("sce") / F.col("sse"), 6).alias(
            "resid_lag1_autocorr"
        ),
        F.round(bp, 6).alias("breusch_pagan_lm"),
        F.when(dw < 1.5, "positive_autocorr")
        .when(dw > 2.5, "negative_autocorr")
        .otherwise("ok")
        .alias("dw_verdict"),
        (bp > _OLS_CHI2_1_CRIT).alias("heteroscedastic"),
    )
