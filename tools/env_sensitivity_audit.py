#!/usr/bin/env python
"""Audit every registered oracle for the environment-sensitivity
classes that produced round-7's two driver hash mismatches
(CORRECTNESS_r07: cogroup_purchase_click_gap,
vopt_histogram_weekly_revenue; repaired in commit 42dd309).

A value-hash comparison between Spark and DuckDB is environment
sensitive when a FLOAT that the two engines compute through different
code paths (different summation order, different libm, different
quantile interpolation, FMA contraction) is ROUNDed at a grain finer
than the accumulated cross-build error, or is used as a ranking key
with near-ties. Risk classes scanned here:

  MEDIAN_INTERP   oracle uses MEDIAN()/QUANTILE_CONT(): the engines'
                  interpolation formulas differ at the ulp level, so
                  any downstream ROUND can flip. Pin to scaled
                  integers (2x-median / den-scaled quantile) unless
                  the interpolated inputs are exactly representable.
  SIGDIG          empirical: a float output column where
                  log10(max|v|) + column_round_digits > SIGDIG_BUDGET
                  — the value carries more significant digits than
                  cross-build double determinism supports (the vopt
                  failure mode: ~1e17 values ROUNDed at fine grain).
                  Measured by running the oracle in DuckDB at sf0.01;
                  ROUND digits are attributed per column by parsing
                  "ROUND(..., d) AS col".
  RANK_DOUBLE     a window-function ORDER BY over a float expression
                  with no trailing tie-break key in the same OVER
                  clause — near-ties flip across builds (the vopt
                  argmin failure mode).

ADJUDICATED names carry a reviewed verdict (round 8, VERDICT item 3):
PINNED means every reported float is either exact integer/DECIMAL
arithmetic or a deterministic scalar expression tree over exact
inputs (IEEE +,-,*,/,sqrt are correctly rounded, so identical trees
give identical doubles on any build); LOW means a residual
engine-divergent accumulation exists but its boundary-crossing
probability is bounded well under 1e-4 for the whole result.

Output: a markdown table (stdout) destined for SCALE.md, plus exit 1
if any IN-WINDOW query is flagged without an adjudication.
"""

from __future__ import annotations

import math
import re
import sys

SIGDIG_BUDGET = 9.0  # max log10(|v|)+round_digits before flagging
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)

# reviewed verdicts for flagged queries (r8 audit; see SCALE.md)
ADJUDICATED = {
    "ams_f2_sketch_eval": (
        "PINNED: all estimator arithmetic is exactly-representable "
        "integers in doubles (z, z^2, 4-term sums, /4, median of 4 "
        "exact values)"
    ),
    "bootstrap_ci_revenue": (
        "PINNED: resample sums are DECIMAL-exact (hash-selected "
        "subsets), cast to double once per replicate"
    ),
    "incremental_rollup_maintenance": (
        "PINNED: CAST(SUM(DECIMAL) AS DOUBLE) only"
    ),
    "null_semantics_battery": (
        "PINNED: DECIMAL-exact sum / count after r8 repair "
        "(AVG(double) removed)"
    ),
    "scalar_function_battery": (
        "PINNED: per-row scalar trees over exact inputs, no "
        "accumulation, no libm"
    ),
    # --- r10: flags raised by the new SUM/AVG-over-unmarked-arg
    # detector; in each, the bare-identifier argument is DECIMAL-typed
    # in its defining CTE (invisible to the textual scan), so the
    # accumulation is exact and the reported float is a deterministic
    # scalar tree over exact casts ---
    "brand_revenue_share": (
        "PINNED: rev is SUM(DECIMAL) in the CTE; share_of_type is one "
        "correctly-rounded division of two exact-valued doubles"
    ),
    "daily_revenue_moving_avg": (
        "PINNED: day_rev is SUM(DECIMAL); ma7 is exact frame-sum cast "
        "once then divided by an integer count"
    ),
    "q17_small_quantity_revenue": (
        "PINNED: avg_yearly is CAST(SUM(DECIMAL) AS DOUBLE)/7.0; the "
        "AVG(l_quantity) filter threshold is an exact-sum/count "
        "division of cent-quantized decimals (correctly rounded, "
        "build-identical)"
    ),
    "q8_market_share": (
        "PINNED: both numerator and denominator are SUM(DECIMAL) cast "
        "once; mkt_share is a single correctly-rounded division"
    ),
    "segment_balance_moments": (
        "PINNED: b and b*b accumulate in DECIMAL; mean/stddev are "
        "scalar trees over the exact sums (IEEE sqrt correctly rounded)"
    ),
    "benford_digit_audit": (
        "PINNED: exact count ratios; libm log10 terms rounded at 3 dp "
        "against O(1e4) magnitude (5e-11 error vs 5e-4 half-grain)"
    ),
    "benjamini_hochberg_nations": (
        "LOW: AVG(double) per nation diverges ~1e-12 relative; all "
        "reported floats are O(1-1e4) at 4-8 dp, crossing < 1e-5"
    ),
    "cohort_ltv_curves": (
        "PINNED: DECIMAL-exact running sums cast to double once, then "
        "one deterministic division per row"
    ),
    "conformal_trend_intervals": (
        "PINNED: HUGEINT/DECIMAL-exact normal-equation sums; a, b, "
        "residuals, ranked quantile are identical scalar trees; "
        "residual rank tie-breaks on day index"
    ),
    "corr_covar_battery": (
        "PINNED: explicit DECIMAL-exact power sums replace native "
        "CORR/COVAR/STDDEV (r8 repair); moments are scalar trees"
    ),
    "covariate_shift_ess": (
        "LOW: 20-term weighted double sum at ~n_ref magnitude, "
        "reported at 2 dp (r8 repair) -> crossing < 1e-7"
    ),
    "croston_intermittent_demand": (
        "LOW: EWMA folds are identical scalar recursions; outputs "
        "O(1-1e3) at 6 dp, per-step contraction error < 1e-12"
    ),
    "cube_segment_priority": (
        "PINNED: CAST(SUM(DECIMAL) AS DOUBLE) only; grouping "
        "aggregates exact"
    ),
    "did_estimator_orders": (
        "PINNED: DECIMAL-exact conditional power sums cast once "
        "(r8 repair); means/variances/t are scalar trees"
    ),
    "fisher_lda_classifier": (
        "PINNED: integer/decimal-exact moment sums (normal-equations "
        "precedent); weights are scalar trees over exact inputs"
    ),
    "forecast_backtest_mase": (
        "PINNED: absolute errors accumulate in DECIMAL, divided after "
        "one cast"
    ),
    "funnel_latency_percentiles": (
        "PINNED: den-scaled interpolated quantiles land on exact "
        "integers recovered by ROUND on both engines (r8 repair)"
    ),
    "gradient_boosted_stumps": (
        "LOW: split argmin margins are ~1e15x the cross-build sum "
        "error; train error reported as O(1) ratio to round-0 "
        "variance (r8 repair)"
    ),
    "grouping_sets_segment_priority": (
        "PINNED: CAST(SUM(DECIMAL) AS DOUBLE) only"
    ),
    "hill_tail_index": (
        "LOW: per-term libm LN ulps average out; outputs O(1) at "
        "6 dp, crossing < 1e-8"
    ),
    "huber_trend_irls": (
        "LOW: IRLS weight sums diverge ~1e-12 relative; outputs "
        "O(1-10) at 6-9 dp, crossing < 1e-5"
    ),
    "mann_kendall_trend": (
        "PINNED: S and tie sums are exact integers; var/z are scalar "
        "trees (IEEE sqrt is correctly rounded)"
    ),
    "mann_whitney_value_shift": (
        "PINNED: midranks are exact halves; U/mu/sigma/z are scalar "
        "trees over exact integer counts"
    ),
    "quantile_forecast_pinball": (
        "LOW: 7-row-bounded quantile interpolation feeds O(1e6)-"
        "magnitude losses at 4 dp; ulp-level yhat divergence crosses "
        "with p < 1e-5"
    ),
    "rake_keywords": (
        "PINNED: integer-scaled scores (degree*1e6//freq), one final "
        "exact division"
    ),
    "range_frame_trailing_week": (
        "PINNED: DECIMAL through the frame sum, cast at output "
        "(r8 repair)"
    ),
    "regression_normal_equations": (
        "PINNED: HUGEINT/DECIMAL-exact sums; coefficients are scalar "
        "trees (the normal-equations precedent)"
    ),
    "revenue_gini_by_segment": (
        "LOW: SUM(i*rd) diverges ~1e-13 relative; gini is O(1) at "
        "6 dp, total_revenue is a cast exact DECIMAL"
    ),
    "ridge_regression_path": (
        "PINNED: exact moment sums; closed-form 2x2 solve is a "
        "scalar tree"
    ),
    "rollup_order_status": ("PINNED: CAST(SUM(DECIMAL) AS DOUBLE) only"),
    "segment_price_approx_quantiles": (
        "LOW: QUANTILE_CONT midpoints of cent values are 3-decimal "
        "exact, never on the 4 dp ROUND half-boundary"
    ),
    "segment_price_percentiles": (
        "LOW: same cent-midpoint argument as "
        "segment_price_approx_quantiles; r1-r2 driver passes on record"
    ),
    "theil_sen_trend_robust": (
        "PINNED: pairwise slopes are deterministic divisions of exact "
        "decimals; median of identical doubles picks/averages "
        "identically"
    ),
    "value_outlier_mad_battery": (
        "LOW: MEDIAN/MAD over cent-quantized values; midpoints are "
        "half-cent exact, outputs coarse-rounded"
    ),
    "value_winsorize_stats": (
        "LOW: QUANTILE_CONT clips on cent-quantized values; the "
        "clipped sum re-quantizes before aggregation"
    ),
}

MEDIAN_RX = re.compile(r"\b(MEDIAN|QUANTILE_CONT)\s*\(", re.I)
OVER_RX = re.compile(r"OVER\s*\(([^()]*(?:\([^()]*\)[^()]*)*)\)", re.I)
FLOATY_RX = re.compile(
    r"ORDER\s+BY[^,)]*\b(cost|sse|dist|score|err|loss|gain|lift|ratio"
    r"|prob|pvalue|margin)\w*", re.I,
)
TIEBREAK_RX = re.compile(
    # a trailing plain-identifier sort key (id/bucket/cand/pb/...)
    # after the float key counts as a deterministic tie-break
    r"ORDER\s+BY.*,\s*[\w.]+\s*(ASC|DESC)?\s*$", re.I | re.S,
)
# "ROUND(" opener; the matching close paren is found by a depth scan so
# nested calls attribute correctly and non-ROUND two-arg calls ending in
# an alias (POWER(x, 2) AS t) no longer steal a rounding grain
ROUND_OPEN_RX = re.compile(r"\bROUND\s*\(", re.I)
ROUND_DIGITS_RX = re.compile(r",\s*(\d+)\s*$")
ALIAS_RX = re.compile(r"\s*(?:AS\s+)?([A-Za-z_]\w*)", re.I)
# cast plumbing that may sit between ROUND's close paren and the alias
# (r9 ADVICE): a `::double` suffix cast, or the `AS <type>)` tail of an
# enclosing CAST(ROUND(...) AS <type>). Without skipping these, the
# suffix form loses attribution and the CAST form attributes the grain
# to a column literally named after the type.
SUFFIX_CAST_RX = re.compile(r"\s*::\s*\w+(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?")
ENCLOSING_CAST_TAIL_RX = re.compile(
    # the word after AS must be a TYPE name, else `(SELECT ROUND(x,2)
    # AS y)` at the end of a subquery would be eaten as a cast tail
    r"\s*AS\s+(?:DOUBLE(?:\s+PRECISION)?|FLOAT[48]?|REAL|DECIMAL|NUMERIC"
    r"|U?(?:TINY|SMALL|BIG|HUGE)?INT(?:EGER)?)"
    r"(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?\s*\)",
    re.I,
)
# divergence only enters a raw (un-ROUNDed) float through ordered
# double accumulation, libm transcendentals, or engine-specific
# algorithms — a plain ratio of exact sums is build-stable
RAW_RISK_RX = re.compile(
    r"\b(STDDEV|VAR_SAMP|VAR_POP|CORR|COVAR_SAMP|COVAR_POP|EXP|LN|LOG"
    r"|LOG10|LOG2|POWER|POW|SIN|COS|TAN|ATAN|ATAN2|ASIN|ACOS|REGR_"
    r"|MEDIAN|QUANTILE_CONT|PERCENTILE_CONT)\s*\(",
    re.I,
)
SUM_AVG_OPEN_RX = re.compile(r"\b(SUM|AVG)\s*\(", re.I)
# textual exactness markers inside a SUM/AVG argument: an explicit
# DECIMAL/HUGEINT cast makes the accumulation exact (the house rule),
# and ::BIGINT/::INTEGER arguments accumulate in integer arithmetic.
# Anchored to CAST SYNTAX, not bare substrings (r10 ADVICE: a column
# merely NAMED decimal_price, or ::INTERVAL matching ::\s*INT, would
# otherwise suppress the flag — a false negative in a detector
# documented to err toward risky): either `CAST(... AS <type>` /
# `TRY_CAST(... AS <type>` or a `::<type>` suffix cast, with word
# boundaries on the type name.
EXACT_ARG_RX = re.compile(
    r"(?:\bAS\s+|::\s*)"
    r"(?:DECIMAL|NUMERIC|HUGEINT|BIGINT|INTEGER|INT|SMALLINT|TINYINT"
    r"|UBIGINT|UINTEGER)\b",
    re.I,
)


def risky_sum_avg(sql: str) -> bool:
    """True when any SUM()/AVG() argument lacks an exactness marker.

    Plain SUM/AVG over a DOUBLE is ordered accumulation — the exact
    divergence class behind the round-7 driver failures — yet the
    transcendental-oriented RAW_RISK_RX never matched it (r9 ADVICE,
    medium). Balanced-paren scan per call; errs toward risky (an
    integer column summed without a cast is textually indistinguishable
    from a double, and a false flag only asks for an adjudication).
    """
    for m in SUM_AVG_OPEN_RX.finditer(sql):
        depth, i = 1, m.end()
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        if depth:
            continue  # unbalanced tail; ignore
        if not EXACT_ARG_RX.search(sql[m.end() : i - 1]):
            return True
    return False
NON_ALIAS_KEYWORDS = frozenset(
    "FROM WHERE GROUP ORDER AS END THEN ELSE WHEN AND OR NOT DESC ASC "
    "OVER JOIN ON UNION LIMIT HAVING IS IN BETWEEN CASE SELECT CROSS "
    "INNER LEFT RIGHT FULL USING WINDOW QUALIFY".split()
)


def scan_sql(sql: str) -> list[str]:
    flags = []
    if MEDIAN_RX.search(sql):
        flags.append("MEDIAN_INTERP")
    for m in OVER_RX.finditer(sql):
        body = m.group(1)
        if FLOATY_RX.search(body) and not TIEBREAK_RX.search(body):
            flags.append("RANK_DOUBLE")
            break
    return flags


def column_grains(sql: str) -> dict[str, int]:
    """Map ``alias -> max ROUND grain`` via balanced-paren attribution.

    Only a genuine ``ROUND(<expr>, d)`` whose close paren is directly
    followed by an (optionally AS-prefixed) alias contributes a grain;
    unattributed float columns fall back to grain 0 in the caller
    (i.e. they are flagged only when the raw magnitude alone busts the
    significant-digit budget).
    """
    grains: dict[str, int] = {}
    for m in ROUND_OPEN_RX.finditer(sql):
        depth, i = 1, m.end()
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        if depth:  # unbalanced tail; ignore
            continue
        digits_m = ROUND_DIGITS_RX.search(sql[m.end() : i - 1])
        if not digits_m:
            continue  # one-arg ROUND -> integer grain 0, the fallback
        # skip cast plumbing between the close paren and the alias:
        # any run of `::type` suffix casts, then (when the ROUND sits
        # inside CAST(... AS type)) the enclosing cast's `AS type)` tail
        while True:
            suffix = SUFFIX_CAST_RX.match(sql, i)
            if not suffix:
                break
            i = suffix.end()
        tail = ENCLOSING_CAST_TAIL_RX.match(sql, i)
        if tail:
            i = tail.end()
            while True:  # the enclosing CAST may itself be suffix-cast
                suffix = SUFFIX_CAST_RX.match(sql, i)
                if not suffix:
                    break
                i = suffix.end()
        alias_m = ALIAS_RX.match(sql, i)
        if not alias_m or alias_m.group(1).upper() in NON_ALIAS_KEYWORDS:
            continue
        col = alias_m.group(1).lower()
        grains[col] = max(grains.get(col, 0), int(digits_m.group(1)))
    return grains


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import duckdb

    sys.path.insert(0, ".")
    import __spark_entry__ as entry
    from ytspark.queries import _PRIORITY

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    oracles = entry.oracle_sql()
    in_window = set(_PRIORITY)
    rows = []
    for name, sql in sorted(oracles.items()):
        stripped = re.sub(r"--[^\n]*", "", sql)
        flags = scan_sql(stripped)
        grains = column_grains(stripped)
        # unattributed float columns get grain 0: flagged only when raw
        # magnitude alone busts the budget (the old max-grain fallback
        # mis-attributed other columns' grains in both directions)
        fallback = 0
        try:
            df = con.execute(sql).df()
        except Exception as e:  # noqa: BLE001
            rows.append((name, ["ORACLE_ERROR"], str(e).splitlines()[0][:80]))
            continue
        worst = 0.0
        raw_cols = []
        for col in df.columns:
            if df[col].dtype.kind != "f":
                continue
            vals = df[col].dropna()
            if not len(vals):
                continue
            # a hash-visible float with no ROUND attribution and >6dp of
            # true precision is effectively unrounded: the %.10g hash
            # sees it at 1e-9 RELATIVE grain regardless of magnitude.
            # Only divergence-capable expressions matter (ordered double
            # accumulation / libm / engine algorithms) — a lone division
            # of exact sums is correctly rounded on any build, so gate
            # the flag on a risk marker in the SQL
            if (
                col.lower() not in grains
                and not (vals == vals.round(6)).all()
                and (RAW_RISK_RX.search(stripped) or risky_sum_avg(stripped))
            ):
                raw_cols.append(col)
            mx = float(vals.abs().max())
            if mx <= 0:
                continue
            # an integer-valued float column is exact; skip
            if (vals == vals.round()).all() and mx < 2**53:
                continue
            grain = grains.get(col.lower(), fallback)
            worst = max(worst, math.log10(mx) + grain)
        if worst > SIGDIG_BUDGET:
            flags.append(f"SIGDIG({worst:.1f})")
        if raw_cols:
            flags.append(f"RAW_FLOAT({','.join(sorted(raw_cols)[:4])})")
        if flags:
            verdict = ADJUDICATED.get(name, "")
            rows.append((name, flags, verdict))

    unadjudicated_window = [
        r for r in rows if r[0] in in_window and not r[2]
    ]
    print("| query | in window | flags | adjudication |")
    print("|---|---|---|---|")
    for name, flags, verdict in rows:
        print(
            f"| {name} | {'YES' if name in in_window else ''} | "
            f"{', '.join(flags)} | {verdict} |"
        )
    print(
        f"\n{len(rows)} flagged of {len(oracles)} oracles; "
        f"{len(unadjudicated_window)} UNADJUDICATED inside the window"
    )
    for name, flags, _ in unadjudicated_window:
        print(f"  UNADJUDICATED: {name} {flags}")
    return 1 if unadjudicated_window else 0


if __name__ == "__main__":
    raise SystemExit(main())
