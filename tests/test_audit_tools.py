"""Unit tests for the audit tooling itself (round 9).

The env-sensitivity analyzer and the second-environment gate are part
of the correctness story — a bug in either silently under-flags the
exact divergence class that produced round 7's driver failures — so
their load-bearing pieces are pinned here: the ROUND-anchored grain
parser (the r8 advisor's finding) and the value comparator the gate
diffs perturbed runs with.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)


class TestColumnGrains:
    def _grains(self, sql):
        from env_sensitivity_audit import column_grains

        return column_grains(sql)

    def test_round_alias_attributed(self):
        assert self._grains("SELECT ROUND(x, 4) AS y FROM t") == {"y": 4}

    def test_round_with_as_keyword_optional(self):
        assert self._grains("SELECT ROUND(x, 2) y FROM t") == {"y": 2}

    def test_power_does_not_steal_a_grain(self):
        # the r8 advisor's exact counterexample: a non-ROUND two-arg
        # call ending in an alias must not be attributed a grain
        assert self._grains("SELECT POWER(x, 2) AS t2 FROM t") == {}
        assert self._grains("SELECT LEAST(a, 5) AS v FROM t") == {}

    def test_nested_calls_inside_round(self):
        sql = "SELECT ROUND(SUM(CAST(a AS DOUBLE)) / COUNT(*), 6) AS m FROM t"
        assert self._grains(sql) == {"m": 6}

    def test_round_in_mid_expression_not_misattributed(self):
        # ROUND not followed by an alias (feeds an outer expression)
        # contributes nothing rather than grabbing a later token
        sql = "SELECT ROUND(x, 2) + 1 AS z FROM t"
        assert self._grains(sql) == {}

    def test_one_arg_round_is_integer_grain_fallback(self):
        assert self._grains("SELECT ROUND(x) AS y FROM t") == {}

    def test_keyword_after_round_is_not_an_alias(self):
        assert self._grains("SELECT ROUND(x, 2) FROM t") == {}

    def test_max_grain_wins_per_column(self):
        sql = "SELECT ROUND(a, 2) AS y FROM t UNION ALL SELECT ROUND(b, 5) AS y FROM u"
        assert self._grains(sql) == {"y": 5}

    def test_suffix_cast_between_round_and_alias(self):
        # r9 ADVICE: ROUND(x,2)::DOUBLE AS y lost attribution
        assert self._grains("SELECT ROUND(x, 2)::DOUBLE AS y FROM t") == {"y": 2}
        assert self._grains(
            "SELECT ROUND(x, 4)::DECIMAL(18,4) AS y FROM t"
        ) == {"y": 4}

    def test_enclosing_cast_between_round_and_alias(self):
        # r9 ADVICE: CAST(ROUND(x,2) AS DOUBLE) AS y attributed the
        # grain to a column literally named "double"
        sql = "SELECT CAST(ROUND(x, 2) AS DOUBLE) AS y FROM t"
        assert self._grains(sql) == {"y": 2}

    def test_subquery_tail_is_not_eaten_as_a_cast(self):
        # `AS y)` at the end of a subquery select list must stay an
        # alias, not be skipped as an enclosing-cast tail
        sql = "SELECT * FROM (SELECT ROUND(x, 3) AS y FROM t) s"
        assert self._grains(sql) == {"y": 3}


class TestRiskySumAvg:
    def _risky(self, sql):
        from env_sensitivity_audit import risky_sum_avg

        return risky_sum_avg(sql)

    def test_plain_double_sum_is_risky(self):
        # the r9 advisor's medium finding: ordered double accumulation
        # (the round-7 failure class) was never RAW_FLOAT-gated
        assert self._risky("SELECT SUM(price) AS s FROM t")
        assert self._risky("SELECT AVG(score) AS a FROM t")

    def test_decimal_cast_sum_is_exact(self):
        assert not self._risky(
            "SELECT SUM(CAST(price AS DECIMAL(18,2))) AS s FROM t"
        )
        assert not self._risky("SELECT SUM(price::DECIMAL(18,2)) AS s FROM t")

    def test_integer_cast_sum_is_exact(self):
        assert not self._risky("SELECT SUM(qty::BIGINT) AS s FROM t")

    def test_one_risky_among_exact_still_flags(self):
        sql = (
            "SELECT SUM(CAST(a AS DECIMAL(18,2))) AS s1, SUM(b) AS s2 FROM t"
        )
        assert self._risky(sql)


class TestSecondEnvComparator:
    def test_normalize_detects_a_single_float_divergence(self):
        import pandas as pd

        from oracle_check import normalize

        a = pd.DataFrame({"k": [1, 2], "v": [0.1234567891, 2.0]})
        b = pd.DataFrame({"k": [1, 2], "v": [0.1234567892, 2.0]})
        assert normalize(a) != normalize(b)

    def test_normalize_is_column_and_row_order_insensitive(self):
        import pandas as pd

        from oracle_check import normalize

        a = pd.DataFrame({"k": [1, 2], "v": [1.5, 2.5]})
        b = pd.DataFrame({"v": [2.5, 1.5], "k": [2, 1]})
        assert normalize(a) == normalize(b)

    def test_normalize_below_10_sig_digits_is_stable(self):
        # the %.10g hash sees 10 significant digits: an ulp-level
        # difference beyond them must NOT flip the comparison
        import pandas as pd

        from oracle_check import normalize

        x = 123456.789
        a = pd.DataFrame({"v": [x]})
        b = pd.DataFrame({"v": [x * (1 + 1e-15)]})
        assert normalize(a) == normalize(b)
