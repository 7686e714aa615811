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
