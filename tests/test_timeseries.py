"""Tests for the time-series operators (EWMA, MAD outliers) and the
closed-form OLS trend fit: each is checked against an independent
driver-side numpy/pandas recomputation on the small SF, plus
determinism under repartitioning for the ordered fold."""

from __future__ import annotations

import numpy as np

from ytspark.operators.learn import revenue_trend_ols
from ytspark.operators.timeseries import (
    EWMA_ALPHA,
    MAD_K,
    MAD_Z,
    events_value_ewma,
    value_outlier_mad_battery,
)


def _pandas_ewma(sf_dir):
    import pandas as pd

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev[ev.value.notna()].sort_values(["user_id", "ts", "event_id"])
    out = {}
    for uid, grp in ev.groupby("user_id"):
        acc = None
        for v in grp.value:
            acc = v if acc is None else EWMA_ALPHA * v + (1 - EWMA_ALPHA) * acc
        out[uid] = (len(grp), round(acc, 6))
    return out


class TestEwma:
    def test_matches_sequential_fold(self, spark, sf_dir):
        got = {
            r["user_id"]: (r["n_obs"], r["ewma_last"])
            for r in events_value_ewma(spark, sf_dir).collect()
        }
        want = _pandas_ewma(sf_dir)
        assert got.keys() == want.keys()
        for uid in want:
            assert got[uid][0] == want[uid][0]
            assert abs(got[uid][1] - want[uid][1]) < 1e-6, uid

    def test_deterministic_under_partitioning(self, spark, sf_dir):
        base = sorted(
            map(tuple, events_value_ewma(spark, sf_dir).collect())
        )
        ev = (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .repartition(13)
            .cache()
        )
        try:
            import ytspark.operators.timeseries as ts

            orig = ts.load_tables
            ts.load_tables = lambda s, d, *t: {"events": ev}
            try:
                shuffled = sorted(
                    map(tuple, events_value_ewma(spark, sf_dir).collect())
                )
            finally:
                ts.load_tables = orig
            assert base == shuffled
        finally:
            ev.unpersist()


class TestMadBattery:
    def test_matches_numpy(self, spark, sf_dir):
        import pandas as pd

        ev = pd.read_parquet(f"{sf_dir}/events.parquet")
        ev = ev[ev.value.notna()]
        got = {
            r["event_type"]: r
            for r in value_outlier_mad_battery(spark, sf_dir).collect()
        }
        for et, grp in ev.groupby("event_type"):
            med = np.median(grp.value)
            adev = np.abs(grp.value - med)
            mad = np.median(adev)
            n_out = int((adev > MAD_Z * MAD_K * mad).sum())
            r = got[et]
            assert r["n"] == len(grp)
            assert abs(r["med"] - round(med, 6)) < 1e-6
            assert abs(r["mad"] - round(mad, 6)) < 1e-6
            assert r["n_outliers"] == n_out
            if n_out:
                worst = float((adev / (MAD_K * mad)).max())
                assert abs(r["worst_robust_z"] - round(worst, 6)) < 1e-6
            else:
                assert r["worst_robust_z"] is None


class TestOlsTrend:
    def test_matches_numpy_lstsq(self, spark, sf_dir):
        import pandas as pd

        orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
        daily = (
            orders.assign(
                x=(
                    orders.o_orderdate.dt.normalize()
                    - pd.Timestamp("1992-01-01")
                ).dt.days
            )
            .groupby("x")
            .o_totalprice.sum()
            .div(1e6)
        )
        x = daily.index.to_numpy(dtype=float)
        y = daily.to_numpy()
        slope, intercept = np.polyfit(x, y, 1)
        ss_res = ((y - (intercept + slope * x)) ** 2).sum()
        ss_tot = ((y - y.mean()) ** 2).sum()
        r2 = 1 - ss_res / ss_tot

        row = revenue_trend_ols(spark, sf_dir).collect()[0]
        assert row["n_days"] == len(daily)
        assert abs(row["slope_m_per_day"] - slope) < 1e-5
        assert abs(row["intercept_m"] - intercept) < 1e-5
        assert abs(row["r2"] - r2) < 1e-5
        want_fc = intercept + slope * (x.max() + 30)
        assert abs(row["forecast_30d_m"] - want_fc) < 1e-5


class TestHolt:
    def test_matches_sequential_recompute(self, spark, sf_dir):
        import pandas as pd

        from ytspark.operators.timeseries import (
            HOLT_ALPHA,
            HOLT_BETA,
            HOLT_H,
            events_value_holt,
        )

        ev = pd.read_parquet(f"{sf_dir}/events.parquet")
        ev = ev[ev.value.notna()].sort_values(["user_id", "ts", "event_id"])
        want = {}
        for uid, grp in ev.groupby("user_id"):
            v = list(grp.value)
            if len(v) < 2:
                continue
            l, b = v[0], v[1] - v[0]
            for x in v[2:]:
                nl = HOLT_ALPHA * x + (1 - HOLT_ALPHA) * (l + b)
                b = HOLT_BETA * (nl - l) + (1 - HOLT_BETA) * b
                l = nl
            want[uid] = (
                len(v),
                round(l, 6),
                round(b, 6),
                round(l + HOLT_H * b, 6),
            )
        got = {
            r["user_id"]: (
                r["n_obs"],
                r["level_last"],
                r["trend_last"],
                r["forecast_h3"],
            )
            for r in events_value_holt(spark, sf_dir).collect()
        }
        assert got.keys() == want.keys()
        for uid in want:
            assert got[uid][0] == want[uid][0]
            for i in (1, 2, 3):
                assert abs(got[uid][i] - want[uid][i]) < 1e-6, uid
