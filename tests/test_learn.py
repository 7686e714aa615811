"""In-engine GD trainer: the registered query is value-certified vs
DuckDB; these tests pin the trainer against an independent numpy
reference and check it actually learns."""

from __future__ import annotations

import numpy as np
import pytest

from ytspark.operators.learn import GD_ITERS, LR, logreg_train


@pytest.fixture(scope="module")
def linearly_separable(spark):
    rng = np.random.default_rng(7)
    n = 400
    x1 = rng.normal(0, 1, n)
    x2 = rng.normal(0, 1, n)
    y = (x1 + 2 * x2 > 0).astype(float)  # true boundary: x1 + 2*x2
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(x1, x2, y)],
        "x1 double, x2 double, y double",
    )
    return df, np.column_stack([np.ones(n), x1, x2]), y


def test_matches_numpy_gd(spark, linearly_separable):
    df, X, y = linearly_separable
    row = logreg_train(df, ["x1", "x2"]).first()

    w = np.zeros(3)
    for _ in range(GD_ITERS):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        w = w - LR * (X.T @ (p - y)) / len(y)

    assert row.n == len(y)
    got = np.array([row.b, row.w_x1, row.w_x2])
    assert got == pytest.approx(w, abs=1e-6)  # weights rounded to 6 dp


def test_learns_the_boundary_direction(spark, linearly_separable):
    df, X, y = linearly_separable
    row = logreg_train(df, ["x1", "x2"], iters=25).first()
    # true boundary x1 + 2*x2 > 0: both weights positive, w_x2 larger
    assert row.w_x1 > 0 and row.w_x2 > 0
    assert row.w_x2 > row.w_x1
    # and it classifies the training set far better than chance
    w = np.array([row.b, row.w_x1, row.w_x2])
    acc = (((X @ w) > 0).astype(float) == y).mean()
    assert acc > 0.9


def test_single_aggregate_per_iteration(spark, linearly_separable):
    # the gradient must be one map-side-combinable aggregate per
    # iteration: no window, no join back to the feature rows
    df, _, _ = linearly_separable
    plan = (
        logreg_train(df, ["x1", "x2"], iters=2)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "Window" not in plan
