"""Histogram-quantile sketch: accuracy bound (bin width) vs exact
quantiles, merge/order independence."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from go_mysql_elasticsearch_spark.pipeline.histq import hist_quantiles


@pytest.fixture(scope="module")
def spark():
    from go_mysql_elasticsearch_spark.session import get_spark

    return get_spark(app_name="test-histq")


def test_hist_quantiles_within_bin_width(spark):
    rng = np.random.default_rng(11)
    vals = rng.gamma(2.0, 50.0, size=20_000)
    df = spark.createDataFrame([(float(v),) for v in vals], "value double")
    row = hist_quantiles(df, "value", [0.5, 0.95, 0.99], n_bins=256).first()
    width = (vals.max() - vals.min()) / 256
    for q in (0.5, 0.95, 0.99):
        exact = float(np.quantile(vals, q))
        est = row[f"est_q{str(q).replace('.', '_')}"]
        assert abs(est - exact) <= 2 * width, (q, est, exact, width)


def test_hist_quantiles_degenerate_inputs_yield_nulls(spark):
    """Empty table / all-NULL column: one row of NULL estimates,
    matching the DuckDB twin's empty-histogram subqueries (ADVICE r4 —
    previously crashed with float(None))."""
    empty = spark.createDataFrame([], "value double")
    row = hist_quantiles(empty, "value", [0.5, 0.99]).first()
    assert row["est_q0_5"] is None and row["est_q0_99"] is None
    nulls = spark.createDataFrame([(None,), (None,)], "value double")
    row = hist_quantiles(nulls, "value", [0.5]).first()
    assert row["est_q0_5"] is None


def test_hist_quantiles_order_independent(spark):
    vals = [float(v) for v in range(1000)]
    a = spark.createDataFrame([(v,) for v in vals], "value double")
    b = spark.createDataFrame([(v,) for v in reversed(vals)], "value double").repartition(7)
    ra = hist_quantiles(a, "value", [0.5]).first()["est_q0_5"]
    rb = hist_quantiles(b, "value", [0.5]).first()["est_q0_5"]
    assert ra == rb  # unlike t-digest, bit-identical under reordering
