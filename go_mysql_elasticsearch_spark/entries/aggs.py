"""Aggregations: bucket / metric / pipeline (SURVEY.md §2.4 table).

Reference surface: search_aggs_bucket_*.go, search_aggs_metrics_*.go,
search_aggs_pipeline_*.go. Bucket aggs → groupBy; metric aggs → agg
functions; pipeline aggs → window functions over the bucket frame —
exactly the Catalyst-native mapping from the survey.

Time-series entries run on the ``events`` table (ts, user_id,
event_type, value); doc entries on ``documents``. All float outputs
are rounded to 6 decimals for cross-engine hash stability; skewness/
kurtosis use explicit population-moment formulas because Spark and
DuckDB disagree on sample corrections.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import index_for


def _docs(spark, sf_dir):
    return index_for(spark, sf_dir).docstore()


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


# --- bucket aggs -----------------------------------------------------------

def q_terms_agg(spark, sf_dir):
    """terms agg (search_aggs_bucket_terms.go:10)."""
    return (
        _docs(spark, sf_dir)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("doc_count"))
    )


def q_histogram(spark, sf_dir):
    """histogram interval=50 on n_chars (search_aggs_bucket_histogram.go:12)."""
    d = _docs(spark, sf_dir).withColumn("n_chars", F.length("text"))
    return (
        d.groupBy((F.floor(F.col("n_chars") / 50) * 50).cast("long").alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("doc_count"))
    )


def q_date_histogram(spark, sf_dir):
    """date_histogram hourly (search_aggs_bucket_date_histogram.go:10)."""
    return (
        _events(spark, sf_dir)
        .groupBy(F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"))
        .agg(F.count(F.lit(1)).cast("long").alias("doc_count"))
    )


def q_range_agg(spark, sf_dir):
    """range agg (search_aggs_bucket_range.go:18)."""
    d = _docs(spark, sf_dir).withColumn("n_chars", F.length("text"))
    bucket = (
        F.when(F.col("n_chars") < 100, "lt100")
        .when(F.col("n_chars") < 300, "100-300")
        .otherwise("gte300")
    )
    return d.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("doc_count")
    )


def q_date_range_agg(spark, sf_dir):
    """date_range agg (search_aggs_bucket_date_range.go:19)."""
    e = _events(spark, sf_dir)
    bucket = (
        F.when(F.col("ts") < F.lit("2024-01-10").cast("timestamp"), "early")
        .when(F.col("ts") < F.lit("2024-01-20").cast("timestamp"), "mid")
        .otherwise("late")
    )
    return e.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("doc_count"),
        F.round(F.sum("value"), 6).alias("vsum"),
    )


def q_global_agg(spark, sf_dir):
    """global agg (search_aggs_bucket_global.go:12): metric over ALL
    docs alongside a filtered metric — escape the query scope."""
    e = _events(spark, sf_dir)
    return e.agg(
        F.round(F.avg("value"), 6).alias("avg_all"),
        F.round(F.avg(F.when(F.col("event_type") == "click", F.col("value"))), 6).alias("avg_clicks"),
    )


def q_filters_agg(spark, sf_dir):
    """filters agg (search_aggs_bucket_filters.go:19) — one conditional
    count per named filter."""
    e = _events(spark, sf_dir)
    return e.agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).cast("long").alias("clicks"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).cast("long").alias("errors"),
        F.sum(F.when(F.col("value") > 100, 1).otherwise(0)).cast("long").alias("big_value"),
    )


def q_missing_agg(spark, sf_dir):
    """missing agg (search_aggs_bucket_missing.go:15)."""
    e = _events(spark, sf_dir)
    return e.agg(
        F.sum(F.when(F.col("props").isNull(), 1).otherwise(0)).cast("long").alias("missing_props")
    )


def q_significant_terms(spark, sf_dir):
    """significant_terms (search_aggs_bucket_significant_terms.go:10):
    fg = lang 'de' docs, bg = corpus; score = (fg_freq/fg_n) / (bg_freq/bg_n),
    top 5 by (score desc, term asc)."""
    from ..analyzer import tokens_col

    d = _docs(spark, sf_dir)
    toks = d.select("doc_id", "lang", F.explode(F.array_distinct(tokens_col("text"))).alias("term"))
    # fg/bg corpus sizes ride the plan as a 1-row broadcast — one job,
    # no driver-side .count() round-trips
    sizes = d.agg(
        F.count(F.lit(1)).cast("double").alias("bg_n"),
        F.sum(F.when(F.col("lang") == "de", 1).otherwise(0)).cast("double").alias("fg_n"),
    )
    bg = toks.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("bg_df"))
    fg = (
        toks.where(F.col("lang") == "de")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("double").alias("fg_df"))
    )
    out = fg.join(bg, "term").crossJoin(F.broadcast(sizes)).select(
        "term",
        F.round((F.col("fg_df") / F.col("fg_n")) / (F.col("bg_df") / F.col("bg_n")), 6).alias("score"),
    )
    return out.orderBy(F.desc("score"), F.asc("term")).limit(5)


def q_sampler_agg(spark, sf_dir):
    """sampler agg (search_aggs_bucket_sampler.go:12) — deterministic
    sample: docs whose md5(doc_id)-derived bucket is 0, then a metric.
    md5 (not xxhash64) so the DuckDB oracle computes the identical
    sample: cast(conv(substr(md5(x),1,15),16,10) as bigint) % 10."""
    from ..pipeline.dedup import h60

    d = _docs(spark, sf_dir).withColumn("n_chars", F.length("text"))
    s = d.where(F.pmod(h60(F.col("doc_id").cast("string")), F.lit(10)) == 0)
    return s.agg(
        F.count(F.lit(1)).cast("long").alias("sample_n"),
        F.round(F.avg("n_chars"), 6).alias("avg_n_chars"),
    )


# --- metric aggs ------------------------------------------------------------

def q_stats_agg(spark, sf_dir):
    """stats + value_count (search_aggs_metrics_stats.go, _value_count.go)."""
    e = _events(spark, sf_dir)
    return e.agg(
        F.count("value").cast("long").alias("n"),
        F.round(F.min("value"), 6).alias("vmin"),
        F.round(F.max("value"), 6).alias("vmax"),
        F.round(F.sum("value"), 6).alias("vsum"),
        F.round(F.avg("value"), 6).alias("vavg"),
        F.round(F.stddev("value"), 6).alias("vstd"),
    )


def q_extended_stats(spark, sf_dir):
    """extended_stats (search_aggs_metrics_extended_stats.go): population
    moments, explicit formulas (Spark/DuckDB sample corrections differ)."""
    e = _events(spark, sf_dir).select("value")
    m = e.agg(
        F.count("value").cast("double").alias("n"),
        F.avg("value").alias("mu"),
        F.avg(F.col("value") * F.col("value")).alias("m2r"),
        F.avg(F.pow("value", 3)).alias("m3r"),
        F.avg(F.pow("value", 4)).alias("m4r"),
    )
    mu, m2r, m3r, m4r = F.col("mu"), F.col("m2r"), F.col("m3r"), F.col("m4r")
    var_p = m2r - mu * mu
    m3 = m3r - 3 * mu * m2r + 2 * mu**3
    m4 = m4r - 4 * mu * m3r + 6 * mu * mu * m2r - 3 * mu**4
    return m.select(
        F.round(var_p, 6).alias("var_pop"),
        F.round(m3 / F.pow(var_p, 1.5), 6).alias("skew_pop"),
        F.round(m4 / (var_p * var_p) - 3, 6).alias("kurt_pop"),
    )


def q_cardinality(spark, sf_dir):
    """cardinality (search_aggs_metrics_cardinality.go:12). ES uses HLL;
    the oracle-checked entry is exact count distinct (the engine also
    exposes approx_count_distinct — HLL params differ across engines so
    it cannot be hash-compared)."""
    return _events(spark, sf_dir).agg(
        F.countDistinct("user_id").cast("long").alias("users")
    )


def q_percentiles(spark, sf_dir):
    """percentiles (search_aggs_metrics_percentiles.go:9) — exact
    continuous interpolation."""
    e = _events(spark, sf_dir)
    return e.agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


def q_percentile_ranks(spark, sf_dir):
    """percentile_ranks (search_aggs_metrics_percentile_ranks.go:9):
    for each probe value, the percentage of observed values <= it —
    the inverse of percentiles; one pass, three conditional means."""
    e = _events(spark, sf_dir)
    pct = lambda v: F.round(
        F.avg(F.when(F.col("value") <= v, 1.0).otherwise(0.0)) * 100, 6
    )
    return e.agg(
        pct(50).alias("rank_50"), pct(200).alias("rank_200"), pct(800).alias("rank_800")
    )


def q_top_hits(spark, sf_dir):
    """top_hits (search_aggs_metrics_top_hits.go:17): top-2 docs per
    lang by (n_chars desc, doc_id asc)."""
    d = _docs(spark, sf_dir).withColumn("n_chars", F.length("text"))
    w = Window.partitionBy("lang").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2)
        .select("lang", "doc_id", "n_chars", F.col("rn").cast("long").alias("rn"))
    )


# --- pipeline aggs -----------------------------------------------------------

def _hourly(spark, sf_dir):
    return (
        _events(spark, sf_dir)
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"), F.round(F.sum("value"), 6).alias("v"))
    )


def q_derivative(spark, sf_dir):
    """derivative (search_aggs_pipeline_derivative.go): lag diff over
    hourly buckets."""
    h = _hourly(spark, sf_dir)
    w = Window.orderBy("h")
    return h.select(
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        (F.col("c") - F.lag("c").over(w)).cast("long").alias("deriv"),
    )


def q_cumulative_sum(spark, sf_dir):
    """cumulative_sum (search_aggs_pipeline_cumulative_sum.go)."""
    h = _hourly(spark, sf_dir)
    w = Window.orderBy("h").rowsBetween(Window.unboundedPreceding, 0)
    return h.select(
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.sum("c").over(w).cast("long").alias("cum"),
    )


def q_moving_avg(spark, sf_dir):
    """mov_avg window=3 (search_aggs_pipeline_mov_avg.go)."""
    h = _hourly(spark, sf_dir)
    w = Window.orderBy("h").rowsBetween(-2, 0)
    return h.select(
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.round(F.avg("c").over(w), 6).alias("mov_avg"),
    )


def q_windowed_counts(spark, sf_dir):
    """Tumbling event-time windows per event_type via F.window — the
    Structured-Streaming-native bucketing (streaming/windowed.py); the
    watermarked streaming twin of this exact aggregation is asserted
    output-identical (and late-data-dropping) in
    tests/test_windowed.py. Timestamps stringified for hash-stable
    cross-engine compare."""
    from ..streaming.windowed import windowed_counts

    out = windowed_counts(_events(spark, sf_dir))
    return out.select(
        F.date_format("w_start", "yyyy-MM-dd HH:mm:ss").alias("w_start"),
        F.date_format("w_end", "yyyy-MM-dd HH:mm:ss").alias("w_end"),
        "event_type",
        "n",
        "v",
    )


def _windowed_counts_sql() -> str:
    from ..streaming.windowed import windowed_counts_oracle_sql

    return (
        "SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS w_start, "
        "strftime(w_end, '%Y-%m-%d %H:%M:%S') AS w_end, event_type, n, v "
        f"FROM ({windowed_counts_oracle_sql()})"
    )


def q_cardinality_hll(spark, sf_dir):
    """cardinality as ES actually computes it — an HLL ESTIMATE
    (search_aggs_metrics_cardinality.go:10), not a count. Deterministic
    md5-register sketch (pipeline/hll.py): both engines produce the
    IDENTICAL estimate, reported next to the exact count. m=512 → ~4.6%
    standard error; a 10^12-row column reduces to 512 registers
    map-side before any shuffle."""
    from ..pipeline.hll import estimate_df

    ev = _events(spark, sf_dir)
    est = estimate_df(ev, "event_id")
    exact = ev.agg(F.countDistinct("event_id").cast("long").alias("exact"))
    return est.crossJoin(exact)


def _cardinality_hll_sql() -> str:
    from ..pipeline.hll import estimate_sql

    return (
        f"SELECT e.hll_estimate, x.exact FROM ({estimate_sql('event_id', 'events', 'duckdb')}) e "
        "CROSS JOIN (SELECT count(DISTINCT event_id) AS exact FROM events) x"
    )


def q_terms_cms(spark, sf_dir):
    """Heavy-hitter term counts via a deterministic COUNT-MIN sketch
    (pipeline/cms.py) next to the exact counts — the fixed-memory form
    of what terms-agg doc_count_error_upper_bound hints at
    (search_aggs_bucket_terms.go). One token-stream scan, 4096-cell
    sketch, estimates bit-identical across engines."""
    from ..analyzer import tokens_col
    from ..pipeline.cms import PROBES, estimate_df

    toks = _docs(spark, sf_dir).select(F.explode(tokens_col("text")).alias("term"))
    est = estimate_df(spark, toks)
    exact = (
        toks.where(F.col("term").isin(PROBES))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("exact"))
    )
    return (
        est.join(exact, "term", "left")
        .select("term", "est", F.coalesce("exact", F.lit(0)).cast("long").alias("exact"))
        .orderBy("term")
    )


def _terms_cms_sql() -> str:
    from ..analyzer import duckdb_tokens_sql
    from ..pipeline.cms import PROBES, estimate_sql

    toks_select = f"SELECT unnest({duckdb_tokens_sql('text')}) AS term FROM documents"
    in_list = ", ".join(f"'{t}'" for t in PROBES)
    return f"""WITH e AS ({estimate_sql(toks_select, 'duckdb')}),
x AS (
  SELECT term, count(*) AS exact FROM ({toks_select})
  WHERE term IN ({in_list}) GROUP BY term
)
SELECT e.term, e.est, cast(coalesce(x.exact, 0) AS BIGINT) AS exact
FROM e LEFT JOIN x USING (term) ORDER BY term"""


MOVAVG_WINDOW = 5  # ES default window
EWMA_ALPHA = 0.3  # ES EwmaModel default
HOLT_ALPHA, HOLT_BETA = 0.3, 0.1  # ES HoltLinearModel defaults


def _lagged_hourly(spark, sf_dir, n: int = MOVAVG_WINDOW):
    """Hourly buckets + the window's values as lag columns x1(oldest)..
    xn(current) — the unrolled carrier for the recursive mov_avg
    models. One window spec, no extra shuffle beyond the hourly agg."""
    h = _hourly(spark, sf_dir)
    w = Window.orderBy("h")
    for i in range(n):
        h = h.withColumn(
            f"x{i + 1}",
            F.lag(F.col("c").cast("double"), n - 1 - i).over(w),
        )
    return h


def q_mov_avg_ewma(spark, sf_dir):
    """mov_avg model=ewma (search_aggs_pipeline_mov_avg.go EWMA model,
    alpha=0.3): single-exponential smoothing seeded with the window's
    oldest value — avg := alpha*x + (1-alpha)*avg over the 5-bucket
    window, unrolled to closed arithmetic on lag columns (identical
    recursion in the SQL twin). Buckets with an incomplete window emit
    NULL."""
    h = _lagged_hourly(spark, sf_dir)
    s = F.col("x1")
    for i in range(2, MOVAVG_WINDOW + 1):
        s = EWMA_ALPHA * F.col(f"x{i}") + (1.0 - EWMA_ALPHA) * s
    return h.select(
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.round(s, 6).alias("ewma"),
    )


def q_mov_avg_holt(spark, sf_dir):
    """mov_avg model=holt (search_aggs_pipeline_mov_avg.go HoltLinear,
    alpha=0.3 beta=0.1): double-exponential smoothing over the window,
    textbook seeding s:=x1, b:=x2-x1, then s' = a*x + (1-a)*(s+b),
    b' = B*(s'-s) + (1-B)*b; the bucket value is the final level s.
    Stepwise withColumn chain — the SQL twin runs the identical steps
    as nested subqueries, so both engines do the same float ops in the
    same order."""
    h = _lagged_hourly(spark, sf_dir)
    a, b_ = HOLT_ALPHA, HOLT_BETA
    h = h.withColumn("s2", a * F.col("x2") + (1 - a) * (F.col("x1") + (F.col("x2") - F.col("x1"))))
    h = h.withColumn("b2", b_ * (F.col("s2") - F.col("x1")) + (1 - b_) * (F.col("x2") - F.col("x1")))
    for i in range(3, MOVAVG_WINDOW + 1):
        p = i - 1
        h = h.withColumn(f"s{i}", a * F.col(f"x{i}") + (1 - a) * (F.col(f"s{p}") + F.col(f"b{p}")))
        h = h.withColumn(f"b{i}", b_ * (F.col(f"s{i}") - F.col(f"s{p}")) + (1 - b_) * F.col(f"b{p}"))
    return h.select(
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.round(F.col(f"s{MOVAVG_WINDOW}"), 6).alias("holt"),
    )


def _lagged_sql(n: int = MOVAVG_WINDOW) -> str:
    return (
        f"WITH h AS ({{hourly}}), lg AS (SELECT h, "
        + ", ".join(
            f"lag(c::DOUBLE, {n - 1 - i}) OVER (ORDER BY h) AS x{i + 1}"
            for i in range(n)
        )
        + " FROM h)"
    )


_LAGGED_SQL = _lagged_sql()


def _ewma_sql() -> str:
    s = "x1"
    for i in range(2, MOVAVG_WINDOW + 1):
        s = f"({EWMA_ALPHA} * x{i} + {1.0 - EWMA_ALPHA} * {s})"
    return (
        _LAGGED_SQL.format(hourly=_HOURLY_SQL)
        + f" SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour, round({s}, 6) AS ewma FROM lg"
    )


def _holt_sql() -> str:
    a, b_ = HOLT_ALPHA, HOLT_BETA
    q = (
        _LAGGED_SQL.format(hourly=_HOURLY_SQL)
        + f", st2 AS (SELECT *, {a} * x2 + {1 - a} * (x1 + (x2 - x1)) AS s2, "
        f"{b_} * (({a} * x2 + {1 - a} * (x1 + (x2 - x1))) - x1) + {1 - b_} * (x2 - x1) AS b2 FROM lg)"
    )
    prev = "st2"
    for i in range(3, MOVAVG_WINDOW + 1):
        p = i - 1
        q += (
            f", st{i} AS (SELECT *, {a} * x{i} + {1 - a} * (s{p} + b{p}) AS s{i}_tmp, "
            f"{b_} * (({a} * x{i} + {1 - a} * (s{p} + b{p})) - s{p}) + {1 - b_} * b{p} AS b{i} FROM {prev})"
        )
        q += f", r{i} AS (SELECT *, s{i}_tmp AS s{i} FROM st{i})"
        prev = f"r{i}"
    q += (
        f" SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour, "
        f"round(s{MOVAVG_WINDOW}, 6) AS holt FROM {prev}"
    )
    return q


# Holt-Winters (triple exponential) — explicit model settings, as a
# client always sends (search_aggs_pipeline_mov_avg.go:266-341 exposes
# alpha/beta/gamma/period/type knobs)
HW_ALPHA, HW_BETA, HW_GAMMA, HW_PERIOD = 0.3, 0.1, 0.3, 3
HW_WINDOW = 2 * HW_PERIOD  # the model needs >= two full seasons


class _SqlExpr:
    """Operator-overloaded SQL-text expression, so the SAME Python
    lambdas that build the Spark Column tree render the SQL twin —
    one source of truth for the float-op order in both engines."""

    __slots__ = ("s",)

    def __init__(self, s):
        self.s = s

    @staticmethod
    def _t(o):
        return o.s if isinstance(o, _SqlExpr) else repr(o)

    def __add__(self, o):
        return _SqlExpr(f"({self.s} + {self._t(o)})")

    def __radd__(self, o):
        return _SqlExpr(f"({self._t(o)} + {self.s})")

    def __sub__(self, o):
        return _SqlExpr(f"({self.s} - {self._t(o)})")

    def __rsub__(self, o):
        return _SqlExpr(f"({self._t(o)} - {self.s})")

    def __mul__(self, o):
        return _SqlExpr(f"({self.s} * {self._t(o)})")

    def __rmul__(self, o):
        return _SqlExpr(f"({self._t(o)} * {self.s})")

    def __truediv__(self, o):
        return _SqlExpr(f"({self.s} / {self._t(o)})")


def _hw_steps():
    """The additive Holt-Winters unroll as (name, expr-builder) steps,
    shared shape between the Spark chain and the SQL twin so both
    engines perform the SAME float ops in the SAME order (each builder
    takes the column-handle factory: F.col | _SqlExpr). Seeds are
    derived from HW_PERIOD, not hardcoded, so changing the period knob
    changes the whole unroll consistently (code-review r5)."""
    a, bt, g, p = HW_ALPHA, HW_BETA, HW_GAMMA, HW_PERIOD
    steps = []

    # seeds: level = first-season mean; trend = mean cross-season slope
    # (sum((x[i+p]-x[i])/p)/p); seasonal index c_i = x_i - level
    def _level(c, p=p):
        e = c("x1")
        for i in range(2, p + 1):
            e = e + c(f"x{i}")
        return e / float(p)

    def _trend(c, p=p):
        e = c(f"x{p + 1}") - c("x1")
        for i in range(2, p + 1):
            e = e + (c(f"x{i + p}") - c(f"x{i}"))
        return e / float(p * p)

    steps.append((f"s{p}", _level))
    steps.append((f"b{p}", _trend))
    for i in range(1, p + 1):
        steps.append((f"c{i}", lambda c, i=i: c(f"x{i}") - c(f"s{p}")))
    # recursion over the second season
    for i in range(p + 1, 2 * p + 1):
        pv = i - 1
        steps.append(
            (f"s{i}", lambda c, i=i, pv=pv: a * (c(f"x{i}") - c(f"c{i - p}"))
             + (1.0 - a) * (c(f"s{pv}") + c(f"b{pv}")))
        )
        steps.append(
            (f"b{i}", lambda c, i=i, pv=pv: bt * (c(f"s{i}") - c(f"s{pv}"))
             + (1.0 - bt) * c(f"b{pv}"))
        )
        steps.append(
            (f"c{i}", lambda c, i=i, pv=pv: g * (c(f"x{i}") - (c(f"s{pv}") - c(f"b{pv}")))
             + (1.0 - g) * c(f"c{i - p}"))
        )
    # one-step-ahead forecast: level + trend + matching seasonal index
    steps.append(
        ("hw", lambda c: c(f"s{2 * p}") + c(f"b{2 * p}") + c(f"c{p + 1}"))
    )
    return steps


def q_mov_avg_holt_winters(spark, sf_dir):
    """mov_avg model=holt_winters (search_aggs_pipeline_mov_avg.go
    HoltWintersMovAvgModel, additive seasonality, period=3 over a
    6-bucket window): triple exponential smoothing — level/trend seeded
    from the first season's mean and the mean cross-season slope,
    seasonal indices c_i = x_i - level, then the standard additive
    recursion; the bucket value is the one-step-ahead forecast
    s + b + c. Unrolled to a fixed withColumn chain (window=2·period is
    a constant), so a 10^9-bucket series runs it as ONE window-function
    projection — no UDF, no iteration state. Incomplete windows emit
    NULL."""
    h = _lagged_hourly(spark, sf_dir, n=HW_WINDOW)
    for name, fn in _hw_steps():
        h = h.withColumn(name, fn(F.col))
    return h.select(
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.round(F.col("hw"), 6).alias("holt_winters"),
    )


def _holt_winters_sql() -> str:
    q = _lagged_sql(HW_WINDOW).format(hourly=_HOURLY_SQL)
    prev = "lg"
    sref = lambda n: _SqlExpr(n)  # noqa: E731
    for j, (name, fn) in enumerate(_hw_steps()):
        q += f", hw{j} AS (SELECT *, {fn(sref).s} AS {name} FROM {prev})"
        prev = f"hw{j}"
    return (
        q + f" SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour, "
        f"round(hw, 6) AS holt_winters FROM {prev}"
    )


def _hw_steps_mult():
    """Multiplicative-seasonality Holt-Winters unroll
    (search_aggs_pipeline_mov_avg.go HoltWintersMovAvgModel with
    SeasonalityType "mult"): seasonal indices are RATIOS to the level
    (c_i = x_i / level), the level update deseasonalizes by division,
    and the forecast re-applies the index multiplicatively
    ((s + b) * c). Same step-table shape as the additive model so the
    Spark chain and the SQL twin render from one source of truth."""
    a, bt, g, p = HW_ALPHA, HW_BETA, HW_GAMMA, HW_PERIOD
    steps = []

    def _level(c, p=p):
        e = c("x1")
        for i in range(2, p + 1):
            e = e + c(f"x{i}")
        return e / float(p)

    def _trend(c, p=p):
        e = c(f"x{p + 1}") - c("x1")
        for i in range(2, p + 1):
            e = e + (c(f"x{i + p}") - c(f"x{i}"))
        return e / float(p * p)

    steps.append((f"s{p}", _level))
    steps.append((f"b{p}", _trend))
    for i in range(1, p + 1):
        steps.append((f"c{i}", lambda c, i=i: c(f"x{i}") / c(f"s{p}")))
    for i in range(p + 1, 2 * p + 1):
        pv = i - 1
        steps.append(
            (f"s{i}", lambda c, i=i, pv=pv: a * (c(f"x{i}") / c(f"c{i - p}"))
             + (1.0 - a) * (c(f"s{pv}") + c(f"b{pv}")))
        )
        steps.append(
            (f"b{i}", lambda c, i=i, pv=pv: bt * (c(f"s{i}") - c(f"s{pv}"))
             + (1.0 - bt) * c(f"b{pv}"))
        )
        steps.append(
            (f"c{i}", lambda c, i=i, pv=pv: g * (c(f"x{i}") / c(f"s{i}"))
             + (1.0 - g) * c(f"c{i - p}"))
        )
    steps.append(
        ("hw", lambda c: (c(f"s{2 * p}") + c(f"b{2 * p}")) * c(f"c{p + 1}"))
    )
    return steps


def q_mov_avg_holt_winters_mult(spark, sf_dir):
    """mov_avg model=holt_winters type=mult: triple exponential
    smoothing with multiplicative seasonality — same unrolled
    one-window-projection plan as the additive model (no UDF, no
    iteration state; scale-safe for 10^9 buckets)."""
    h = _lagged_hourly(spark, sf_dir, n=HW_WINDOW)
    for name, fn in _hw_steps_mult():
        h = h.withColumn(name, fn(F.col))
    return h.select(
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.round(F.col("hw"), 6).alias("holt_winters_mult"),
    )


def _holt_winters_mult_sql() -> str:
    q = _lagged_sql(HW_WINDOW).format(hourly=_HOURLY_SQL)
    prev = "lg"
    sref = lambda n: _SqlExpr(n)  # noqa: E731
    for j, (name, fn) in enumerate(_hw_steps_mult()):
        q += f", hw{j} AS (SELECT *, {fn(sref).s} AS {name} FROM {prev})"
        prev = f"hw{j}"
    return (
        q + f" SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour, "
        f"round(hw, 6) AS holt_winters_mult FROM {prev}"
    )


def q_serial_diff(spark, sf_dir):
    """serial_diff lag=2 (search_aggs_pipeline_serial_diff.go)."""
    h = _hourly(spark, sf_dir)
    w = Window.orderBy("h")
    return h.select(
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        (F.col("c") - F.lag("c", 2).over(w)).cast("long").alias("sdiff"),
    )


def q_bucket_selector(spark, sf_dir):
    """bucket_selector = HAVING (search_aggs_pipeline_bucket_selector.go:16)."""
    h = _hourly(spark, sf_dir)
    return h.where(F.col("c") > 20).select(
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"), "c"
    )


def q_bucket_script_and_avg_bucket(spark, sf_dir):
    """bucket_script (v/c ratio per bucket) + avg_bucket / max_bucket
    second-level aggregation (search_aggs_pipeline_{bucket_script,
    avg_bucket,max_bucket}.go)."""
    h = _hourly(spark, sf_dir).withColumn("ratio", F.round(F.col("v") / F.col("c"), 6))
    return h.agg(
        F.round(F.avg("c"), 6).alias("avg_bucket_count"),
        F.max("c").cast("long").alias("max_bucket_count"),
        F.round(F.avg("ratio"), 6).alias("avg_ratio"),
    )


def q_min_sum_bucket(spark, sf_dir):
    """min_bucket / sum_bucket second-level aggregation
    (search_aggs_pipeline_{min_bucket,sum_bucket}.go) — the two bucket
    reducers avg/max_bucket left implied."""
    h = _hourly(spark, sf_dir)
    return h.agg(
        F.min("c").cast("long").alias("min_bucket_count"),
        F.sum("c").cast("long").alias("sum_bucket_count"),
        F.round(F.min("v"), 6).alias("min_bucket_value"),
        F.round(F.sum("v"), 6).alias("sum_bucket_value"),
    )


def q_sessionize(spark, sf_dir):
    """Sessionization (the custom stateful operator, batch shape): per-
    user sessions split at 30-min inactivity gaps over the events
    table. The streaming twin (applyInPandasWithState) is asserted
    output-identical in tests/test_sessionize.py."""
    from ..streaming.sessionize import sessionize

    s = sessionize(_events(spark, sf_dir), gap_sec=1800)
    return s.select(
        "user_id", "session_id", "n_events",
        F.date_format("t_start", "yyyy-MM-dd HH:mm:ss").alias("t_start"),
        F.date_format("t_end", "yyyy-MM-dd HH:mm:ss").alias("t_end"),
    )


def _tf_exploded(spark, sf_dir):
    """(doc_id, lang, term, tf) — the nested (term, tf) elements of
    each doc, the explode side of the §2.4 nested-agg mapping."""
    from ..analyzer import tokens_col

    d = _docs(spark, sf_dir).select(
        "doc_id", "lang", F.explode(tokens_col("text")).alias("term")
    )
    return d.groupBy("doc_id", "lang", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )


def q_nested_agg(spark, sf_dir):
    """nested agg (search_aggs_bucket_nested.go:10): per-lang bucket,
    metrics over the doc's nested (term, tf) elements with tf >= 3 —
    explode + groupBy, all JVM-side."""
    return (
        _tf_exploded(spark, sf_dir)
        .where(F.col("tf") >= 3)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("nested_count"),
            F.round(F.avg("tf"), 6).alias("avg_tf"),
        )
    )


def q_reverse_nested_agg(spark, sf_dir):
    """reverse_nested agg (search_aggs_bucket_reverse_nested.go):
    bucket by a NESTED field (term), then count ROOT docs per bucket.
    ``occurrence_count`` is total term occurrences (sum of tf) inside
    the bucket; ``doc_count`` is the reverse_nested root-doc count
    (distinct parents) — the ES reverse_nested number."""
    return (
        _tf_exploded(spark, sf_dir)
        .where(F.col("term").isin("dup", "scan"))
        .groupBy("term")
        .agg(
            F.sum("tf").cast("long").alias("occurrence_count"),
            F.countDistinct("doc_id").cast("long").alias("doc_count"),
        )
    )


def q_children_agg(spark, sf_dir):
    """children agg (search_aggs_bucket_children.go:11): bucket parents
    by lang, aggregate over their children (parent routing key =
    doc_id % 10, the relations.py fixture) — broadcast the tiny parent
    side into the child scan."""
    d = _docs(spark, sf_dir)
    parents = d.where(F.col("doc_id") < 10).select(
        F.col("doc_id").alias("parent_id"), F.col("lang").alias("parent_lang")
    )
    children = d.where(F.col("doc_id") >= 10).select(
        (F.col("doc_id") % 10).alias("parent_id"), F.length("text").alias("n_chars")
    )
    return (
        children.join(F.broadcast(parents), "parent_id")
        .groupBy("parent_lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("child_count"),
            F.round(F.avg("n_chars"), 6).alias("avg_child_chars"),
        )
    )


_TF_SQL = """tf AS (
  SELECT doc_id, lang, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, lang, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM documents)
  GROUP BY doc_id, lang, term
)"""

_HOURLY_SQL = (
    "SELECT date_trunc('hour', ts) AS h, count(*)::BIGINT AS c, round(sum(value), 6) AS v "
    "FROM events GROUP BY 1"
)

ENTRIES = {
    "agg_terms": (q_terms_agg, "SELECT lang, count(*)::BIGINT AS doc_count FROM documents GROUP BY lang"),
    "agg_nested": (
        q_nested_agg,
        f"""WITH {_TF_SQL}
SELECT lang, count(*)::BIGINT AS nested_count, round(avg(tf), 6) AS avg_tf
FROM tf WHERE tf >= 3 GROUP BY lang""",
    ),
    "agg_reverse_nested": (
        q_reverse_nested_agg,
        f"""WITH {_TF_SQL}
SELECT term, sum(tf)::BIGINT AS occurrence_count, count(DISTINCT doc_id)::BIGINT AS doc_count
FROM tf WHERE term IN ('dup', 'scan') GROUP BY term""",
    ),
    "agg_children": (
        q_children_agg,
        """SELECT p.lang AS parent_lang, count(*)::BIGINT AS child_count,
       round(avg(length(c.text)), 6) AS avg_child_chars
FROM documents c JOIN documents p ON p.doc_id = c.doc_id % 10 AND p.doc_id < 10
WHERE c.doc_id >= 10 GROUP BY p.lang""",
    ),
    "agg_histogram": (
        q_histogram,
        "SELECT (floor(length(text) / 50) * 50)::BIGINT AS bucket, count(*)::BIGINT AS doc_count "
        "FROM documents GROUP BY 1",
    ),
    "agg_date_histogram": (
        q_date_histogram,
        "SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, "
        "count(*)::BIGINT AS doc_count FROM events GROUP BY 1",
    ),
    "agg_range": (
        q_range_agg,
        "SELECT CASE WHEN length(text) < 100 THEN 'lt100' WHEN length(text) < 300 THEN '100-300' "
        "ELSE 'gte300' END AS bucket, count(*)::BIGINT AS doc_count FROM documents GROUP BY 1",
    ),
    "agg_date_range": (
        q_date_range_agg,
        "SELECT CASE WHEN ts < TIMESTAMP '2024-01-10' THEN 'early' "
        "WHEN ts < TIMESTAMP '2024-01-20' THEN 'mid' ELSE 'late' END AS bucket, "
        "count(*)::BIGINT AS doc_count, round(sum(value), 6) AS vsum FROM events GROUP BY 1",
    ),
    "agg_global": (
        q_global_agg,
        "SELECT round(avg(value), 6) AS avg_all, "
        "round(avg(CASE WHEN event_type = 'click' THEN value END), 6) AS avg_clicks FROM events",
    ),
    "agg_filters": (
        q_filters_agg,
        "SELECT sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS clicks, "
        "sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS errors, "
        "sum(CASE WHEN value > 100 THEN 1 ELSE 0 END)::BIGINT AS big_value FROM events",
    ),
    "agg_missing": (
        q_missing_agg,
        "SELECT sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END)::BIGINT AS missing_props FROM events",
    ),
    "agg_significant_terms": (
        q_significant_terms,
        """WITH toks AS (
  SELECT doc_id, lang, unnest(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS term
  FROM documents
),
bg AS (SELECT term, count(*)::DOUBLE AS bg_df FROM toks GROUP BY term),
fg AS (SELECT term, count(*)::DOUBLE AS fg_df FROM toks WHERE lang = 'de' GROUP BY term),
n AS (SELECT count(*)::DOUBLE AS bg_n, (SELECT count(*) FROM documents WHERE lang = 'de')::DOUBLE AS fg_n FROM documents)
SELECT term, round((fg_df / fg_n) / (bg_df / bg_n), 6) AS score
FROM fg JOIN bg USING (term) CROSS JOIN n
ORDER BY score DESC, term ASC LIMIT 5""",
    ),
    "agg_sampler": (
        q_sampler_agg,
        "SELECT count(*)::BIGINT AS sample_n, round(avg(length(text)), 6) AS avg_n_chars "
        "FROM documents "
        "WHERE cast(('0x' || substr(md5(doc_id::VARCHAR), 1, 15)) AS BIGINT) % 10 = 0",
    ),
    "agg_stats": (
        q_stats_agg,
        "SELECT count(value)::BIGINT AS n, round(min(value), 6) AS vmin, round(max(value), 6) AS vmax, "
        "round(sum(value), 6) AS vsum, round(avg(value), 6) AS vavg, round(stddev(value), 6) AS vstd FROM events",
    ),
    "agg_extended_stats": (
        q_extended_stats,
        """WITH m AS (
  SELECT count(value)::DOUBLE AS n, avg(value) AS mu, avg(value * value) AS m2r,
         avg(pow(value, 3)) AS m3r, avg(pow(value, 4)) AS m4r FROM events
)
SELECT round(m2r - mu * mu, 6) AS var_pop,
       round((m3r - 3 * mu * m2r + 2 * pow(mu, 3)) / pow(m2r - mu * mu, 1.5), 6) AS skew_pop,
       round((m4r - 4 * mu * m3r + 6 * mu * mu * m2r - 3 * pow(mu, 4)) / pow(m2r - mu * mu, 2) - 3, 6) AS kurt_pop
FROM m""",
    ),
    "agg_cardinality": (
        q_cardinality,
        "SELECT count(DISTINCT user_id)::BIGINT AS users FROM events",
    ),
    "agg_percentiles": (
        q_percentiles,
        "SELECT round(quantile_cont(value, 0.5), 6) AS p50, round(quantile_cont(value, 0.95), 6) AS p95, "
        "round(quantile_cont(value, 0.99), 6) AS p99 FROM events",
    ),
    "agg_percentile_ranks": (
        q_percentile_ranks,
        "SELECT round(avg(CASE WHEN value <= 50 THEN 1.0 ELSE 0.0 END) * 100, 6) AS rank_50, "
        "round(avg(CASE WHEN value <= 200 THEN 1.0 ELSE 0.0 END) * 100, 6) AS rank_200, "
        "round(avg(CASE WHEN value <= 800 THEN 1.0 ELSE 0.0 END) * 100, 6) AS rank_800 FROM events",
    ),
    "agg_top_hits": (
        q_top_hits,
        "SELECT lang, doc_id, n_chars, rn FROM (SELECT lang, doc_id, length(text) AS n_chars, "
        "row_number() OVER (PARTITION BY lang ORDER BY length(text) DESC, doc_id ASC)::BIGINT AS rn "
        "FROM documents) WHERE rn <= 2",
    ),
    "pipeline_derivative": (
        q_derivative,
        f"WITH h AS ({_HOURLY_SQL}) SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour, "
        "(c - lag(c) OVER (ORDER BY h))::BIGINT AS deriv FROM h",
    ),
    "pipeline_cumulative_sum": (
        q_cumulative_sum,
        f"WITH h AS ({_HOURLY_SQL}) SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour, "
        "sum(c) OVER (ORDER BY h ROWS UNBOUNDED PRECEDING)::BIGINT AS cum FROM h",
    ),
    "pipeline_moving_avg": (
        q_moving_avg,
        f"WITH h AS ({_HOURLY_SQL}) SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour, "
        "round(avg(c) OVER (ORDER BY h ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS mov_avg FROM h",
    ),
    "windowed_counts": (q_windowed_counts, _windowed_counts_sql()),
    "agg_cardinality_hll": (q_cardinality_hll, _cardinality_hll_sql()),
    "agg_terms_cms": (q_terms_cms, _terms_cms_sql()),
    "pipeline_mov_avg_ewma": (q_mov_avg_ewma, _ewma_sql()),
    "pipeline_mov_avg_holt": (q_mov_avg_holt, _holt_sql()),
    "pipeline_mov_avg_holt_winters": (q_mov_avg_holt_winters, _holt_winters_sql()),
    "pipeline_mov_avg_holt_winters_mult": (
        q_mov_avg_holt_winters_mult,
        _holt_winters_mult_sql(),
    ),
    "pipeline_serial_diff": (
        q_serial_diff,
        f"WITH h AS ({_HOURLY_SQL}) SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour, "
        "(c - lag(c, 2) OVER (ORDER BY h))::BIGINT AS sdiff FROM h",
    ),
    "pipeline_bucket_selector": (
        q_bucket_selector,
        f"WITH h AS ({_HOURLY_SQL}) SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour, c FROM h WHERE c > 20",
    ),
    "pipeline_bucket_script": (
        q_bucket_script_and_avg_bucket,
        f"""WITH h AS ({_HOURLY_SQL}), r AS (SELECT *, round(v / c, 6) AS ratio FROM h)
SELECT round(avg(c), 6) AS avg_bucket_count, max(c)::BIGINT AS max_bucket_count,
       round(avg(ratio), 6) AS avg_ratio FROM r""",
    ),
    "sessionize_events": (
        q_sessionize,
        """WITH base AS (SELECT * FROM ({inner}))
SELECT user_id, session_id, n_events,
       strftime(t_start, '%Y-%m-%d %H:%M:%S') AS t_start,
       strftime(t_end, '%Y-%m-%d %H:%M:%S') AS t_end
FROM base""".format(inner=__import__("go_mysql_elasticsearch_spark.streaming.sessionize", fromlist=["x"]).sessionize_oracle_sql(1800)),
    ),
    "pipeline_min_sum_bucket": (
        q_min_sum_bucket,
        f"""WITH h AS ({_HOURLY_SQL})
SELECT min(c)::BIGINT AS min_bucket_count, sum(c)::BIGINT AS sum_bucket_count,
       round(min(v), 6) AS min_bucket_value, round(sum(v), 6) AS sum_bucket_value FROM h""",
    ),
}
