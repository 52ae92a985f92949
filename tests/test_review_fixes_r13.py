"""r13 review fixes: de-skewed analytic aggregate/group_count (groupBy +
null-safe join-back instead of Window.partitionBy(group) — the hot-key
window partition is the one shuffle-skew shape AQE cannot split), the
broadcast-hint guard on the hot-key census, and the analytic forms that
the window path rejected (quantiles, Python callables) now working."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from omigo_data_analytics_spark import OmigoDF

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    df = entry.queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_aggregate_analytic_has_no_window(spark):
    """collapse=False compiles to partial-agg groupBy + join-back: no
    WindowExec anywhere in the plan (a hot group would be ONE task)."""
    p = _plan(spark, "aggregate_analytic")
    assert "Window" not in p
    assert "HashAggregate" in p  # partial-aggregated census


def test_group_count_analytic_has_no_window(spark):
    df = entry.queries()["group_count"](spark, SF)  # uses collapse inside
    li = OmigoDF(df.sparkSession.read.parquet(f"{SF}/lineitem.parquet"))
    out = li.group_count(["l_returnflag"], prefix="g", collapse=False)
    p = out.df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in p


def test_aggregate_analytic_values_match_window_semantics(spark):
    """Join-back parity with the old window path, including NULL group
    keys (eqNullSafe: NULL is a real group, same as partitionBy)."""
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), (None, 10.0), (None, 20.0), ("b", 5.0)],
        ["g", "v"])
    out = OmigoDF(df).aggregate(["g"], ["v"], ["sumfloat"], collapse=False)
    assert out.num_rows() == 5
    got = {(r["g"], r["v"]): r["v:sumfloat"] for r in out.df.collect()}
    assert got[("a", 1.0)] == 3.0 and got[("a", 2.0)] == 3.0
    assert got[(None, 10.0)] == 30.0 and got[(None, 20.0)] == 30.0
    assert got[("b", 5.0)] == 5.0


def test_aggregate_analytic_replaces_colliding_output_name(spark):
    """withColumn semantics: an existing column named like the output is
    replaced in place, not duplicated."""
    df = spark.createDataFrame([("a", 1.0, 99.0), ("a", 2.0, 99.0)],
                               ["g", "v", "v:sumfloat"])
    out = OmigoDF(df).aggregate(["g"], ["v"], ["sumfloat"], collapse=False)
    assert out.columns == ["g", "v", "v:sumfloat"]
    assert all(r["v:sumfloat"] == 3.0 for r in out.df.collect())


def test_aggregate_analytic_quantile_now_supported(spark):
    """quantile/median were _WINDOW_UNSUPPORTED; the groupBy+join-back
    path runs every registry aggregate (reference parity: its analytic
    mode reuses the same funcs, dataframe.py:1080-1123)."""
    df = spark.createDataFrame(
        [("a", "1"), ("a", "2"), ("a", "3"), ("b", "10")], ["g", "v"])
    out = OmigoDF(df).aggregate(["g"], ["v"], ["median"], collapse=False)
    got = {r["g"]: r["v:median"] for r in out.df.collect()}
    assert got["a"] == 2.0 and got["b"] == 10.0


def test_aggregate_analytic_python_callable_now_supported(spark):
    def span(vals):
        fs = [float(v) for v in vals if v != ""]
        return max(fs) - min(fs)

    df = spark.createDataFrame([("a", "1"), ("a", "4"), ("b", "7")],
                               ["g", "v"])
    out = OmigoDF(df).aggregate(["g"], ["v"], [span], collapse=False)
    got = {r["g"]: r["v:span"] for r in out.df.collect()}
    assert got["a"] == "3.0" and got["b"] == "0.0"


def test_aggregate_analytic_empty_grouping_is_broadcast_total(spark):
    df = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], ["v"])
    out = OmigoDF(df).aggregate([], ["v"], ["sumfloat"], collapse=False)
    assert sorted(r["v:sumfloat"] for r in out.df.collect()) == [6.0] * 3
    p = out.df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in p


def test_hot_key_census_broadcast_hint_guarded(spark):
    """threshold below BROADCAST_HINT_MIN_THRESHOLD → census may be every
    distinct key, so the explicit broadcast hint (which bypasses AQE's
    size check) is withheld; above it the hint applies (r12 advice)."""
    from omigo_data_analytics_spark.operators.timeseries import _hot_key_split

    df = spark.createDataFrame([("k%d" % i, i) for i in range(10)], ["k", "v"])
    hot_lo, _ = _hot_key_split(df, ["k"], 1)
    assert "ResolvedHint" not in hot_lo._jdf.queryExecution().analyzed().toString()
    hot_hi, _ = _hot_key_split(df, ["k"], 4096)
    assert "ResolvedHint" in hot_hi._jdf.queryExecution().analyzed().toString()
    # routing still exact under the low threshold
    assert hot_lo.count() == 10


def test_hot_key_census_runs_once_localcheckpointed(spark):
    """the census is localCheckpointed: its aggregation does not re-run
    per semi/anti join (r12 advice: lineage re-evaluation)."""
    from omigo_data_analytics_spark.operators.timeseries import _hot_keys_census

    df = spark.createDataFrame([("a", 1)] * 5 + [("b", 2)], ["k", "v"])
    hk = _hot_keys_census(df, ["k"], 3)
    # a checkpointed frame's plan is a scan of materialized blocks
    assert "Scan ExistingRDD" in hk._jdf.queryExecution().executedPlan().toString()
    assert [r["k"] for r in hk.collect()] == ["a"]
