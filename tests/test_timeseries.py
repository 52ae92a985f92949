"""Time-series operators: as-of join, range join, sessionization —
semantics checked against hand-computed expectations on synthetic frames
and against brute-force joins on real testdata."""

import pytest
from pyspark.sql import functions as F

from omigo_data_analytics_spark import OmigoDF
from omigo_data_analytics_spark.operators import timeseries as TS


@pytest.fixture(scope="module")
def quotes(spark):
    # (key, t, px): the right side of the as-of join
    rows = [("a", 1.0, 10.0), ("a", 5.0, 11.0), ("a", 9.0, 12.0),
            ("b", 2.0, 20.0)]
    return OmigoDF(spark.createDataFrame(rows, "k string, t double, px double"))


@pytest.fixture(scope="module")
def trades(spark):
    rows = [("a", 0.5), ("a", 1.0), ("a", 6.0), ("a", 100.0),
            ("b", 1.0), ("c", 3.0)]
    return OmigoDF(spark.createDataFrame(rows, "k string, t double"))


def test_asof_backward_inclusive(trades, quotes):
    out = TS.asof_join(trades, quotes, on="k", left_time="t",
                       right_time="t", suffix="q").df
    got = {(r["k"], r["t"]): r["q:px"] for r in out.collect()}
    assert got == {
        ("a", 0.5): None,       # before first quote
        ("a", 1.0): 10.0,       # same-timestamp quote visible
        ("a", 6.0): 11.0,       # latest at-or-before
        ("a", 100.0): 12.0,     # carries arbitrarily far forward
        ("b", 1.0): None,       # b's quote is at t=2 (future)
        ("c", 3.0): None,       # key with no right rows at all
    }
    assert out.count() == 6  # left join: every left row survives


def test_asof_tolerance(trades, quotes):
    out = TS.asof_join(trades, quotes, on="k", left_time="t",
                       suffix="q", tolerance_sec=10.0).df
    got = {(r["k"], r["t"]): r["q:px"] for r in out.collect()}
    assert got[("a", 100.0)] is None  # match is 91s stale > 10s horizon
    assert got[("a", 6.0)] == 11.0


def test_asof_vs_bruteforce_events(spark, events):
    """purchase events vs the latest view event per user — union-window
    result must equal the brute-force inequality-join result."""
    ev = events.df.select("user_id", "event_id", "ts", "event_type",
                          "value").limit(4000)
    left = OmigoDF(ev.where("event_type = 'purchase'"))
    right = OmigoDF(ev.where("event_type = 'view'")
                    .select("user_id", "ts", F.col("event_id").alias("view_id")))
    out = TS.asof_join(left, right, on="user_id", left_time="ts",
                       suffix="v").df
    # brute force: max view ts <= purchase ts, then its id
    l, r = ev.where("event_type = 'purchase'").alias("l"), \
        ev.where("event_type = 'view'").alias("r")
    bf = (l.join(r, (F.col("l.user_id") == F.col("r.user_id"))
                 & (F.col("r.ts") <= F.col("l.ts")), "left")
          .groupBy("l.event_id")
          .agg(F.max_by(F.col("r.event_id"), F.col("r.ts")).alias("view_id")))
    got = {r["event_id"]: r["v:view_id"] for r in out.collect()}
    want = {r["event_id"]: r["view_id"] for r in bf.collect()}
    assert got == want


def test_range_join_binned_equals_bruteforce(spark):
    pts = OmigoDF(spark.createDataFrame(
        [(i, float(i * 7 % 100)) for i in range(200)], "pid long, x double"))
    iv = OmigoDF(spark.createDataFrame(
        [(j, float(j * 13 % 90), float(j * 13 % 90 + 12)) for j in range(50)],
        "iid long, lo double, hi double"))
    out = TS.range_join(pts, iv, "x", "lo", "hi", bin_width=8.0).df
    got = {(r["pid"], r["iid"]) for r in out.collect()}
    bf = (pts.df.alias("p").join(
        iv.df.alias("i"),
        (F.col("p.x") >= F.col("i.lo")) & (F.col("p.x") <= F.col("i.hi"))))
    want = {(r["pid"], r["iid"]) for r in bf.select("pid", "iid").collect()}
    assert got == want and len(got) > 0


def test_range_join_with_keys(spark):
    pts = OmigoDF(spark.createDataFrame(
        [("a", 1, 5.0), ("a", 2, 50.0), ("b", 3, 5.0)],
        "k string, pid long, x double"))
    iv = OmigoDF(spark.createDataFrame(
        [("a", 10, 0.0, 10.0), ("b", 11, 40.0, 60.0)],
        "k string, iid long, lo double, hi double"))
    out = TS.range_join(pts, iv, "x", "lo", "hi", on=["k"], bin_width=10.0).df
    got = {(r["pid"], r["iid"]) for r in out.collect()}
    assert got == {(1, 10)}  # key must match AND range must contain


def test_range_join_left_preserves_unmatched_points(spark):
    # the range predicate rides the join condition: a left join keeps
    # every point, with NULL interval cols for non-contained points
    pts = OmigoDF(spark.createDataFrame(
        [(1, 5.0), (2, 50.0), (3, 7.0)], "pid long, x double"))
    iv = OmigoDF(spark.createDataFrame(
        [(10, 0.0, 10.0)], "iid long, lo double, hi double"))
    out = TS.range_join(pts, iv, "x", "lo", "hi", bin_width=8.0,
                        how="left").df
    got = {(r["pid"], r["iid"]) for r in out.collect()}
    assert got == {(1, 10), (3, 10), (2, None)}
    with pytest.raises(ValueError, match="unsupported"):
        TS.range_join(pts, iv, "x", "lo", "hi", how="full")


def test_sessionize_gaps(spark):
    rows = [("u", 0.0), ("u", 100.0), ("u", 5000.0), ("u", 5100.0),
            ("u", 99999.0), ("v", 1.0)]
    d = OmigoDF(spark.createDataFrame(rows, "k string, t double"))
    out = TS.sessionize(d, "k", "t", gap_sec=1800.0).df
    got = {(r["k"], r["t"]): r["session_id"] for r in out.collect()}
    assert got == {("u", 0.0): 1, ("u", 100.0): 1,
                   ("u", 5000.0): 2, ("u", 5100.0): 2,
                   ("u", 99999.0): 3, ("v", 1.0): 1}


def test_session_stats(spark):
    rows = [("u", 0.0), ("u", 100.0), ("u", 5000.0)]
    d = OmigoDF(spark.createDataFrame(rows, "k string, t double"))
    out = TS.session_stats(d, "k", "t", gap_sec=1800.0).df
    got = {r["session_id"]: (r["session_start"], r["session_end"],
                             r["duration_sec"], r["n_events"])
           for r in out.collect()}
    assert got == {1: (0.0, 100.0, 100.0, 2), 2: (5000.0, 5000.0, 0.0, 1)}


def test_asof_plan_single_window_exchange(trades, quotes):
    """The as-of join must compile to ONE hash-partitioned exchange +
    window — no inequality join, no cartesian."""
    out = TS.asof_join(trades, quotes, on="k", left_time="t").df
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Window") >= 1


def test_asof_forward(trades, quotes):
    out = TS.asof_join(trades, quotes, on="k", left_time="t",
                       suffix="q", direction="forward").df
    got = {(r["k"], r["t"]): r["q:px"] for r in out.collect()}
    assert got == {
        ("a", 0.5): 10.0,      # earliest at-or-after
        ("a", 1.0): 10.0,      # same-timestamp inclusive
        ("a", 6.0): 12.0,
        ("a", 100.0): None,    # nothing after
        ("b", 1.0): 20.0,
        ("c", 3.0): None,
    }


def test_asof_forward_tolerance(trades, quotes):
    out = TS.asof_join(trades, quotes, on="k", left_time="t", suffix="q",
                       direction="forward", tolerance_sec=2.0).df
    got = {(r["k"], r["t"]): r["q:px"] for r in out.collect()}
    assert got[("a", 6.0)] is None    # next quote is 3s ahead > 2s horizon
    assert got[("a", 0.5)] == 10.0    # 0.5s ahead, inside horizon


def test_rolling_aggregate(spark):
    rows = [("u", float(t), float(v)) for t, v in
            [(1, 10), (2, 20), (3, 30), (4, 40), (5, 50), (6, 60), (7, 70)]]
    d = OmigoDF(spark.createDataFrame(rows, "k string, t double, v double"))
    out = TS.rolling_aggregate(d, "k", "t", ["v"], ["mean"], window_rows=3).df
    got = {r["t"]: r["v:rolling_mean"] for r in out.collect()}
    assert got[1.0] == 10.0          # window of 1
    assert got[2.0] == 15.0          # (10+20)/2
    assert got[7.0] == 60.0          # (50+60+70)/3


def test_merge_intervals_islands(spark):
    rows = [("u", 0.0, 10.0), ("u", 5.0, 12.0), ("u", 20.0, 25.0),
            ("v", 1.0, 2.0)]
    d = OmigoDF(spark.createDataFrame(rows, "k string, lo double, hi double"))
    out = TS.merge_intervals(d, "k", "lo", "hi").df
    got = {(r["k"], r["island_id"]): (r["island_start"], r["island_end"],
                                      r["n_intervals"])
           for r in out.collect()}
    assert got[("u", 1)] == (0.0, 12.0, 2)   # overlapping pair merged
    assert got[("u", 2)] == (20.0, 25.0, 1)
    assert got[("v", 1)] == (1.0, 2.0, 1)


def test_merge_intervals_contained(spark):
    # an interval fully inside an earlier one must not split the island
    rows = [("u", 0.0, 100.0), ("u", 10.0, 20.0), ("u", 50.0, 200.0)]
    d = OmigoDF(spark.createDataFrame(rows, "k string, lo double, hi double"))
    out = TS.merge_intervals(d, "k", "lo", "hi").df.collect()
    assert len(out) == 1 and out[0]["island_end"] == 200.0


def test_asof_nearest(trades, quotes):
    out = TS.asof_join(trades, quotes, on="k", left_time="t",
                       suffix="q", direction="nearest").df
    got = {(r["k"], r["t"]): r["q:px"] for r in out.collect()}
    assert got == {
        ("a", 0.5): 10.0,     # only forward exists
        ("a", 1.0): 10.0,     # exact hit
        ("a", 6.0): 11.0,     # back 1s vs fwd 3s -> backward
        ("a", 100.0): 12.0,   # only backward exists
        ("b", 1.0): 20.0,
        ("c", 3.0): None,
    }


def test_asof_nearest_tolerance_and_tie(spark):
    q = OmigoDF(spark.createDataFrame(
        [("a", 1.0, 1.0), ("a", 5.0, 2.0)], "k string, t double, px double"))
    l = OmigoDF(spark.createDataFrame(
        [("a", 3.0), ("a", 50.0)], "k string, t double"))
    out = TS.asof_join(l, q, on="k", left_time="t", suffix="q",
                       direction="nearest", tolerance_sec=10.0).df
    got = {r["t"]: r["q:px"] for r in out.collect()}
    assert got[3.0] == 1.0     # tie (2s both ways) -> backward row
    assert got[50.0] is None   # both sides beyond tolerance


def test_asof_nearest_single_exchange(trades, quotes):
    plan = (TS.asof_join(trades, quotes, on="k", left_time="t",
                         direction="nearest").df
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan


def test_range_join_rejects_shared_nonkey_names(spark):
    """Shared non-key column names would produce duplicate output names
    (unselectable downstream) and an ambiguous range predicate — reject
    up front, like the core join's collision rule."""
    p = OmigoDF(spark.createDataFrame([(1, 5.0, "x")], ["k", "ts", "name"]))
    i = OmigoDF(spark.createDataFrame(
        [(1, 0.0, 10.0, "y")], ["k", "s", "e", "name"]))
    with pytest.raises(ValueError, match="both sides"):
        TS.range_join(p, i, "ts", "s", "e", on=["k"])


def test_rolling_aggregate_overflow_raises(spark):
    """A value that parses as double but overflows DECIMAL(28,8) must
    raise, not silently vanish from the window sum while the count
    denominator keeps it."""
    df = OmigoDF(spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, 1e22), ("a", 3, 2.0)],
        ["k", "t", "v"]))
    with pytest.raises(Exception, match="decimal overflow"):
        (TS.rolling_aggregate(df, "k", "t", ["v"], ["mean"], window_rows=2)
         .df.collect())
