"""Stats (Welch t / KS) and SQL pushdown tests."""

import math
import random

from omigo_data_analytics_spark import OmigoDF
from omigo_data_analytics_spark.operators import stats as SS
from omigo_data_analytics_spark.sources import sql as SQ


def test_welch_ttest_detects_shift(spark):
    rng = random.Random(7)
    a = spark.createDataFrame([(rng.gauss(0, 1),) for _ in range(300)], ["x"])
    b = spark.createDataFrame([(rng.gauss(1, 1),) for _ in range(300)], ["x"])
    r = SS.welch_ttest(OmigoDF(a), OmigoDF(b), "x")
    assert r["n1"] == 300 and r["n2"] == 300
    assert r["t_stat"] < -5          # strong shift
    assert r["p_value"] < 0.001


def test_welch_ttest_null_case(spark):
    rng = random.Random(9)
    a = spark.createDataFrame([(rng.gauss(0, 1),) for _ in range(200)], ["x"])
    b = spark.createDataFrame([(rng.gauss(0, 1),) for _ in range(200)], ["x"])
    r = SS.welch_ttest(OmigoDF(a), OmigoDF(b), "x")
    assert abs(r["t_stat"]) < 3


def test_ks_matches_manual(spark):
    xs = [1.0, 2.0, 3.0, 4.0]
    ys = [3.0, 4.0, 5.0, 6.0]
    r = SS.ks_test(OmigoDF(spark.createDataFrame([(v,) for v in xs], ["x"])),
                   OmigoDF(spark.createDataFrame([(v,) for v in ys], ["x"])), "x")
    assert math.isclose(r["d_stat"], 0.5)   # CDF gap at x in [2,3)
    assert 0 <= r["p_value"] <= 1


def test_do_ttest_report_shape(spark):
    a = spark.createDataFrame([(float(i),) for i in range(50)], ["x"])
    b = spark.createDataFrame([(float(i + 30),) for i in range(50)], ["x"])
    rep = SS.do_ttest(OmigoDF(a), OmigoDF(b), "x")
    assert rep["ttest_reject"] and rep["ks_reject"]
    assert {"ttest_t_stat", "ks_d_stat", "alpha"} <= set(rep)


def test_ttest_single_row_side_no_zerodiv(spark):
    # one side with exactly 1 row: v=0 there, Welch-Satterthwaite term
    # must be guarded (0.0/0 raised before the fix)
    a = spark.createDataFrame([(5.0,)], ["x"])
    b = spark.createDataFrame([(float(i),) for i in range(20)], ["x"])
    w = SS.welch_ttest(OmigoDF(a), OmigoDF(b), "x")
    assert w["n1"] == 1 and math.isfinite(w["df"]) and w["df"] > 0
    rep = SS.do_ttest(OmigoDF(a), OmigoDF(b), "x")
    assert rep["ttest_n1"] == 1 and math.isfinite(rep["ttest_df"])
    # both sides single-row: se2 == 0 path, pooled fallback stays >= 1
    w2 = SS.welch_ttest(OmigoDF(a), OmigoDF(spark.createDataFrame([(7.0,)], ["x"])), "x")
    assert w2["df"] >= 1 and w2["t_stat"] == 0.0


def test_do_ttest_matches_unfused(spark):
    rng = random.Random(11)
    a = spark.createDataFrame([(rng.gauss(0, 2),) for _ in range(150)], ["x"])
    b = spark.createDataFrame([(rng.gauss(0.5, 1),) for _ in range(120)], ["x"])
    oa, ob = OmigoDF(a), OmigoDF(b)
    w = SS.welch_ttest(oa, ob, "x", precision=None)
    k = SS.ks_test(oa, ob, "x", precision=None)
    rep = SS.do_ttest(oa, ob, "x", precision=None)
    assert rep["ttest_t_stat"] == w["t_stat"] and rep["ttest_df"] == w["df"]
    assert rep["ttest_var1"] == w["var1"] and rep["ttest_var2"] == w["var2"]
    assert rep["ks_d_stat"] == k["d_stat"]


def test_sql_execute_query(spark):
    df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], ["v", "g"])
    SQ.register_table(OmigoDF(df), "t_sql_test")
    out = SQ.execute_query(spark, ["g", "SUM(v) AS s"], "t_sql_test",
                           where="v > 0", group_by="g", having="SUM(v) > 2",
                           order_by="g", limit=10)
    rows = [(r["g"], r["s"]) for r in out.df.collect()]
    assert rows == [("a", 3), ("b", 3)]
    assert SQ.build_query(["x"], "t", distinct=True) == "SELECT DISTINCT x FROM t"


def test_sql_execute_query_reference_shape(spark):
    """List group_by: unselected group cols prepend to the select and
    GROUP BY emits ordinals (sql_helper.py effective-columns behavior);
    order list + sort_order; map_col JSON-serializes a map column."""
    q = SQ.build_query(["SUM(v) AS s"], "t", group_by=["g", "h"],
                       order_by=["g", "h"], sort_order="desc")
    assert q == ("SELECT g, h, SUM(v) AS s FROM t GROUP BY 1, 2 "
                 "ORDER BY g, h desc")
    # alias-aware, case-insensitive dedup: G already selected via alias base
    q2 = SQ.build_query(["G AS grp", "SUM(v) AS s"], "t", group_by=["g"])
    assert q2 == "SELECT G AS grp, SUM(v) AS s FROM t GROUP BY 1"
    df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], ["v", "g"])
    SQ.register_table(OmigoDF(df), "t_sql_ref")
    out = SQ.execute_query(spark, ["SUM(v) AS s"], "t_sql_ref",
                           group_by=["g"], order_by=["g"])
    assert [(r["g"], r["s"]) for r in out.df.collect()] == [("a", 3), ("b", 3)]
    # map_col serialization
    m = spark.createDataFrame([(1,)], ["k"]).selectExpr(
        "k", "map('a', 1) AS mc")
    SQ.register_table(OmigoDF(m), "t_sql_map")
    got = SQ.execute_query(spark, ["k", "mc"], "t_sql_map", map_col="MC")
    row = got.df.first()
    assert row["mc"] == '{"a":1}'


def test_ks_identical_samples_p_is_one(spark, lineitem):
    """D=0 (identical samples) must give p=1, not 0: the truncated
    alternating series returns 0 at lam=0, flipping ks_reject for
    indistinguishable distributions."""
    from omigo_data_analytics_spark.operators import stats as SS

    a = OmigoDF(lineitem.df.where("l_orderkey % 7 = 0"))
    r = SS.ks_test(a, a, "l_quantity")
    assert r["d_stat"] == 0.0 and r["p_value"] == 1.0
    t = SS.do_ttest(a, a, "l_quantity")
    assert t["ks_p_value"] == 1.0 and t["ks_reject"] is False


def test_ks_empty_side_no_crash(spark, lineitem):
    from omigo_data_analytics_spark.operators import stats as SS

    empty = OmigoDF(lineitem.df.where("l_orderkey < 0"))
    r = SS.ks_test(empty, lineitem, "l_quantity")
    assert r["n1"] == 0 and r["p_value"] == 1.0


def test_welch_ttest_empty_side_matches_do_ttest(spark):
    # one EMPTY side: the two-sample statistic is undefined; both paths
    # must agree on the degenerate (t=0) report instead of welch_ttest
    # silently testing the non-empty side against mean 0 (r10 review)
    a = spark.createDataFrame([(float(i),) for i in range(10)], ["x"])
    b = spark.createDataFrame([], "x double")
    w = SS.welch_ttest(OmigoDF(a), OmigoDF(b), "x")
    rep = SS.do_ttest(OmigoDF(a), OmigoDF(b), "x")
    assert w["t_stat"] == 0.0 == rep["ttest_t_stat"]
    assert w["n2"] == 0 == rep["ttest_n2"]
    assert rep["ks_d_stat"] == 0.0
