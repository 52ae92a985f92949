"""Regression tests for the r10 self-review findings over core/dataframe.py:
ANSI cast edges, NULL-slot key hashing, group_by_key missing-value contract,
reorder's use_existing_order, split_batches determinism, cols_as_map NULLs,
normalize's broadcast, and the int(float(x)) convention in cumulative_sum."""

from pyspark.sql import functions as F

from omigo_data_analytics_spark import OmigoDF


def test_to_int_nan_overflow_yields_null_not_throw(spark):
    """Under Spark 4 ANSI mode, double->long CAST throws on NaN/overflow;
    to_int must instead produce NULL (the missing-value convention)."""
    df = spark.createDataFrame(
        [(1, "3.7"), (2, "NaN"), (3, "1e300"), (4, "junk"), (5, None)],
        "id long, v string")
    out = {r["id"]: r["v"] for r in
           OmigoDF(df).to_int("v").df.collect()}
    assert out == {1: 3, 2: None, 3: None, 4: None, 5: None}


def test_typed_filter_int_survives_nan_rows(spark):
    """eq_int over a column containing NaN text must not abort the job."""
    df = spark.createDataFrame(
        [(1, "5"), (2, "NaN"), (3, "1e300")], "id long, v string")
    got = [r["id"] for r in OmigoDF(df).eq_int("v", 5).df.collect()]
    assert got == [1]


def test_replicate_rows_nan_drops_row(spark):
    df = spark.createDataFrame(
        [(1, "2"), (2, "NaN")], "id long, n string")
    got = sorted(r["id"] for r in
                 OmigoDF(df).replicate_rows("n").df.collect())
    assert got == [1, 1]


def test_cumulative_sum_as_int_floats_like_reference(spark):
    """as_int=True follows int(float(x)): '3.5' contributes 3, never a
    silent NULL (a bare try_cast('long') nulls float-formatted text)."""
    df = spark.createDataFrame([(1, "3.5"), (2, "2")], "id long, v string")
    out = {r["id"]: r["cs"] for r in
           OmigoDF(df).cumulative_sum("v", "cs", sort_cols=["id"],
                                      as_int=True, exact=False).df.collect()}
    assert out == {1: 3, 2: 5}


def test_generate_key_hash_null_position_distinct(spark):
    """('x', NULL) and (NULL, 'x') are different rows and MUST hash
    differently (concat_ws alone would skip the NULL and collide them);
    whitespace normalization is the reference's tab/newline->space, not
    trim."""
    df = spark.createDataFrame(
        [(1, "x", None), (2, None, "x"), (3, "a\tb", None), (4, "a b", None)],
        "id long, c1 string, c2 string")
    out = {r["id"]: r["key_hash"] for r in
           OmigoDF(df).generate_key_hash(["c1", "c2"]).df.collect()}
    assert out[1] != out[2]
    assert out[3] == out[4]  # embedded tab normalizes to one space
    # NULL and '' occupy the slot identically (both are "missing")
    df2 = spark.createDataFrame([(5, "", "x")], "id long, c1 string, c2 string")
    h5 = OmigoDF(df2).generate_key_hash(["c1", "c2"]).df.collect()[0]["key_hash"]
    assert h5 == out[2]


def test_arg_max_null_arg_keeps_topk_slot(spark):
    """A NULL arg value must occupy its position in the top-k list as ''
    (concat_ws alone would drop it and shift ranks)."""
    df = spark.createDataFrame(
        [("g", None, 10.0), ("g", "bob", 5.0)],
        "g string, name string, score double")
    out = OmigoDF(df).arg_max(["g"], ["name"], ["score"], topk=2).df.collect()
    assert out[0]["name:score:arg_max"] == ",bob"


def test_group_by_key_null_cells_are_empty_strings(spark):
    """agg_func receives NULL cells as '' (the missing marker), never the
    literal strings 'None'/'nan'."""
    seen = []

    def agg(rows):
        seen.extend(rows)
        return {"joined": "|".join(r["a"] for r in rows)}

    df = spark.createDataFrame(
        [("g1", "v"), ("g1", None)], "g string, a string")
    out = OmigoDF(df).group_by_key(["g"], ["a"], agg, suffix="agg")
    row = out.df.collect()[0]
    assert row["joined:agg"] in ("v|", "|v")
    assert all(r["a"] in ("v", "") for r in seen)


def test_group_by_key_numeric_null_not_nan_string(spark):
    def agg(rows):
        return {"cat": ",".join(sorted(r["x"] for r in rows))}

    df = spark.createDataFrame(
        [("g1", 1.5), ("g1", None)], "g string, x double")
    row = OmigoDF(df).group_by_key(["g"], ["x"], agg, suffix="agg").df.collect()[0]
    assert "nan" not in row["cat:agg"]
    assert row["cat:agg"] == ",1.5"


def test_reorder_use_existing_order(spark):
    df = spark.createDataFrame([(1, 2, 3)], "a long, b long, c long")
    # default (reference False): argument order in front
    assert OmigoDF(df).reorder(["b", "a"]).columns == ["b", "a", "c"]
    # True: matched cols move to the front in HEADER order
    assert (OmigoDF(df).reorder(["b", "a"], use_existing_order=True)
            .columns == ["a", "b", "c"])


def test_cols_as_map_null_is_empty_string(spark):
    df = spark.createDataFrame([("k", None)], "k string, v string")
    assert OmigoDF(df).cols_as_map("k", "v") == {"k": ""}


def test_split_batches_uniform_is_stable_across_actions(spark):
    """cols=None buckets come from monotonically_increasing_id; without
    the unconditional checkpoint each returned batch would re-execute the
    plan with fresh ids and rows could appear in 0 or 2 batches."""
    df = spark.range(2000).withColumnRenamed("id", "k").repartition(8)
    batches = OmigoDF(df).split_batches(4)
    ids = [sorted(r["k"] for r in b.df.collect()) for b in batches]
    flat = sorted(x for part in ids for x in part)
    assert flat == list(range(2000))  # every row exactly once
    # second action sees the identical assignment
    ids2 = [sorted(r["k"] for r in b.df.collect()) for b in batches]
    assert ids == ids2


def test_normalize_grouped_no_forced_broadcast(spark):
    """Per-group stats must not be force-broadcast (OOM at high group
    cardinality) — AQE picks broadcast when actually small."""
    from omigo_data_analytics_spark.sources.io import load_testdata

    ev = load_testdata(spark, "/root/testdata/sf0.001", "events")
    out = ev.normalize(["value"], group_cols=["user_id"])
    pre = out.df._jdf.queryExecution().optimizedPlan().toString()
    # the logical plan carries no user ResolvedHint for the grouped join
    assert "UnresolvedHint" not in pre and "broadcast" not in pre.lower()
    assert out.df.count() == ev.df.count()


def test_sample_group_by_col_value_delegates(spark):
    df = spark.createDataFrame(
        [("g", "spam"), ("g", "ham")], "g string, v string")
    out = OmigoDF(df).sample_group_by_col_value(
        ["g"], "v", "spam", 0.0, seed=1)
    assert [r["v"] for r in out.df.collect()] == ["ham"]


def test_profile_handles_hostile_column_names(spark):
    """Names with quotes/backticks must survive profile's generated SQL
    (stack literals, named_struct refs) in both exact and approx paths."""
    df = (spark.createDataFrame([(1, "x")], ["id", "v"])
          .withColumnRenamed("v", "we`ird'name"))
    for exact in (False, True):
        rows = {r["column"]: r for r in
                OmigoDF(df).profile(exact=exact).df.collect()}
        assert set(rows) == {"id", "we`ird'name"}
        assert rows["we`ird'name"]["n_rows"] == 1


def test_explode_json_all_null_clear_error(spark):
    df = spark.createDataFrame([(1, None), (2, "")], "id long, j string")
    import pytest as _pt
    with _pt.raises(ValueError, match="explode_json.*schema"):
        OmigoDF(df).explode_json("j")
