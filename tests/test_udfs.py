"""Reference UDF library parity (functions/udfs.py, pure Python) and
consistency of the native AGG_REGISTRY mappings against the Python bodies."""

import pytest

from omigo_data_analytics_spark.functions import udfs


# ---------------------------------------------------------------- scalars
def test_parse_file_base_name():
    assert udfs.parse_file_base_name("/a/b/c.tsv") == "c.tsv"
    assert udfs.parse_file_base_name("a\\b\\c.tsv") == "c.tsv"
    assert udfs.parse_file_base_name("plain") == "plain"


def test_digit_formatting():
    assert udfs.to2digit("1.005") == "1.00"
    assert udfs.to4digit(2) == "2.0000"
    assert udfs.to6digit("0.1") == "0.100000"


def test_if_else_family():
    assert udfs.if_else_str("a", "a", "y", "n") == "y"
    assert udfs.if_else_str("b", "a", "y", "n") == "n"
    assert udfs.if_else_int("3", 3, 1, 0) == 1
    assert udfs.if_else_non_empty_str("", "y", "n") == "n"
    assert udfs.if_else_non_empty_str("x", "y", "n") == "y"
    assert udfs.if_else_non_zero_int("0", 1, 0) == 0
    assert udfs.if_else_non_zero_int("7", 1, 0) == 1
    # array-notation calling convention (reference use_array_notation)
    assert udfs.if_else_str(["a", "a", "y", "n"]) == "y"


def test_select_first_non_empty():
    assert udfs.select_first_non_empty("", "", "x", "y") == "x"
    assert udfs.select_first_non_empty("", "") == ""


def test_convert_prob_to_binary():
    assert udfs.convert_prob_to_binary("0.5") == 1
    assert udfs.convert_prob_to_binary("0.49") == 0


# ------------------------------------------------------------- aggregates
def test_mkstr_family():
    vs = ["b", "a", "b"]
    assert udfs.mkstr(vs) == "b,a,b"
    assert udfs.sorted_mkstr(vs) == "a,b,b"
    assert udfs.uniq_mkstr(vs) == "a,b"
    assert udfs.split_merge_uniq_mkstr(["a,b", "b,c", ""]) == "a,b,c"
    assert udfs.mkstr4f(["1", "2.5"]) == "1.000000,2.500000"


def test_minmax_failsafe():
    assert udfs.minint_failsafe(["3", "", "1"]) == 1
    assert udfs.maxfloat_failsafe(["", ""]) == ""
    assert udfs.maxstr_failsafe(["", "b", "a"]) == "b"
    assert udfs.get_range_int(["3", "10", "5"]) == 7


def test_std_dev_small_n():
    assert udfs.std_dev(["5"]) == 0.0
    assert udfs.std_dev(["1", "3"]) == pytest.approx(2 ** 0.5)


def test_quantile_grids():
    vs = [str(i) for i in range(5)]  # 0..4
    # arange(0,1,.25) -> q at 0,.25,.5,.75 over sorted 0..4
    assert udfs.quantile4(vs) == "0.0000,1.0000,2.0000,3.0000"
    # the reference's float-accumulating arange loop yields 11 points for
    # by=1/10 (last ≈ 1.0) — parity means reproducing that, not "10"
    assert len(udfs.quantile10(vs).split(",")) == 11
    assert len(udfs.quantile40(vs).split(",")) == 40
    with pytest.raises(ValueError):
        udfs.quantile(vs, start=1, end=0)


# ----------------------- native registry agrees with the Python bodies
def test_native_quantile4_matches_python(iris):
    out = iris.aggregate(["class"], ["petal_length"], ["quantile4"])
    native = {r["class"]: r["petal_length:quantile4"] for r in out.df.collect()}
    rows = iris.df.select("class", "petal_length").collect()
    groups = {}
    for r in rows:
        groups.setdefault(r["class"], []).append(r["petal_length"])
    for k, vs in groups.items():
        assert native[k] == udfs.quantile4(vs)


def test_native_mkstr4f_matches_python(iris):
    out = iris.df.limit(20)
    from omigo_data_analytics_spark import OmigoDF
    agg = OmigoDF(out).aggregate(["class"], ["sepal_width"], ["mkstr4f"])
    native = {r["class"]: r["sepal_width:mkstr4f"] for r in agg.df.collect()}
    rows = out.select("class", "sepal_width").collect()
    groups = {}
    for r in rows:
        groups.setdefault(r["class"], []).append(r["sepal_width"])
    for k, vs in groups.items():
        # native collect_list order is nondeterministic across partitions;
        # compare as multisets of formatted values
        assert sorted(native[k].split(",")) == sorted(udfs.mkstr4f(vs).split(","))


def test_callable_dispatch_picks_native(iris):
    # passing the udfs function object routes to the native aggregate by name
    out = iris.aggregate(["class"], ["petal_length"], [udfs.sumfloat])
    assert "petal_length:sumfloat" in out.columns
    got = {r["class"]: r["petal_length:sumfloat"] for r in out.df.collect()}
    rows = iris.df.select("class", "petal_length").collect()
    groups = {}
    for r in rows:
        groups.setdefault(r["class"], []).append(r["petal_length"])
    for k, vs in groups.items():
        assert got[k] == pytest.approx(udfs.sumfloat(vs))
