"""funclib helper parity (reference omigo_core/funclib.py)."""

from omigo_data_analytics_spark.functions import funclib as fl


def test_display_relative_time_str():
    # max two units (funclib.py:283-314)
    assert fl.get_display_relative_time_str(90061) == "1d 1h"
    assert fl.get_display_relative_time_str(3661) == "1h 1m"
    assert fl.get_display_relative_time_str(59) == "59s"
    assert fl.get_display_relative_time_str(0) == ""


def test_get_time_diffs_scalar_matches_ladder():
    assert fl.get_time_diffs(["1700000000", "1700000030", "1700000150"]) == "30s,2m"
    assert fl.get_time_diffs(["1700000000"]) == ""
    # mixed shapes go through the timefuncs ladder
    assert fl.get_time_diffs(["2023-11-14T22:13:20Z", "1700000030"]) == "30s"


def test_url_encoded_col_name_maps():
    assert fl.simple_map_to_url_encoded_col_names(["a", "b"], ["b"]) == \
        ["a", "b:url_encoded"]
    assert fl.simple_map_to_url_encoded_col_names(["a", "b"]) == ["a", "b"]
    assert fl.map_to_url_encoded_col_names(["x:a", "b"], prefix="p",
                                           url_encoded_cols=["a"]) == \
        ["p:x:a:url_encoded", "p:b"]


def test_str_maps_and_misc():
    assert fl.get_str_map_with_keys({"a": 1, "b": 2}, ["a"]) == {"a": "1"}
    try:
        fl.get_str_map_with_keys({"a": 1}, ["z"])
        raise AssertionError("expected KeyError")
    except KeyError:
        pass
    assert fl.get_str_map_without_keys({"a": 1, "b": 2}, ["a"]) == {"b": "2"}
    assert fl.str_arr_to_float(["1.5", "2"]) == [1.5, 2.0]
    assert fl.win32_timestamp_to_utctimestamp("1330000000000000000") == \
        13300000000 + 339576461


def test_aliases_resolve_to_reference_bodies():
    assert fl.sumint(["3.7", "2"]) == 5  # int(float()) semantics
    assert fl.uniq_mkstr(["a,b", "b"]) == "a,b"
    assert fl.datetime_to_utctimestamp_sec("1681202675") == 1681202675


def test_small_utils_parity(spark):
    from omigo_data_analytics_spark.functions import funclib as fl

    assert fl.get_counts_map(["a", "b", "a"]) == {"a": 2, "b": 1}
    assert fl.merge_arrays([[1], [2, 3], []]) == [1, 2, 3]
    assert fl.split_str_to_arr("a,,b") == ["a", "b"]
    assert fl.split_str_to_arr(None) == []
    # reference quirk preserved: unpadded octets
    assert fl.convert_ipv4_to_hex("10.0.0.1") == "a001"
    assert fl.convert_ipv4_to_hex("255.255.255.255") == "ffffffff"
    import pytest
    with pytest.raises(ValueError):
        fl.convert_ipv4_to_hex("1.2.3")
    # distributed twin agrees with the scalar on a real column
    from pyspark.sql import functions as F
    df = spark.createDataFrame([("10.0.0.1",), ("192.168.17.254",)], ["ip"])
    rows = df.select("ip", fl.convert_ipv4_to_hex_col(F.col("ip"))
                     .alias("hx")).collect()
    for r in rows:
        assert r["hx"] == fl.convert_ipv4_to_hex(r["ip"])


def test_window_forms_for_merge_and_distinct_aggs(spark):
    """collapse=False (window) forms for uniq_len / merge_uniq /
    split_merge_uniq_mkstr / uniq_count / count_distinct /
    get_time_diffs — previously invalid window expressions."""
    from omigo_data_analytics_spark import OmigoDF

    df = spark.createDataFrame(
        [("g1", "a,b", "1690000000"), ("g1", "b,c", "1690000060"),
         ("g2", "x", "1690000000")],
        ["g", "v", "ts"])
    out = OmigoDF(df).aggregate(
        ["g"], ["v", "v", "v", "v", "ts"],
        ["uniq_len", "merge_uniq", "split_merge_uniq_mkstr",
         "count_distinct", "get_time_diffs"],
        collapse=False).df
    rows = {(r["g"], r["v"]): r for r in out.collect()}
    r = rows[("g1", "a,b")]
    assert r["v:uniq_len"] == 3
    assert r["v:merge_uniq"] == "a,b,c"
    assert r["v:count_distinct"] == 2
    assert r["ts:get_time_diffs"] == "1m"


def test_param_agg_accepts_namespaced_order_col(spark):
    """select_first(<order col>) must accept ':'-namespaced names (the
    library's own output convention) — previously a KeyError."""
    from omigo_data_analytics_spark import OmigoDF

    df = spark.createDataFrame(
        [("g", "a", 3), ("g", "b", 1)], ["g", "v", "o:rank"])
    out = OmigoDF(df).aggregate(["g"], ["v"], ["select_first(o:rank)"],
                                collapse=True).df
    assert out.first()["v:select_first(o:rank)"] == "b"


def test_ipv4_hex_malformed_yields_null(spark):
    """try_element_at: a malformed ip must NULL out, not fail the job
    under ANSI."""
    from pyspark.sql import functions as F

    from omigo_data_analytics_spark.functions import funclib as FL

    df = spark.createDataFrame([("10.0.0.1",), ("10.0.0",), ("",)], ["ip"])
    got = [r["h"] for r in
           df.select(FL.convert_ipv4_to_hex_col(F.col("ip")).alias("h"))
           .collect()]
    assert got[0] == "a001" and got[1] is None and got[2] is None  # unpadded octets, reference-shape
