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
