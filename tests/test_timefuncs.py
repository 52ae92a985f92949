"""timefuncs: the format-sniffing ladder (reference timefuncs.py:7-117)
as native expressions, scalar parity twins, and get_time_diffs."""

import pytest
from pyspark.sql import functions as F

from omigo_data_analytics_spark import OmigoDF
from omigo_data_analytics_spark.functions import timefuncs as TF

LADDER = [
    # (input, epoch_sec, epoch_millis)
    ("1681202675", 1681202675, 1681202675000),
    ("1681202675933", 1681202675, 1681202675933),
    ("1681202675.933", 1681202675, 1681202675933),
    ("2023-04-11T08:44:35.933Z", 1681202675, 1681202675933),
    ("2023-04-15T15:05:16.175000Z", 1681571116, 1681571116175),
    ("2023-04-11T08:44:35.933+00:00", 1681202675, 1681202675933),
    ("2023-04-18T18:47:45", 1681843665, 1681843665000),
    ("2023-04-18 18:47:45", 1681843665, 1681843665000),
    ("2021-11-01", 1635724800, 1635724800000),
    ("2022-05-20T05:00:00+00:00", 1653022800, 1653022800000),
    ("2025-05-08T20:03:35.000+0000", 1746734615, 1746734615000),
]


def test_ladder_sec_and_millis_expressions(spark):
    df = spark.createDataFrame([(x,) for x, _, _ in LADDER], ["x"])
    out = df.select("x", TF.to_utctimestamp_sec(F.col("x")).alias("s"),
                    TF.to_utctimestamp_millis(F.col("x")).alias("ms")).collect()
    got = {r["x"]: (r["s"], r["ms"]) for r in out}
    for x, sec, ms in LADDER:
        assert got[x] == (sec, ms), (x, got[x], (sec, ms))


def test_ladder_unknown_shape_is_null(spark):
    df = spark.createDataFrame([("junk",), ("",)], ["x"])
    out = df.select(TF.to_utctimestamp_sec(F.col("x")).alias("s")).collect()
    assert [r["s"] for r in out] == [None, None]


def test_scalar_parity_twins():
    for x, sec, ms in LADDER:
        assert TF.datetime_to_utctimestamp_sec(x) == sec, x
        assert TF.datetime_to_utctimestamp_millis(x) == ms, x


def test_utctimestamp_to_datetime_str(spark):
    df = spark.createDataFrame(
        [("1681202675",), ("1681202675933",)], ["x"])
    out = df.select(TF.utctimestamp_to_datetime_str(F.col("x")).alias("d")).collect()
    assert [r["d"] for r in out] == ["2023-04-11T08:44:35"] * 2


def test_win32_timestamp(spark):
    # funclib.py:205-206 verbatim: int(str(x)[0:-8]) + 339576461
    df = spark.createDataFrame([("13300000000" + "0" * 8,)], ["x"])
    out = df.select(TF.win32_timestamp_to_utctimestamp(F.col("x")).alias("t")).collect()
    assert out[0]["t"] == 13300000000 + 339576461


def test_get_time_diffs_aggregate(spark):
    base = 1700000000
    rows = [("g", str(base)), ("g", str(base + 30)),  # 30s
            ("g", str(base + 30 + 120)),              # 2m
            ("g", str(base + 30 + 120 + 7200)),       # 2h
            ("h", str(base))]                         # single -> ''
    df = OmigoDF(spark.createDataFrame(rows, ["k", "ts"]))
    out = {r["k"]: r["ts:get_time_diffs"]
           for r in df.aggregate(["k"], ["ts"], ["get_time_diffs"]).df.collect()}
    assert out["g"] == "30s,2m,2h"
    assert out["h"] == ""
    # reference formatting parity on the same values
    from omigo_data_analytics_spark.functions import timefuncs as tf
    vs = [base, base + 30, base + 150, base + 7350]
    diffs = [vs[i + 1] - vs[i] for i in range(3)]
    assert diffs == [30, 120, 7200]


def test_scalar_utctimestamp_converters():
    import datetime as dt

    from omigo_data_analytics_spark.functions import timefuncs as tf

    d = tf.utctimestamp_to_datetime("1700000000")
    assert d == dt.datetime(2023, 11, 14, 22, 13, 20, tzinfo=dt.timezone.utc)
    assert tf.utctimestamp_millis_to_datetime("1700000000000") == d
    assert tf.utctimestamp_to_datetime(1700000000) == d
    assert tf.utctimestamp_to_datetime("1700000000.500").microsecond == 500000
    assert tf.datestr_to_datetime("2023-11-14T22:13:20+00:00") == d
    assert tf.utctimestamp_millis_to_datetime_str("1700000000")\
        .startswith("2023-11-14T22:13:20")
    import pytest
    with pytest.raises(ValueError, match="datetime_to_utctimestamp"):
        tf.datetime_to_timestamp("x")
    with pytest.raises(ValueError, match="unknown format"):
        tf.utctimestamp_to_datetime("not-a-ts")
    assert isinstance(tf.get_utctimestamp_sec(), int)
    assert tf.get_utctimestamp_millis() >= tf.get_utctimestamp_sec() * 1000 - 1
    assert len(tf.get_datetime_str()) == 19


def test_resolve_time_str():
    from omigo_data_analytics_spark.functions.timefuncs import resolve_time_str

    iso = resolve_time_str("1700000000")
    assert iso == "2023-11-14T22:13:20"
    now = resolve_time_str("now")
    past = resolve_time_str("now-3h")
    assert len(now) == 19 and len(past) == 19 and past < now
    import pytest
    with pytest.raises(ValueError, match="Unknown operator"):
        resolve_time_str("now+3h")
    with pytest.raises(ValueError, match="Unknown time unit"):
        resolve_time_str("now-3y")
