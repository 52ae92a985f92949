"""Timestamp normalization: the reference ``timefuncs`` format-sniffing
ladder as UDF-free Spark column expressions.

The reference (omigo_core/timefuncs.py:7-117) normalizes arbitrary
timestamp strings by probing shapes in order: 13-digit epoch millis,
``sec.millis`` floats, ISO-8601 variants (Z / +00:00 / +0000 / ' UTC' /
date-only / 'T'-or-space separator), 10-digit epoch seconds. Here the
whole ladder is one ``coalesce`` of native expressions — the numeric
shapes by regex, everything else by ``try_cast(timestamp)`` (which, with
the session pinned to UTC, accepts every ISO variant the reference
enumerates) — so it runs JVM-side inside whole-stage codegen, no Python.

``get_time_diffs`` (funclib.py:208-238) — pairwise deltas of the sorted
timestamps rendered as '3s,5m,2h' — compiles to a native aggregate
expression (collect_list → array_sort → indexed transform), registered in
the aggregate registry under its reference name.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column
from pyspark.sql import functions as F

_EPOCH_SEC = r"^\d{10}$"
_EPOCH_MILLIS = r"^\d{13}$"
_EPOCH_SEC_FLOAT = r"^\d{10}\.\d+$"


def to_utctimestamp_sec(c: Column) -> Column:
    """Column ladder → epoch seconds (long); NULL for unknown shapes
    (reference timefuncs.py:40-81 raises instead — documented delta:
    engine semantics are null-propagating, use a downstream filter)."""
    s = F.trim(c.cast("string"))
    return (
        F.when(s.rlike(_EPOCH_SEC), s.cast("long"))
        .when(s.rlike(_EPOCH_MILLIS), (s.cast("long") / 1000).cast("long"))
        .when(s.rlike(_EPOCH_SEC_FLOAT), s.cast("double").cast("long"))
        .otherwise(F.unix_timestamp(s.try_cast("timestamp")))
    )


def to_utctimestamp_millis(c: Column) -> Column:
    """Column ladder → epoch milliseconds (reference timefuncs.py:7-38)."""
    s = F.trim(c.cast("string"))
    return (
        F.when(s.rlike(_EPOCH_MILLIS), s.cast("long"))
        .when(s.rlike(_EPOCH_SEC_FLOAT), (s.cast("double") * 1000).cast("long"))
        .when(s.rlike(_EPOCH_SEC), s.cast("long") * 1000)
        .otherwise(F.unix_millis(s.try_cast("timestamp")))
    )


def utctimestamp_to_datetime_str(c: Column) -> Column:
    """Epoch sec/millis (string or numeric) → 'YYYY-MM-DDTHH:MM:SS'
    (reference timefuncs.py:108-110: isoformat truncated to seconds)."""
    s = F.trim(c.cast("string"))
    sec = (
        F.when(s.rlike(_EPOCH_MILLIS), (s.cast("long") / 1000).cast("long"))
        .when(s.rlike(_EPOCH_SEC_FLOAT), s.cast("double").cast("long"))
        .otherwise(s.try_cast("long"))
    )
    return F.from_unixtime(sec, "yyyy-MM-dd'T'HH:mm:ss")


def win32_timestamp_to_utctimestamp(c: Column) -> Column:
    """Win32 FILETIME-ish → epoch sec (reference funclib.py:205-206:
    int(str(x)[0:-8]) + 339576461 — reproduced verbatim, quirk included)."""
    s = c.cast("string")
    return (F.substring(s, 1, F.length(s) - 8).cast("long") + F.lit(339576461))


def _fmt_diff(d: Column) -> Column:
    # funclib.py:225-236: <60 -> Ns, <1h -> Nm, <1d -> Nh, <30d -> Nd,
    # else 'N:s'
    return (
        F.when(d < 60, F.concat(d.cast("string"), F.lit("s")))
        .when(d < 3600, F.concat(F.floor(d / 60).cast("string"), F.lit("m")))
        .when(d < 86400, F.concat(F.floor(d / 3600).cast("string"), F.lit("h")))
        .when(d < 30 * 86400,
              F.concat(F.floor(d / 86400).cast("string"), F.lit("d")))
        .otherwise(F.concat(d.cast("string"), F.lit(":s")))
    )


def time_diffs_agg(c: Column) -> Column:
    """``get_time_diffs`` as a native aggregate: sort the group's
    timestamps (any ladder shape), emit formatted consecutive deltas as a
    CSV string; '' for groups of <=1 (funclib.py:208-238)."""
    return _time_diffs_from(F.collect_list(to_utctimestamp_sec(c)))


def time_diffs_window_agg(c: Column, w) -> Column:
    """Analytic (collapse=False) form: the window frame attaches to the
    inner collect_list; the sort/format post-processing is an ordinary
    expression over the window result."""
    return _time_diffs_from(F.collect_list(to_utctimestamp_sec(c)).over(w))


def _time_diffs_from(collected: Column) -> Column:
    arr = F.array_sort(collected)
    n = F.size(arr)
    diffs = F.transform(
        F.slice(arr, 1, F.greatest(n - 1, F.lit(0))),
        lambda v, i: _fmt_diff(F.element_at(arr, i + F.lit(2)) - v))
    return F.when(n <= 1, F.lit("")).otherwise(F.concat_ws(",", diffs))


# ----------------------------------------------------------- scalar parity
# Driver-side scalar twins (reference API shape) for code that works on
# single values; the column expressions above are the distributed path.

def datetime_to_utctimestamp_sec(x) -> int:
    s = str(x).strip()
    if len(s) == 10 and s.isdigit():
        return int(s)
    if len(s) == 13 and s.isdigit():
        return int(int(s) / 1000)
    if len(s) == 14 and s.find(".") == 10:
        return int(float(s))
    return int(_parse_iso(s).timestamp())


def datetime_to_utctimestamp_millis(x) -> int:
    s = str(x).strip()
    if len(s) == 13 and s.isdigit():
        return int(s)
    if len(s) == 14 and s.find(".") == 10:
        return int(float(s) * 1000)
    if len(s) == 10 and s.isdigit():
        return int(s) * 1000
    return int(_parse_iso(s).timestamp() * 1000)


def datetime_to_utctimestamp(x) -> int:
    return datetime_to_utctimestamp_sec(x)


def utctimestamp_to_datetime(x) -> "_dt.datetime":
    """(reference timefuncs.py:90-101) epoch sec / millis / fractional-sec
    string or int → timezone-aware UTC datetime."""
    s = str(x).strip()
    if len(s) == 10 and s.isdigit():
        return _dt.datetime.fromtimestamp(int(s), tz=_dt.timezone.utc)
    if len(s) == 13 and s.isdigit():
        return _dt.datetime.fromtimestamp(int(s) / 1000, tz=_dt.timezone.utc)
    if len(s) > 10 and s.find(".") == 10:
        return _dt.datetime.fromtimestamp(float(s), tz=_dt.timezone.utc)
    raise ValueError(f"utctimestamp_to_datetime: unknown format: {x!r}")


def utctimestamp_millis_to_datetime(x) -> "_dt.datetime":
    """(reference timefuncs.py:103-104 — same sniffing ladder)"""
    return utctimestamp_to_datetime(x)


def utctimestamp_millis_to_datetime_str(x) -> str:
    """(reference timefuncs.py:112-117). The endswith('UTC') truncation
    branch is DEAD in the reference too — isoformat() ends '+00:00',
    never 'UTC' — so actual behavior on both sides is the full
    offset-suffixed string; the dead branch is reproduced for parity,
    not as a live code path."""
    result = utctimestamp_to_datetime(x).isoformat()
    return result[0:23] if result.endswith("UTC") else result


def datetime_to_timestamp(x):
    """(reference timefuncs.py:119-120 — raises by design there too)"""
    raise ValueError("Please use datetime_to_utctimestamp")


def get_utctimestamp_sec() -> int:
    """(reference timefuncs.py:122-123)"""
    return int(_dt.datetime.now(_dt.timezone.utc).timestamp())


def get_utctimestamp_millis() -> int:
    """(reference timefuncs.py:125-126)"""
    return int(_dt.datetime.now(_dt.timezone.utc).timestamp() * 1000)


def datestr_to_datetime(x) -> "_dt.datetime":
    """(reference timefuncs.py:128-129)"""
    return utctimestamp_to_datetime(datetime_to_utctimestamp_sec(x))


def get_datetime_str() -> str:
    """(reference timefuncs.py:131-132)"""
    return utctimestamp_to_datetime(get_utctimestamp_sec()).isoformat()[0:19]


def _parse_iso(s: str) -> _dt.datetime:
    s = s.replace(" UTC", "+00:00").replace(" GMT", "+00:00")
    if s.endswith("Z"):
        s = s[:-1] + "+00:00"
    # '+0000' (no colon) — fromisoformat handles it on 3.11+
    d = _dt.datetime.fromisoformat(s)
    if d.tzinfo is None:
        d = d.replace(tzinfo=_dt.timezone.utc)
    return d


def resolve_time_str(x) -> str:
    """(reference splunk_common.py:5-41) 'now' / 'now-3h' style relative
    time resolution (units d/h/m/s) → ISO datetime string; anything else
    goes through the datetime sniffing ladder. The Splunk/LogScale
    search-window syntax, usable by any time-ranged source."""
    s = str(x).strip()
    if s.startswith("now"):
        s = s.replace(" ", "")
        base = int(_dt.datetime.now(_dt.timezone.utc).timestamp())
        if s == "now":
            diff = 0
        else:
            if not s.startswith("now-"):
                raise ValueError(f"Unknown operator against now: {x}")
            diffstr = s[len("now-"):]
            unit, count = diffstr[-1], int(diffstr[:-1])
            mult = {"d": 86400, "h": 3600, "m": 60, "s": 1}.get(unit)
            if mult is None:
                raise ValueError(f"Unknown time unit: {unit}")
            diff = count * mult
        return utctimestamp_to_datetime(base - diff).isoformat()[0:19]
    return utctimestamp_to_datetime(
        datetime_to_utctimestamp_sec(s)).isoformat()[0:19]
