"""funclib: the reference's grab-bag helper module (omigo_core/funclib.py)
under its original names. Most entries are aliases into ``udfs`` (the
aggregate/scalar bodies) and ``timefuncs`` (the timestamp ladder); the
handful of funclib-only helpers live here.

Not carried over: ``resolve_reference_time`` (funclib.py:363-395 references
an undefined ``self`` in the reference itself — broken at the source);
``parse_image_file_base_name`` alias maps to udfs.parse_file_base_name.
"""

from __future__ import annotations

from . import timefuncs as _tf
from . import udfs as _udfs

# ---- aggregate/scalar aliases (funclib.py:12-167 delegate to udfs) ----
get_len = _udfs.get_len
get_non_empty_len = _udfs.get_non_empty_len
uniq_len = _udfs.uniq_len
uniq_mkstr = _udfs.uniq_mkstr
split_merge_uniq_mkstr = _udfs.split_merge_uniq_mkstr
mean = _udfs.mean
std_dev = _udfs.std_dev
mkstr = _udfs.mkstr
sorted_mkstr = _udfs.sorted_mkstr
mkstr4f = _udfs.mkstr4f
minint = _udfs.minint
maxint = _udfs.maxint
minfloat = _udfs.minfloat
maxfloat = _udfs.maxfloat
minstr = _udfs.minstr
maxstr = _udfs.maxstr
minint_failsafe = _udfs.minint_failsafe
maxint_failsafe = _udfs.maxint_failsafe
minstr_failsafe = _udfs.minstr_failsafe
maxstr_failsafe = _udfs.maxstr_failsafe
sumint = _udfs.sumint
sumfloat = _udfs.sumfloat
uniq_count = _udfs.uniq_count
merge_uniq = _udfs.merge_uniq
select_first = _udfs.select_first
select_first_non_empty = _udfs.select_first_non_empty
select_max_int = _udfs.select_max_int
quantile = _udfs.quantile
quantile4 = _udfs.quantile4
quantile10 = _udfs.quantile10
quantile40 = _udfs.quantile40
max_str = _udfs.max_str
min_str = _udfs.min_str
to2digit = _udfs.to2digit
to4digit = _udfs.to4digit
to6digit = _udfs.to6digit
convert_prob_to_binary = _udfs.convert_prob_to_binary
if_else_non_empty_str = _udfs.if_else_non_empty_str
if_else_str = _udfs.if_else_str
if_else_int = _udfs.if_else_int
if_else_non_zero_int = _udfs.if_else_non_zero_int
parse_image_file_base_name = _udfs.parse_file_base_name

# ---- time aliases (funclib.py:356-400 delegate to timefuncs) ----
datetime_to_utctimestamp_sec = _tf.datetime_to_utctimestamp_sec
datetime_to_utctimestamp_millis = _tf.datetime_to_utctimestamp_millis
datetime_to_utctimestamp = _tf.datetime_to_utctimestamp
utctimestamp_to_datetime = _tf.utctimestamp_to_datetime
utctimestamp_millis_to_datetime = _tf.utctimestamp_millis_to_datetime
utctimestamp_millis_to_datetime_str = _tf.utctimestamp_millis_to_datetime_str
datetime_to_timestamp = _tf.datetime_to_timestamp
get_utctimestamp_sec = _tf.get_utctimestamp_sec
get_utctimestamp_millis = _tf.get_utctimestamp_millis
datestr_to_datetime = _tf.datestr_to_datetime


def str_arr_to_float(xs) -> list[float]:
    """(funclib.py:125-127)"""
    return [float(x) for x in xs]


def get_str_map_with_keys(mp: dict, keys, fail_on_missing: bool = True) -> dict:
    """(funclib.py:169-178)"""
    out = {}
    for k in keys:
        if k not in mp:
            if fail_on_missing:
                raise KeyError(f"get_str_map_with_keys: missing key: {k}")
            continue
        out[str(k)] = str(mp[k])
    return out


def get_str_map_without_keys(mp: dict, excluded_keys) -> dict:
    """(funclib.py:180-187)"""
    excluded = set(excluded_keys)
    return {str(k): str(v) for k, v in mp.items() if k not in excluded}


def win32_timestamp_to_utctimestamp(x) -> int:
    """(funclib.py:205-206, quirk reproduced verbatim)"""
    return int(str(x)[0:-8]) + 339576461


def get_time_diffs(vs) -> str:
    """Scalar twin of the native get_time_diffs aggregate
    (funclib.py:208-238)."""
    secs = sorted(_tf.datetime_to_utctimestamp_sec(t) for t in vs)
    if len(secs) <= 1:
        return ""
    out = []
    for v1, v2 in zip(secs, secs[1:]):
        d = int(v2 - v1)
        if d < 60:
            out.append(f"{d}s")
        elif d < 3600:
            out.append(f"{d // 60}m")
        elif d < 86400:
            out.append(f"{d // 3600}h")
        elif d < 30 * 86400:
            out.append(f"{d // 86400}d")
        else:
            out.append(f"{d}:s")
    return ",".join(out)


def simple_map_to_url_encoded_col_names(cols, url_encoded_cols=None) -> list[str]:
    """(funclib.py:240-254)"""
    if url_encoded_cols is None:
        return list(cols)
    return [f"{c}:url_encoded" if c in url_encoded_cols else c for c in cols]


def map_to_url_encoded_col_names(cols, prefix=None, url_encoded_cols=None) -> list[str]:
    """(funclib.py:256-281)"""
    results = []
    for c in cols:
        leaf = c.split(":")[-1] if ":" in c else c
        result = c
        if url_encoded_cols is not None and leaf in url_encoded_cols:
            result = f"{c}:url_encoded"
        if prefix is not None:
            result = f"{prefix}:{result}"
        results.append(result)
    return results


def get_display_relative_time_str(v) -> str:
    """Seconds → 'Nd Nh' style display, max two units (funclib.py:283-314)."""
    v = int(v)
    days, rem = divmod(v, 86400)
    hours, rem = divmod(rem, 3600)
    minutes, seconds = divmod(rem, 60)
    results = []
    for amount, unit in ((days, "d"), (hours, "h"), (minutes, "m"), (seconds, "s")):
        if amount > 0 and len(results) < 2:
            results.append(f"{amount}{unit}")
    return " ".join(results)


def get_counts_map(xs) -> dict:
    """(reference utils.py:312-319)"""
    mp = {}
    for x in xs:
        mp[x] = mp.get(x, 0) + 1
    return mp


def merge_arrays(arr_list) -> list:
    """(reference utils.py:331-337)"""
    return [v for arr in arr_list for v in arr]


def split_str_to_arr(x) -> list:
    """(reference utils.py:827-831): comma split, empties dropped."""
    if x is None or x == "":
        return []
    return [t for t in x.split(",") if t != ""]


def convert_ipv4_to_hex(ip: str) -> str:
    """(reference utils.py:845-861) — including its quirk: each octet's
    hex is concatenated UNPADDED ('10.0.0.1' → 'a001', not '0a000001'),
    so the mapping is not injective; kept for output parity."""
    if ip is None or ip == "":
        raise ValueError(f"convert_ipv4_to_hex: invalid input: {ip}")
    parts = ip.split(".")
    if len(parts) != 4:
        raise ValueError(f"convert_ipv4_to_hex: invalid input: {ip}")
    return "".join(hex(int(p)) for p in parts).replace("0x", "")


def convert_ipv4_to_hex_col(c):
    """Distributed twin of convert_ipv4_to_hex — same unpadded-octet
    output, as a codegen expression (no Python in the hot path)."""
    from pyspark.sql import functions as F

    parts = F.split(c, r"\.")
    # try_element_at: under ANSI (the Spark 4 default) element_at throws
    # on out-of-bounds, so ONE malformed ip ('10.0.0', '') would fail the
    # whole job; the scalar twin raises a catchable per-value error, and
    # here a malformed ip yields NULL (concat propagates it)
    return F.concat(*[
        F.lower(F.conv(F.try_element_at(parts, F.lit(i)), 10, 16))
        for i in (1, 2, 3, 4)])


def get_func_name(f) -> str:
    """(reference dataframe.py:5509-5510)"""
    return f.__name__


def get_version() -> str:
    """(reference dataframe.py:5506-5507 returns its package version;
    this engine reports its own.)"""
    return "omigo-spark-0.5"
