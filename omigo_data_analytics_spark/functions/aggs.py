"""Aggregate-function library: the reference's ``udfs`` aggregation names
compiled to native Spark aggregate expressions.

In the reference every aggregation collects each group's values into a
Python list and applies a ``list[str] -> scalar`` callable
(omigo_core/dataframe.py:977-1126, omigo_core/udfs.py). Here each known
function name becomes a JVM-side, whole-stage-codegen'd aggregate expression
— map-side partial aggregation and all — so nothing is ever materialized per
group. Unknown callables fall back to ``collect_list`` + a Python UDF (kept
for API parity; documented slow path).

Name → semantics cross-reference (omigo_core/udfs.py line):
  get_array_len:24 get_non_empty_len:35 uniq_len:39 mkstr:77 sorted_mkstr:81
  uniq_mkstr:47 split_merge_uniq_mkstr:56 merge_uniq:212 mean:63 std_dev:67
  min/max int/float/str:89-153 (+failsafe:155-193) sumint:195 sumfloat:201
  uniq_count:208 select_first:221 select_first_non_empty:275
  quantile:227 get_range_int:408
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import timefuncs as TF


def _num(c: Column, t: str = "double") -> Column:
    # try_cast: string-typed inputs with junk become NULL (ANSI-safe),
    # numeric-typed inputs pass through a no-op cast.
    return c.try_cast(t)


def _int(c: Column) -> Column:
    # Reference int aggregates compute int(float(x)) (udfs.py:195-199):
    # '3.7' -> 3. A direct try_cast('long') on a string would NULL out
    # float-formatted text, so go through double first (same two-step as
    # dataframe.to_int). double->long truncates toward zero like Python
    # int(). The second step is try_cast too: a NaN/±Inf/overflowing
    # double is an ANSI CAST_OVERFLOW that would kill the whole job for
    # one corrupt cell (r11 extreme-values sweep) — it NULLs out and the
    # min/max skips it, same convention as replicate_rows/to_int.
    return c.try_cast("double").try_cast("long")


def _nonempty(c: Column) -> Column:
    # failsafe-family filter: exact (non-stripped) '' match, udfs.py:155-193.
    return F.when(c.isNotNull() & (c.cast("string") != ""), c)


def _nonblank(c: Column) -> Column:
    # strip-based empty filter used by mkstr/get_non_empty_len
    # (udfs.py:35-37, 77-85): drops values that are empty after strip.
    return F.when(c.isNotNull() & (F.trim(c.cast("string")) != ""), c)


def _split_tokens(c: Column) -> Column:
    # uniq_len/uniq_mkstr cell convention (udfs.py:39-54): each cell is a
    # ','-joined list; tokens blank-after-strip are dropped, kept unstripped.
    return F.filter(F.split(c.cast("string"), ","), lambda t: F.trim(t) != "")


# Each builder: Column -> aggregate Column (unaliased).
def _quantile_grid(c: Column, by: float) -> Column:
    # grid built with the reference's own float-accumulating loop
    # (udfs.py:231-234): by=1/10 yields 11 points (last ≈ 1.0), not 10 —
    # reproduced exactly so results hash-match.
    qs = []
    cur = 0.0
    while cur < 1.0:
        qs.append(cur)
        cur += by
    return F.concat_ws(
        ",", F.transform(F.percentile(_num(c), F.array([F.lit(q) for q in qs])),
                         lambda v: F.format_string("%.4f", v)))


AGG_REGISTRY: dict[str, Callable[[Column], Column]] = {
    # counts
    "get_array_len": lambda c: F.count(F.lit(1)),
    "get_non_empty_len": lambda c: F.count(_nonblank(c)),
    # uniq_len/uniq_mkstr: cells are ','-lists — split, drop blank tokens,
    # uniq (udfs.py:39-54). collect_set keeps per-group state comparable to
    # countDistinct; at extreme per-group cardinality use approx_uniq_len.
    "uniq_len": lambda c: F.size(
        F.array_distinct(F.flatten(F.collect_set(_split_tokens(c))))),
    "uniq_count": lambda c: F.countDistinct(_nonblank(c)),
    "approx_uniq_len": lambda c: F.approx_count_distinct(c),
    # string merges (cell-level ','-arrays, SURVEY §1.3); mkstr family drops
    # blank-after-strip values (udfs.py:77-85)
    "mkstr": lambda c: F.concat_ws(",", F.collect_list(_nonblank(c).cast("string"))),
    "sorted_mkstr": lambda c: F.concat_ws(
        ",", F.array_sort(F.collect_list(_nonblank(c).cast("string")))),
    "uniq_mkstr": lambda c: F.concat_ws(
        ",", F.array_sort(F.array_distinct(F.flatten(F.collect_set(_split_tokens(c)))))),
    "split_merge_uniq_mkstr": lambda c: F.concat_ws(
        ",", F.array_sort(F.array_distinct(F.flatten(F.collect_set(_split_tokens(c)))))),
    # merge_uniq keeps empty tokens (udfs.py:212-219 has no filter)
    "merge_uniq": lambda c: F.concat_ws(
        ",",
        F.array_sort(F.array_distinct(F.flatten(F.collect_set(F.split(c.cast("string"), ","))))),
    ),
    # numeric
    "mean": lambda c: F.avg(_num(c)),
    "std_dev": lambda c: F.coalesce(F.stddev_samp(_num(c)), F.lit(0.0)),
    "sumint": lambda c: F.sum(_int(c)),
    "sumfloat": lambda c: F.sum(_num(c)),
    "minint": lambda c: F.min(_int(c)),
    "maxint": lambda c: F.max(_int(c)),
    "minfloat": lambda c: F.min(_num(c)),
    "maxfloat": lambda c: F.max(_num(c)),
    "minstr": lambda c: F.min(c.cast("string")),
    "maxstr": lambda c: F.max(c.cast("string")),
    "minint_failsafe": lambda c: F.min(_int(_nonempty(c))),
    "maxint_failsafe": lambda c: F.max(_int(_nonempty(c))),
    "minfloat_failsafe": lambda c: F.min(_num(_nonempty(c))),
    "maxfloat_failsafe": lambda c: F.max(_num(_nonempty(c))),
    "minstr_failsafe": lambda c: F.min(_nonempty(c).cast("string")),
    "maxstr_failsafe": lambda c: F.max(_nonempty(c).cast("string")),
    "get_range_int": lambda c: F.max(_int(c)) - F.min(_int(c)),
    # order-dependent picks. Bare names keep the reference's partition-order
    # semantics (F.first — nondeterministic across runs on Spark, warned
    # below in agg_expr); the deterministic default is the parameterized
    # spelling "select_first(order_col)" → min_by(c, order_col), resolved in
    # _parse_param_agg. "select_first_unordered" is the silent opt-in to
    # partition order.
    "select_first": lambda c: F.first(c, ignorenulls=False),
    "select_first_unordered": lambda c: F.first(c, ignorenulls=False),
    "select_first_non_empty": lambda c: F.first(_nonempty(c), ignorenulls=True),
    "select_first_non_empty_unordered":
        lambda c: F.first(_nonempty(c), ignorenulls=True),
    # exact quantiles (reference uses numpy; percentile() is Spark's exact
    # aggregate — swap to percentile_approx for the 100 TB path via
    # "approx_quantile"). Reference default quantile == quantile4: grid
    # arange(0,1,0.25), 4-decimal format (udfs.py:227-244).
    "median": lambda c: F.percentile(_num(c), F.lit(0.5)),
    "quantile": lambda c: _quantile_grid(c, 0.25),
    "approx_quantile": lambda c: F.concat_ws(
        ",",
        F.transform(
            F.percentile_approx(_num(c), F.array([F.lit(x) for x in (0.25, 0.5, 0.75)])),
            lambda v: F.format_string("%.6f", v),
        ),
    ),
    # decimal-exact numeric aggregates: cast inputs to DECIMAL so the sum is
    # exact integer arithmetic (deterministic under any partitioning /
    # add-order — required for bit-exact oracle comparison and generally the
    # right call for money-like columns), then present as double.
    "sumdec": lambda c: F.sum(c.try_cast("decimal(18,4)")).cast("double"),
    "sumdec6": lambda c: F.sum(c.try_cast("decimal(18,6)")).cast("double"),
    "meandec": lambda c: F.sum(c.try_cast("decimal(18,4)")).cast("double")
    / F.count(c.try_cast("decimal(18,4)")),
    "meandec6": lambda c: F.sum(c.try_cast("decimal(18,6)")).cast("double")
    / F.count(c.try_cast("decimal(18,6)")),
    # deprecated reference aliases (udfs.py:20-22, 250-258)
    "get_len": lambda c: F.count(F.lit(1)),
    "min_str": lambda c: F.min(c.cast("string")),
    "max_str": lambda c: F.max(c.cast("string")),
    # "{:4f}"-formatted CSV merge (udfs.py:85-87)
    "mkstr4f": lambda c: F.concat_ws(
        ",", F.transform(F.collect_list(_num(c)),
                         lambda v: F.format_string("%4f", v))),
    # reference quantile grids: arange(0, 1, by), precision 4, linear
    # interpolation (udfs.py:227-248; numpy default) — F.percentile is
    # Spark's exact linear-interpolation aggregate
    "quantile4": lambda c: _quantile_grid(c, 0.25),
    "quantile10": lambda c: _quantile_grid(c, 1 / 10),
    "quantile40": lambda c: _quantile_grid(c, 1 / 40),
    # time: formatted consecutive deltas of the sorted group timestamps
    # (reference funclib.py:208-238; any timefuncs ladder shape accepted)
    "get_time_diffs": TF.time_diffs_agg,
    # plain SQL names accepted too
    "count": lambda c: F.count(F.lit(1)),
    "sum": lambda c: F.sum(_num(c)),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
    "avg": lambda c: F.avg(_num(c)),
    "count_distinct": lambda c: F.countDistinct(c),
    "collect_list": lambda c: F.collect_list(c),
    "collect_set": lambda c: F.collect_set(c),
}

# Window-compatible subset: most registry entries work over a Window spec as
# analytic functions (collapse=False semantics, reference dataframe.py:1080-1123).
_WINDOW_UNSUPPORTED = {"quantile", "approx_quantile", "median",
                       "quantile4", "quantile10", "quantile40"}

# Compound registry entries post-process the aggregate (e.g. cast after sum);
# over a Window the frame must attach to the inner aggregate, so these get
# dedicated window builders.
_WINDOW_COMPOUND: dict[str, Callable] = {
    "sumdec": lambda c, w: F.sum(c.try_cast("decimal(18,4)")).over(w).cast("double"),
    "sumdec6": lambda c, w: F.sum(c.try_cast("decimal(18,6)")).over(w).cast("double"),
    "meandec": lambda c, w: F.sum(c.try_cast("decimal(18,4)")).over(w).cast("double")
    / F.count(c.try_cast("decimal(18,4)")).over(w),
    "meandec6": lambda c, w: F.sum(c.try_cast("decimal(18,6)")).over(w).cast("double")
    / F.count(c.try_cast("decimal(18,6)")).over(w),
    "std_dev": lambda c, w: F.coalesce(F.stddev_samp(c.try_cast("double")).over(w), F.lit(0.0)),
    "get_range_int": lambda c, w: F.max(_int(c)).over(w) - F.min(_int(c)).over(w),
    "mkstr": lambda c, w: F.concat_ws(
        ",", F.collect_list(_nonblank(c).cast("string")).over(w)),
    "sorted_mkstr": lambda c, w: F.concat_ws(
        ",", F.array_sort(F.collect_list(_nonblank(c).cast("string")).over(w))),
    "uniq_mkstr": lambda c, w: F.concat_ws(
        ",", F.array_sort(F.array_distinct(
            F.flatten(F.collect_set(_split_tokens(c)).over(w))))),
    "mkstr4f": lambda c, w: F.concat_ws(
        ",", F.transform(F.collect_list(c.try_cast("double")).over(w),
                         lambda v: F.format_string("%4f", v))),
    # token-merge family: the frame attaches to the inner collect_set,
    # outer flatten/distinct/size post-process the window result
    "uniq_len": lambda c, w: F.size(F.array_distinct(
        F.flatten(F.collect_set(_split_tokens(c)).over(w)))),
    "split_merge_uniq_mkstr": lambda c, w: F.concat_ws(
        ",", F.array_sort(F.array_distinct(
            F.flatten(F.collect_set(_split_tokens(c)).over(w))))),
    "merge_uniq": lambda c, w: F.concat_ws(
        ",", F.array_sort(F.array_distinct(F.flatten(
            F.collect_set(F.split(c.cast("string"), ",")).over(w))))),
    # DISTINCT aggregates are rejected as window functions by Spark —
    # the window-exact form is size(collect_set) over the frame (same
    # null/blank semantics: collect_set drops nulls)
    "uniq_count": lambda c, w: F.size(F.collect_set(_nonblank(c)).over(w)),
    "count_distinct": lambda c, w: F.size(F.collect_set(c).over(w)),
    "get_time_diffs": lambda c, w: TF.time_diffs_window_agg(c, w),
}


def _fallback_udf_agg(func: Callable, c: Column) -> Column:
    """API-parity slow path: apply a ``list[str] -> scalar`` Python callable
    to the group's collected values (the reference's native contract,
    dataframe.py:1076). Returns string like the reference does."""

    @F.udf(returnType=T.StringType())
    def _apply(vals):
        out = func([v if v is not None else "" for v in (vals or [])])
        return "" if out is None else str(out)

    return _apply(F.collect_list(c.cast("string")))


# Parameterized aggregates: "name(order_col)" spellings that take an explicit
# order column and compile to deterministic min_by picks (partition-order
# `first` is nondeterministic on Spark; min_by is order-independent).
# min_by ignores rows whose ordering expression is NULL, which implements the
# non-empty filter for free.
_PARAM_AGGS = {
    "select_first": lambda c, o: F.min_by(c, o),
    "select_first_non_empty":
        lambda c, o: F.min_by(c, F.when(c.isNotNull() & (c.cast("string") != ""), o)),
    "select_last": lambda c, o: F.max_by(c, o),
    "select_last_non_empty":
        lambda c, o: F.max_by(c, F.when(c.isNotNull() & (c.cast("string") != ""), o)),
}

# ':' is this library's own column-namespace separator and '.' is legal in
# names — both are accepted in the order-column position and the reference
# is backtick-quoted so neither parses as struct access
_PARAM_RE = __import__("re").compile(r"^(\w+)\(\s*([\w.:]+)\s*\)$")


def _parse_param_agg(func: str):
    m = _PARAM_RE.match(func)
    if m and m.group(1) in _PARAM_AGGS:
        return _PARAM_AGGS[m.group(1)], m.group(2)
    return None, None


def agg_expr(func, col: Column) -> Column:
    """Compile a function (registry name, ``name(order_col)`` parameterized
    spec, or Python callable) + column into an aggregate expression."""
    if isinstance(func, str):
        fac, ord_col = _parse_param_agg(func)
        if fac is not None:
            from ..core import colutils
            return fac(col, F.col(colutils.quote(ord_col)))
        if func not in AGG_REGISTRY:
            raise KeyError(f"unknown aggregate function: {func!r}")
        if func in ("select_first", "select_first_non_empty"):
            from ..core.compat import warn_once

            warn_once(f"{func}: partition-order pick is nondeterministic on "
                      f"Spark; prefer '{func}(<order_col>)' (min_by) or opt "
                      f"in explicitly via {func}_unordered")
        return AGG_REGISTRY[func](col)
    name = getattr(func, "__name__", "")
    if name in AGG_REGISTRY:
        return AGG_REGISTRY[name](col)
    return _fallback_udf_agg(func, col)


def func_name(func) -> str:
    if isinstance(func, str):
        return func
    return getattr(func, "__name__", "func")


def window_agg_expr(func, col: Column, window) -> Column:
    """Analytic form: aggregate over a Window partition (collapse=False)."""
    name = func if isinstance(func, str) else getattr(func, "__name__", "")
    if name in _WINDOW_UNSUPPORTED:
        raise ValueError(f"{name} is not supported with collapse=False")
    if name in _WINDOW_COMPOUND:
        return _WINDOW_COMPOUND[name](col, window)
    if not isinstance(func, str) and name not in AGG_REGISTRY:
        raise ValueError("custom callables are not supported with collapse=False; "
                         "use group_by_key")
    return agg_expr(func, col).over(window)
