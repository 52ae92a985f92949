"""Reference-compatible UDF library (reference omigo_core/udfs.py).

Plain-Python scalar and ``list[str] -> scalar`` aggregate callables with
the reference's names and string-first semantics. They plug into the
engine's lambda extension points (``transform``, ``filter``,
``aggregate`` — the UDF fallback collects the group and applies the
callable, reference dataframe.py:1076). For every aggregate name here
there is also a NATIVE Spark mapping in ``functions.aggs.AGG_REGISTRY``;
passing the *name* (or this module's function, by __name__) picks the
native JVM-side aggregate — these Python bodies are the API-parity /
custom-lambda path, not the hot path.

Reference citations: udfs.py:9-17 (parse_file_base_name), :20-37 (len
family), :39-61 (uniq/mkstr), :63-75 (mean/std_dev), :77-87 (mkstr
variants), :89-193 (min/max typed + failsafe), :195-206 (sums),
:208-225 (uniq_count/merge_uniq/select_first/select_max_int),
:227-258 (quantiles, min_str/max_str), :260-273 (to*digit,
convert_prob_to_binary), :275-406 (select_first_non_empty, if_else
family), :408-415 (get_range_int).
"""

from __future__ import annotations

import math


def _floats(vs):
    return [float(v) for v in vs]


# ---------------------------------------------------------------- scalars
def parse_file_base_name(x: str) -> str:
    """Basename of a path (either separator) — reference udfs.py:9-17."""
    x = str(x)
    for sep in ("\\", "/"):
        if sep in x:
            x = x[x.rindex(sep) + 1:]
    return x


def get_string_len(v) -> str:
    return str(len(str(v)))


def to2digit(x) -> str:
    return "{:.2f}".format(float(x))


def to4digit(x) -> str:
    return "{:.4f}".format(float(x))


def to6digit(x) -> str:
    return "{:.6f}".format(float(x))


def convert_prob_to_binary(x, split: float = 0.5) -> int:
    return 1 if float(x) >= split else 0


def select_max_int(x, y) -> int:
    return max(int(x), int(y))


def _unpack(args, n, name):
    xs = args[0] if args and isinstance(args[0], (list, tuple)) else list(args)
    if len(xs) != n:
        raise ValueError(f"{name}: expected {n} args, got {xs!r}")
    return xs


def if_else_str(*args) -> str:
    """(xinput, xval, v1, v2) -> v1 if str equal else v2 (udfs.py:324-349)."""
    xinput, xval, v1, v2 = _unpack(args, 4, "if_else_str")
    return str(v1) if (xinput is not None and str(xinput) == str(xval)) else str(v2)


def if_else_int(*args):
    """(xinput, xval, v1, v2) -> v1 if int equal else v2 (udfs.py:352-378)."""
    xinput, xval, v1, v2 = _unpack(args, 4, "if_else_int")
    return v1 if (xinput is not None and int(xinput) == int(xval)) else v2


def if_else_non_empty_str(*args) -> str:
    """(x, v1, v2) -> v1 if x non-empty else v2 (udfs.py:298-321)."""
    x, v1, v2 = _unpack(args, 3, "if_else_non_empty_str")
    return str(v1) if (x is not None and str(x) != "") else str(v2)


def if_else_non_zero_int(*args):
    """(x, v1, v2) -> v1 if x is null-or-nonzero else v2 (udfs.py:381-406)."""
    x, v1, v2 = _unpack(args, 3, "if_else_non_zero_int")
    return v1 if (x is None or int(x) != 0) else v2


def select_first_non_empty(*args) -> str:
    """First non-empty value among the args (udfs.py:275-295)."""
    xs = args[0] if args and isinstance(args[0], (list, tuple)) else list(args)
    for x in xs:
        if x is not None and x != "":
            return str(x)
    return ""


# ------------------------------------------------------------- aggregates
def get_len(vs) -> str:
    return str(len(vs))


def get_array_len(vs) -> str:
    return str(len(vs)) if isinstance(vs, list) else "0"


def get_non_empty_len(vs) -> str:
    return str(sum(1 for v in vs if str(v).strip() != ""))


def _split_nonblank(vs) -> set:
    # uniq_len/uniq_mkstr cell convention (reference udfs.py:39-54): each
    # cell is a ','-list; blank-after-strip tokens dropped, kept unstripped.
    out = set()
    for v in vs:
        out.update(k for k in str(v).split(",") if k.strip() != "")
    return out


def uniq_len(vs) -> str:
    return str(len(_split_nonblank(vs)))


def uniq_count(vs) -> str:
    # udfs.py:208-210 — exact-'' filter, no splitting
    return str(len({v for v in vs if str(v).strip() != ""}))


def mkstr(vs) -> str:
    # udfs.py:77-79 — drops blank-after-strip values
    return ",".join(s for s in (str(v) for v in vs) if s.strip() != "")


def sorted_mkstr(vs) -> str:
    return ",".join(sorted(s for s in (str(v) for v in vs) if s.strip() != ""))


def uniq_mkstr(vs) -> str:
    return ",".join(sorted(_split_nonblank(vs)))


def split_merge_uniq_mkstr(vs) -> str:
    return ",".join(sorted(_split_nonblank(vs)))


def merge_uniq(vs) -> str:
    # udfs.py:212-219 — splits but keeps empty tokens
    out = set()
    for v in vs:
        out.update(str(v).split(","))
    return ",".join(sorted(out))


def mkstr4f(vs) -> str:
    return ",".join("{:4f}".format(float(v)) for v in vs)


def mean(vs) -> float:
    xs = _floats(vs)
    return sum(xs) / len(xs)


def std_dev(vs) -> float:
    xs = _floats(vs)
    if len(xs) < 2:
        return 0.0
    m = sum(xs) / len(xs)
    return math.sqrt(sum((x - m) ** 2 for x in xs) / (len(xs) - 1))


def sumint(vs) -> int:
    return sum(int(float(v)) for v in vs)


def sumfloat(vs) -> float:
    return sum(_floats(vs))


def minint(vs) -> int:
    return min(int(float(v)) for v in vs)


def maxint(vs) -> int:
    return max(int(float(v)) for v in vs)


def minfloat(vs) -> float:
    return min(_floats(vs))


def maxfloat(vs) -> float:
    return max(_floats(vs))


def minstr(vs) -> str:
    return min(str(v) for v in vs)


def maxstr(vs) -> str:
    return max(str(v) for v in vs)


def min_str(vs) -> str:
    return minstr(vs)


def max_str(vs) -> str:
    return maxstr(vs)


def _nonempty_vals(vs):
    return [v for v in vs if str(v) != ""]


def minint_failsafe(vs):
    vs = _nonempty_vals(vs)
    return minint(vs) if vs else ""


def maxint_failsafe(vs):
    vs = _nonempty_vals(vs)
    return maxint(vs) if vs else ""


def minfloat_failsafe(vs):
    vs = _nonempty_vals(vs)
    return minfloat(vs) if vs else ""


def maxfloat_failsafe(vs):
    vs = _nonempty_vals(vs)
    return maxfloat(vs) if vs else ""


def minstr_failsafe(vs):
    vs = _nonempty_vals(vs)
    return minstr(vs) if vs else ""


def maxstr_failsafe(vs):
    vs = _nonempty_vals(vs)
    return maxstr(vs) if vs else ""


def select_first(vs) -> str:
    return str(vs[0]) if vs else ""


def get_range_int(vs) -> int:
    return maxint(vs) - minint(vs)


def _quantile_linear(xs: list[float], q: float) -> float:
    """numpy-style linear-interpolation quantile (np.quantile default)."""
    xs = sorted(xs)
    if len(xs) == 1:
        return xs[0]
    pos = q * (len(xs) - 1)
    lo = int(math.floor(pos))
    hi = min(lo + 1, len(xs) - 1)
    return xs[lo] + (pos - lo) * (xs[hi] - xs[lo])


def quantile(vs, start: float = 0, end: float = 1, by: float = 0.25,
             precision: int = 4) -> str:
    """CSV of quantiles at arange(start, end, by) (udfs.py:227-240)."""
    if start > end:
        raise ValueError(f"quantile: start {start} > end {end}")
    qs = []
    cur = start
    while cur < end:
        qs.append(cur)
        cur += by
    xs = _floats(vs)
    fmt = "{:." + str(precision) + "f}"
    return ",".join(fmt.format(_quantile_linear(xs, q)) for q in qs)


def quantile4(vs) -> str:
    return quantile(vs)


def quantile10(vs) -> str:
    return quantile(vs, by=1 / 10)


def quantile40(vs) -> str:
    return quantile(vs, by=1 / 40)
