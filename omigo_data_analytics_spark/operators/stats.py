"""Statistical comparison operators (reference omigo_ext/stats.py:5-39:
Welch t-test + Kolmogorov-Smirnov on a column of two DataFrames).

Everything aggregates distributedly: moments via one agg per side (no
driver materialization of the data), KS via a merged sorted CDF sweep
expressed as window functions. scipy is not in this container, so p-values
use standard closed-form approximations (normal tail for t at the sample
sizes this targets; the Kolmogorov asymptotic series for KS) behind an
import-try that prefers scipy when present.
"""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..core.dataframe import OmigoDF


def _moments(odf: OmigoDF, col: str):
    """Count/mean/sample-variance from EXACT decimal sums: per-element
    double→decimal(38,10) rounding is order-independent and decimal
    addition is exact, so the moments are bit-identical regardless of
    partitioning — and reproducible by any engine (the DuckDB oracle
    mirrors this formula)."""
    x = F.col(col).cast("double")
    r = odf.df.agg(
        F.count(x).alias("n"),
        F.sum(x.cast("decimal(38,10)")).alias("s1"),
        F.sum((x * x).cast("decimal(38,10)")).alias("s2")).first()
    n = r["n"] or 0
    if n == 0:
        return 0, 0.0, 0.0
    s1, s2 = float(r["s1"]), float(r["s2"])
    m = s1 / n
    v = (s2 - n * m * m) / (n - 1) if n > 1 else 0.0
    return n, m, v


def welch_ttest(odf1: OmigoDF, odf2: OmigoDF, col: str,
                precision: int | None = 6) -> dict:
    """Welch two-sample t-test. Returns dict with t_stat, df, p_value,
    plus per-side n/mean/var. ``precision=None`` skips rounding — with
    the exact-sum moments every statistic is then bit-deterministic
    (add/mul/div/sqrt are IEEE correctly rounded on identical inputs)."""
    n1, m1, v1 = _moments(odf1, col)
    n2, m2, v2 = _moments(odf2, col)
    se2 = v1 / n1 + v2 / n2
    t = (m1 - m2) / math.sqrt(se2) if se2 > 0 else 0.0
    # explicit multiplication (not **): keeps the op sequence mirrorable
    # in SQL for bit-exact oracle comparison
    df = (se2 * se2) / ((v1 / n1) * (v1 / n1) / (n1 - 1)
                        + (v2 / n2) * (v2 / n2) / (n2 - 1)) \
        if se2 > 0 else float(n1 + n2 - 2)
    try:
        from scipy import stats as sps  # type: ignore

        p = float(2 * sps.t.sf(abs(t), df))
    except Exception:
        # normal-tail approximation (good for df ≳ 30, our scale regime)
        p = math.erfc(abs(t) / math.sqrt(2.0))
    rnd = (lambda x: x) if precision is None else (lambda x: round(x, precision))
    return {
        "n1": n1, "n2": n2,
        "mean1": rnd(m1), "mean2": rnd(m2),
        "var1": rnd(v1), "var2": rnd(v2),
        "t_stat": rnd(t), "df": rnd(df),
        "p_value": rnd(p),
    }


def ks_test(odf1: OmigoDF, odf2: OmigoDF, col: str,
            precision: int | None = 6) -> dict:
    """Two-sample Kolmogorov-Smirnov D statistic, computed distributedly:
    union the samples tagged by side, sort-window the empirical CDFs, take
    the max gap. One shuffle (the window sort)."""
    a = odf1.df.select(F.col(col).cast("double").alias("x")).where("x IS NOT NULL") \
        .withColumn("s", F.lit(1))
    b = odf2.df.select(F.col(col).cast("double").alias("x")).where("x IS NOT NULL") \
        .withColumn("s", F.lit(2))
    n1 = a.count()
    n2 = b.count()
    u = a.unionByName(b)
    # rangeBetween (not rowsBetween): at a tied x both sides' ties must be
    # fully counted before the gap is evaluated, or D is inflated mid-tie
    w = Window.orderBy("x").rangeBetween(Window.unboundedPreceding, 0)
    cdfs = (u.withColumn("c1", F.sum(F.when(F.col("s") == 1, 1).otherwise(0)).over(w) / n1)
             .withColumn("c2", F.sum(F.when(F.col("s") == 2, 1).otherwise(0)).over(w) / n2))
    d = cdfs.agg(F.max(F.abs(F.col("c1") - F.col("c2")))).first()[0] or 0.0
    en = math.sqrt(n1 * n2 / (n1 + n2))
    lam = (en + 0.12 + 0.11 / en) * d
    p = 2 * sum((-1) ** (k - 1) * math.exp(-2 * (lam ** 2) * (k ** 2))
                for k in range(1, 101))
    p = max(0.0, min(1.0, p))
    rnd = (lambda x: x) if precision is None else (lambda x: round(x, precision))
    return {"n1": n1, "n2": n2, "d_stat": rnd(d), "p_value": rnd(p)}


def do_ttest(odf1: OmigoDF, odf2: OmigoDF, col: str, alpha: float = 0.05) -> dict:
    """Reference-shaped combined report (omigo_ext/stats.py:5-39)."""
    t = welch_ttest(odf1, odf2, col)
    k = ks_test(odf1, odf2, col)
    return {**{f"ttest_{kk}": vv for kk, vv in t.items()},
            **{f"ks_{kk}": vv for kk, vv in k.items()},
            "alpha": alpha,
            "ttest_reject": t["p_value"] < alpha,
            "ks_reject": k["p_value"] < alpha}
