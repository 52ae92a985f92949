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
    r = odf.df.agg(
        F.count(col).alias("n"),
        F.avg(F.col(col).cast("double")).alias("mean"),
        F.var_samp(F.col(col).cast("double")).alias("var")).first()
    return r["n"], r["mean"] or 0.0, r["var"] or 0.0


def welch_ttest(odf1: OmigoDF, odf2: OmigoDF, col: str,
                precision: int = 6) -> dict:
    """Welch two-sample t-test. Returns dict with t_stat, df, p_value,
    plus per-side n/mean/var (all rounded for oracle comparability)."""
    n1, m1, v1 = _moments(odf1, col)
    n2, m2, v2 = _moments(odf2, col)
    se2 = v1 / n1 + v2 / n2
    t = (m1 - m2) / math.sqrt(se2) if se2 > 0 else 0.0
    df = (se2 ** 2) / ((v1 / n1) ** 2 / (n1 - 1) + (v2 / n2) ** 2 / (n2 - 1)) \
        if se2 > 0 else float(n1 + n2 - 2)
    try:
        from scipy import stats as sps  # type: ignore

        p = float(2 * sps.t.sf(abs(t), df))
    except Exception:
        # normal-tail approximation (good for df ≳ 30, our scale regime)
        p = math.erfc(abs(t) / math.sqrt(2.0))
    return {
        "n1": n1, "n2": n2,
        "mean1": round(m1, precision), "mean2": round(m2, precision),
        "var1": round(v1, precision), "var2": round(v2, precision),
        "t_stat": round(t, precision), "df": round(df, precision),
        "p_value": round(p, precision),
    }


def ks_test(odf1: OmigoDF, odf2: OmigoDF, col: str, precision: int = 6) -> dict:
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
    return {"n1": n1, "n2": n2, "d_stat": round(d, precision),
            "p_value": round(p, precision)}


def do_ttest(odf1: OmigoDF, odf2: OmigoDF, col: str, alpha: float = 0.05) -> dict:
    """Reference-shaped combined report (omigo_ext/stats.py:5-39)."""
    t = welch_ttest(odf1, odf2, col)
    k = ks_test(odf1, odf2, col)
    return {**{f"ttest_{kk}": vv for kk, vv in t.items()},
            **{f"ks_{kk}": vv for kk, vv in k.items()},
            "alpha": alpha,
            "ttest_reject": t["p_value"] < alpha,
            "ks_reject": k["p_value"] < alpha}
