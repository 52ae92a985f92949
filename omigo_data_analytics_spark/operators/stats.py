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

from pyspark.sql import functions as F

from ..core.colutils import qcol

from ..core.dataframe import OmigoDF
from ..core.jobs import checkpoint_with_metrics


def _moments(odf: OmigoDF, col: str):
    """Count/mean/sample-variance from EXACT decimal sums: per-element
    double→decimal(38,10) rounding is order-independent and decimal
    addition is exact, so the moments are bit-identical regardless of
    partitioning — and reproducible by any engine (the DuckDB oracle
    mirrors this formula)."""
    x = qcol(col).cast("double")
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
    # both sides must be non-empty: with one side empty the old
    # per-side guard left se2 = v/n of the OTHER side, silently turning
    # the two-sample test into a bogus test against mean 0 (and
    # diverging from do_ttest's fused path, which already returned 0)
    se2 = v1 / n1 + v2 / n2 if n1 and n2 else 0.0
    t = (m1 - m2) / math.sqrt(se2) if se2 > 0 else 0.0
    # explicit multiplication (not **): keeps the op sequence mirrorable
    # in SQL for bit-exact oracle comparison. A side with n<=1 has v=0 and
    # contributes nothing to the Welch-Satterthwaite denominator — guard it
    # so the 0.0/0 term can't raise (pooled-df fallback when both vanish).
    ws_den = ((v1 / n1) * (v1 / n1) / (n1 - 1) if n1 > 1 else 0.0) \
        + ((v2 / n2) * (v2 / n2) / (n2 - 1) if n2 > 1 else 0.0)
    df = (se2 * se2) / ws_den if se2 > 0 and ws_den > 0 \
        else float(max(n1 + n2 - 2, 1))
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


def _ks_d_distributed(u) -> tuple[float, int, int]:
    """Max ECDF gap WITHOUT a global-order window (which would put every
    row in one task): aggregate per distinct value (ties on x are counted
    together, same semantics as a rangeBetween sweep), range-repartition
    the distinct values, then a two-phase prefix sum — per-partition
    totals broadcast as offsets, local cumsum inside mapInPandas. Exact,
    and every stage is distributed.

    Returns ``(d_stat, n1, n2)`` — the side counts fall out of the
    per-partition totals the prefix sum collects anyway (r15), so
    callers no longer pay separate count() jobs; an empty side returns
    d=0 without running the scan."""
    from pyspark.sql import types as T

    g = (u.groupBy("x")
          .agg(F.sum(F.when(F.col("s") == 1, 1).otherwise(0)).alias("d1"),
               F.sum(F.when(F.col("s") == 2, 1).otherwise(0)).alias("d2")))
    # localCheckpoint pins the sampled range boundaries (two jobs follow)
    d = (g.repartitionByRange("x").sortWithinPartitions("x")).localCheckpoint()
    pid = F.spark_partition_id()
    parts = {r["pid"]: (r["t1"], r["t2"]) for r in
             d.groupBy(pid.alias("pid"))
              .agg(F.sum("d1").alias("t1"), F.sum("d2").alias("t2")).collect()}
    offsets, acc1, acc2 = {}, 0, 0
    for p in sorted(parts):
        offsets[p] = (acc1, acc2)
        acc1 += parts[p][0] or 0
        acc2 += parts[p][1] or 0
    n1, n2 = acc1, acc2
    if not (n1 and n2):
        return 0.0, n1, n2
    b_off = d.sparkSession.sparkContext.broadcast(offsets)
    schema = T.StructType([T.StructField("gap", T.DoubleType())])

    def _scan(iterator):
        import pandas as pd
        from pyspark import TaskContext

        c1, c2 = b_off.value.get(TaskContext.get().partitionId(), (0, 0))
        best = 0.0
        for pdf in iterator:
            for d1, d2 in zip(pdf["d1"], pdf["d2"]):
                c1 += int(d1)
                c2 += int(d2)
                gap = abs(c1 / n1 - c2 / n2)
                if gap > best:
                    best = gap
        yield pd.DataFrame({"gap": [best]})

    r = d.mapInPandas(_scan, schema=schema).agg(F.max("gap")).first()[0]
    return float(r or 0.0), n1, n2


def ks_test(odf1: OmigoDF, odf2: OmigoDF, col: str,
            precision: int | None = 6) -> dict:
    """Two-sample Kolmogorov-Smirnov D statistic, computed distributedly:
    per-distinct-value side counts, then a two-phase prefix-sum ECDF scan
    (no global-order window — see _ks_d_distributed)."""
    a = odf1.df.select(qcol(col).cast("double").alias("x")).where("x IS NOT NULL") \
        .withColumn("s", F.lit(1))
    b = odf2.df.select(qcol(col).cast("double").alias("x")).where("x IS NOT NULL") \
        .withColumn("s", F.lit(2))
    # side counts fall out of the KS scan's own per-partition totals
    # (r15) — the two separate full-scan count() jobs are gone
    u = a.unionByName(b)
    d, n1, n2 = _ks_d_distributed(u)
    p = _ks_pvalue(d, n1, n2)
    rnd = (lambda x: x) if precision is None else (lambda x: round(x, precision))
    return {"n1": n1, "n2": n2, "d_stat": rnd(d), "p_value": rnd(p)}


def _ks_pvalue(d: float, n1: int, n2: int) -> float:
    """Asymptotic Kolmogorov p-value with the degenerate guards the raw
    series lacks: an empty side divides by zero in the lam scaling, and
    at lam -> 0 (identical samples, D = 0) the truncated alternating
    series returns ~0 — flipping the p-value for INDISTINGUISHABLE
    distributions from 1 to 0 and making ks_reject fire on identical
    data. The true survival value for lam below ~0.05 is 1.0 to double
    precision."""
    if not (n1 and n2) or d <= 0:
        return 1.0
    en = math.sqrt(n1 * n2 / (n1 + n2))
    lam = (en + 0.12 + 0.11 / en) * d
    if lam < 0.05:
        return 1.0
    p = 2 * sum((-1) ** (k - 1) * math.exp(-2 * (lam ** 2) * (k ** 2))
                for k in range(1, 101))
    return max(0.0, min(1.0, p))


def do_ttest(odf1: OmigoDF, odf2: OmigoDF, col: str, alpha: float = 0.05,
             precision: int | None = 6) -> dict:
    """Reference-shaped combined report (omigo_ext/stats.py:5-39).

    Fused plan: both sides' moments come from ONE aggregation over the
    tagged union (checkpointed so the KS scan reuses it) — 2 jobs total
    for moments+counts instead of 4, plus the distributed KS scan. The
    statistics are numerically identical to welch_ttest/ks_test (same
    exact-decimal formulas)."""
    a = odf1.df.select(qcol(col).cast("double").alias("x")).where("x IS NOT NULL") \
        .withColumn("s", F.lit(1))
    b = odf2.df.select(qcol(col).cast("double").alias("x")).where("x IS NOT NULL") \
        .withColumn("s", F.lit(2))
    # both sides' moments ride the union checkpoint's OWN materialization
    # job as observe() metrics (r15): the tag has exactly two values, so
    # the per-side groupBy collapses to six conditional global aggregates
    # — same decimal addends, so the exact sums are bit-identical — and
    # the separate moments-collect job disappears. The checkpoint stays
    # EAGER (the r14 adjudication: the KS scan below is a second
    # consumer).
    x = F.col("x")

    def _m(tag, expr):
        return F.sum(F.when(F.col("s") == tag, expr))

    u, mrow = checkpoint_with_metrics(a.unionByName(b), {
        "n_1": F.count(F.when(F.col("s") == 1, x)),
        "s1_1": _m(1, x.cast("decimal(38,10)")),
        "s2_1": _m(1, (x * x).cast("decimal(38,10)")),
        "n_2": F.count(F.when(F.col("s") == 2, x)),
        "s1_2": _m(2, x.cast("decimal(38,10)")),
        "s2_2": _m(2, (x * x).cast("decimal(38,10)")),
    })
    mom = {t: {"n": mrow[f"n_{t}"], "s1": mrow[f"s1_{t}"],
               "s2": mrow[f"s2_{t}"]} for t in (1, 2)}

    def _side(tag):
        r = mom.get(tag)
        if r is None or not r["n"]:
            return 0, 0.0, 0.0
        n = r["n"]
        s1, s2 = float(r["s1"]), float(r["s2"])
        m = s1 / n
        v = (s2 - n * m * m) / (n - 1) if n > 1 else 0.0
        return n, m, v

    n1, m1, v1 = _side(1)
    n2, m2, v2 = _side(2)
    se2 = v1 / n1 + v2 / n2 if n1 and n2 else 0.0
    t_stat = (m1 - m2) / math.sqrt(se2) if se2 > 0 else 0.0
    # n<=1 side contributes 0 to the Welch-Satterthwaite denominator
    # (v=0); guard the (0.0/0) term and fall back to pooled df when the
    # whole denominator vanishes.
    ws_den = ((v1 / n1) * (v1 / n1) / (n1 - 1) if n1 > 1 else 0.0) \
        + ((v2 / n2) * (v2 / n2) / (n2 - 1) if n2 > 1 else 0.0)
    dof = (se2 * se2) / ws_den if se2 > 0 and ws_den > 0 \
        else float(max(n1 + n2 - 2, 1))
    try:
        from scipy import stats as sps  # type: ignore

        t_p = float(2 * sps.t.sf(abs(t_stat), dof))
    except Exception:
        t_p = math.erfc(abs(t_stat) / math.sqrt(2.0))

    d = _ks_d_distributed(u)[0] if n1 and n2 else 0.0
    ks_p = _ks_pvalue(d, n1, n2)

    rnd = (lambda v: v) if precision is None else (lambda v: round(v, precision))
    t = {"n1": n1, "n2": n2, "mean1": rnd(m1), "mean2": rnd(m2),
         "var1": rnd(v1), "var2": rnd(v2), "t_stat": rnd(t_stat),
         "df": rnd(dof), "p_value": rnd(t_p)}
    k = {"n1": n1, "n2": n2, "d_stat": rnd(d), "p_value": rnd(ks_p)}
    return {**{f"ttest_{kk}": vv for kk, vv in t.items()},
            **{f"ks_{kk}": vv for kk, vv in k.items()},
            "alpha": alpha,
            "ttest_reject": t["p_value"] < alpha,
            "ks_reject": k["p_value"] < alpha}
