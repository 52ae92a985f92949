"""Randomized adversarial parity hunt (r13): drive the bucketed
two-phase plans (sessionize / merge_intervals / asof x3 directions x
tolerances / rolling) against their plain single-window twins over
hostile value soups (NULL / NaN / +-Inf / -0.0 / +-1e308 / NULL keys),
random spans and gaps, and assert bit-identical canonical outputs.
Complements the fixed-seed pytest properties with breadth. Expected
"fails": the rolling decimal-overflow guard raising loudly on +-1e308
(its documented contract, shared by both plans).

Usage: python tools/parity_hunt.py [n_trials] [seed]
"""
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F
from omigo_data_analytics_spark import OmigoDF, get_spark
from omigo_data_analytics_spark.operators import timeseries as TS

spark = get_spark("hunt", cpus=8)
N_TRIALS = int(sys.argv[1]) if len(sys.argv) > 1 else 24
random.seed(int(sys.argv[2]) if len(sys.argv) > 2 else 20260816)
VALS = [None, float("nan"), float("inf"), float("-inf"), -0.0, 0.0,
        1e308, -1e308] + [float(x) for x in range(-50, 400, 7)]

def rand_rows(nk=3, nmax=60):
    rows = []
    for ki in range(nk):
        k = random.choice([f"k{ki}", None])
        for _ in range(random.randint(0, nmax)):
            rows.append((k, random.choice(VALS), random.choice(VALS)))
    return rows

def canon(df):
    return sorted(tuple(str(x) for x in r) for r in map(tuple, df.collect()))

fails = 0
for trial in range(N_TRIALS):
    rows = rand_rows()
    if not rows:
        continue
    span = random.choice([3.0, 17.0, 100.0, 1e6])
    df = spark.createDataFrame(rows, "k string, t double, v double")
    odf = OmigoDF(df)
    op = trial % 4
    try:
        if op == 0:
            gap = random.choice([5.0, 50.0])
            a = TS.sessionize(odf, "k", "t", gap_sec=gap).df
            b = TS.sessionize(odf, "k", "t", gap_sec=gap,
                              time_buckets_sec=span, hot_key_rows=1).df
        elif op == 1:
            iv = OmigoDF(df.select("k", F.col("t").alias("s"),
                                   random.choice([F.col("v"), F.col("t") + 5.0]).alias("e")))
            a = TS.merge_intervals(iv, "k", "s", "e").df
            b = TS.merge_intervals(iv, "k", "s", "e",
                                   time_buckets_sec=span, hot_key_rows=1).df
        elif op == 2:
            direction = random.choice(["backward", "forward", "nearest"])
            tol = random.choice([None, 10.0, 200.0])
            left = OmigoDF(df.select("k", F.col("t").alias("lt"),
                                     F.col("v").alias("lv")))
            right = OmigoDF(df.select("k", F.col("t").alias("rt"),
                                      F.col("v").alias("rv")))
            a = TS.asof_join(left, right, "k", "lt", "rt", suffix="q",
                             direction=direction, tolerance_sec=tol,
                             tiebreak_cols=["rv"]).df
            b = TS.asof_join(left, right, "k", "lt", "rt", suffix="q",
                             direction=direction, tolerance_sec=tol,
                             tiebreak_cols=["rv"],
                             time_buckets_sec=span, hot_key_rows=1).df
        else:
            w = random.choice([2, 4])
            a = TS.rolling_aggregate(odf, "k", "t", ["v"], ["sum"],
                                     window_rows=w, tiebreak_cols=["v"]).df
            try:
                b = TS.rolling_aggregate(odf, "k", "t", ["v"], ["sum"],
                                         window_rows=w, tiebreak_cols=["v"],
                                         time_buckets_sec=span,
                                         hot_key_rows=1).df
            except Exception as e:
                # in-plan since r14: fires at execution as a Spark error
                if "time_buckets_sec too small" in str(e):
                    print(f"trial {trial}: rolling guard raised (ok)")
                    continue
                raise
        ca, cb = canon(a), canon(b)
        if ca != cb:
            fails += 1
            only_a = [r for r in ca if r not in cb][:3]
            only_b = [r for r in cb if r not in ca][:3]
            print(f"trial {trial} op={op} span={span} DIVERGED "
                  f"({len(ca)} vs {len(cb)} rows)\n  a-only={only_a}\n  b-only={only_b}")
        else:
            print(f"trial {trial} op={op} span={span} ok ({len(ca)} rows)")
    except Exception as ex:
        if op == 3 and "time_buckets_sec too small" in str(ex):
            # in-plan since r14: the guard fires when canon() executes
            # the bucketed plan, not at construct time
            print(f"trial {trial}: rolling guard raised (ok)")
            continue
        if op == 3 and "decimal overflow" in str(ex):
            # documented contract on +-1e308 window sums, shared by
            # both plans (the docstring's expected-raise class); since
            # the span guard went in-plan more trials reach it
            print(f"trial {trial}: rolling overflow guard raised (ok)")
            continue
        fails += 1
        print(f"trial {trial} op={op} ERROR: {str(ex)[:160]}")
print("HUNT DONE, fails =", fails)
