"""Randomized adversarial parity hunt (r13, widened r15): drive the
engine's restructured plans against independent reference plans over
hostile value soups (NULL / NaN / +-Inf / -0.0 / +-1e308 / NULL keys)
and hostile column names (dots, backticks, colons, commas):

- ops 0-3 (r13): the bucketed two-phase plans (sessionize /
  merge_intervals / asof x3 directions x tolerances / rolling) vs
  their plain single-window twins;
- ops 4-6 (r15, the r13-verdict de-skewed join-back shapes):
  aggregate(collapse=False)'s groupBy+join-back vs a window reference,
  inverted_index's doc_freq join-back + WindowGroupLimit postings vs a
  collect_list reference, merge_similar_nodes' groupBy(psig)+join-back
  vs a window-min reference.

Asserts bit-identical canonical outputs. Complements the fixed-seed
pytest properties with breadth. Expected "fails": the rolling
decimal-overflow guard raising loudly on +-1e308 (its documented
contract, shared by both plans).

Usage: python tools/parity_hunt.py [n_trials] [seed]
"""
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import Window, functions as F
from omigo_data_analytics_spark import OmigoDF, get_spark
from omigo_data_analytics_spark.core import colutils
from omigo_data_analytics_spark.operators import graph as GR
from omigo_data_analytics_spark.operators import text as TX
from omigo_data_analytics_spark.operators import timeseries as TS

N_OPS = 7

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

_NODES = [None, "a", "b", "c", "a,b", "d.1", "d`2", "", "x y", "-0.0"]


def rand_edges(nmax=40):
    return [(random.choice(_NODES), random.choice(_NODES))
            for _ in range(random.randint(1, nmax))]


def _q(name):
    return F.col(colutils.quote(name))


fails = 0
for trial in range(N_TRIALS):
    rows = rand_rows()
    if not rows:
        continue
    span = random.choice([3.0, 17.0, 100.0, 1e6])
    df = spark.createDataFrame(rows, "k string, t double, v double")
    odf = OmigoDF(df)
    op = trial % N_OPS
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
        elif op == 4:
            # aggregate(collapse=False): de-skewed groupBy+join-back vs
            # a window reference, hostile names, NULL keys. min/max only
            # (order-insensitive — float sum would false-diverge), and
            # -0.0 canonicalized in the INPUT because Spark min/max keep
            # the first-seen of an IEEE-equal pair in BOTH plans (the
            # documented engine behavior, not a join-back property).
            h = df.select(F.col("k").alias("k:x.y"),
                          F.when(F.col("t") == 0.0, 0.0)
                          .otherwise(F.col("t")).alias("v`w"))
            a = OmigoDF(h).aggregate(["k:x.y"], ["v`w", "v`w"],
                                     ["min", "max"], collapse=False).df
            wref = Window.partitionBy(_q("k:x.y"))
            b = (h.withColumn("v`w:min", F.min(_q("v`w")).over(wref))
                  .withColumn("v`w:max", F.max(_q("v`w")).over(wref))
                  .select(*[_q(c) for c in a.columns]))
        elif op == 5:
            # inverted_index: doc_freq join-back + WindowGroupLimit
            # postings vs a collect_list reference, hostile id-col name
            # and comma/dot/backtick doc ids
            mp = random.choice([1, 3, 100])
            docs = spark.createDataFrame(
                [(random.choice([n for n in _NODES if n is not None]),
                  " ".join(random.choices(
                      ["the", "a", "b,c", "d.e", "", "THE", "x"],
                      k=random.randint(0, 6))))
                 for _ in range(random.randint(1, 30))],
                "`doc.id``x` string, text string")
            a = TX.inverted_index(OmigoDF(docs), id_col="doc.id`x",
                                  max_postings=mp).df
            ex = (docs.select(F.explode(F.array_distinct(
                      F.split(F.lower(F.col("text")), " "))).alias("term"),
                      _q("doc.id`x"))
                  .where(F.col("term") != ""))
            b = (ex.groupBy("term")
                 .agg(F.count(F.lit(1)).alias("doc_freq"),
                      F.concat_ws(",", F.slice(
                          F.array_sort(F.collect_list(
                              _q("doc.id`x").cast("string"))),
                          1, mp)).alias("postings")))
        elif op == 6:
            # merge_similar_nodes: groupBy(psig)+join-back representative
            # vs a window-min reference, hostile edge-col names and
            # comma-collision node ids
            edges = spark.createDataFrame(rand_edges(),
                                          "`sr.c` string, `d``st` string")
            a = GR.merge_similar_nodes(OmigoDF(edges), src_col="sr.c",
                                       dst_col="d`st").df
            srcs = edges.select(_q("sr.c").alias("__n__")).distinct()
            leaves = (edges.join(srcs, _q("d`st")
                                 == F.col("__n__"), "left_anti")
                      .select(_q("d`st").alias("__leaf__")).distinct())
            parents = (edges.join(leaves, _q("d`st")
                                  == F.col("__leaf__"))
                       .groupBy("__leaf__")
                       .agg(F.array_sort(F.collect_set(
                           _q("sr.c").cast("string"))).alias("__psig__")))
            wp = Window.partitionBy("__psig__")
            remap = (parents
                     .withColumn("__rep__", F.min("__leaf__").over(wp))
                     .select("__leaf__", "__rep__"))
            b = (edges.join(remap, _q("d`st")
                            == F.col("__leaf__"), "left")
                 .withColumn("d`st", F.coalesce(F.col("__rep__"),
                                                _q("d`st")))
                 .drop("__leaf__", "__rep__")
                 .select(*[_q(c) for c in edges.columns]).distinct())
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
