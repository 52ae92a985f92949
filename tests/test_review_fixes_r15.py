"""Round-15 focused pins: observe-fused checkpoint terminators and the
dead-end-flag loop restructure."""

import pytest
from pyspark.sql import functions as F

from omigo_data_analytics_spark.core.dataframe import OmigoDF
from omigo_data_analytics_spark.core.jobs import checkpoint_with_metrics
from omigo_data_analytics_spark.operators import graph as G


def test_checkpoint_with_metrics_matches_separate_aggregate(spark):
    df = spark.range(1000).select((F.col("id") % 13).alias("k"),
                                  F.col("id").alias("v"))
    ck, m = checkpoint_with_metrics(
        df, {"n": F.count(F.lit(1)),
             "h": F.expr("bit_xor(xxhash64(k, v))"),
             "cond": F.count(F.when(F.col("k") == 0, 1))})
    row = df.agg(F.count(F.lit(1)).alias("n"),
                 F.expr("bit_xor(xxhash64(k, v))").alias("h"),
                 F.count(F.when(F.col("k") == 0, 1)).alias("cond")).first()
    assert m["n"] == row["n"] == 1000
    assert m["h"] == row["h"]
    assert m["cond"] == row["cond"]
    # the returned frame is materialized and reusable
    assert ck.count() == 1000


def test_checkpoint_with_metrics_empty_frame(spark):
    df = spark.range(10).where("id < 0")
    ck, m = checkpoint_with_metrics(
        df, {"n": F.count(F.lit(1)),
             "h": F.expr("bit_xor(xxhash64(id))")})
    assert m["n"] == 0
    assert m["h"] is None
    assert ck.count() == 0


def test_checkpoint_with_metrics_single_job(spark):
    # the whole point: checkpoint + terminator metrics in ONE driver job
    sc = spark.sparkContext

    def _n_jobs():
        return len(sc.statusTracker().getJobIdsForGroup(None) or [])

    df = spark.range(5000).select((F.col("id") % 7).alias("g")).distinct()
    df.count()  # warm any lazy session state
    j0 = _n_jobs()
    _, m = checkpoint_with_metrics(
        spark.range(5000).select((F.col("id") % 7).alias("g")),
        {"n": F.count(F.lit(1))})
    # no exchange in this plan -> exactly one job for ckpt + metrics
    assert _n_jobs() - j0 == 1
    assert m["n"] == 5000


def test_bfs_levels_dead_end_early_exit_correct(spark):
    # last level is all dead-ends: the early exit (live == 0) must still
    # emit those nodes at their level
    e = OmigoDF(spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")], ["src", "dst"]))
    out = {r["node_id"]: r["level"]
           for r in G.bfs_levels(e, ["a"]).df.collect()}
    assert out == {"a": 0, "b": 1, "c": 1, "d": 2}


def test_bfs_levels_dead_end_seeds_and_cycles(spark):
    # seeds with no outgoing edges appear at level 0; cycles keep min level
    e = OmigoDF(spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c")], ["src", "dst"]))
    out = {r["node_id"]: r["level"]
           for r in G.bfs_levels(e, ["a", "zzz"]).df.collect()}
    assert out == {"a": 0, "zzz": 0, "b": 1, "c": 2}


def test_ancestors_flag_carries_through_composition(spark):
    # depth-4 chain: the closure needs 2 composition rounds; pairs ending
    # at the chain tail (dead end) must still compose INTO others' results
    e = OmigoDF(spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")], ["src", "dst"]))
    out = sorted((r["node_id"], r["ancestor"])
                 for r in G.ancestors(e).df.collect())
    want = sorted([("b", "a"), ("c", "a"), ("c", "b"), ("d", "a"),
                   ("d", "b"), ("d", "c"), ("e", "a"), ("e", "b"),
                   ("e", "c"), ("e", "d")])
    assert out == want


def test_time_ordered_ancestors_dead_end_states_kept(spark):
    # states at dead-end nodes never extend but MUST stay in the output
    rows = [("a", "b", 1), ("b", "c", 2), ("x", "c", 5)]
    e = OmigoDF(spark.createDataFrame(rows, ["src", "dst", "ts"]))
    out = sorted((r["node_id"], r["ancestor"], r["arr_ts"])
                 for r in G.time_ordered_ancestors(e, "ts").df.collect())
    assert out == [("b", "a", 1), ("c", "a", 2), ("c", "b", 2),
                   ("c", "x", 5)]


def _wait_for_warning(record, needle, timeout=15.0):
    import time
    t0 = time.time()
    while time.time() - t0 < timeout:
        if any(needle in str(w.message) for w in record):
            return True
        time.sleep(0.25)
    return False


def test_plain_hot_key_watch_warns_with_zero_extra_jobs(spark):
    # r13 verdict #3 via r14 verdict #5: the PLAIN ordered-carry paths
    # warn on hot keys by riding the main action (observe), with ZERO
    # extra jobs at construct — no eager census scan.
    import warnings

    from omigo_data_analytics_spark.operators import timeseries as TS
    sc = spark.sparkContext

    def _n_jobs():
        return len(sc.statusTracker().getJobIdsForGroup(None) or [])

    rows = [("hot", float(i)) for i in range(50)] + [("cold", 1.0)]
    d = OmigoDF(spark.createDataFrame(rows, ["k", "t"]))
    j0 = _n_jobs()
    out = TS.sessionize(d, "k", "t", gap_sec=5.0, hot_key_rows=10)
    assert _n_jobs() - j0 == 0  # construction submits no jobs
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        assert out.df.count() == 51
        assert _wait_for_warning(rec, "sessionize: a key group holds 50")
        assert any("time_buckets_sec" in str(w.message) for w in rec)


def test_plain_hot_key_watch_quiet_below_threshold(spark):
    import time
    import warnings

    from omigo_data_analytics_spark.operators import timeseries as TS
    rows = [("a", float(i)) for i in range(5)]
    d = OmigoDF(spark.createDataFrame(rows, ["k", "t"]))
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        out = TS.merge_intervals(
            OmigoDF(spark.createDataFrame(
                [("a", 0.0, 1.0), ("a", 2.0, 3.0)], ["k", "s", "e"])),
            "k", "s", "e", hot_key_rows=10)
        assert out.df.count() == 2
        r = TS.rolling_aggregate(d, "k", "t", ["t"], ["sum"],
                                 hot_key_rows=10)
        assert r.df.count() == 5
        time.sleep(2.0)  # give the poller time to (not) fire
        assert not [w for w in rec if "key group" in str(w.message)]


def test_plain_hot_key_watch_asof_and_results_unchanged(spark):
    import warnings

    from omigo_data_analytics_spark.operators import timeseries as TS
    left = OmigoDF(spark.createDataFrame(
        [("k", float(i)) for i in range(30)], ["k", "t"]))
    right = OmigoDF(spark.createDataFrame(
        [("k", float(i) + 0.5, i) for i in range(30)], ["k", "t", "v"]))
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        out = TS.asof_join(left, right, "k", "t", hot_key_rows=20)
        rows = {r["t"]: r["r:v"] for r in out.df.collect()}
        # backward as-of: t=5.0 matches right t=4.5 -> v=4
        assert rows[5.0] == 4 and rows[0.0] is None
        assert _wait_for_warning(rec, "asof_join: a key group holds 60")


def test_graph_ops_hostile_backtick_dot_names(spark):
    # r15 parity-hunt find: merge_similar_nodes / remove_cycles /
    # remove_dangling_edges used e[col] getitem and raw-string selects,
    # which PARSE the name — a lone backtick or dot broke them
    edges = spark.createDataFrame([("a", "b"), ("a", "c")],
                                  "`sr.c` string, `d``st` string")
    out = {tuple(r) for r in G.merge_similar_nodes(
        OmigoDF(edges), src_col="sr.c", dst_col="d`st").df.collect()}
    assert out == {("a", "b")}  # b,c same-parent leaves merge to min
    e2 = spark.createDataFrame([("a", "b", 1), ("b", "a", 0)],
                               "`sr.c` string, `d``st` string, `t.s` long")
    out2 = {tuple(r) for r in G.remove_cycles(
        OmigoDF(e2), "t.s", src_col="sr.c", dst_col="d`st").df.collect()}
    assert out2 == {("a", "b", 1)}
    out3 = {tuple(r) for r in G.remove_dangling_edges(
        OmigoDF(edges), ["b", "c"], src_col="sr.c",
        dst_col="d`st").df.collect()}
    assert out3 == {("a", "b"), ("a", "c")}


def test_connected_components_signature_rides_checkpoint(spark):
    # long chain forces several propagation rounds through the fused
    # observe() signature path; labels must be the component min
    n = 8
    rows = [(f"n{i}", f"n{i+1}") for i in range(n)]
    cc = {r["id"]: r["cluster_id"]
          for r in __import__(
              "omigo_data_analytics_spark.operators.dedup",
              fromlist=["dedup"]).connected_components(
              OmigoDF(spark.createDataFrame(rows, ["id_a", "id_b"])),
              max_iter=20).df.collect()}
    assert set(cc.values()) == {"n0"} and len(cc) == n + 1


# --------------------------------------------------------------------------
# r15 similarity expression hygiene: centroid-norm literals + per-row norm
# binding must be BIT-IDENTICAL to the all-inline r14 cosine form,
# including on hostile vectors (NaN / ±Inf / -0.0 / zero-norm / NULL).

def _r14_inline_cands_expr(vec_col, centroids):
    """The pre-r15 _ivf_cands_expr, kept verbatim as the parity reference:
    every centroid's cosine recomputed BOTH norms inline per row."""
    dot = ("aggregate(zip_with(CAST({a} AS ARRAY<DOUBLE>), "
           "CAST({b} AS ARRAY<DOUBLE>), (x, y) -> x * y), "
           "CAST(0 AS DOUBLE), (acc, v) -> acc + v)")
    elems = []
    for cid, vec in centroids:
        arr = ("CAST(array(" + ", ".join(repr(float(x)) for x in vec)
               + ") AS ARRAY<DOUBLE>)")
        elems.append(f"named_struct('id', CAST({int(cid)} AS BIGINT), 'v', {arr})")
    cents = "array(" + ", ".join(elems) + ")"
    d = dot.format(a=f"`{vec_col}`", b="c.v")
    na = f"sqrt({dot.format(a=f'`{vec_col}`', b=f'`{vec_col}`')})"
    nb = f"sqrt({dot.format(a='c.v', b='c.v')})"
    cos = f"({d}) / nullif(({na}) * ({nb}), CAST(0 AS DOUBLE))"
    return (f"transform({cents}, c -> named_struct("
            f"'id', c.id, 'cos', round({cos}, 6)))")


_HOSTILE_VECS = [
    (1, [0.3, -0.7, 1.2]),
    (2, [0.0, 0.0, 0.0]),                       # zero norm -> NULL cosine
    (3, [-0.0, 0.0, -0.0]),                     # signed zeros
    (4, [float("nan"), 1.0, 2.0]),              # NaN poisons dot and norm
    (5, [float("inf"), 1.0, 2.0]),
    (6, [-1e308, 1e308, 1.0]),                  # overflow-prone products
    (7, None),                                  # NULL vector
    (8, [1e-308, -1e-308, 5e-324]),             # subnormals
    (9, [0.1, 0.2, 0.30000000000000004]),
]


def test_ivf_cands_expr_bit_identical_to_r14_inline(spark):
    from omigo_data_analytics_spark.operators.similarity import (
        _ivf_cands_expr)
    cents = [(10, [0.5, -0.25, 0.125]), (11, [1.0, 1.0, 1.0]),
             (12, [-0.0, 0.0, 0.0]), (13, [1e154, -1e154, 1.0])]
    df = spark.createDataFrame(_HOSTILE_VECS, "vec_id INT, v ARRAY<DOUBLE>")
    new = df.select("vec_id", F.expr(_ivf_cands_expr("v", cents)).alias("a"))
    old = df.select("vec_id",
                    F.expr(_r14_inline_cands_expr("v", cents)).alias("a"))
    # exact value comparison incl. NaN/NULL: to JSON then compare strings
    n = new.select("vec_id", F.to_json(F.col("a")).alias("j")).collect()
    o = old.select("vec_id", F.to_json(F.col("a")).alias("j")).collect()
    assert sorted((r["vec_id"], r["j"]) for r in n) == \
           sorted((r["vec_id"], r["j"]) for r in o)


def test_cos_with_norms_bit_identical_to_inline_cosine(spark):
    from omigo_data_analytics_spark.operators.similarity import (
        _cos_with_norms, _norm_expr, cosine_expr)
    df = spark.createDataFrame(
        [(a, b) for _, a in _HOSTILE_VECS for _, b in _HOSTILE_VECS],
        "va ARRAY<DOUBLE>, vb ARRAY<DOUBLE>")
    hoisted = (df.withColumn("__na__", F.expr(_norm_expr("`va`")))
                 .withColumn("__nb__", F.expr(_norm_expr("`vb`")))
                 .select(F.round(F.expr(_cos_with_norms(
                     "va", "vb", "__na__", "__nb__")), 6).alias("c")))
    inline = df.select(F.round(F.expr(cosine_expr("va", "vb")), 6).alias("c"))
    h = [r["c"] for r in hoisted.collect()]
    i = [r["c"] for r in inline.collect()]
    assert len(h) == len(i)
    for x, y in zip(h, i):
        if x is None or y is None:
            assert x is None and y is None
        elif x != x:  # NaN
            assert y != y
        else:
            assert x == y, (x, y)


def test_fold_dot_py_matches_sql_fold(spark):
    from omigo_data_analytics_spark.operators.similarity import (
        _dot_expr, _fold_dot_py)
    vecs = [v for _, v in _HOSTILE_VECS if v is not None]
    df = spark.createDataFrame([(a, b) for a in vecs for b in vecs],
                               "va ARRAY<DOUBLE>, vb ARRAY<DOUBLE>")
    rows = df.select("va", "vb",
                     F.expr(_dot_expr("va", "vb")).alias("d")).collect()
    import math
    for r in rows:
        py = _fold_dot_py(r["va"], r["vb"])
        sq = r["d"]
        if math.isnan(py):
            assert sq != sq
        else:
            assert py == sq, (r["va"], r["vb"], py, sq)


# --------------------------------------------------------------------------
# r15 order-key materialization: the plain carries order their windows by a
# REAL column now, so all window passes share ONE Sort and the hot-key
# counter collapses into an existing Window node (no extra pass).

def _phys_nodes(df, *names):
    import re
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {n: len(re.findall(rf"\b{n}\b", plan)) for n in names}


def test_plain_carries_single_sort_fused_counter(spark):
    from omigo_data_analytics_spark.operators import timeseries as TS
    d = OmigoDF(spark.createDataFrame(
        [(1, float(i % 50), float(i % 50) + 5.0) for i in range(200)],
        "k INT, s DOUBLE, e DOUBLE"))
    sess = TS.sessionize(d, "k", "s", gap_sec=2.0).df
    n = _phys_nodes(sess, "Sort", "WindowExec|Window")
    assert n["Sort"] == 1, n
    mi = TS.merge_intervals(d, "k", "s", "e").df
    assert _phys_nodes(mi, "Sort")["Sort"] == 1
    ra = TS.rolling_aggregate(d, "k", "s", ["e"], ["sum"], window_rows=3).df
    assert _phys_nodes(ra, "Sort")["Sort"] == 1


def test_cosine_family_hostile_vec_and_id_names(spark):
    """r15: the norm hoists must never put a raw user column name into a
    parsed expression — drive backtick+dot+colon names through every
    cosine-family entry point and pin value-equality to the clean run."""
    from omigo_data_analytics_spark.operators import dedup as DD
    from omigo_data_analytics_spark.operators import similarity as SIM
    rows = [(i, [float((i * 7 + j * 3) % 11) - 5.0 for j in range(8)])
            for i in range(40)]
    clean = OmigoDF(spark.createDataFrame(rows, "vid BIGINT, v ARRAY<DOUBLE>"))
    hid, hv = "id.we`ird:x", "vec.o`dd:y"
    host = OmigoDF(clean.df.withColumnRenamed("vid", hid)
                           .withColumnRenamed("v", hv))
    qc = OmigoDF(clean.df.where("vid < 3"))
    qh = OmigoDF(host.df.where("`id.we``ird:x` < 3"))
    c = sorted((r["query_id"], r["vid"], r["rank"], r["cosine"]) for r in
               SIM.cosine_topk(clean, qc, k=3, id_col="vid",
                               vec_col="v").df.collect())
    h = sorted((r["query_id"], r[hid], r["rank"], r["cosine"]) for r in
               SIM.cosine_topk(host, qh, k=3, id_col=hid,
                               vec_col=hv).df.collect())
    assert c == h and len(c) == 9
    cents_c = SIM.ivf_centroids(clean, 4, id_col="vid", vec_col="v")
    cents_h = SIM.ivf_centroids(host, 4, id_col=hid, vec_col=hv)
    assert cents_c == cents_h
    asg_c = sorted((r["vid"], r["cluster_id"]) for r in
                   SIM.kmeans_assign(clean, cents_c, vec_col="v")
                   .df.collect())
    asg_h = sorted((r[hid], r["cluster_id"]) for r in
                   SIM.kmeans_assign(host, cents_h, vec_col=hv)
                   .df.collect())
    assert asg_c == asg_h
    de_c = sorted(r["vid"] for r in DD.dedup_embedding(
        clean, 0.9, id_col="vid", vec_col="v", method="exact").df.collect())
    de_h = sorted(r[hid] for r in DD.dedup_embedding(
        host, 0.9, id_col=hid, vec_col=hv, method="exact").df.collect())
    assert de_c == de_h
