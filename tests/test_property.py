"""Property-based oracle tests: random small tables → operator chains on
the engine vs the same relational algebra in DuckDB. Complements the
fixed-query gate with adversarial shapes (empty strings, negatives,
duplicate keys, unicode)."""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from omigo_data_analytics_spark import OmigoDF

KEYS = ["k0", "k1", "k2", "ké"]
VALS = st.integers(min_value=-1000, max_value=1000)

ROWS = st.lists(st.tuples(st.sampled_from(KEYS), VALS,
                          st.sampled_from(["", "x", "y z", "0", "-7"])),
                min_size=0, max_size=60)

_SETTINGS = settings(max_examples=12, deadline=None,
                     suppress_health_check=[HealthCheck.function_scoped_fixture])


def _duck(rows, sql):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k VARCHAR, v BIGINT, s VARCHAR)")
    if rows:
        con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    return con.execute(sql).fetchall()


@given(rows=ROWS)
@_SETTINGS
def test_groupby_sum_count_matches_duck(spark, rows):
    if not rows:
        return
    odf = OmigoDF(spark.createDataFrame(rows, ["k", "v", "s"]))
    got = {(r["k"]): (r["v:sumint"], r["v:get_array_len"])
           for r in odf.aggregate(["k"], ["v", "v"],
                                  ["sumint", "get_array_len"]).df.collect()}
    exp = {k: (s, n) for k, s, n in
           _duck(rows, "SELECT k, SUM(v), COUNT(*) FROM t GROUP BY k")}
    assert got == exp


@given(rows=ROWS, thr=VALS)
@_SETTINGS
def test_filter_sort_take_matches_duck(spark, rows, thr):
    if not rows:
        return
    odf = OmigoDF(spark.createDataFrame(rows, ["k", "v", "s"]))
    got = [(r["k"], r["v"]) for r in
           odf.gt_int("v", thr).sort(["v", "k", "s"]).take(10)
              .select(["k", "v"]).df.collect()]
    exp = _duck(rows, f"SELECT k, v FROM t WHERE v > {thr} "
                      "ORDER BY v, k, s LIMIT 10")
    # both ordered by (v, k) but s-ties can differ after projection: compare
    # as multisets plus the (v, k) ordering
    assert sorted(got) == sorted([tuple(e) for e in exp])
    assert [g[1] for g in got] == [e[1] for e in exp]


@given(rows=ROWS)
@_SETTINGS
def test_distinct_union_matches_duck(spark, rows):
    if not rows:
        return
    odf = OmigoDF(spark.createDataFrame(rows, ["k", "v", "s"]))
    two = odf.union(odf)
    got = sorted(tuple(r) for r in two.distinct().df.collect())
    exp = sorted(tuple(e) for e in
                 _duck(rows, "SELECT DISTINCT * FROM (SELECT * FROM t "
                             "UNION ALL SELECT * FROM t)"))
    assert got == exp


@given(rows=ROWS)
@_SETTINGS
def test_join_matches_duck(spark, rows):
    if not rows:
        return
    odf = OmigoDF(spark.createDataFrame(rows, ["k", "v", "s"]))
    dim = OmigoDF(odf.spark.createDataFrame(
        [("k0", "zero"), ("k1", "one"), ("k9", "nine")], ["k", "label"]))
    got = sorted((r["k"], r["v"], r["label"])
                 for r in odf.inner_join(dim, lkeys="k")
                             .select(["k", "v", "label"]).df.collect())
    exp = sorted(tuple(e) for e in _duck(
        rows, "SELECT t.k, t.v, d.label FROM t JOIN (VALUES ('k0','zero'),"
              "('k1','one'),('k9','nine')) d(k,label) ON t.k = d.k"))
    assert got == exp


@given(rows=ROWS)
@_SETTINGS
def test_window_topk_matches_duck(spark, rows):
    if not rows:
        return
    odf = OmigoDF(spark.createDataFrame(rows, ["k", "v", "s"]))
    got = sorted((r["k"], r["v"]) for r in
                 odf.sample_group_by_topk(["k"], "v", 2, reverse=True,
                                          all_numeric=True,
                                          tie_break_cols=["s"])
                    .select(["k", "v"]).df.collect())
    exp = sorted(tuple(e) for e in _duck(
        rows, "SELECT k, v FROM (SELECT k, v, row_number() OVER "
              "(PARTITION BY k ORDER BY v DESC, s) rn FROM t) WHERE rn <= 2"))
    assert got == exp


TS_ROWS = st.lists(
    st.tuples(st.sampled_from(["a", "b"]),
              st.floats(min_value=0, max_value=100, allow_nan=False)),
    min_size=0, max_size=25)


@given(left=TS_ROWS, right=TS_ROWS)
@_SETTINGS
def test_asof_join_matches_bruteforce(spark, left, right):
    from pyspark.sql import functions as F
    from omigo_data_analytics_spark.operators import timeseries as TS

    if not left:
        return
    # dedupe right on (k, t): equal keys have no defined as-of winner
    rseen, rdedup = set(), []
    for i, (k, t) in enumerate(right):
        if (k, t) not in rseen:
            rseen.add((k, t))
            rdedup.append((k, t, float(i)))
    l = OmigoDF(spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)],
        "k string, t double, lid long"))
    r = OmigoDF(spark.createDataFrame(
        rdedup or [("zz", -1.0, 0.0)], "k string, t double, px double"))
    out = TS.asof_join(l, r, on="k", left_time="t", suffix="q").df
    got = {row["lid"]: row["q:px"] for row in out.collect()}
    want = {}
    for i, (k, t) in enumerate(left):
        best = None
        for (rk, rt, px) in (rdedup or []):
            if rk == k and rt <= t and (best is None or rt > best[0]):
                best = (rt, px)
        want[i] = best[1] if best else None
    assert got == want


@given(rows=TS_ROWS, gap=st.floats(min_value=0.5, max_value=50))
@_SETTINGS
def test_sessionize_matches_bruteforce(spark, rows, gap):
    from omigo_data_analytics_spark.operators import timeseries as TS

    rows = [(k, t, i) for i, (k, t) in enumerate(rows)]
    if not rows:
        return
    d = OmigoDF(spark.createDataFrame(rows, "k string, t double, rid long"))
    out = TS.sessionize(d, "k", "t", gap_sec=gap).df
    got = {r["rid"]: r["session_id"] for r in out.collect()}
    # brute force per key: sort by (t, insertion) — ties get the same
    # session id either way since their gap is 0
    want = {}
    for key in {k for k, _, _ in rows}:
        seq = sorted([(t, rid) for k, t, rid in rows if k == key])
        sid, prev = 1, None
        for t, rid in seq:
            if prev is not None and t - prev > gap:
                sid += 1
            want[rid] = sid
            prev = t
    assert got == want


@given(points=TS_ROWS,
       ivs=st.lists(st.tuples(st.sampled_from(["a", "b"]),
                              st.floats(min_value=0, max_value=90,
                                        allow_nan=False),
                              st.floats(min_value=0, max_value=30,
                                        allow_nan=False)),
                    min_size=0, max_size=15),
       bw=st.floats(min_value=1, max_value=40))
@_SETTINGS
def test_range_join_matches_bruteforce(spark, points, ivs, bw):
    from omigo_data_analytics_spark.operators import timeseries as TS

    if not points or not ivs:
        return
    p = OmigoDF(spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(points)],
        "k string, x double, pid long"))
    iv = OmigoDF(spark.createDataFrame(
        [(k, lo, lo + w, j) for j, (k, lo, w) in enumerate(ivs)],
        "k string, lo double, hi double, iid long"))
    out = TS.range_join(p, iv, "x", "lo", "hi", on=["k"], bin_width=bw).df
    got = {(r["pid"], r["iid"]) for r in out.collect()}
    want = {(i, j)
            for i, (pk, x) in enumerate(points)
            for j, (ik, lo, w) in enumerate(ivs)
            if pk == ik and lo <= x <= lo + w}
    assert got == want


@given(docs=st.lists(st.lists(st.sampled_from(["a", "b", "cc", "déf"]),
                              min_size=1, max_size=12),
                     min_size=1, max_size=10))
@_SETTINGS
def test_repetition_metrics_match_brute_force(spark, docs):
    from collections import Counter

    from omigo_data_analytics_spark.operators import curation as CU

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    odf = OmigoDF(spark.createDataFrame(rows, "doc_id long, text string"))
    got = {r["doc_id"]: r for r in CU.repetition_metrics(odf, n=2).df.collect()}
    for i, toks in enumerate(docs):
        grams = ([" ".join(toks[j:j + 2]) for j in range(len(toks) - 1)]
                 if len(toks) >= 2 else toks)
        c = Counter(grams)
        assert got[i]["ngram_count"] == len(grams)
        assert got[i]["dup_ngram_frac"] == pytest.approx(
            round(1.0 - len(c) / len(grams), 6), abs=1e-9)
        assert got[i]["top_ngram_frac"] == pytest.approx(
            round(max(c.values()) / len(grams), 6), abs=1e-9)


@given(counts=st.lists(st.integers(min_value=1, max_value=8),
                       min_size=1, max_size=12))
@_SETTINGS
def test_trend_scores_match_brute_force(spark, counts):
    import math

    from omigo_data_analytics_spark.operators.trends import trend_scores

    rows = [("k", b) for b, n in enumerate(counts) for _ in range(n)]
    odf = OmigoDF(spark.createDataFrame(rows, "k string, b int"))
    W = 4
    got = {r["b"]: r for r in
           trend_scores(odf, ["k"], "b", learning_window=W).df.collect()}

    def ref_stats(xs):  # the reference's computeStats semantics
        if not xs:
            return 0.0, 0.0, 0.0, 0.0
        s = sorted(xs)
        n = len(s)
        mean = sum(s) / n
        med = s[int(n * 0.5)]
        sd = math.sqrt(sum((x - mean) ** 2 for x in s) / n)
        mad = s[int(n * 0.75)] - s[int(n * 0.25)]
        return mean, med, sd, mad

    for b, c in enumerate(counts):
        window = [float(x) for x in counts[max(0, b - W):b]]
        mean, med, sd, mad = ref_stats(window)
        r = got[b]
        assert r["n_events"] == c
        assert r["learning_mean"] == pytest.approx(round(mean, 6), abs=1e-9)
        assert r["learning_median"] == pytest.approx(round(med, 6), abs=1e-9)
        assert r["learning_stddev"] == pytest.approx(round(sd, 6), abs=1e-6)
        assert r["learning_mad"] == pytest.approx(round(mad, 6), abs=1e-9)
        exp_sp = max((c - mean) / sd, 0.0) if sd > 0 else 0.0
        assert r["spike_stddev"] == pytest.approx(round(exp_sp, 6), abs=1e-6)


SEQ_ROWS = st.lists(
    st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 30),
              st.integers(1, 50)),
    min_size=1, max_size=25,
    unique_by=lambda r: (r[0], r[1]))  # one row per (key, seq) by contract


@given(rows=SEQ_ROWS, mw=st.integers(0, 4))
@_SETTINGS
def test_sequence_stats_match_brute_force(spark, rows, mw):
    """sequence_stats == a pure-Python replay of the reference's
    computeStats + percIncreaseMax closures on random sequences."""
    from omigo_data_analytics_spark.operators.trends import sequence_stats

    d = OmigoDF(spark.createDataFrame(rows, "k string, b int, cnt int"))
    got = {(r["k"], r["minus_window_value"]): r
           for r in sequence_stats(d, ["k"], "b", ["cnt"], minus_window=mw,
                                   inference_col="cnt").df.collect()}
    by_key = {}
    for k, b, c in rows:
        by_key.setdefault(k, []).append((b, c))
    expect_rows = 0
    for k, seq in by_key.items():
        seq = [c for _, c in sorted(seq)]
        for w in range(0, mw + 1):
            if len(seq) - w <= 0:
                continue
            expect_rows += 1
            pfx, sfx = seq[:len(seq) - w], seq[len(seq) - w:]
            s = sorted(pfx)
            n = len(s)
            mean = sum(s) / n
            med = s[int(n * 0.5)]
            sd = (sum((x - mean) ** 2 for x in s) / n) ** 0.5
            mad = s[int(n * 0.75)] - s[int(n * 0.25)]
            mx = max(pfx)
            infs = sorted(
                ((c / mx if mx > 0 else float(c)) if c > mx else 0.0)
                for c in sfx)
            r = got[(k, w)]
            assert r["num_count"] == n
            assert abs(r["cnt_mean"] - round(mean, 6)) < 1e-9
            assert r["cnt_median"] == med
            assert abs(r["cnt_stddev"] - round(sd, 6)) < 1e-9
            assert r["cnt_mad"] == mad
            assert r["cnt_min"] == min(pfx) and r["cnt_max"] == mx
            pm = sum(infs) / len(infs) if infs else -1.0
            pmed = infs[int(len(infs) * 0.5)] if infs else -1.0
            assert abs(r["perc_over_max_mean"] - round(pm, 6)) < 1e-9
            assert abs(r["perc_over_max_median"] - round(pmed, 6)) < 1e-9
    assert len(got) == expect_rows


PACK_ROWS = st.lists(st.tuples(st.integers(0, 10_000), st.integers(1, 900)),
                     min_size=1, max_size=40,
                     unique_by=lambda r: r[0])


@given(rows=PACK_ROWS, budget=st.integers(100, 2000))
@_SETTINGS
def test_pack_sequences_invariants(spark, rows, budget):
    """Random documents: bin ids contiguous from 0, assignment matches
    the global exclusive-cumsum definition in portable-hash order, and
    non-last bins deviate from the budget by at most one document."""
    import collections

    from omigo_data_analytics_spark.operators import text as TX

    d = OmigoDF(spark.createDataFrame(rows, "doc_id long, toks int"))
    got = {r["doc_id"]: r["bin_id"]
           for r in TX.pack_sequences(d, "toks", budget=budget,
                                      key_cols=["doc_id"])
           .df.select("doc_id", "bin_id").collect()}
    # brute force: same hash order via the DuckDB twin of the hash
    import duckdb as ddb

    con = ddb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, toks INT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    from omigo_data_analytics_spark.operators.text import (
        pack_sequences_sql_duck,
    )
    want = {r[0]: r[1] for r in con.execute(pack_sequences_sql_duck(
        "t", "toks", budget, ["doc_id"], select="d.doc_id")).fetchall()}
    assert got == want
    vol = collections.defaultdict(int)
    toks = dict(rows)
    for did, b in got.items():
        vol[b] += toks[did]
    mx = max(vol)
    maxdoc = max(toks.values())
    if maxdoc < budget:
        # contiguity + bounded deviation hold when no document spans
        # multiple budget ranges; an oversized document legitimately
        # skips the bins its own body covers
        assert set(vol) == set(range(mx + 1))
        assert all(abs(v - budget) <= maxdoc
                   for b, v in vol.items() if b != mx)
    assert sum(vol.values()) == sum(toks.values())


DRIFT_ROWS = st.lists(
    st.tuples(st.sampled_from(["a", "b"]), st.integers(1, 4),
              st.sampled_from(["x", "y", "z", "w"])),
    min_size=2, max_size=40)


@given(rows=DRIFT_ROWS)
@_SETTINGS
def test_distribution_drift_matches_brute_force(spark, rows):
    """distribution_drift's decomposed cosine/jaccard/JSD == a direct
    Python computation over the per-bucket count distributions."""
    import math

    from omigo_data_analytics_spark.operators.trends import (
        distribution_drift,
    )

    d = OmigoDF(spark.createDataFrame(rows, "k string, b int, v string"))
    got = {(r["k"], r["b"]): r
           for r in distribution_drift(d, ["k"], "b", "v").df.collect()}

    counts = {}
    for k, b, v in rows:
        counts.setdefault(k, {}).setdefault(b, {})
        counts[k][b][v] = counts[k][b].get(v, 0) + 1
    n_pairs = 0
    for k, buckets in counts.items():
        order = sorted(buckets)
        for b1, b2 in zip(order, order[1:]):
            n_pairs += 1
            c1, c2 = buckets[b1], buckets[b2]
            dot = sum(c1[v] * c2[v] for v in set(c1) & set(c2))
            cos = dot / math.sqrt(sum(c * c for c in c1.values())
                                  * sum(c * c for c in c2.values()))
            matched = len(set(c1) & set(c2))
            jac = matched / (len(c1) + len(c2) - matched)
            t1, t2 = sum(c1.values()), sum(c2.values())
            vals = set(c1) | set(c2)

            def h(dist, tot):
                return -sum((c / tot) * math.log2(c / tot)
                            for c in dist.values())
            hm = -sum(m * math.log2(m) for m in
                      ((c1.get(v, 0) / t1 + c2.get(v, 0) / t2) / 2
                       for v in vals) if m > 0)
            jsd = max(hm - (h(c1, t1) + h(c2, t2)) / 2, 0.0)
            r = got[(k, b1)]
            assert r["bucket_next"] == b2
            assert abs(r["cosine_sim"] - round(cos, 6)) < 1e-6
            assert abs(r["jaccard_sim"] - round(jac, 6)) < 1e-6
            assert abs(r["jsd"] - round(jsd, 6)) < 1e-6, (k, b1, r["jsd"], jsd)
    assert len(got) == n_pairs


# ------------------------------------------- duplicate spans (n small)
# Tiny alphabet + short docs force heavy cross-doc n-gram collisions —
# exactly the overlap/ownership edge cases the fixed queries can't hit.
SPAN_DOCS = st.lists(
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=12),
    min_size=1, max_size=8)


def _span_brute(docs_tokens, n):
    owner, occ = {}, {}
    for d, ts in enumerate(docs_tokens):
        for i in range(len(ts) - n + 1):
            g = tuple(ts[i:i + n])
            occ.setdefault(g, set()).add(d)
    dup = {g for g, ds in occ.items() if len(ds) >= 2}
    stats, removed = {}, {}
    for d, ts in enumerate(docs_tokens):
        starts = [i for i in range(len(ts) - n + 1)
                  if tuple(ts[i:i + n]) in dup]
        cov = 0
        for j, s in enumerate(starts):
            nxt = starts[j + 1] if j + 1 < len(starts) else None
            cov += min(n, nxt - s) if nxt is not None else n
        stats[d] = (len(ts), len(starts), cov)
        own_starts = [s for s in starts
                      if d != min(occ[tuple(ts[s:s + n])])]
        drop = set()
        for s in own_starts:
            drop.update(range(s, s + n))
        removed[d] = " ".join(t for i, t in enumerate(ts) if i not in drop)
    return stats, removed


@given(docs=SPAN_DOCS)
@_SETTINGS
def test_duplicate_spans_match_brute_force(spark, docs):
    from omigo_data_analytics_spark.operators import dedup as DD
    n = 3
    odf = OmigoDF(spark.createDataFrame(
        [(i, " ".join(ts)) for i, ts in enumerate(docs)],
        "doc_id long, text string"))
    exp_stats, exp_removed = _span_brute(docs, n)
    got = {r["doc_id"]: (r["n_tokens"], r["dup_spans"], r["dup_tokens"])
           for r in DD.duplicate_span_stats(odf, n=n).df.collect()}
    assert got == exp_stats
    got_rm = {r["doc_id"]: r["text"]
              for r in DD.remove_duplicate_spans(odf, n=n).df.collect()}
    assert got_rm == exp_removed


# --------------------------------------------------------------- QueryGraph
QG_ENTITIES = ["h0", "h1"]
QG_NODES = ["n0", "n1", "n2", "n3"]
QG_TS = st.integers(min_value=0, max_value=10_000)

QG_T1_ROWS = st.lists(
    st.tuples(st.sampled_from(QG_ENTITIES), st.sampled_from(QG_NODES), QG_TS),
    min_size=0, max_size=12)
QG_H_ROWS = st.lists(
    st.tuples(st.sampled_from(QG_ENTITIES), st.sampled_from(QG_NODES), QG_TS),
    min_size=0, max_size=20)


@given(t1_rows=QG_T1_ROWS, h_rows=QG_H_ROWS,
       window=st.sampled_from([0, 1, 100]),
       min_group=st.sampled_from([-1, 2]))
@_SETTINGS
def test_query_graph_chain_matches_bruteforce(spark, t1_rows, h_rows,
                                              window, min_group):
    """The compiled 3-node chain (Table1 -> Hierarchy -> Hierarchy with
    time_window + min_group_size) against a brute-force nested-loop
    evaluation of the same semantics."""
    from omigo_data_analytics_spark.operators import query_graph as QG

    t1 = spark.createDataFrame(
        [(e, "d", f"u{i}", n, "ev", ts)
         for i, (e, n, ts) in enumerate(t1_rows)],
        "id1 string, id2 string, uuid string, node_id string, "
        "event_id string, ts long")
    hier = spark.createDataFrame(
        [(e, "d", f"c{i}", p, "ev", ts)
         for i, (e, p, ts) in enumerate(h_rows)],
        "id1 string, id2 string, node_id string, parent_id string, "
        "event_id string, ts long")
    c2 = QG.Hierarchy().as_("C2").time_window(window)
    if min_group >= 0:
        c2.min_group_size(min_group)
    nodes = [QG.Table1().as_("T1"), QG.Hierarchy().as_("C1"), c2]
    out = QG.QueryGraph("p", nodes, QG.QueryGraphInput(
        {"table1": t1, "hierarchy": hier})).execute().df
    got = {(r["T1_uuid"], r["C1_node_id"], r["C2_node_id"])
           for r in out.collect()}

    # brute force
    t1l = [(e, f"u{i}", n, ts) for i, (e, n, ts) in enumerate(t1_rows)]
    hl = [(e, f"c{i}", p, ts) for i, (e, p, ts) in enumerate(h_rows)]
    j1 = [(u, cn, e1, ts2)
          for (e1, u, n1, _ts1) in t1l
          for (e2, cn, p2, ts2) in hl if e1 == e2 and p2 == n1]
    j2 = [(u, cn, gn, e3, p3)
          for (u, cn, e1, ts1) in j1
          for (e3, gn, p3, ts3) in hl
          if e1 == e3 and p3 == cn and ts3 <= ts1 + window * 60_000]
    if min_group >= 0:
        from collections import Counter
        sizes = Counter((e3, p3) for (_u, _cn, _gn, e3, p3) in j2)
        j2 = [row for row in j2 if sizes[(row[3], row[4])] >= min_group]
    want = {(u, cn, gn) for (u, cn, gn, _e, _p) in j2}
    assert got == want


# ----------------------------------------------------- graph analysis_job
AJ_NODES = ["a", "b", "c", "d", "e"]
AJ_EDGES = st.lists(
    st.tuples(st.sampled_from(AJ_NODES), st.sampled_from(AJ_NODES),
              st.integers(min_value=0, max_value=9)),
    min_size=1, max_size=14)


@given(edges=AJ_EDGES,
       keep=st.sets(st.sampled_from(AJ_NODES), max_size=2),
       seeds=st.sets(st.sampled_from(AJ_NODES), min_size=1, max_size=2))
@_SETTINGS
def test_analysis_job_matches_bruteforce(spark, edges, keep, seeds):
    """graph.analysis_job (prune -> decycle -> BFS + ancestor summary)
    vs a literal Python re-execution of each stage's semantics."""
    from collections import deque

    from omigo_data_analytics_spark.operators import graph as G

    e = OmigoDF(spark.createDataFrame(edges, "src string, dst string, ts int"))
    got = {r["node_id"]: (r["level"], r["n_ancestors"], r["ancestors"])
           for r in G.analysis_job(e, "ts", sorted(keep),
                                   sorted(seeds)).df.collect()}

    # stage 1: dangling prune, fixpoint <= 3 rounds (engine default)
    cur = list(edges)
    for _ in range(3):
        protected = {s for s, _d, _t in cur} | keep
        nxt = [r for r in cur if r[1] in protected]
        if len(nxt) == len(cur):
            break
        cur = nxt
    # stage 2: temporal back-edge removal
    first = {}
    for _s, d, t in cur:
        first[d] = min(first.get(d, t), t)
    cur = [r for r in cur if r[0] not in first or r[2] >= first[r[0]]]
    ed = {(s, d) for s, d, _t in cur}
    nodes = {s for s, _d in ed} | {d for _s, d in ed}
    # stage 3: BFS min levels from seeds
    lvl = {s: 0 for s in seeds}
    q = deque(sorted(seeds))
    while q:
        n = q.popleft()
        for s, d in ed:
            if s == n and d not in lvl:
                lvl[d] = lvl[n] + 1
                q.append(d)
    # stage 4: ancestor closure
    anc = {n: set() for n in nodes}
    changed = True
    while changed:
        changed = False
        for s, d in ed:
            new = ({s} | anc.get(s, set())) - anc[d]
            if new:
                anc[d] |= new
                changed = True
    want = {n: (lvl.get(n), len(anc[n]), ",".join(sorted(anc[n])))
            for n in nodes}
    assert got == want


# ---------------------------------------------------------------- r8 family
_WORDS = st.text(alphabet="abcdxy ", min_size=0, max_size=12)
_FUZZY_ROWS = st.lists(_WORDS, min_size=2, max_size=14)


def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@given(names=_FUZZY_ROWS, d=st.integers(min_value=1, max_value=2))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_fuzzy_pairs_complete_vs_bruteforce(spark, names, d):
    """The q-gram count filter must be a NECESSARY condition on any
    corpus shape — random short/empty/repeated/space-bearing strings
    are exactly where the bound math would break if wrong."""
    from omigo_data_analytics_spark.operators import fuzzy as FZ
    rows = list(enumerate(names))
    df = spark.createDataFrame(rows, "id long, name string")
    got = {(r["id_a"], r["id_b"], r["dist"]) for r in
           FZ.fuzzy_pairs(OmigoDF(df), "id", "name", max_dist=d)
           .df.collect()}
    exp = set()
    for i, a in rows:
        for j, b in rows:
            if i < j and _lev(a, b) <= d:
                exp.add((i, j, _lev(a, b)))
    assert got == exp


@given(texts=st.lists(st.text(alphabet="ab c\nd\t", max_size=20),
                      min_size=1, max_size=8))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_hash_embeddings_duck_parity_random_text(spark, texts):
    """Bit parity on adversarial whitespace/unicode-free strings: the
    tokenizer, sign bit, bucket hash and folds must agree on shapes the
    fixed corpus never exercises (leading/trailing/multiple spaces,
    newlines, tabs, empty)."""
    from omigo_data_analytics_spark.operators import similarity as SIM
    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sp = {r["doc_id"]: [round(x, 9) for x in r["embedding"]] for r in
          SIM.hash_embeddings(OmigoDF(df), dim=8).df.collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    hs = SIM.hash_embed_hs_sql_duck(dim=8)
    vec = SIM.hash_embed_vec_sql_duck("hs", dim=8)
    got = dict(con.execute(
        f"SELECT doc_id, {vec} FROM (SELECT doc_id, {hs} AS hs FROM t)"
    ).fetchall())
    for did, v in sp.items():
        assert [round(x, 9) for x in got[did]] == v, did


# random text incl. unicode letters, digits, punctuation, whitespace
# runs, contractions — the shapes that would expose Java-regex vs RE2
# divergence in the BPE-ish pre-tokenizer
_TEXT = st.text(alphabet="ab zé9'.,()\t\n", min_size=0, max_size=40)


@given(texts=st.lists(_TEXT, min_size=1, max_size=20))
@_SETTINGS
def test_token_estimates_matches_duck_on_random_text(spark, texts):
    from omigo_data_analytics_spark.operators.text import (
        token_estimate_exprs, token_estimates)

    rows = [(i, t) for i, t in enumerate(texts)]
    odf = OmigoDF(spark.createDataFrame(rows, "doc_id long, text string"))
    got = {r["doc_id"]: (r["pretoken_count"], r["token_estimate"])
           for r in token_estimates(odf).df.collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    ex = token_estimate_exprs("duckdb")
    exp = {i: (c, e) for i, c, e in con.execute(
        f"SELECT doc_id, {ex['pretoken_count']}, {ex['token_estimate']} "
        f"FROM d").fetchall()}
    assert got == exp


@given(rows=st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]), _TEXT),
    min_size=1, max_size=25))
@_SETTINGS
def test_nb_classify_matches_duck_on_random_labeled_text(spark, rows):
    from omigo_data_analytics_spark.operators import curation as CU

    train = [(i, t, lbl) for i, (lbl, t) in enumerate(rows)]
    # skip wholly tokenless train sets (engine raises by design)
    if not any(t.strip() for _, t, _ in train):
        return
    score = [(100 + i, t) for i, (_, t) in enumerate(rows[:10])]
    tdf = OmigoDF(spark.createDataFrame(
        train, "doc_id long, text string, lbl string"))
    sdf = OmigoDF(spark.createDataFrame(score, "doc_id long, text string"))
    got = {r["doc_id"]: (r["label"], r["log_joint"]) for r in
           CU.nb_classify(tdf, sdf, "lbl").df.collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE tr (doc_id BIGINT, text VARCHAR, lbl VARCHAR)")
    con.executemany("INSERT INTO tr VALUES (?, ?, ?)", train)
    con.execute("CREATE TABLE sc (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO sc VALUES (?, ?)", score)
    exp = {r[0]: (r[1], r[2]) for r in con.execute(
        CU.nb_classify_sql_duck("tr", "sc", "lbl")).fetchall()}
    assert got == exp


@given(target=st.lists(_TEXT, min_size=1, max_size=10),
       pool=st.lists(_TEXT, min_size=1, max_size=15))
@_SETTINGS
def test_dsir_weights_matches_duck_on_random_text(spark, target, pool):
    from omigo_data_analytics_spark.operators import curation as CU

    # skip tokenless corpora (engine raises by design)
    if not any(t.strip() for t in target) or not any(t.strip() for t in pool):
        return
    tgt = OmigoDF(spark.createDataFrame(
        [(i, t) for i, t in enumerate(target)], "doc_id long, text string"))
    pl = OmigoDF(spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(pool)],
        "doc_id long, text string"))
    got = {r["doc_id"]: (r["n_feats"], r["logweight"]) for r in
           CU.dsir_weights(tgt, pl).df.collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE tg (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO tg VALUES (?, ?)",
                    [(i, t) for i, t in enumerate(target)])
    con.execute("CREATE TABLE pl (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO pl VALUES (?, ?)",
                    [(100 + i, t) for i, t in enumerate(pool)])
    exp = {r[0]: (r[1], r[2]) for r in con.execute(
        CU.dsir_weights_sql_duck("tg", "pl")).fetchall()}
    assert got == exp


# whitespace-control-char text: the exact regime where Java \s and RE2 \s
# disagreed (r8 advice) — every tokenizer-parity-critical fragment must
# agree token-for-token on arbitrary mixes of spaces, tabs, newlines,
# form feeds, carriage returns, VERTICAL TABS, and word characters
_WS_TEXT = st.text(
    alphabet=" \t\n\f\r\x0b" + "abz09.',#é",
    min_size=0, max_size=40)


@given(texts=st.lists(_WS_TEXT, min_size=1, max_size=20))
@_SETTINGS
def test_ws_tokenizer_fragments_match_duck(spark, texts):
    from omigo_data_analytics_spark.operators.text import (
        WS_RUN_DUCK, WS_RUN_SPARK, fingerprint_sql_duck,
        token_estimate_exprs)
    from pyspark.sql import functions as F

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ex = token_estimate_exprs("spark")
    got = {r["doc_id"]: (r["t"], r["fp"], r["pc"], r["te"])
           for r in df.withColumn("fp", F.md5(F.lower(F.regexp_replace(
               F.trim(F.col("text")), r"[ \t\n\f\r]+", " ")))).selectExpr(
        "doc_id",
        f"filter(split(lower(text), '{WS_RUN_SPARK}'), x -> x != '') AS t",
        "fp",
        f"{ex['pretoken_count']} AS pc",
        f"{ex['token_estimate']} AS te",
    ).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    exd = token_estimate_exprs("duckdb")
    exp = {r[0]: (r[1], r[2], r[3], r[4]) for r in con.execute(
        f"SELECT doc_id, "
        f"list_filter(string_split_regex(lower(text), '{WS_RUN_DUCK}'), "
        f"x -> x != ''), {fingerprint_sql_duck('text')}, "
        f"{exd['pretoken_count']}, {exd['token_estimate']} FROM d"
    ).fetchall()}
    assert got == exp


@given(train=st.lists(_TEXT, min_size=1, max_size=10),
       score=st.lists(_TEXT, min_size=1, max_size=10))
@_SETTINGS
def test_lm_score_matches_duck_on_random_text(spark, train, score):
    """Pins the r9 DOUBLE-cast smoothing operands (r8 advice): the
    bigram-LM average log-prob and perplexity must be bit-identical to
    the DuckDB replay on arbitrary text, including docs with <2 tokens
    (NULL score) and smoothing-floor-only documents."""
    from omigo_data_analytics_spark.operators import curation as CU

    # engine raises by design on a tokenless train corpus (V = 0)
    if not any(t.split() for t in train):
        return
    tr = OmigoDF(spark.createDataFrame(
        [(i, t) for i, t in enumerate(train)], "doc_id long, text string"))
    sc = OmigoDF(spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(score)],
        "doc_id long, text string"))
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_logprob"], r["perplexity"])
           for r in CU.lm_score(tr, sc).df.collect()}
    con = duckdb.connect()
    # table names must dodge the oracle's internal CTE names (tr, scp, ...)
    con.execute("CREATE TABLE trn (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO trn VALUES (?, ?)",
                    [(i, t) for i, t in enumerate(train)])
    con.execute("CREATE TABLE scr (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO scr VALUES (?, ?)",
                    [(100 + i, t) for i, t in enumerate(score)])
    exp = {r[0]: (r[1], r[2], r[3]) for r in con.execute(
        CU.lm_score_sql_duck("trn", "scr")).fetchall()}
    assert got == exp


@given(texts=st.lists(_WS_TEXT, min_size=1, max_size=12),
       qwords=st.lists(st.text(alphabet="abz09.'", min_size=1, max_size=6),
                       min_size=1, max_size=4))
@_SETTINGS
def test_bm25_matches_duck_on_random_text(spark, texts, qwords):
    """Pins the r9 DOUBLE-cast score constants AND the WS_RUN tokenizer
    (control-char corpora) through the full bm25 engine/oracle pair."""
    from omigo_data_analytics_spark.operators import search as SR

    query = " ".join(qwords)
    docs = OmigoDF(spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"))
    got = sorted(tuple(r) for r in SR.bm25_rank(docs, query).df.collect())
    con = duckdb.connect()
    # dodge the oracle's internal CTE names (toks, stats, ex, tf, d, sc)
    con.execute("CREATE TABLE corpus (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO corpus VALUES (?, ?)",
                    [(i, t) for i, t in enumerate(texts)])
    exp = sorted(tuple(r) for r in con.execute(
        SR.bm25_sql_duck("corpus", query)).fetchall())
    assert got == exp
