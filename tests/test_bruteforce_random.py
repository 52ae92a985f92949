"""Randomized brute-force oracles for the iterative/window operators the
SQL-oracle gate can't easily replay: merge_intervals vs an O(n^2) sweep,
connected_components (both algorithms) vs union-find, and
time_ordered_ancestors vs exhaustive temporal-path search. Fixed seeds —
deterministic failures, adversarial shapes (chains, cliques, ties,
touching intervals, repeated timestamps)."""

import random

from omigo_data_analytics_spark import OmigoDF
from omigo_data_analytics_spark.operators import dedup as DD
from omigo_data_analytics_spark.operators import graph as GR
from omigo_data_analytics_spark.operators import timeseries as TS


def _brute_islands(intervals):
    """Max-disjoint islands of [s, e] per the operator's contract:
    ordered by (s, e), an island breaks where s > max(previous ends)."""
    out = []
    for s, e in sorted(intervals):
        if out and s <= out[-1][1]:
            out[-1][1] = max(out[-1][1], e)
            out[-1][2] += 1
        else:
            out.append([s, e, 1])
    return {(s, e, n) for s, e, n in out}


def test_merge_intervals_matches_bruteforce(spark):
    rng = random.Random(42)
    rows = []
    for case in range(6):
        key = f"k{case}"
        for _ in range(rng.randint(1, 25)):
            s = rng.randint(0, 40)
            rows.append((key, float(s), float(s + rng.randint(0, 8))))
    # adversarial: touching endpoints (s == prev e joins the island)
    rows += [("touch", 0.0, 5.0), ("touch", 5.0, 9.0), ("touch", 10.0, 11.0)]
    odf = OmigoDF(spark.createDataFrame(rows, ["k", "s", "e"]))
    got = {}
    for r in TS.merge_intervals(odf, "k", "s", "e").df.collect():
        got.setdefault(r["k"], set()).add(
            (r["island_start"], r["island_end"], r["n_intervals"]))
    by_key = {}
    for k, s, e in rows:
        by_key.setdefault(k, []).append((s, e))
    for k, ivs in by_key.items():
        assert got[k] == _brute_islands(ivs), k


def _union_find_clusters(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


def test_connected_components_both_algorithms_match_union_find(spark):
    rng = random.Random(7)
    edges = set()
    # random sparse graph + a long chain (the propagation worst case)
    for _ in range(60):
        edges.add((rng.randint(0, 40), rng.randint(0, 40)))
    chain_base = 100
    for i in range(15):
        edges.add((chain_base + i, chain_base + i + 1))
    # a clique (the LSH-bucket shape)
    for a in range(200, 205):
        for b in range(a + 1, 205):
            edges.add((a, b))
    edges = sorted(edges)
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    want = _union_find_clusters(nodes, edges)
    e = OmigoDF(spark.createDataFrame(edges, ["id_a", "id_b"]))
    for fn in (DD.connected_components, DD.connected_components_star):
        got = {r["id"]: r["cluster_id"] for r in fn(e, max_iter=40).df.collect()}
        assert got == want, fn.__name__


def _brute_time_ancestors(edges):
    """(node, ancestor) pairs reachable along non-decreasing-ts paths,
    with the MIN arrival ts — exhaustive relaxation to fixpoint."""
    best = {}
    for s, d, t in edges:
        if t is None:
            continue
        k = (d, s)
        if k not in best or t < best[k]:
            best[k] = t
    changed = True
    while changed:
        changed = False
        for s, d, t in edges:
            if t is None:
                continue
            for (node, anc), arr in list(best.items()):
                if node == s and t >= arr:
                    k = (d, anc)
                    if k not in best or t < best[k]:
                        best[k] = t
                        changed = True
    return best


def test_time_ordered_ancestors_matches_bruteforce(spark):
    rng = random.Random(11)
    nodes = [f"n{i}" for i in range(8)]
    edges = []
    for _ in range(25):
        s, d = rng.sample(nodes, 2)
        edges.append((s, d, rng.randint(0, 10)))
    # repeated timestamps on one pair (the multiplicity path) and a
    # deliberate time-ordered chain
    edges += [("n0", "n1", 3), ("n0", "n1", 3), ("n1", "n2", 3),
              ("n2", "n3", 2)]  # n0->..->n3 blocked by the 3 > 2 step
    e = OmigoDF(spark.createDataFrame(edges, ["src", "dst", "ts"]))
    got = {(r["node_id"], r["ancestor"]): r["arr_ts"]
           for r in GR.time_ordered_ancestors(e, "ts").df.collect()}
    want = _brute_time_ancestors(edges)
    assert got == want


def _brute_asof(left, right, direction, tol=None):
    """Reference for asof over unique right times: (k, t) -> payload."""
    out = {}
    for k, t in left:
        cands = [(rt, v) for (rk, rt, v) in right if rk == k]
        back = [(rt, v) for rt, v in cands if rt <= t]
        fwd = [(rt, v) for rt, v in cands if rt >= t]
        b = max(back) if back else None
        f = min(fwd) if fwd else None
        if tol is not None:
            if b and t - b[0] > tol:
                b = None
            if f and f[0] - t > tol:
                f = None
        if direction == "backward":
            pick = b
        elif direction == "forward":
            pick = f
        else:  # nearest: closer wins, tie -> backward
            if b and f:
                pick = b if (t - b[0]) <= (f[0] - t) else f
            else:
                pick = b or f
        out[(k, t)] = pick[1] if pick else None
    return out


def test_asof_all_directions_match_bruteforce(spark):
    rng = random.Random(5)
    left, right = [], []
    for k in ("a", "b", "c"):
        left += [(k, float(rng.randint(0, 100))) for _ in range(15)]
        # unique right times per key (the documented default contract)
        ts = rng.sample(range(0, 100), 12)
        right += [(k, float(t), f"{k}{t}") for t in ts]
    left = sorted(set(left))
    ldf = OmigoDF(spark.createDataFrame(left, "k string, t double"))
    rdf = OmigoDF(spark.createDataFrame(right, "k string, t double, v string"))
    for d in ("backward", "forward", "nearest"):
        for tol in (None, 7.0):
            got = {(r["k"], r["t"]): r["r:v"]
                   for r in TS.asof_join(ldf, rdf, "k", "t", direction=d,
                                         tolerance_sec=tol).df.collect()}
            want = _brute_asof(left, right, d, tol)
            assert got == want, (d, tol)


def test_query_graph_chain_matches_bruteforce(spark):
    """Full QueryGraph compile path (Table1 -> Hierarchy with time
    window + min_group_size) on RANDOM pillar data vs a plain-Python
    replay of the documented join semantics — randomized-data coverage
    for the DSL beyond the fixed driver chain."""
    from omigo_data_analytics_spark.operators import query_graph as QG

    rng = random.Random(19)
    t1_rows, h_rows = [], []
    for _ in range(40):
        id1 = f"h{rng.randint(0, 3)}"
        nid = f"n{rng.randint(0, 5)}"
        t1_rows.append((id1, "d", f"u{rng.randint(0, 9)}", nid,
                        f"ev{rng.randint(0, 2)}", rng.randint(0, 100_000)))
    for i in range(80):
        id1 = f"h{rng.randint(0, 3)}"
        parent = f"n{rng.randint(0, 5)}"
        h_rows.append((id1, "d", f"c{i}", parent,
                       f"ev{rng.randint(0, 2)}", rng.randint(0, 200_000)))
    t1 = spark.createDataFrame(
        t1_rows, ["id1", "id2", "uuid", "node_id", "event_id", "ts"])
    hier = spark.createDataFrame(
        h_rows, ["id1", "id2", "node_id", "parent_id", "event_id", "ts"])
    window_min, min_group = 1, 2
    nodes = [QG.Table1().as_("T"),
             QG.Hierarchy().as_("C").time_window(window_min)
             .min_group_size(min_group)]
    gi = QG.QueryGraphInput({"table1": t1, "hierarchy": hier})
    got = {(r["T_uuid"], r["C_node_id"])
           for r in QG.QueryGraph("t", nodes, gi).execute().df.collect()}

    # brute force: C joins (id1, id2, parent_id=node_id) to T with
    # C.ts <= T.ts + window; then group-size floor over C's
    # (id1, id2, parent_id) join-key tuple
    limit_ms = window_min * 60 * 1000
    pairs = []
    for (tid1, tid2, uuid, tnid, tev, tts) in t1_rows:
        for (hid1, hid2, hnid, hpar, hev, hts) in h_rows:
            if (hid1, hid2) == (tid1, tid2) and hpar == tnid \
                    and hts <= tts + limit_ms:
                pairs.append(((hid1, hid2, hpar), uuid, hnid))
    from collections import Counter
    sizes = Counter(k for k, _, _ in pairs)
    want = {(u, c) for k, u, c in pairs if sizes[k] >= min_group}
    assert got == want and len(want) > 0


def test_graph_family_matches_bruteforce(spark):
    """bfs_levels vs Python BFS, remove_dangling_edges vs the fixpoint
    rule, remove_cycles vs its direct definition, and ancestors with
    encode_vertices on/off equality — one random graph, fixed seed."""
    from collections import deque

    rng = random.Random(23)
    edges = sorted({(f"n{rng.randint(0, 25)}", f"n{rng.randint(0, 25)}",
                     rng.randint(0, 50)) for _ in range(80)})
    plain = [(s, d) for s, d, _ in edges]
    e = OmigoDF(spark.createDataFrame(edges, ["src", "dst", "ts"]))

    # --- bfs_levels: min level from seeds, python BFS reference
    seeds = ["n0", "n1"]
    adj = {}
    for s, d in plain:
        adj.setdefault(s, []).append(d)
    want_lv = {s: 0 for s in seeds}
    dq = deque(seeds)
    while dq:
        u = dq.popleft()
        for v in adj.get(u, []):
            if v not in want_lv:
                want_lv[v] = want_lv[u] + 1
                dq.append(v)
    got_lv = {r["node_id"]: r["level"]
              for r in GR.bfs_levels(e, seeds).df.collect()}
    assert got_lv == want_lv

    # --- ancestors: dictionary-encoded run must equal the plain run
    a_plain = {(r["node_id"], r["ancestor"])
               for r in GR.ancestors(e).df.collect()}
    a_enc = {(r["node_id"], r["ancestor"])
             for r in GR.ancestors(e, encode_vertices=True).df.collect()}
    assert a_plain == a_enc and len(a_plain) > 0

    # --- remove_dangling_edges: python fixpoint of the same rule
    keep = {"n3"}
    cur = set(plain)
    while True:
        srcs = {s for s, _ in cur}
        nxt = {(s, d) for s, d in cur if d in srcs or d in keep}
        if nxt == cur:
            break
        cur = nxt
    got_d = {(r["src"], r["dst"])
             for r in GR.remove_dangling_edges(
                 OmigoDF(spark.createDataFrame(plain, ["src", "dst"])),
                 ["n3"], max_iter=50).df.collect()}
    assert got_d == cur

    # --- remove_cycles: edge survives iff ts >= min arrival ts at src
    # (sources never appearing as dst always emit)
    first = {}
    for s, d, t in edges:
        first[d] = min(first.get(d, t), t)
    want_c = {(s, d, t) for s, d, t in edges
              if s not in first or t >= first[s]}
    got_c = {(r["src"], r["dst"], r["ts"])
             for r in GR.remove_cycles(e, "ts").df.collect()}
    assert got_c == want_c


def test_asof_atomic_row_pick_with_random_nulls(spark):
    """r11 advice fix, randomized: right payloads with random NULL cells
    and duplicate (k, t) rows. The winning row (max (t, seq) tuple at-or-
    before / min-then-max for forward) must come back WHOLE — both cells
    from the same source row, NULLs preserved — across all directions."""
    import random as _r
    rng = _r.Random(23)
    left, right = [], []
    for k in ("a", "b"):
        left += [(k, float(rng.randint(0, 60))) for _ in range(12)]
        for _ in range(18):
            t = float(rng.randint(0, 60))
            seq = rng.randint(0, 999)
            a = None if rng.random() < 0.4 else f"A{seq}"
            b = None if rng.random() < 0.4 else f"B{seq}"
            right.append((k, t, seq, a, b))
    left = sorted(set(left))
    ldf = OmigoDF(spark.createDataFrame(left, "k string, t double"))
    rdf = OmigoDF(spark.createDataFrame(
        right, "k string, t double, seq int, a string, b string"))

    def brute(direction):
        out = {}
        for k, t in left:
            cands = [r for r in right if r[0] == k]
            back = [r for r in cands if r[1] <= t]
            fwd = [r for r in cands if r[1] >= t]
            # max (t, seq) wins backward; forward = min t, then max seq
            bpick = max(back, key=lambda r: (r[1], r[2])) if back else None
            fpick = (max([r for r in fwd
                          if r[1] == min(x[1] for x in fwd)],
                         key=lambda r: r[2]) if fwd else None)
            if direction == "backward":
                p = bpick
            elif direction == "forward":
                p = fpick
            else:
                if bpick and fpick:
                    p = bpick if (t - bpick[1]) <= (fpick[1] - t) else fpick
                else:
                    p = bpick or fpick
            out[(k, t)] = (p[3], p[4]) if p else (None, None)
        return out

    for d in ("backward", "forward", "nearest"):
        got = {(r["k"], r["t"]): (r["r:a"], r["r:b"])
               for r in TS.asof_join(ldf, rdf, "k", "t", direction=d,
                                     tiebreak_cols=["seq"]).df.collect()}
        assert got == brute(d), d
