"""Graph operator tests on small hand-built graphs."""

from omigo_data_analytics_spark import OmigoDF
from omigo_data_analytics_spark.operators import graph as G


def _edges(spark, rows):
    return OmigoDF(spark.createDataFrame(rows, ["src", "dst"]))


def test_bfs_levels_min_level_and_cycles(spark):
    # a -> b -> c -> a (cycle), b -> d, d -> e; seed a
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("b", "d"), ("d", "e")])
    out = {r["node_id"]: r["level"] for r in G.bfs_levels(e, ["a"]).df.collect()}
    assert out == {"a": 0, "b": 1, "c": 2, "d": 2, "e": 3}


def test_bfs_levels_multi_seed(spark):
    e = _edges(spark, [("a", "b"), ("x", "b"), ("b", "c")])
    out = {r["node_id"]: r["level"] for r in G.bfs_levels(e, ["a", "x"]).df.collect()}
    assert out == {"a": 0, "x": 0, "b": 1, "c": 2}


def test_degrees(spark):
    e = _edges(spark, [("a", "b"), ("a", "c"), ("b", "c")])
    out = {r["node_id"]: (r["out_degree"], r["in_degree"])
           for r in G.degrees(e).df.collect()}
    assert out == {"a": (2, 0), "b": (1, 1), "c": (0, 2)}


def test_ancestors_transitive(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("b", "d")])
    out = {(r["node_id"], r["ancestor"]) for r in G.ancestors(e).df.collect()}
    assert out == {("b", "a"), ("c", "b"), ("c", "a"), ("d", "b"), ("d", "a")}


def test_remove_dangling_edges(spark):
    # chain a->b->c->d ; keep {d}: all survive. keep {}: all pruned.
    rows = [("a", "b"), ("b", "c"), ("c", "d")]
    e = _edges(spark, rows)
    kept = G.remove_dangling_edges(e, ["d"]).df.collect()
    assert {(r["src"], r["dst"]) for r in kept} == set(rows)
    none = G.remove_dangling_edges(e, []).df.collect()
    assert none == []


def test_remove_cycles_time_order(spark):
    # u->v at t=1, v->u at t=0 is a back-edge (u first reached at t=... )
    rows = [("u", "v", 1), ("v", "u", 0), ("w", "u", 5)]
    e = OmigoDF(spark.createDataFrame(rows, ["src", "dst", "ts"]))
    out = {(r["src"], r["dst"]) for r in G.remove_cycles(e, "ts").df.collect()}
    # v first reached at ts=1, so v->u@0 violates time order and is dropped;
    # u first reached at ts=0; u->v@1 ok; w never a dst -> survives
    assert out == {("u", "v"), ("w", "u")}


def test_time_ordered_ancestors(spark):
    # a -(1)-> b -(2)-> c : time-ordered path a->c exists
    # x -(5)-> y -(3)-> z : x->z violates time order (5 then 3)
    rows = [("a", "b", 1), ("b", "c", 2), ("x", "y", 5), ("y", "z", 3)]
    e = OmigoDF(spark.createDataFrame(rows, ["src", "dst", "ts"]))
    out = {(r["node_id"], r["ancestor"])
           for r in G.time_ordered_ancestors(e, "ts").df.collect()}
    assert ("c", "a") in out and ("c", "b") in out
    assert ("z", "y") in out and ("z", "x") not in out


def test_merge_similar_nodes(spark):
    # leaves l1, l2 share parent set {a, b}; l3 has parent set {a}
    rows = [("a", "l1"), ("b", "l1"), ("a", "l2"), ("b", "l2"), ("a", "l3")]
    e = OmigoDF(spark.createDataFrame(rows, ["src", "dst"]))
    out = {(r["src"], r["dst"]) for r in G.merge_similar_nodes(e).df.collect()}
    assert out == {("a", "l1"), ("b", "l1"), ("a", "l3")}
