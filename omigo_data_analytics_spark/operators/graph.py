"""Graph operators: BFS levels, ancestor paths, dangling-edge pruning,
cycle removal — the graph_traversal surface of the reference
(reference graph_traversal.py:7-342), re-expressed as iterative DataFrame
joins (Pregel-style frontier expansion).

Scale design: each iteration is a distributed hash join between the
frontier and the edge table partitioned on the join key; the driver only
orchestrates the loop and checks an empty-frontier terminator. Frontiers
are localCheckpoint()ed per iteration so the lineage (and task binary)
does not grow with depth — the standard iterative-algorithm pattern on
Spark. No driver-side materialization of vertices or edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..core.dataframe import OmigoDF


def _df(x) -> DataFrame:
    return x.df if isinstance(x, OmigoDF) else x


def bfs_levels(edges, seed_vertices, src_col: str = "src", dst_col: str = "dst",
               max_iter: int = 30, out_col: str = "level") -> OmigoDF:
    """Minimum BFS level of every reachable vertex from the seed set
    (seeds = level 0). Cycle-tolerant: a vertex keeps its first (minimum)
    level (reference graph_traversal.py:7-78, forward direction).

    `seed_vertices` is a list of vertex ids or a DataFrame/OmigoDF with a
    `node_id` column. Returns (node_id, level).
    """
    # checkpoint the edge projection once: every BFS level joins against it,
    # and without the barrier the upstream plan (unions/distinct of the
    # caller's edge construction) would re-execute per iteration
    e = _df(edges).select(F.col(src_col).alias("src"),
                          F.col(dst_col).alias("dst")).localCheckpoint()
    spark = e.sparkSession
    if isinstance(seed_vertices, (list, tuple)):
        seeds = spark.createDataFrame([(v,) for v in seed_vertices], ["node_id"])
        seeds = seeds.withColumn("node_id", F.col("node_id").cast(
            e.schema["src"].dataType))
    else:
        seeds = _df(seed_vertices).select("node_id")
    visited = seeds.distinct().withColumn("level", F.lit(0)).localCheckpoint()
    frontier = visited.select("node_id")
    for depth in range(1, max_iter + 1):
        nxt = (e.join(frontier.withColumnRenamed("node_id", "src"), "src")
                .select(F.col("dst").alias("node_id")).distinct()
                .join(visited.select("node_id"), "node_id", "left_anti")
                .localCheckpoint())
        if nxt.isEmpty():
            break
        visited = visited.unionByName(
            nxt.withColumn("level", F.lit(depth))).localCheckpoint()
        frontier = nxt
    return OmigoDF(visited.withColumnRenamed("level", out_col))


def degrees(edges, src_col: str = "src", dst_col: str = "dst") -> OmigoDF:
    """(node_id, out_degree, in_degree) for every vertex appearing in the
    edge table. One aggregation per direction, outer-merged."""
    e = _df(edges)
    outd = e.groupBy(F.col(src_col).alias("node_id")).agg(
        F.count(F.lit(1)).alias("out_degree"))
    ind = e.groupBy(F.col(dst_col).alias("node_id")).agg(
        F.count(F.lit(1)).alias("in_degree"))
    return OmigoDF(
        outd.join(ind, "node_id", "full")
            .select("node_id",
                    F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
                    F.coalesce("in_degree", F.lit(0)).alias("in_degree")))


def ancestors(edges, src_col: str = "src", dst_col: str = "dst",
              max_iter: int = 30) -> OmigoDF:
    """Full ancestor set of every vertex in a DAG: (node_id, ancestor)
    pairs — the relational core of the reference's
    get_forward_edges_only path/ancestor columns
    (graph_traversal.py:80-171). Iterates reachability joins to fixpoint.
    """
    e = _df(edges).select(F.col(src_col).alias("anc"),
                          F.col(dst_col).alias("node_id")).localCheckpoint()
    reach = e.distinct().localCheckpoint()   # direct parents = 1-step ancestors
    frontier = reach
    for _ in range(max_iter):
        # extend: ancestor -of-> frontier.anc gives new (node, ancestor)
        ext = (frontier.join(
                   e.select(F.col("anc").alias("anc2"), F.col("node_id").alias("anc")),
                   "anc")
               .select(F.col("anc2").alias("anc"), "node_id").distinct()
               .join(reach, ["anc", "node_id"], "left_anti").localCheckpoint())
        if ext.isEmpty():
            break
        reach = reach.unionByName(ext).localCheckpoint()
        frontier = ext
    return OmigoDF(reach.select("node_id", F.col("anc").alias("ancestor")))


def remove_dangling_edges(edges, keep_vertices=None, src_col: str = "src",
                          dst_col: str = "dst", max_iter: int = 10) -> OmigoDF:
    """Iteratively prune edges whose destination is a leaf (no outgoing
    edges) and not in the protected vertex set, until fixpoint or max_iter
    (reference graph_traversal.py:215-285). Returns the surviving edges."""
    e = _df(edges).localCheckpoint()
    spark = e.sparkSession
    dst_type = e.schema[dst_col].dataType
    if keep_vertices is None or (isinstance(keep_vertices, (list, tuple))
                                 and len(keep_vertices) == 0):
        keep = (e.select(F.col(dst_col).alias("node_id")).limit(0)
                 .select(F.col("node_id").cast(dst_type).alias("node_id")))
    elif isinstance(keep_vertices, (list, tuple)):
        keep = spark.createDataFrame([(v,) for v in keep_vertices], ["node_id"])
        keep = keep.withColumn("node_id", F.col("node_id").cast(dst_type))
    else:
        keep = _df(keep_vertices).select("node_id")
    cur = e
    prev_n = cur.count()
    for _ in range(max_iter):
        srcs = cur.select(F.col(src_col).alias("node_id")).distinct()
        protected = srcs.unionByName(keep).distinct()
        pruned = cur.join(protected.withColumnRenamed("node_id", dst_col),
                          dst_col, "left_semi").localCheckpoint()
        n = pruned.count()
        if n == prev_n:
            break
        cur, prev_n = pruned, n
    return OmigoDF(cur.select(*e.columns))


def time_ordered_ancestors(edges, ts_col: str, src_col: str = "src",
                           dst_col: str = "dst", max_iter: int = 30) -> OmigoDF:
    """Ancestors reachable along TIME-ORDERED paths: a path a→…→z counts
    only if every successive edge timestamp is >= the previous one —
    the reference's time-based forward-edge expansion
    (graph_traversal.py:173-212). Returns (node_id, ancestor).

    State per (node, ancestor) is the MINIMUM arrival timestamp (the most
    permissive for further extension), so each iteration is join + min-agg
    — no path materialization, no explosion on dense DAGs."""
    e = _df(edges).select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"),
                          F.col(ts_col).alias("ts")).localCheckpoint()

    def _best(parts):
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.groupBy("node_id", "anc").agg(F.min("arr_ts").alias("arr_ts"))

    # pieces are individually checkpointed; the running "best arrival" view
    # is a lazy union+min over them, so each iteration runs exactly ONE job
    # (materializing ext) instead of also re-checkpointing the accumulator
    pieces = [(e.groupBy(F.col("dst").alias("node_id"), F.col("src").alias("anc"))
                .agg(F.min("ts").alias("arr_ts"))).localCheckpoint()]
    frontier = pieces[0]
    for _ in range(max_iter):
        ext = (F.broadcast(frontier).join(e, frontier["node_id"] == e["src"])
               .where(F.col("ts") >= F.col("arr_ts"))
               .groupBy(F.col("dst").alias("node_id"), F.col("anc"))
               .agg(F.min("ts").alias("arr_ts")))
        # keep only strictly-better states (new pair, or earlier arrival)
        ext = (ext.alias("x")
               .join(_best(pieces).alias("r"), ["node_id", "anc"], "left")
               .where(F.col("r.arr_ts").isNull()
                      | (F.col("x.arr_ts") < F.col("r.arr_ts")))
               .select("node_id", "anc", F.col("x.arr_ts").alias("arr_ts"))
               .localCheckpoint())
        if ext.isEmpty():
            break
        pieces.append(ext)
        frontier = ext
    return OmigoDF(_best(pieces).select("node_id", F.col("anc").alias("ancestor"),
                                        "arr_ts"))


def merge_similar_nodes(edges, src_col: str = "src", dst_col: str = "dst") -> OmigoDF:
    """Collapse equivalent leaf nodes: leaves (no outgoing edges) with the
    same sorted parent set merge into one representative (minimum id) —
    the working core of the reference's merge_similar_nodes_reference
    (graph_traversal.py:344-444, whose own impl has undefined vars).
    Returns the edge table with merged leaf destinations, deduped."""
    e = _df(edges)
    srcs = e.select(F.col(src_col).alias("n")).distinct()
    leaves = (e.join(srcs, e[dst_col] == F.col("n"), "left_anti")
              .select(F.col(dst_col).alias("leaf")).distinct())
    parents = (e.join(leaves, e[dst_col] == F.col("leaf"))
               .groupBy("leaf")
               .agg(F.concat_ws(",", F.array_sort(
                   F.collect_set(F.col(src_col).cast("string")))).alias("psig")))
    rep = parents.groupBy("psig").agg(F.min("leaf").alias("rep"))
    remap = parents.join(rep, "psig").select("leaf", "rep")
    out = (e.join(remap, e[dst_col] == F.col("leaf"), "left")
           .withColumn(dst_col, F.coalesce(F.col("rep"), e[dst_col]))
           .drop("leaf", "rep")
           .select(*e.columns).distinct())
    return OmigoDF(out)


def remove_cycles(edges, ts_col: str, src_col: str = "src",
                  dst_col: str = "dst") -> OmigoDF:
    """Drop back-edges that violate temporal ordering: an edge survives iff
    its timestamp is >= the earliest timestamp at which its source was
    itself reached (seeds — sources that are never destinations — always
    emit). Time-ordered DAG extraction (reference
    graph_traversal.py:288-342)."""
    e = _df(edges)
    first_seen = e.groupBy(F.col(dst_col).alias("__node__")).agg(
        F.min(ts_col).alias("__first_ts__"))
    out = (e.join(first_seen, e[src_col] == F.col("__node__"), "left")
            .where(F.col("__first_ts__").isNull()
                   | (F.col(ts_col) >= F.col("__first_ts__")))
            .select(*e.columns))
    return OmigoDF(out)
