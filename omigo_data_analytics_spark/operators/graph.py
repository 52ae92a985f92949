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

from ..core.colutils import qcol

from ..core.dataframe import OmigoDF
from ..core.jobs import checkpoint_with_metrics


def _df(x) -> DataFrame:
    return x.df if isinstance(x, OmigoDF) else x


# ------------------------------------------------- vertex dictionary codec
# The iterative operators re-shuffle vertex ids every round (up to max_iter
# times). Real telemetry graphs key on long strings (the reference's process
# trees use guid-style ids), so each round's exchange carries the full id in
# every row and every hash/compare walks the string. With
# ``encode_vertices=True`` the operator builds a (node -> BIGINT) dictionary
# ONCE, runs every iteration over 8-byte longs, and decodes before
# returning — shuffle bytes and compare cost drop 2-3x on string-keyed
# graphs (SCALE.md records the measured cut), for the one-time price of a
# vertex-set distinct plus encode/decode joins that AQE broadcasts whenever
# the dictionary fits. monotonically_increasing_id assigns the ids: unique
# without any global sort/window barrier; the ids are not dense and not
# stable across runs, but they never escape the operator (decoded before
# return), so output determinism is unaffected.

# Above this row count the dictionary is left to AQE (a billion-vertex
# dictionary must NOT be force-broadcast); below it the encode/decode joins
# get an explicit broadcast hint. The hint matters because the dictionary is
# localCheckpoint'd (stable ids require materialization) and checkpointed
# plans carry no size statistics — without the hint Spark sort-merge-joins,
# shuffling the corpus-sized edge/output side to encode it (measured at
# sf0.1: 10x MORE shuffle than no encoding at all).
_DICT_BROADCAST_MAX_ROWS = 1_000_000


def _vertex_dict(*node_dfs: DataFrame) -> tuple[DataFrame, bool]:
    """(``__node__``, ``__vid__`` BIGINT) dictionary over the union of the
    given single-column vertex frames, checkpointed (encode and decode
    must see the SAME id assignment) — plus whether it is small enough to
    broadcast. The count is one cheap job over the just-materialized
    blocks."""
    u = node_dfs[0].toDF("__node__")
    for d in node_dfs[1:]:
        u = u.unionByName(d.toDF("__node__"))
    # NULL vertex ids cannot be dictionary-encoded without changing
    # semantics: the un-encoded traversal's joins never match NULL=NULL
    # (while still carrying NULL-keyed rows through non-join paths), but
    # an encoded NULL would become a real id that DOES match itself —
    # and an inner-join encode would instead silently DROP those rows.
    # Refuse loudly. The NULL probe and the broadcast-size count ride
    # the (eager, per the r14 adjudication) checkpoint's materialization
    # job via observe() (r15) — ONE job total, where r14's fused
    # aggregate was a second job over the blocks and r13's probe + count
    # pair was three.
    vdict, row = checkpoint_with_metrics(
        u.distinct().withColumn("__vid__", F.monotonically_increasing_id()),
        {"__n__": F.count(F.lit(1)),
         "__nulls__": F.count(F.when(F.col("__node__").isNull(), 1))})
    if row["__nulls__"] > 0:
        raise ValueError(
            "encode_vertices: NULL vertex ids are not supported — filter "
            "or fill them first (encoding NULL would silently change "
            "traversal semantics)")
    return vdict, row["__n__"] <= _DICT_BROADCAST_MAX_ROWS


def _encode_vcol(df: DataFrame, vdict: DataFrame, col: str,
                 small: bool) -> DataFrame:
    """Replace vertex column ``col`` with its dictionary id (inner join —
    every value is in the dictionary by construction)."""
    cols = df.columns
    d = vdict.withColumnRenamed("__node__", col)
    return (df.join(F.broadcast(d) if small else d, col)
              .select(*[F.col("__vid__").alias(c) if c == col else qcol(c)
                        for c in cols]))


def _decode_vcol(df: DataFrame, vdict: DataFrame, col: str,
                 small: bool) -> DataFrame:
    """Inverse of _encode_vcol: dictionary id back to the original vertex."""
    cols = df.columns
    d = vdict.withColumnRenamed("__vid__", col)
    return (df.join(F.broadcast(d) if small else d, col)
              .select(*[F.col("__node__").alias(c) if c == col else qcol(c)
                        for c in cols]))


def bfs_levels(edges, seed_vertices, src_col: str = "src", dst_col: str = "dst",
               max_iter: int = 30, out_col: str = "level",
               encode_vertices: bool = False,
               _entry_barrier: bool = True) -> OmigoDF:
    """Minimum BFS level of every reachable vertex from the seed set
    (seeds = level 0). Cycle-tolerant: a vertex keeps its first (minimum)
    level (reference graph_traversal.py:7-78, forward direction).

    `seed_vertices` is a list of vertex ids or a DataFrame/OmigoDF with a
    `node_id` column. Returns (node_id, level).

    ``encode_vertices=True`` runs every BFS round over dictionary-encoded
    BIGINT vertex ids (see _vertex_dict) — same output, 2-3x less
    per-round shuffle on string-keyed graphs.
    """
    # checkpoint the edge projection once: every BFS level joins against it,
    # and without the barrier the upstream plan (unions/distinct of the
    # caller's edge construction) would re-execute per iteration
    e = _df(edges).select(qcol(src_col).alias("src"),
                          qcol(dst_col).alias("dst"))
    spark = e.sparkSession
    if isinstance(seed_vertices, (list, tuple)):
        seeds = spark.createDataFrame([(v,) for v in seed_vertices], ["node_id"])
        seeds = seeds.withColumn("node_id", F.col("node_id").cast(
            e.schema["src"].dataType))
    else:
        seeds = _df(seed_vertices).select("node_id")
    vdict = None
    if encode_vertices:
        # checkpoint the RAW projection first: the dict build + two encode
        # joins would otherwise re-execute the caller's edge construction
        # three more times (measured 3x scan inflation at sf0.1)
        if _entry_barrier:
            e = e.localCheckpoint()
        # seeds participate in the dictionary: a seed absent from the edge
        # table still appears in the output at level 0
        vdict, vsmall = _vertex_dict(e.select("src"), e.select("dst"),
                                     seeds.select("node_id"))
        # the encoded projection is a cheap broadcast-join plan over the
        # raw blocks consumed only by the flag checkpoint's job below —
        # fold it in rather than materializing a second edge copy (r15)
        e = _encode_vcol(_encode_vcol(e, vdict, "src", vsmall),
                         vdict, "dst", vsmall)
        seeds = _encode_vcol(seeds, vdict, "node_id", vsmall)
    elif _entry_barrier:
        # barrier so the caller's edge construction runs exactly once
        # under the flag join's two readers (e side + src-set side).
        # Callers that hand in an ALREADY-materialized edge frame
        # (analysis_job / get_bfs_levels checkpoint it themselves) pass
        # _entry_barrier=False to skip this redundant edge copy (r15).
        e = e.localCheckpoint()
    # dead-end flag ON the edge blocks (r15): an expansion row's
    # destination can itself expand iff it appears as some edge's source.
    # Computing that flag ONCE at entry and letting it ride every round's
    # join output replaces the old per-round `frontier ⋈ srcs` semi-join
    # (a vertex-set-sized broadcast build EVERY round) with one entry
    # join, and — because each round now knows how many of its new nodes
    # are expandable — an all-dead frontier exits WITHOUT paying the
    # convergence round's |E| join at all.
    srcs = e.select(F.col("src").alias("__sn__")).distinct()
    e = (e.join(srcs, e["dst"] == F.col("__sn__"), "left")
         .select("src", "dst",
                 F.col("__sn__").isNotNull().alias("__has_out__"))
         .localCheckpoint())
    # visited is kept as a LAZY union of per-level checkpointed deltas:
    # each iteration re-reads materialized blocks (cheap) instead of also
    # re-writing the whole accumulated set (one fewer job per level)
    deltas = [seeds.distinct().withColumn("level", F.lit(0)).localCheckpoint()]
    frontier = deltas[0].select("node_id")

    def _visited():
        out = deltas[0].select("node_id")
        for d in deltas[1:]:
            out = out.unionByName(d.select("node_id"))
        return out

    for depth in range(1, max_iter + 1):
        # both terminators (any new node? any EXPANDABLE new node?) ride
        # the eager checkpoint's materialization job via observe() (r15)
        # — one job per level, where checkpoint + isEmpty was two, and
        # the final all-dead round is skipped outright. __has_out__ is
        # constant per node, so distinct() over (node_id, flag) yields
        # exactly the node-distinct the plain projection had.
        nxt, m = checkpoint_with_metrics(
            e.join(frontier.withColumnRenamed("node_id", "src"), "src")
             .select(F.col("dst").alias("node_id"), F.col("__has_out__"))
             .distinct()
             .join(_visited(), "node_id", "left_anti"),
            {"n": F.count(F.lit(1)),
             "live": F.count(F.when(F.col("__has_out__"), 1))})
        if m["n"] == 0:
            break
        deltas.append(nxt.select("node_id").withColumn("level", F.lit(depth)))
        if m["live"] == 0:
            break
        frontier = nxt.where(F.col("__has_out__")).select("node_id")
    visited = deltas[0]
    for d in deltas[1:]:
        visited = visited.unionByName(d)
    if vdict is not None:
        visited = _decode_vcol(visited, vdict, "node_id", vsmall)
    return OmigoDF(visited.withColumnRenamed("level", out_col))


def degrees(edges, src_col: str = "src", dst_col: str = "dst") -> OmigoDF:
    """(node_id, out_degree, in_degree) for every vertex appearing in the
    edge table. A tagged union into ONE conditional aggregate — a single
    partial-aggregated shuffle, where the per-direction groupBy + full
    outer join form costs two shuffles plus a vertex-sized join.
    Delta from that join form: a NULL node id aggregates into ONE row
    carrying both directions (groupBy groups NULLs), where the full
    outer join emitted two separate NULL rows (NULL keys never match)."""
    e = _df(edges)
    u = (e.select(qcol(src_col).alias("node_id"),
                  F.lit(1).alias("__o__"), F.lit(0).alias("__i__"))
         .unionByName(e.select(qcol(dst_col).alias("node_id"),
                               F.lit(0).alias("__o__"),
                               F.lit(1).alias("__i__"))))
    return OmigoDF(u.groupBy("node_id")
                    .agg(F.sum("__o__").alias("out_degree"),
                         F.sum("__i__").alias("in_degree")))


def ancestors(edges, src_col: str = "src", dst_col: str = "dst",
              max_iter: int = 30, encode_vertices: bool = False,
              _entry_barrier: bool = True) -> OmigoDF:
    """Full ancestor set of every vertex in a DAG: (node_id, ancestor)
    pairs — the relational core of the reference's
    get_forward_edges_only path/ancestor columns
    (graph_traversal.py:80-171). Iterates reachability joins to fixpoint.

    ``encode_vertices=True`` runs the closure over dictionary-encoded
    BIGINT ids (see _vertex_dict) — the closure is the worst case for
    wide ids, since |R| grows toward V x avg-ancestry pairs, every one
    carrying BOTH ids through every round's shuffle.
    """
    e = _df(edges).select(qcol(src_col).alias("anc"),
                          qcol(dst_col).alias("node_id"))
    vdict = None
    if encode_vertices:
        if _entry_barrier:
            e = e.localCheckpoint()
        vdict, vsmall = _vertex_dict(e.select("anc"), e.select("node_id"))
        # the encoded projection is a cheap broadcast-join plan over the
        # raw blocks consumed only by the base delta's checkpoint job
        # below — fold it in rather than materializing a second edge
        # copy (r15)
        e = _encode_vcol(_encode_vcol(e, vdict, "anc", vsmall),
                         vdict, "node_id", vsmall)
    elif _entry_barrier:
        # barrier so the caller's edge construction runs exactly once
        # under the base delta's two readers (pair side + src-set side).
        # Callers handing in an already-materialized frame pass
        # _entry_barrier=False (see bfs_levels).
        e = e.localCheckpoint()
    # semi-naive recursive doubling ("smart" transitive closure):
    # Δ_k = Δ_{k-1} ∘ R_{k-1}, still O(log depth) rounds — a pair whose
    # MINIMAL path length lies in (2^(k-1), 2^k] splits at 2^(k-1) into a
    # prefix that is minimal-length-new at step k-1 (∈ Δ) and a suffix
    # already in R; composing the full closure with itself (R∘R) each
    # round instead re-derives every previously-known pair before the
    # anti-join throws them away — on a depth-d graph the last (empty)
    # round alone costs a full |R|×|R| self-join. With Δ on the build
    # side the convergence round joins only the newest (often tiny or
    # dead-ended) delta against R. R is a LAZY union of checkpointed
    # deltas: per-round readers re-scan materialized blocks instead of
    # also re-writing the whole closure every round.
    # dead-end flag ON the delta pairs (r15): a pair (anc, n) can compose
    # further iff n has an outgoing edge (n ∈ src set — exactly the set
    # of anc values reach can ever hold). The flag joins in ONCE inside
    # the base delta's checkpoint job and then rides every composition's
    # reach side for free, replacing the old per-round `delta ⋈ srcs`
    # semi-join AND the separate srcs checkpoint; a fully-dead delta now
    # exits WITHOUT paying the convergence round's closure join.
    # __has_out__ is constant per node_id, so distinct() over
    # (anc, node_id, flag) is exactly the pair-distinct.
    srcs = e.select(F.col("anc").alias("__sn__")).distinct()
    deltas = [(e.join(srcs, e["node_id"] == F.col("__sn__"), "left")
               .select("anc", "node_id",
                       F.col("__sn__").isNotNull().alias("__has_out__"))
               .distinct().localCheckpoint())]   # direct parents

    def _reach():
        out = deltas[0]
        for d in deltas[1:]:
            out = out.unionByName(d)
        return out

    for _ in range(max_iter):
        # both terminators (any new pair? any COMPOSABLE new pair?) ride
        # the eager checkpoint's materialization job via observe() (r15)
        live = deltas[-1].where(F.col("__has_out__"))
        reach = _reach()
        comp, m = checkpoint_with_metrics(
            live.select("anc", F.col("node_id").alias("mid"))
                .join(reach.select(F.col("anc").alias("mid"), "node_id",
                                   "__has_out__"), "mid")
                .select("anc", "node_id", "__has_out__").distinct()
                .join(reach.select("anc", "node_id"),
                      ["anc", "node_id"], "left_anti"),
            {"n": F.count(F.lit(1)),
             "live": F.count(F.when(F.col("__has_out__"), 1))})
        if m["n"] == 0:
            break
        deltas.append(comp)
        if m["live"] == 0:
            break
    out = _reach().select("node_id", F.col("anc").alias("ancestor"))
    if vdict is not None:
        out = _decode_vcol(_decode_vcol(out, vdict, "node_id", vsmall),
                           vdict, "ancestor", vsmall)
    return OmigoDF(out)


def remove_dangling_edges(edges, keep_vertices=None, src_col: str = "src",
                          dst_col: str = "dst", max_iter: int = 10) -> OmigoDF:
    """Iteratively prune edges whose destination is a leaf (no outgoing
    edges) and not in the protected vertex set, until fixpoint or max_iter
    (reference graph_traversal.py:215-285). Returns the surviving edges."""
    # the fixpoint terminators (entry row count + per-round counts) ride
    # the checkpoints' own materialization jobs via observe() (r15) —
    # one job per round, where checkpoint + count() was two
    e, m0 = checkpoint_with_metrics(_df(edges), {"n": F.count(F.lit(1))})
    spark = e.sparkSession
    dst_type = e.schema[dst_col].dataType
    if keep_vertices is None or (isinstance(keep_vertices, (list, tuple))
                                 and len(keep_vertices) == 0):
        keep = (e.select(qcol(dst_col).alias("node_id")).limit(0)
                 .select(F.col("node_id").cast(dst_type).alias("node_id")))
    elif isinstance(keep_vertices, (list, tuple)):
        keep = spark.createDataFrame([(v,) for v in keep_vertices], ["node_id"])
        keep = keep.withColumn("node_id", F.col("node_id").cast(dst_type))
    else:
        keep = _df(keep_vertices).select("node_id")
    cur = e
    prev_n = m0["n"]
    for _ in range(max_iter):
        srcs = cur.select(qcol(src_col).alias("node_id")).distinct()
        protected = srcs.unionByName(keep).distinct()
        pruned, m = checkpoint_with_metrics(
            cur.join(protected.withColumnRenamed("node_id", dst_col),
                     dst_col, "left_semi"),
            {"n": F.count(F.lit(1))})
        n = m["n"]
        if n == prev_n:
            break
        cur, prev_n = pruned, n
    return OmigoDF(cur.select(*[qcol(c) for c in e.columns]))


def time_ordered_ancestors(edges, ts_col: str, src_col: str = "src",
                           dst_col: str = "dst", max_iter: int = 30,
                           encode_vertices: bool = False) -> OmigoDF:
    """Ancestors reachable along TIME-ORDERED paths: a path a→…→z counts
    only if every successive edge timestamp is >= the previous one —
    the reference's time-based forward-edge expansion
    (graph_traversal.py:173-212). Returns (node_id, ancestor).

    State per (node, ancestor) is the MINIMUM arrival timestamp (the most
    permissive for further extension), so each iteration is join + min-agg
    — no path materialization, no explosion on dense DAGs.

    The edge table is pre-grouped ONCE to (src, dst, sorted distinct ts
    array): the per-iteration extension join then emits one row per
    (state, successor-pair) with a binary probe for the first eligible
    timestamp, instead of one row per (state, raw edge) — at high edge
    multiplicity (many events per node pair, the common temporal-graph
    shape) that divides the join volume by the multiplicity factor.
    Caveat: the distinct-ts array of ONE (src, dst) pair must fit in a
    row; for adversarial inputs where a single pair carries ~10^8
    distinct timestamps, split the pair's time range before calling.

    ``encode_vertices=True`` runs the whole loop (pre-grouping included)
    over dictionary-encoded BIGINT ids — see _vertex_dict."""
    e = _df(edges).select(qcol(src_col).alias("src"), qcol(dst_col).alias("dst"),
                          qcol(ts_col).alias("ts"))
    vdict = None
    if encode_vertices:
        # encode BEFORE the pre-grouping so even that first corpus-sized
        # (src, dst) shuffle runs over BIGINT keys — the accumulator
        # (node, ancestor, ts) then never carries a string id at all
        e = e.localCheckpoint()
        vdict, vsmall = _vertex_dict(e.select("src"), e.select("dst"))
        e = _encode_vcol(_encode_vcol(e, vdict, "src", vsmall),
                         vdict, "dst", vsmall)
    eg = (e.groupBy("src", "dst")
          .agg(F.sort_array(F.collect_set("ts")).alias("tss"))
          ).localCheckpoint()
    # dead-end flag ON the pair summary (r15): a state at node n can
    # extend iff n has an outgoing edge. The flag joins in once (reading
    # the just-landed summary blocks) and rides every extension's eg
    # side, replacing the old per-round `frontier ⋈ srcs` semi-join and
    # the separate srcs checkpoint; an all-dead delta exits WITHOUT
    # paying the convergence round's extension join.
    srcs = eg.select(F.col("src").alias("__sn__")).distinct()
    eg = (eg.join(srcs, eg["dst"] == F.col("__sn__"), "left")
          .select("src", "dst", "tss",
                  F.col("__sn__").isNotNull().alias("__has_out__"))
          .localCheckpoint())

    # incremental accumulator: `best` is the checkpointed running minimum
    # arrival per (node, ancestor); each iteration touches O(|best| + |ext|)
    # — not a re-union of every prior delta (O(depth^2) recompute). The
    # frontier delta is NOT force-broadcast: on dense DAGs it is O(V*A) and
    # would OOM the driver at scale; AQE broadcasts it when it is small.
    # (src, dst) is unique in eg, so the depth-1 closure needs no extra
    # shuffle: the min arrival is the sorted array's head.
    best = eg.select(F.col("dst").alias("node_id"), F.col("src").alias("anc"),
                     F.expr("get(tss, 0)").alias("arr_ts"),
                     F.col("__has_out__")).localCheckpoint()
    # NULL-arrival states (all-null-ts pairs) stay in `best` (reachability
    # with unknown time) but never enter the frontier: ts >= NULL can't
    # extend them, and a NULL state's __old_ts__ is NULL every round, so
    # keeping them in the delta would defeat convergence detection and
    # force all max_iter rounds. States at dead-end nodes (no outgoing
    # edge — the __has_out__ flag attached to eg above) are likewise
    # excluded from the frontier: they can never extend.
    frontier = (best.where(F.col("arr_ts").isNotNull()
                           & F.col("__has_out__"))
                .select("node_id", "anc", "arr_ts"))
    for _ in range(max_iter):
        # Extensions union the accumulator straight into ONE tagged
        # aggregate: min arrival overall + min arrival among prior states.
        # That single shuffle replaces three (the extension pre-agg, the
        # strictly-better left join against `best`, and the union
        # re-aggregate) — the combined groupBy's map-side partial agg does
        # the extension combine, and a row is a delta exactly when its
        # overall min beats (or lacks) a prior-state min. The first
        # eligible timestamp per successor pair comes from the sorted
        # array via get() — null (no eligible edge, or an all-null-ts pair) drops pre-shuffle; ANSI subscripting would throw on the empty filter result.
        ext_raw = (frontier.join(eg, frontier["node_id"] == eg["src"])
                   .select(F.col("dst").alias("node_id"), F.col("anc"),
                           F.expr("get(filter(tss, t -> t >= arr_ts), 0)")
                           .alias("arr_ts"),
                           F.lit(False).alias("__old__"),
                           F.col("__has_out__"))
                   .where(F.col("arr_ts").isNotNull()))
        # a row is a DELTA when its overall min beats (or lacks) a
        # prior-state min; the delta count AND the extendable-delta count
        # — the loop terminators — ride the checkpoint's materialization
        # job via observe() (r15), replacing the separate
        # frontier.isEmpty() job per round; an all-dead delta exits
        # without paying the convergence round's extension join.
        # __has_out__ is constant per node_id, so max() is exact.
        delta_cond = (F.col("arr_ts").isNotNull()
                      & (F.col("__old_ts__").isNull()
                         | (F.col("arr_ts") < F.col("__old_ts__"))))
        agg, m = checkpoint_with_metrics(
            best.withColumn("__old__", F.lit(True)).unionByName(ext_raw)
                .groupBy("node_id", "anc")
                .agg(F.min("arr_ts").alias("arr_ts"),
                     F.min(F.when(F.col("__old__"), F.col("arr_ts")))
                     .alias("__old_ts__"),
                     F.max("__has_out__").alias("__has_out__")),
            {"d": F.count(F.when(delta_cond, 1)),
             "live": F.count(F.when(delta_cond & F.col("__has_out__"), 1))})
        best = agg.select("node_id", "anc", "arr_ts", "__has_out__")
        if m["d"] == 0 or m["live"] == 0:
            break
        frontier = (agg.where(delta_cond & F.col("__has_out__"))
                    .select("node_id", "anc", "arr_ts"))
    out = best.select("node_id", F.col("anc").alias("ancestor"), "arr_ts")
    if vdict is not None:
        out = _decode_vcol(_decode_vcol(out, vdict, "node_id", vsmall),
                           vdict, "ancestor", vsmall)
    return OmigoDF(out)


def merge_similar_nodes(edges, src_col: str = "src", dst_col: str = "dst") -> OmigoDF:
    """Collapse equivalent leaf nodes: leaves (no outgoing edges) with the
    same sorted parent set merge into one representative (minimum id) —
    the working core of the reference's merge_similar_nodes_reference
    (graph_traversal.py:344-444, whose own impl has undefined vars).
    Returns the edge table with merged leaf destinations, deduped.

    The representative per parent-signature comes from a
    partial-aggregated groupBy(psig) min joined back on psig (r13 —
    previously a window min over psig: a window partition cannot be
    split, so a hot signature, e.g. a botnet-style fan-out of a million
    identical-sibling leaves, landed its whole group in ONE task; the
    groupBy census is map-side combined and the join-back is
    AQE-splittable/broadcastable). The per-leaf frame is
    localCheckpointed so the join's two sides read materialized blocks
    instead of re-evaluating the leaves->parents subtree.

    psig is the sorted parent ARRAY itself, not a ','-joined string:
    a delimiter join makes parent sets {"a,b"} and {"a","b"} collide
    and wrongly merge unrelated leaves (the generate_key_hash NULL-skip
    collision class, r10 review); Spark hash-partitions and compares
    array<string> natively, so the grouping needs no serialized key at
    all."""
    # the edge table is referenced four times (source probe, leaf
    # detection, parent signatures, final remap) with different
    # projections — no exchange reuse is possible, so without a barrier
    # the plan scans the input four times (measured: 4 parquet scans)
    e = _df(edges).localCheckpoint()
    srcs = e.select(qcol(src_col).alias("n")).distinct()
    # qcol, not e[dst_col]: DataFrame.__getitem__ PARSES the name, so a
    # lone backtick or a dot in dst_col raises INVALID_ATTRIBUTE_NAME_SYNTAX
    # / misresolves as a nested field (r15 parity-hunt find on the widened
    # hostile-name corpus); every reference below quotes instead
    leaves = (e.join(srcs, qcol(dst_col) == F.col("n"), "left_anti")
              .select(qcol(dst_col).alias("leaf")).distinct())
    parents = (e.join(leaves, qcol(dst_col) == F.col("leaf"))
               .groupBy("leaf")
               .agg(F.array_sort(
                   F.collect_set(qcol(src_col).cast("string"))).alias("psig"))
               .localCheckpoint())
    reps = parents.groupBy("psig").agg(F.min("leaf").alias("rep"))
    remap = parents.join(reps, on="psig").select("leaf", "rep")
    out = (e.join(remap, qcol(dst_col) == F.col("leaf"), "left")
           .withColumn(dst_col, F.coalesce(F.col("rep"), qcol(dst_col)))
           .drop("leaf", "rep")
           .select(*[qcol(c) for c in e.columns]).distinct())
    return OmigoDF(out)


def remove_cycles(edges, ts_col: str, src_col: str = "src",
                  dst_col: str = "dst") -> OmigoDF:
    """Drop back-edges that violate temporal ordering: an edge survives iff
    its timestamp is >= the earliest timestamp at which its source was
    itself reached (seeds — sources that are never destinations — always
    emit). Time-ordered DAG extraction (reference
    graph_traversal.py:288-342)."""
    e = _df(edges)
    first_seen = e.groupBy(qcol(dst_col).alias("__node__")).agg(
        F.min(qcol(ts_col)).alias("__first_ts__"))
    out = (e.join(first_seen, qcol(src_col) == F.col("__node__"), "left")
            .where(F.col("__first_ts__").isNull()
                   | (qcol(ts_col) >= F.col("__first_ts__")))
            .select(*[qcol(c) for c in e.columns]))
    return OmigoDF(out)


# ---------------------------------------------------------------------
# Reference-named API (omigo_core/graph_traversal.py) — thin wrappers over
# the operators above, keeping the original entry-point names.
# ---------------------------------------------------------------------
def get_bfs_levels(edf, vertex_ids, reverse_first: bool = False,
                   src_col: str = "src", dst_col: str = "dst",
                   max_iter: int = 30) -> OmigoDF:
    """BFS level assignment from seed vertices, expanding forward AND
    reverse (reference graph_traversal.py:7-78 walks one direction, then
    the other; `reverse_first` flips the order, which only affects ties —
    we keep the minimum level per node, matching its first-win rule)."""
    # EAGER checkpoint on the shared projection: both traversal threads
    # below read it, so its one materialization must finish before they
    # start (the analysis_job pattern) — and it also halves the caller-
    # lineage scans (each bfs_levels used to re-execute the caller's
    # edge construction for its own entry checkpoint).
    e = (_df(edf).select(qcol(src_col).alias(src_col),
                         qcol(dst_col).alias(dst_col))
         .localCheckpoint())
    # qcol, not F.col: the checkpointed frame's columns are literally
    # NAMED src_col/dst_col, so dotted hostile names (src_col='src.x')
    # must be quoted here too (r14 ADVICE — bare F.col regressed the
    # r13 hostile-name guarantee with an AnalysisException)
    er = e.select(qcol(dst_col).alias(src_col),
                  qcol(src_col).alias(dst_col))
    first, second = (er, e) if reverse_first else (e, er)
    # r14 (guide §2.6 concurrent jobs): the two directions' iterative
    # driver loops are independent given the checkpointed edge set, and
    # min-union makes the result order-insensitive — overlap them from a
    # 2-thread pool so one loop's convergence-tail tasks back-fill the
    # executors the other frees (sf0.1 edge DAG A/B alternation,
    # 3-pass-min per session: 4.0/4.4/5.8 s threaded vs 5.4/6.3 s
    # sequential — −25 % best-of-passes; same pattern and safety
    # argument as analysis_job).
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.util import inheritable_thread_target

    # inheritable_thread_target (r14 ADVICE): jobs submitted from the
    # pool threads inherit the caller's Spark local properties (job
    # group/description, scheduler pool) and tags, so caller-side
    # cancellation and job accounting see the loop's jobs
    _inherit = inheritable_thread_target(e.sparkSession)
    with ThreadPoolExecutor(max_workers=2) as pool:
        # _entry_barrier=False: e/er are projections of the shared entry
        # checkpoint above — no redundant per-direction edge copy (r15)
        f1 = pool.submit(_inherit(
            lambda: bfs_levels(first, vertex_ids, src_col,
                               dst_col, max_iter,
                               _entry_barrier=False).df))
        f2 = pool.submit(_inherit(
            lambda: bfs_levels(second, vertex_ids, src_col,
                               dst_col, max_iter,
                               _entry_barrier=False).df))
        l1, l2 = f1.result(), f2.result()
    out = (l1.unionByName(l2).groupBy("node_id")
           .agg(F.min("level").alias("level")))
    return OmigoDF(out)


def get_forward_edges_only(edf, prefix: str = "fwd", src_col: str = "src",
                           dst_col: str = "dst", max_iter: int = 30) -> OmigoDF:
    """Per-vertex ancestor summary of the DAG: (node_id,
    <prefix>:ancestors) where ancestors is the sorted uniq ','-merge of
    the transitive ancestor closure (reference graph_traversal.py:80-171
    emits src_paths/all_paths/ancestors columns; the ancestor set is the
    load-bearing one — paths are its expansions)."""
    anc = ancestors(edf, src_col, dst_col, max_iter).df
    out = (anc.groupBy("node_id")
           .agg(F.concat_ws(",", F.array_sort(
               F.collect_set(F.col("ancestor").cast("string"))))
               .alias(f"{prefix}:ancestors")))
    return OmigoDF(out)


def get_time_based_forward_edges_only(edf, ts_col: str = "ts",
                                      prefix: str = "fwd",
                                      src_col: str = "src", dst_col: str = "dst",
                                      max_iter: int = 30) -> OmigoDF:
    """Time-ordered variant of get_forward_edges_only (reference
    graph_traversal.py:173-212): only ancestors reachable along
    non-decreasing-timestamp paths count."""
    anc = time_ordered_ancestors(edf, ts_col, src_col, dst_col, max_iter).df
    out = (anc.groupBy("node_id")
           .agg(F.concat_ws(",", F.array_sort(
               F.collect_set(F.col("ancestor").cast("string"))))
               .alias(f"{prefix}:ancestors")))
    return OmigoDF(out)


def merge_similar_nodes_reference(edges, src_col: str = "src",
                                  dst_col: str = "dst") -> OmigoDF:
    """Reference-named alias of merge_similar_nodes (the reference's own
    body is non-executable — undefined `prop_col` etc.,
    graph_traversal.py:369 — so both names run the working operator)."""
    return merge_similar_nodes(edges, src_col, dst_col)


def split_graph_filter_func(src, tgt, ts, retain_vertex_ids,
                            retain_vertex_annotations,
                            retain_node_filter_func) -> bool:
    """Row-level edge predicate for splitting a graph around retained
    ("detection") vertices (reference graph_traversal.py:446-484): keep
    special nodes, keep edges not touching the retained set, keep edges
    between two retained vertices, and otherwise keep only edges whose
    timestamp falls on the correct side of the retained vertex's
    [ts_min, ts_max] annotation window. Plain Python — usable directly in
    OmigoDF.filter(['src','dst','ts'], ...)."""
    if retain_node_filter_func(src) or retain_node_filter_func(tgt):
        return True
    in_src = src in retain_vertex_ids
    in_tgt = tgt in retain_vertex_ids
    if not in_src and not in_tgt:
        return True
    if in_src and in_tgt:
        return True
    if in_tgt:
        ann = retain_vertex_annotations.get(tgt)
        if ann is not None and int(ts) > int(ann[1]):
            return False
        return True
    ann = retain_vertex_annotations.get(src)
    if ann is not None and int(ts) < int(ann[0]):
        return False
    return True


def apply_time_order_based_filter(vdf, edf, retain_vertex_ids,
                                  strict_ordering_flag: bool = False,
                                  src_col: str = "src", dst_col: str = "dst",
                                  ts_col: str = "ts"):
    """Prune edge pairs around retained vertices that violate temporal
    ordering (reference graph_traversal.py:486-547; its body references
    undefined symbols, so semantics are reconstructed from its decision
    template __apply_time_order_based_filter_template__): for consecutive
    edges l=(a->b), r=(b->c) where min_ts(l) > max_ts(r) for every
    occurrence (order infeasible), exclude r if l touches a retained
    vertex, l if r does, r under strict ordering, and the edge with the
    infeasible flag otherwise. Returns (vdf', edf')."""
    e = _df(edf)
    mm = (e.groupBy(qcol(src_col), qcol(dst_col))
          .agg(F.min(qcol(ts_col).cast("long")).alias("ts_min"),
               F.max(qcol(ts_col).cast("long")).alias("ts_max")))
    left = mm.select(qcol(src_col).alias("l_src"), qcol(dst_col).alias("l_dst"),
                     F.col("ts_min").alias("l_min"))
    right = mm.select(qcol(src_col).alias("r_src"), qcol(dst_col).alias("r_dst"),
                      F.col("ts_max").alias("r_max"))
    spark = e.sparkSession
    rv = spark.createDataFrame([(str(v),) for v in retain_vertex_ids] or
                               [("",)], ["node_id"]).where("node_id != ''")
    pairs = (left.join(right, left["l_dst"] == right["r_src"])
             .withColumn("feasible", (F.col("l_min") <= F.col("r_max")).cast("int")))
    bad = pairs.where("feasible = 0")
    ldet = (bad.join(rv.withColumnRenamed("node_id", "l_src"), "l_src", "left_semi")
            .unionByName(bad.join(rv.withColumnRenamed("node_id", "l_dst"),
                                  "l_dst", "left_semi").select(bad.columns))
            .select(bad.columns).distinct().withColumn("l_det", F.lit(1)))
    if strict_ordering_flag:
        excl = bad.select(F.col("r_src").alias(src_col),
                          F.col("r_dst").alias(dst_col)).distinct()
    else:
        tagged = bad.join(ldet.select("l_src", "l_dst", "r_src", "r_dst", "l_det"),
                          ["l_src", "l_dst", "r_src", "r_dst"], "left")
        excl_r = (tagged.where("l_det = 1")
                  .select(F.col("r_src").alias(src_col),
                          F.col("r_dst").alias(dst_col)))
        excl_l = (tagged.where("l_det IS NULL")
                  .select(F.col("l_src").alias(src_col),
                          F.col("l_dst").alias(dst_col)))
        excl = excl_r.unionByName(excl_l).distinct()
    e2 = e.join(excl, [src_col, dst_col], "left_anti")
    v = _df(vdf)
    keep_nodes = (e2.select(qcol(src_col).alias("node_id"))
                  .unionByName(e2.select(qcol(dst_col).alias("node_id"))).distinct())
    v2 = v.join(keep_nodes, "node_id", "left_semi")
    return OmigoDF(v2), OmigoDF(e2)


def analysis_job(edges, ts_col: str, keep_vertices, seed_vertices,
                 src_col: str = "src", dst_col: str = "dst",
                 prune_max_iter: int = 3, max_iter: int = 30,
                 encode_vertices: bool = False) -> OmigoDF:
    """The matel graph-analysis batch flow as one composition (reference
    projects/matel/graph-analysis GraphAnalysis.scala:750-876 RunQuery:
    load → clean → traverse → summarize), built from the audited
    operators:

      1. remove_dangling_edges(keep_vertices, prune_max_iter)
      2. remove_cycles(ts_col)
      3. distinct (src, dst) — checkpointed once so the two traversals
         below don't re-run the cleaning
      4. bfs_levels(seed_vertices) + ancestors(), joined to a per-node
         summary: (node_id, level, n_ancestors, ancestors) with the
         sorted ','-merged ancestor column get_forward_edges_only uses.

    Scale: each stage is the individually-audited operator; the
    composition itself adds one distinct and two node-sized joins.
    ``encode_vertices`` forwards to both traversals (see _vertex_dict —
    worth it on guid-keyed deep graphs, not on short synthetic ids)."""
    e0 = OmigoDF(_df(edges))
    pruned = remove_dangling_edges(e0, keep_vertices, src_col, dst_col,
                                   max_iter=prune_max_iter)
    dag = remove_cycles(pruned, ts_col, src_col, dst_col)
    # EAGER checkpoint on purpose: both traversal threads below read it,
    # so it must be materialized before they race (one job either way)
    ed = OmigoDF(dag.df.select(qcol(src_col), qcol(dst_col)).distinct().localCheckpoint())
    # The two traversals are independent (both read only the checkpointed
    # `ed`): overlap their per-round driver loops from a 2-thread pool so
    # one traversal's convergence-tail tasks back-fill executors the other
    # frees (guide-standard concurrent-jobs pattern; Spark's scheduler
    # runs jobs from several driver threads FIFO). Each loop's jobs are
    # tiny at any scale — the win is scheduling overlap, not parallelism
    # of data work, and results are unchanged (both plans are
    # deterministic functions of the materialized `ed`).
    from concurrent.futures import ThreadPoolExecutor

    def _lv():
        # _entry_barrier=False: `ed` is already a materialized checkpoint,
        # so the operators skip their redundant entry edge copy (r15)
        return bfs_levels(ed, seed_vertices, src_col, dst_col, max_iter,
                          encode_vertices=encode_vertices,
                          _entry_barrier=False).df

    def _anc():
        return (ancestors(ed, src_col, dst_col, max_iter,
                          encode_vertices=encode_vertices,
                          _entry_barrier=False).df
                .groupBy("node_id")
                .agg(F.count(F.lit(1)).cast("long").alias("n_ancestors"),
                     F.concat_ws(",", F.array_sort(F.collect_set("ancestor")))
                     .alias("ancestors")))

    from pyspark.util import inheritable_thread_target

    _inherit = inheritable_thread_target(ed.df.sparkSession)
    with ThreadPoolExecutor(max_workers=2) as pool:
        # inheritable_thread_target (r14 ADVICE): the loops' jobs keep
        # the caller's job group/description for cancellation/accounting
        lv_f = pool.submit(_inherit(_lv))
        anc_f = pool.submit(_inherit(_anc))
        lv, anc_agg = lv_f.result(), anc_f.result()
    nodes = (ed.df.select(qcol(src_col).alias("node_id"))
             .unionByName(ed.df.select(qcol(dst_col).alias("node_id")))
             .distinct())
    out = (nodes.join(lv, "node_id", "left")
           .join(anc_agg, "node_id", "left")
           .selectExpr("node_id", "CAST(level AS INT) AS level",
                       "COALESCE(n_ancestors, 0L) AS n_ancestors",
                       "COALESCE(ancestors, '') AS ancestors"))
    return OmigoDF(out)


def parent_hierarchy(edges, levels: int = 6, child_col: str = "child",
                     parent_col: str = "parent") -> OmigoDF:
    """Flatten parent pointers into per-node ancestor columns
    (node_id, parent_1 .. parent_<levels>) — the reference trends job's
    createHierarchy step (TrendsAnalysis.scala:240-390), which builds
    bounded parent chains with RDD groupByKey joins; here it is
    ``levels`` chained equi-joins against one deduplicated parent map.

    A node with several recorded parents takes the MIN parent id
    (deterministic canonical chain — the reference's process trees have
    single parents, this guards malformed input). Chains shorter than
    ``levels`` pad with nulls; cycles are naturally truncated at
    ``levels``.

    Scale: the parent map is (node, parent) — vertex-sized, far smaller
    than the event table the reference re-keys per level; each level is
    one shuffle on the chain head, ``levels`` is a small constant, and
    AQE broadcasts the map when it fits."""
    e = _df(edges)
    # the parent map joins back once per level: checkpoint it so each
    # level reads the vertex-sized map instead of re-scanning (and
    # re-aggregating) the edge table `levels` times
    pmap = (e.select(qcol(child_col).alias("__c__"),
                     qcol(parent_col).alias("__p__"))
            .where(qcol(child_col).isNotNull())
            .groupBy("__c__").agg(F.min("__p__").alias("__p__"))
            ).localCheckpoint()
    out = pmap.select(F.col("__c__").alias("node_id"),
                      F.col("__p__").alias("parent_1"))
    for i in range(2, levels + 1):
        prev = f"parent_{i - 1}"
        step = pmap.select(F.col("__c__").alias(prev),
                           F.col("__p__").alias(f"parent_{i}"))
        out = out.join(step, prev, "left")
    return OmigoDF(out.select("node_id",
                              *[f"parent_{i}" for i in range(1, levels + 1)]))
