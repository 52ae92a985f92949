"""Graphviz DOT export parity (reference omigo_ext/graphviz_ext.py:23-211:
``get_graphviz_data`` builds the DOT document as a string; ``plot_graph``
wraps it in ``graphviz.Source``).

Spark-first split: the reference collects every vertex and edge into
driver-side dicts (graphviz_ext.py:188-196 ``to_maps`` loops) and formats
rows in a Python loop — single-node by construction. Here the entire DOT
body is generated as a *distributed* line-per-row DataFrame
(:func:`dot_lines`): validation (duplicate vertex ids, edge endpoints
without vertex rows, vertices without edges) runs as aggregates and
semi/anti-joins, and each vertex/edge renders to its DOT line with pure
codegen string expressions — no Python in the hot path, no driver
materialization until the final (display-sized, guard-capped) collect in
:func:`get_graphviz_data`.

Deltas vs the reference, documented:
- Line order: the reference emits vertices/edges in dict-insertion order
  (nondeterministic across runs); we sort by (section, sort_key) so the
  document is deterministic and oracle-checkable.
- Duplicate (vertex id) / (src, dst) keys: the reference keeps the *last*
  map entry (graphviz_ext.py:189-196); we keep the lexicographically
  smallest rendered line (deterministic under any partitioning).
- ``style_func``: the reference default returns constant style/shape
  (graphviz_ext.py:11-20); we take a ``style_props`` dict rendered as
  literals. A per-row style callable would force row-at-a-time Python;
  instead pre-compute style columns with ``transform`` and pass their
  names via ``style_cols``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..core.colutils import qcol

from ..core.compat import warn
from ..core.dataframe import OmigoDF

#: graphviz_ext.py:11-20 __default_dot_style_func__
DEFAULT_STYLE_PROPS = {"style": "filled", "shape": "rectangle"}

#: guard cap for the driver-side document build (display op; a DOT file
#: beyond this is unrenderable anyway — same spirit as viz.py max_rows).
MAX_DOT_LINES = 50_000


def _kv_expr(col: str, show_key: bool, max_len: int | None):
    """One ``[k = v]`` / ``[v]`` attribute chunk (graphviz_ext.py:52-72):
    NULL when the value is empty, truncated to max_len with ``...``."""
    v = F.coalesce(qcol(col).cast("string"), F.lit(""))
    kv = (F.concat(F.lit(f"[{col} = "), v, F.lit("]")) if show_key
          else F.concat(F.lit("["), v, F.lit("]")))
    if max_len is not None:
        if max_len > 3:
            kv = F.when(F.length(kv) > max_len,
                        F.concat(F.substring(kv, 1, max_len - 3), F.lit("..."))
                        ).otherwise(kv)
        else:
            kv = F.substring(kv, 1, max_len)
    return F.when(v != "", kv)        # NULL → filtered out of the label


def dot_lines(vdf: OmigoDF, edf: OmigoDF, vertex_id_col: str,
              src_col: str, dst_col: str, *,
              vertex_display_id_col: str | None = None,
              node_props: list[str] | None = None,
              edge_props: list[str] | None = None,
              display_vertex_keys: list[str] | None = None,
              display_edge_keys: list[str] | None = None,
              max_len: int | None = None,
              create_missing_vertices: bool = False,
              style_props: dict | None = None,
              style_cols: list[str] | None = None,
              validate: bool = True) -> OmigoDF:
    """Distributed DOT document: one row per line, ordered by
    ``(section, sort_key)`` — section 0 header, 1 vertices, 2 separator,
    3 edges, 4 footer. graphviz_ext.py:23-138 semantics, codegen strings.

    100 TB note: line rendering is map-side; the only shuffles are the
    two distinct/dedup aggs and (when validating or repairing) endpoint
    semi/anti-joins on the vertex-id key — all key-sized, never
    payload-sized. The vertex set is broadcast into the edge-repair join
    only by AQE's own decision (it can be large).
    """
    if vertex_display_id_col is None:
        vertex_display_id_col = vertex_id_col
    sp = DEFAULT_STYLE_PROPS if style_props is None else style_props

    v = vdf.df
    e = edf.df
    vid = qcol(vertex_id_col).cast("string")
    src = qcol(src_col).cast("string")
    dst = qcol(dst_col).cast("string")

    if validate:
        # graphviz_ext.py:148-175 — duplicate vertex ids, edge endpoints
        # with no vertex row, vertices with no edges. Aggregates +
        # distinct-key joins only; warnings, not errors (parity).
        n_rows, n_ids = v.select(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(vid).alias("k")).collect()[0]
        if n_rows != n_ids:
            warn(f"dot_lines: vertex frame is not unique on "
                 f"'{vertex_id_col}' ({n_rows} rows, {n_ids} ids)")
        ep = (e.select(src.alias("_id")).unionByName(
              e.select(dst.alias("_id"))).distinct())
        vids = v.select(vid.alias("_id")).distinct()
        n_missing = ep.join(vids, "_id", "left_anti").count()
        if n_missing:
            warn(f"dot_lines: {n_missing} edge endpoint ids have no "
                 f"vertex row")
        n_no_edge = vids.join(ep, "_id", "left_anti").count()
        if n_no_edge:
            warn(f"dot_lines: {n_no_edge} vertices have no edges")
    else:
        n_missing = None

    # graphviz_ext.py:177-186 — repair: either materialize bare vertices
    # for unknown endpoints, or drop edges touching them.
    if n_missing is None or n_missing:
        ep = (e.select(src.alias("_id")).unionByName(
              e.select(dst.alias("_id"))).distinct())
        vids = v.select(vid.alias("_id")).distinct()
        if create_missing_vertices:
            missing = ep.join(vids, "_id", "left_anti")
            bare = missing.select(F.col("_id").alias(vertex_id_col))
            for c in v.columns:
                if c != vertex_id_col:
                    bare = bare.withColumn(c, F.lit(None).cast(
                        dict(v.dtypes)[c]))
            v = v.unionByName(bare.select(v.columns))
        else:
            # keep only edges whose BOTH endpoints have a vertex row
            # (graphviz_ext.py:184-186 values_not_in(missing) ≡ in vids)
            e = (e.join(vids.withColumnRenamed("_id", "__src_ok"),
                        src == F.col("__src_ok"), "left_semi")
                  .join(vids.withColumnRenamed("_id", "__dst_ok"),
                        dst == F.col("__dst_ok"), "left_semi"))

    # ---- vertex lines (graphviz_ext.py:35-80) ----
    disp = F.coalesce(qcol(vertex_display_id_col).cast("string"), F.lit(""))
    disp = F.when(disp == "", vid).otherwise(disp)  # empty → fallback to id
    parts = [disp]
    for p in (node_props or []):
        parts.append(_kv_expr(
            p, display_vertex_keys is None or p in display_vertex_keys,
            max_len))
    label = F.array_join(F.filter(F.array(*parts),
                                  lambda x: x.isNotNull()), "\n")
    style_bits = [qcol(c).cast("string") for c in (style_cols or [])]
    style_str = ", ".join(f'"{k}" = "{x}"' for k, x in sp.items())
    style_expr = (F.concat_ws(", ", *style_bits, F.lit(style_str))
                  if style_bits else F.lit(style_str))
    vline = F.concat(F.lit('    "'), vid, F.lit('" ["label" = "'), label,
                     F.lit('", '), style_expr, F.lit(" ]"))
    # a NULL id would make the whole concat NULL and break the final
    # '\n'.join — filter like the empty-string edge endpoints below
    vrows = (v.select(vid.alias("sort_key"), vline.alias("line"))
              .where(F.col("sort_key").isNotNull())
              .groupBy("sort_key").agg(F.min("line").alias("line"))
              .select(F.lit(1).alias("section"), "sort_key", "line"))

    # ---- edge lines (graphviz_ext.py:82-128) ----
    e = e.where((src != "") & (dst != ""))
    eparts = [_kv_expr(p, display_edge_keys is None or p in display_edge_keys,
                       max_len) for p in (edge_props or [])]
    base = F.concat(F.lit('    "'), src, F.lit('" -> "'), dst, F.lit('"'))
    if eparts:
        elabel = F.array_join(F.filter(F.array(*eparts),
                                       lambda x: x.isNotNull()), "\n")
        eline = F.when(elabel != "", F.concat(
            base, F.lit(' [ label = "'), elabel, F.lit('" ]'))).otherwise(base)
    else:
        eline = base
    erows = (e.select(F.concat(src, F.lit("\x1f"), dst).alias("sort_key"),
                      eline.alias("line"))
              .groupBy("sort_key").agg(F.min("line").alias("line"))
              .select(F.lit(3).alias("section"), "sort_key", "line"))

    spark = v.sparkSession
    frame = spark.createDataFrame(
        [(0, "", "digraph G {"), (2, "", ""), (4, "", "}")],
        "section int, sort_key string, line string")
    return OmigoDF(frame.unionByName(vrows).unionByName(erows))


def get_graphviz_data(vdf: OmigoDF, edf: OmigoDF, vertex_id_col: str,
                      src_edge_col: str, dest_edge_col: str,
                      max_lines: int = MAX_DOT_LINES, **kw) -> str:
    """The reference's string entry point (graphviz_ext.py:140-200):
    the full DOT document. Driver-side by definition (it's a file/render
    payload); guard-capped at ``max_lines`` like the viz family."""
    rows = (dot_lines(vdf, edf, vertex_id_col, src_edge_col,
                      dest_edge_col, **kw)
            .df.orderBy("section", "sort_key").take(max_lines + 1))
    if len(rows) > max_lines:
        raise ValueError(
            f"get_graphviz_data: document exceeds {max_lines} lines; a "
            f"DOT render of this size is not useful — filter the graph "
            f"or raise max_lines")
    return "\n".join(r["line"] for r in rows)


def plot_graph(vdf: OmigoDF, edf: OmigoDF, vertex_id_col: str,
               src_edge_col: str, dest_edge_col: str, **kw):
    """graphviz_ext.py:202-210 — render via the graphviz binding.
    Import-gated: the library is absent in this environment."""
    dot = get_graphviz_data(vdf, edf, vertex_id_col, src_edge_col,
                            dest_edge_col, **kw)
    try:
        import graphviz  # noqa: F401
    except ImportError as ex:
        raise ImportError(
            "plot_graph needs the 'graphviz' package; use "
            "get_graphviz_data() for the DOT source") from ex
    return graphviz.Source(dot)
