"""Sankey diagram parity (reference omigo_ext/plotly_ext.py:13-33
``get_sankey_figure``: takes a pre-built {label, source, target, value}
map and renders a plotly Sankey).

The reference ships only the render half and leaves the data shaping to
the caller. Spark-first, the shaping IS the interesting part at scale:
:func:`sankey_links` aggregates an edge stream into (source_idx,
target_idx, value) links with a dense label index — one partial-agg
shuffle on (src, dst) plus two broadcast joins against the (display-
sized, guard-capped) label vocabulary. :func:`sankey_data` collapses
that to the exact ``mp`` dict plotly_ext.py:27-30 consumes, and
:func:`get_sankey_figure` is the import-gated render.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..core.colutils import qcol

from ..core.dataframe import OmigoDF

#: a sankey beyond this many nodes is unreadable; same guard-cap spirit
#: as viz.py max_class_col.
MAX_LABELS = 10_000


def sankey_links(xdf: OmigoDF, src_col: str, dst_col: str,
                 value_col: str | None = None,
                 max_labels: int = MAX_LABELS) -> OmigoDF:
    """(label, source_idx, target_idx, value) link table.

    value_col=None counts rows; otherwise sums the column. Labels get a
    dense 0-based index by sorted label text (deterministic; the
    reference's dict is insertion-ordered and caller-defined).

    100 TB note: the edge aggregation is a partial-agg shuffle on
    (src, dst); the label index is a row_number over the distinct label
    set — display-sized by definition and guard-capped at ``max_labels``,
    so the single-partition window is bounded, and the index joins back
    onto the links as broadcasts.
    """
    df = xdf.df
    src = qcol(src_col).cast("string").alias("src_label")
    dst = qcol(dst_col).cast("string").alias("dst_label")
    agg = (F.count(F.lit(1)) if value_col is None
           else F.sum(qcol(value_col))).alias("value")
    proj = [src, dst] + ([qcol(value_col)] if value_col else [])
    # NULL endpoints are dropped up front: row_number gives a NULL label
    # index 0, but its links never survive the equi-joins and sankey_data
    # omits None from the label list — every index would be off by one
    links = (df.select(*proj)
             .where(F.col("src_label").isNotNull()
                    & F.col("dst_label").isNotNull())
             .groupBy("src_label", "dst_label").agg(agg))

    labels = (links.select(F.col("src_label").alias("label"))
              .unionByName(links.select(F.col("dst_label").alias("label")))
              .distinct())
    labels = labels.withColumn(
        "idx", F.row_number().over(Window.orderBy("label")) - F.lit(1))
    n = labels.count()
    if n > max_labels:
        raise ValueError(
            f"sankey_links: {n} distinct node labels (> {max_labels}); "
            f"a sankey of this size is unreadable — pre-aggregate")
    lab = F.broadcast(labels)
    return OmigoDF(
        links
        .join(lab.withColumnRenamed("label", "src_label")
                 .withColumnRenamed("idx", "source"), "src_label")
        .join(lab.withColumnRenamed("label", "dst_label")
                 .withColumnRenamed("idx", "target"), "dst_label")
        .select("src_label", "dst_label", "source", "target", "value"))


def sankey_data(xdf: OmigoDF, src_col: str, dst_col: str,
                value_col: str | None = None,
                max_labels: int = MAX_LABELS) -> dict:
    """The exact map plotly_ext.py:27-30 consumes:
    {label: [...], source: [...], target: [...], value: [...]}."""
    link_df = sankey_links(xdf, src_col, dst_col, value_col, max_labels)
    rows = link_df.df.orderBy("source", "target").collect()
    labels = sorted({r["src_label"] for r in rows}
                    | {r["dst_label"] for r in rows})
    return {"label": labels,
            "source": [r["source"] for r in rows],
            "target": [r["target"] for r in rows],
            "value": [r["value"] for r in rows]}


def get_sankey_figure(mp: dict, pad: int = 15, thickness: int = 20,
                      line_color: str = "black", line_width: float = 0.5,
                      title_text: str = "Basic Sankey", font_size: int = 10):
    """plotly_ext.py:13-33 — import-gated render (plotly absent here)."""
    try:
        import plotly.graph_objects as go
        import plotly.express as px
    except ImportError as ex:
        raise ImportError(
            "get_sankey_figure needs 'plotly'; sankey_data() returns the "
            "node/link map headless") from ex
    base = px.colors.qualitative.Vivid
    colors = [base[i % len(base)] for i in range(len(mp["label"]))]
    fig = go.Figure(data=[go.Sankey(
        node=dict(pad=pad, thickness=thickness,
                  line=dict(color=line_color, width=line_width),
                  label=mp["label"], color=colors),
        link=dict(source=mp["source"], target=mp["target"],
                  value=mp["value"]))])
    fig.update_layout(title_text=title_text, font_size=font_size)
    return fig
