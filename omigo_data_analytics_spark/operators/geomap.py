"""Geo-map plotting parity (reference omigo_ext/geomap_viz.py:12-146
``GeoMapDF.geomap_plot``: filter/distinct lat-lon points, project to Web
Mercator, scatter on a bokeh map tile).

Spark-first split: everything data-shaped — the reference's prep chain
(select display cols, drop empty/zero lat-lon, distinct, constant point
styling, geomap_viz.py:38-48) and the Mercator projection itself
(geomap_viz.py:16-25 ``__x_coord__``) — runs as distributed codegen
column math; the reference instead converts to pandas and projects in a
Python list comprehension (geomap_viz.py:66-69), single-node by
construction. Only the bounded, plot-ready point set crosses the driver
boundary, guard-capped like the viz family. Rendering (bokeh map tiles,
geomap_viz.py:108-143) is import-gated; the returned spec carries
everything a render needs and is assertable headless.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ..core.colutils import qcol

from ..core.dataframe import OmigoDF

#: geomap_viz.py:21 — WGS84 semi-major axis used by the reference.
R_MAJOR = 6378137.000

#: geomap_viz.py:75 — fixed world-extent layout.
WORLD_EXTENT = (-13624971.673499351, 16832321.97793506,
                -4011071.4166808245, 6895498.946934601)

_MAX_POINTS = 10_000   # driver-side cap (same spirit as viz._MAX_POINTS)


def mercator_cols(lat, lon):
    """Web-Mercator (x, y) column expressions — geomap_viz.py:16-25
    ``__x_coord__`` exactly: x = R·radians(lon); y keeps the reference's
    ``scale = x / lon`` formulation (= R·π/180 for lon ≠ 0, which the
    caller's non-zero filter guarantees, as in the reference)."""
    x = F.lit(R_MAJOR) * F.radians(lon)
    scale = x / lon
    y = (F.lit(180.0 / math.pi)
         * F.log(F.tan(F.lit(math.pi / 4.0)
                       + lat * F.lit(math.pi / 180.0) / F.lit(2.0)))
         * scale)
    return x, y


def geomap_prepare(xdf: OmigoDF, lat_col: str, lon_col: str,
                   display_cols_mp: dict | None = None,
                   x_col: str = "mercator_x",
                   y_col: str = "mercator_y") -> OmigoDF:
    """The distributed half of ``geomap_plot`` (geomap_viz.py:38-69):
    select display+coordinate columns, drop empty/zero coordinates,
    distinct, add the constant point styling, project to Mercator.

    100 TB note: filters and the projection are map-side codegen; the
    single shuffle is the ``distinct`` on the (small) display column set
    — exactly the dedup the reference does driver-side.
    """
    display_cols_mp = dict(display_cols_mp or {})
    display_cols_mp.setdefault(lat_col, "Latitude")
    display_cols_mp.setdefault(lon_col, "Longitude")

    df = xdf.df.select(*[qcol(c) for c in display_cols_mp.keys()])
    lat = qcol(lat_col).try_cast("double")
    lon = qcol(lon_col).try_cast("double")
    # is_nonempty_str + is_nonzero_float ×2 (geomap_viz.py:41-45)
    df = df.where(lat.isNotNull() & lon.isNotNull()
                  & (lat != 0.0) & (lon != 0.0)).distinct()
    # geomap_viz.py:47-49 constant styling; :51-58 colon-safe renames
    # (bokeh tooltip syntax) are a rendering concern handled in the spec.
    x, y = mercator_cols(lat, lon)
    return OmigoDF(df.withColumn("circle_size", F.lit(15))
                     .withColumn("color_index", F.lit(0))
                     .withColumn("circle_alpha", F.lit(0.8))
                     .withColumn(x_col, x)
                     .withColumn(y_col, y))


def geomap_spec(xdf: OmigoDF, lat_col: str, lon_col: str,
                display_cols_mp: dict | None = None,
                use_fixed_layout: bool = True,
                max_points: int = _MAX_POINTS) -> dict:
    """Bounded plot spec: guard-capped points + axis ranges. The extent
    math (fixed world box or data min/max, then the ±50% margin rule,
    geomap_viz.py:71-105) runs on aggregates, not collected rows."""
    prepared = geomap_prepare(xdf, lat_col, lon_col, display_cols_mp)
    rows = prepared.df.take(max_points + 1)
    if len(rows) > max_points:
        raise ValueError(
            f"geomap_spec: more than {max_points} distinct points; "
            f"aggregate or sample before plotting")
    if use_fixed_layout:
        min_x, max_x, min_y, max_y = WORLD_EXTENT
    else:
        r = prepared.df.select(
            F.min("mercator_x"), F.max("mercator_x"),
            F.min("mercator_y"), F.max("mercator_y")).collect()[0]
        if r[0] is None:
            # no plottable points (all null/zero lat-lon): fall back to
            # the world extent instead of comparing None in the margin math
            min_x, max_x, min_y, max_y = WORLD_EXTENT
        else:
            min_x, max_x, min_y, max_y = r
    # geomap_viz.py:101-105 margin adjustment
    min_x = 0.5 * min_x if min_x >= 0 else 1.5 * min_x
    max_x = 1.5 * max_x if max_x >= 0 else 0.5 * max_x
    min_y = 0.5 * min_y if min_y >= 0 else 1.5 * min_y
    max_y = 1.5 * max_y if max_y >= 0 else 0.5 * max_y
    cols = [c.replace(":", "_") for c in prepared.df.columns]
    return {"kind": "geomap",
            "columns": cols,
            "points": [tuple(r) for r in rows],
            "x_range": [min_x, max_x], "y_range": [min_y, max_y]}


def geomap_plot(xdf: OmigoDF, lat_col: str, lon_col: str,
                display_cols_mp: dict | None = None, width: int = 1200,
                height: int = 430, use_fixed_layout: bool = True):
    """geomap_viz.py:27-146 — bokeh render, import-gated (bokeh is absent
    in this environment; use :func:`geomap_spec` for the computed data)."""
    spec = geomap_spec(xdf, lat_col, lon_col, display_cols_mp,
                       use_fixed_layout)
    try:
        from bokeh.plotting import figure, ColumnDataSource  # noqa: F401
    except ImportError as ex:
        raise ImportError(
            "geomap_plot needs 'bokeh'; geomap_spec() returns the "
            "plot-ready data headless") from ex
    cols = spec["columns"]
    data = {c: [p[i] for p in spec["points"]] for i, c in enumerate(cols)}
    p = figure(x_axis_type="mercator", y_axis_type="mercator",
               width=width, height=height,
               x_range=spec["x_range"], y_range=spec["y_range"])
    p.scatter(x="mercator_x", y="mercator_y", size=15, alpha=0.8,
              source=ColumnDataSource(data))
    return p
