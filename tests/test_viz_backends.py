"""DOT export, geomap projection, sankey data (reference graphviz_ext /
geomap_viz / plotly_ext parity — the data halves, render import-gated)."""

import math

import pytest
from pyspark.sql import functions as F

from omigo_data_analytics_spark import OmigoDF
from omigo_data_analytics_spark.operators import dot as D
from omigo_data_analytics_spark.operators import geomap as GM
from omigo_data_analytics_spark.operators import sankey as SK


@pytest.fixture(scope="module")
def small_graph(spark):
    v = OmigoDF(spark.createDataFrame(
        [("a", "Alpha", "svc"), ("b", "", "db"), ("c", "Gamma", "svc")],
        "id string, name string, kind string"))
    e = OmigoDF(spark.createDataFrame(
        [("a", "b", "writes"), ("b", "c", ""), ("a", "x", "dangling")],
        "src string, dst string, rel string"))
    return v, e


def test_dot_document_structure(small_graph):
    v, e = small_graph
    out = D.get_graphviz_data(v, e, "id", "src", "dst",
                              vertex_display_id_col="name",
                              node_props=["kind"], edge_props=["rel"],
                              validate=False)
    lines = out.split("\n")
    assert lines[0] == "digraph G {"
    assert lines[-1] == "}"
    # display fallback to id when display value empty (ref :43-45)
    assert '    "b" ["label" = "b\n[kind = db]", "style" = "filled", ' \
           '"shape" = "rectangle" ]' in out
    assert '    "a" ["label" = "Alpha\n[kind = svc]"' in out
    # edge with empty prop gets no label block (ref :89-125)
    assert '    "b" -> "c"' in out
    assert '"b" -> "c" [' not in out
    assert '    "a" -> "b" [ label = "[rel = writes]" ]' in out
    # dangling edge (x has no vertex) dropped when not creating vertices
    assert '"a" -> "x"' not in out


def test_dot_create_missing_vertices(small_graph):
    v, e = small_graph
    out = D.get_graphviz_data(v, e, "id", "src", "dst",
                              create_missing_vertices=True, validate=False)
    assert '    "x" ["label" = "x"' in out
    assert '    "a" -> "x"' in out


def test_dot_max_len_truncation(spark):
    v = OmigoDF(spark.createDataFrame(
        [("n1", "averylongpropertyvalue")], "id string, note string"))
    e = OmigoDF(spark.createDataFrame([("n1", "n1")], "src string, dst string"))
    out = D.get_graphviz_data(v, e, "id", "src", "dst",
                              node_props=["note"], max_len=12,
                              validate=False)
    assert "[note = a..." in out


def test_dot_value_no_keys_display(small_graph):
    v, e = small_graph
    out = D.get_graphviz_data(v, e, "id", "src", "dst",
                              node_props=["kind"],
                              display_vertex_keys=[], validate=False)
    assert '[svc]' in out and '[kind = svc]' not in out


def test_dot_guard_cap(small_graph):
    v, e = small_graph
    with pytest.raises(ValueError, match="exceeds"):
        D.get_graphviz_data(v, e, "id", "src", "dst", max_lines=3,
                            validate=False)


def test_mercator_matches_reference_formula(spark):
    # reference geomap_viz.py:16-25 __x_coord__, computed in python
    def ref_xy(lat, lon):
        r_major = 6378137.000
        x = r_major * math.radians(lon)
        scale = x / lon
        y = (180.0 / math.pi
             * math.log(math.tan(math.pi / 4.0
                                 + lat * (math.pi / 180.0) / 2.0)) * scale)
        return x, y

    pts = [(37.7749, -122.4194), (-33.8688, 151.2093), (51.5074, -0.1278)]
    df = OmigoDF(spark.createDataFrame(pts, "lat double, lon double"))
    out = GM.geomap_prepare(df, "lat", "lon").df.orderBy("lat").collect()
    exp = sorted((ref_xy(la, lo) for la, lo in pts),
                 key=lambda t: t[1])  # order rows by lat like the query
    got = sorted(((r["mercator_x"], r["mercator_y"]) for r in out))
    for (gx, gy), (ex, ey) in zip(got, sorted(exp)):
        assert gx == pytest.approx(ex, rel=1e-12)
        assert gy == pytest.approx(ey, rel=1e-12)


def test_geomap_prepare_filters_and_constants(spark):
    df = OmigoDF(spark.createDataFrame(
        [("10.0", "20.0"), ("0", "20.0"), ("", "5.0"), ("10.0", "20.0"),
         ("junk", "3.0")],
        "lat string, lon string"))
    out = GM.geomap_prepare(df, "lat", "lon").df.collect()
    assert len(out) == 1  # zero/empty/junk dropped, duplicates distinct'd
    r = out[0]
    assert r["circle_size"] == 15 and r["circle_alpha"] == 0.8


def test_geomap_spec_extents(spark):
    df = OmigoDF(spark.createDataFrame(
        [(10.0, 20.0), (-10.0, -20.0)], "lat double, lon double"))
    spec = GM.geomap_spec(df, "lat", "lon", use_fixed_layout=False)
    assert len(spec["points"]) == 2
    # margin rule: positive max *1.5, negative min *1.5 (ref :101-105)
    x_hi = GM.R_MAJOR * math.radians(20.0)
    assert spec["x_range"][1] == pytest.approx(1.5 * x_hi)
    assert spec["x_range"][0] == pytest.approx(-1.5 * x_hi)
    fixed = GM.geomap_spec(df, "lat", "lon", use_fixed_layout=True)
    assert fixed["x_range"][0] == pytest.approx(1.5 * GM.WORLD_EXTENT[0])


def test_geomap_plot_import_gated(spark):
    df = OmigoDF(spark.createDataFrame([(1.0, 2.0)], "lat double, lon double"))
    try:
        import bokeh  # noqa: F401
        pytest.skip("bokeh installed; gate not exercised")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="bokeh"):
        GM.geomap_plot(df, "lat", "lon")


def test_sankey_links_and_data(spark):
    df = OmigoDF(spark.createDataFrame(
        [("a", "x", 1.0), ("a", "x", 2.0), ("b", "y", 5.0), ("a", "y", 1.5)],
        "src string, dst string, v double"))
    mp = SK.sankey_data(df, "src", "dst", "v")
    assert mp["label"] == ["a", "b", "x", "y"]
    # links sorted by (source, target): (a->x 3.0), (a->y 1.5), (b->y 5.0)
    assert mp["source"] == [0, 0, 1]
    assert mp["target"] == [2, 3, 3]
    assert mp["value"] == [3.0, 1.5, 5.0]
    # count mode
    mp2 = SK.sankey_data(df, "src", "dst")
    assert mp2["value"] == [2, 1, 1]


def test_sankey_label_guard(spark):
    df = OmigoDF(spark.range(50).select(
        F.col("id").cast("string").alias("src"),
        (F.col("id") + 100).cast("string").alias("dst")))
    with pytest.raises(ValueError, match="labels"):
        SK.sankey_links(df, "src", "dst", max_labels=10)


def test_sankey_figure_import_gated():
    try:
        import plotly  # noqa: F401
        pytest.skip("plotly installed; gate not exercised")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="plotly"):
        SK.get_sankey_figure({"label": [], "source": [], "target": [],
                              "value": []})


def test_dot_document_partition_invariant(small_graph):
    """Same DOT document regardless of input partitioning (the dedup aggs
    and sorted collect must make the output deterministic)."""
    v, e = small_graph
    base = D.get_graphviz_data(v, e, "id", "src", "dst",
                               node_props=["kind"], validate=False)
    v7 = OmigoDF(v.df.repartition(7))
    e3 = OmigoDF(e.df.repartition(3, "dst"))
    assert D.get_graphviz_data(v7, e3, "id", "src", "dst",
                               node_props=["kind"], validate=False) == base


def test_sankey_data_partition_invariant(spark):
    df = spark.createDataFrame(
        [(f"s{i % 5}", f"t{i % 3}", float(i)) for i in range(200)],
        "src string, dst string, v double")
    a = SK.sankey_data(OmigoDF(df), "src", "dst", "v")
    b = SK.sankey_data(OmigoDF(df.repartition(13)), "src", "dst", "v")
    assert a == b


def test_sankey_links_broadcasts_label_index(spark):
    df = OmigoDF(spark.createDataFrame(
        [("a", "x", 1.0)], "src string, dst string, v double"))
    plan = SK.sankey_links(df, "src", "dst", "v").df._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_sankey_null_endpoints_dropped_and_indices_aligned(spark):
    from omigo_data_analytics_spark import OmigoDF
    from omigo_data_analytics_spark.operators import sankey as SK

    df = spark.createDataFrame(
        [(None, "a", 1.0), ("a", "b", 2.0)], ["s", "d", "v"])
    links = SK.sankey_links(OmigoDF(df), "s", "d", "v").df.collect()
    assert len(links) == 1
    r = links[0]
    assert (r["src_label"], r["dst_label"]) == ("a", "b")
    assert (r["source"], r["target"]) == (0, 1)  # 0-based over ['a','b']


def test_geomap_spec_empty_points_world_extent(spark):
    from omigo_data_analytics_spark import OmigoDF
    from omigo_data_analytics_spark.operators import geomap as GM

    df = spark.createDataFrame([(0.0, 0.0)], ["lat", "lon"])  # filtered out
    spec = GM.geomap_spec(OmigoDF(df), "lat", "lon", use_fixed_layout=False)
    assert spec["points"] == [] and spec["x_range"][0] < 0


def test_dot_lines_null_vertex_id_filtered(spark):
    from omigo_data_analytics_spark import OmigoDF
    from omigo_data_analytics_spark.operators import dot as DOT

    v = spark.createDataFrame([("a",), (None,)], ["id"])
    e = spark.createDataFrame([("a", "a")], ["src", "dst"])
    doc = DOT.get_graphviz_data(OmigoDF(v), OmigoDF(e), "id", "src", "dst")
    assert '"a"' in doc and "None" not in doc
