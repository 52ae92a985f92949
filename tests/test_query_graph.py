"""QueryGraph DSL tests (matel GraphAnalysis semantics) on hand-built
pillar tables."""

import pytest

from omigo_data_analytics_spark import OmigoDF
from omigo_data_analytics_spark.operators import query_graph as QG

T1_COLS = ["id1", "id2", "uuid", "node_id", "event_id", "ts"]
H_COLS = ["id1", "id2", "node_id", "parent_id", "event_id", "ts"]


def _tables(spark):
    t1 = spark.createDataFrame([
        ("h0", "d", "u1", "n1", "start proc alpha", 1000),
        ("h0", "d", "u2", "n2", "start proc beta", 2000),
        ("h1", "d", "u3", "n1", "start proc alpha", 1500),
    ], T1_COLS)
    hier = spark.createDataFrame([
        # children of n1 in h0
        ("h0", "d", "c1", "n1", "child one", 1100),
        ("h0", "d", "c2", "n1", "child two", 999_000_000),  # far future
        # child of n2 in h0
        ("h0", "d", "c3", "n2", "child three", 2100),
        # n1 child but other entity partition
        ("h1", "d", "c4", "n1", "child four", 1600),
        # grandchild: parent c1
        ("h0", "d", "g1", "c1", "grand one", 1200),
    ], H_COLS)
    return {"table1": t1, "hierarchy": hier}


def _run(spark, nodes, **gi_kwargs):
    gi = QG.QueryGraphInput(_tables(spark), **gi_kwargs)
    return QG.QueryGraph("t", nodes, gi).execute().df


def test_chain_joins_on_entity_and_mapped_parent(spark):
    """Child joins hierarchy.parent_id to prev node_id within (id1, id2);
    grandchild extends the chain one more hop."""
    nodes = [QG.Table1().as_("T"), QG.Hierarchy().as_("C1"),
             QG.Hierarchy().as_("C2")]
    rows = _run(spark, nodes).collect()
    # only chain: T(n1,h0) -> C1(c1) -> C2(g1)
    assert len(rows) == 1
    r = rows[0]
    assert (r["T_node_id"], r["C1_node_id"], r["C2_node_id"]) == ("n1", "c1", "g1")
    # current node's columns lead the select order (reference :524)
    cols = rows and _run(spark, [QG.Table1().as_("T"), QG.Hierarchy().as_("C1"),
                                 QG.Hierarchy().as_("C2")]).columns
    assert cols[:len(H_COLS)] == [f"C2_{c}" for c in H_COLS]


def test_self_filters_and_time_window(spark):
    """IN-set filter restricts the start node; time_window bounds
    cur.ts <= prev.ts + limit (upper bound only, like the reference)."""
    nodes = [QG.Table1().as_("T").add_filter("node_id", {"n1"}),
             QG.Hierarchy().as_("C1").time_window(1)]  # 60_000 ms
    got = {(r["T_id1"], r["C1_node_id"]) for r in _run(spark, nodes).collect()}
    # c2's far-future ts fails the window; c1 (h0) and c4 (h1) pass —
    # and c1@1100 also passes for T@1000 (no lower bound needed)
    assert got == {("h0", "c1"), ("h1", "c4")}


def test_word_filters(spark):
    """add_word_all_filter = every word present; add_word_any_filter =
    all words of at least one value present (exact, not hash-approx)."""
    nodes = [QG.Table1().as_("T").add_word_all_filter(
        "event_id", {"start", "alpha"})]
    got = {r["T_uuid"] for r in _run(spark, nodes).collect()}
    assert got == {"u1", "u3"}
    nodes = [QG.Table1().as_("T").add_word_any_filter(
        "event_id", {"proc beta", "nosuch"})]
    got = {r["T_uuid"] for r in _run(spark, nodes).collect()}
    assert got == {"u2"}


def test_min_group_size(spark):
    """Groups over (id1, id2, join keys) below the floor are dropped."""
    nodes = [QG.Table1().as_("T"),
             QG.Hierarchy().as_("C1").min_group_size(2)]
    # per (id1,id2,parent) group sizes: (h0,n1)->2 (c1,c2), (h0,n2)->1,
    # (h1,n1)->1 -> only the size-2 group survives
    got = {r["C1_node_id"] for r in _run(spark, nodes).collect()}
    assert got == {"c1", "c2"}


def test_context_equality_filter(spark):
    """Equality vs the most recent prior node providing the field; the
    provider's select list gains the key automatically."""
    nodes = [QG.Table1().as_("T"),
             QG.Hierarchy().as_("C1")
             .add_context_map_equality_filter("event_id")]
    g = QG.QueryGraph("t", nodes, QG.QueryGraphInput(_tables(spark)))
    g.build()
    assert nodes[1].context_equality_map == {"event_id": "T"}
    # no hierarchy event_id matches a table1 event_id -> empty
    assert g.execute().df.count() == 0


def test_sampling_batches_and_max_results(spark):
    """Depth-1 sampling iterates id1-prefix batches (base prefix 'h'
    + hex chars) and stops after max_results rows accumulate."""
    nodes = [QG.Table1().as_("T"), QG.Hierarchy().as_("C1")]
    gi = QG.QueryGraphInput(_tables(spark), sampling_depth=1, max_results=1,
                            batch_key="id1", id1_base_prefix="h")
    out = QG.QueryGraph("t", nodes, gi).execute().df
    # batch 'h0' yields 3 joined rows (c1, c2, c3) >= max_results=1, so
    # batch 'h1' (c4) is never executed
    got = {r["C1_node_id"] for r in out.collect()}
    assert got == {"c1", "c2", "c3"}


def test_annotation_time_range_join(spark):
    """Annotation-marked node joins prev_ts in [ts, ts_end)."""
    ann = QG.QueryNode(
        table_name="annot",
        default_select=["id1", "id2", "node_id", "ts", "ts_end"],
        supported_join_keys=["node_id"], default_join_keys=["node_id"],
        available_fields=[], markers={QG.ANNOTATION}, join_keys_map={})
    tables = _tables(spark)
    tables["annot"] = spark.createDataFrame(
        [("h0", "d", "n1", 900, 1100),     # contains T.ts=1000
         ("h0", "d", "n2", 2500, 2600)],   # misses T.ts=2000
        ["id1", "id2", "node_id", "ts", "ts_end"])
    nodes = [QG.Table1().as_("T"), ann.as_("A")]
    gi = QG.QueryGraphInput(tables)
    out = QG.QueryGraph("t", nodes, gi).execute().df
    got = {r["T_node_id"] for r in out.collect()}
    assert got == {"n1"}


def test_build_validations(spark):
    with pytest.raises(ValueError, match="sampling_depth"):
        QG.QueryGraphInput({}, sampling_depth=3)
    nodes = [QG.Table1(), QG.Table1()]  # duplicate names
    with pytest.raises(ValueError, match="unique"):
        QG.QueryGraph("t", nodes, QG.QueryGraphInput(_tables(spark))).build()
    with pytest.raises(KeyError, match="no table"):
        QG.QueryGraph("t", [QG.Table1().as_("T")],
                      QG.QueryGraphInput({})).execute()


def test_hostile_node_names_rejected(spark):
    """Node names become output column prefixes (<name>_<col>) and flow
    through parsed contexts — non-identifier names must raise loudly at
    as_()/build() instead of silently producing unaddressable columns
    (the r13 verdict's remaining hostile-name boundary)."""
    for bad in ["a.b", "a b", "a`b", "", "1a", "a-b"]:
        with pytest.raises(ValueError, match="identifier"):
            QG.Table1().as_(bad)
    # build() re-validates (covers table_name-derived names too)
    n = QG.Table1()
    n.name = "dotted.name"  # bypass as_()
    with pytest.raises(ValueError, match="identifier"):
        QG.QueryGraph("t", [n], QG.QueryGraphInput(_tables(spark))).build()
    # plain identifiers still work end-to-end
    nodes = [QG.Table1().as_("T_ok"), QG.Hierarchy().as_("C_1")]
    assert _run(spark, nodes).columns[0].startswith("C_1_")


def test_signature_prefilter_same_results_and_in_plan(spark):
    """With a persisted bloom signature declared, word filters prepend
    the subset test (visible in the plan as bitwise ops on the sig col)
    and results are unchanged — the bloom layer only over-approximates."""
    from omigo_data_analytics_spark.operators import search as SE

    t1 = OmigoDF(spark.createDataFrame([
        ("h0", "d", "u1", "n1", "malware dropper detected", 1000),
        ("h0", "d", "u2", "n2", "benign installer finished", 2000),
        ("h0", "d", "u3", "n3", "malware beacon detected", 3000),
    ], T1_COLS))
    with_sig = SE.add_search_signature(t1, col="event_id",
                                       new_col="search_bits").df
    tables = {"table1": with_sig}

    def _node(sig):
        n = (QG.Table1().as_("T")
             .add_word_all_filter("event_id", {"malware", "detected"}))
        if sig:
            n.set_signature("event_id", "search_bits")
        return n

    plain = {r["T_uuid"] for r in QG.QueryGraph(
        "t", [_node(False)], QG.QueryGraphInput(tables)).execute().df.collect()}
    node = _node(True)
    out = QG.QueryGraph("t", [node],
                        QG.QueryGraphInput(tables)).execute().df
    got = {r["T_uuid"] for r in out.collect()}
    assert got == plain == {"u1", "u3"}
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the subset test survives to the executed plan: bitwise element_at
    # probes (the optimizer may inline the lazy signature projection, so
    # assert on the probe shape, not the column name)
    assert "element_at" in plan
    plain_plan = QG.QueryGraph(
        "t", [_node(False)],
        QG.QueryGraphInput(tables)).execute().df._jdf.queryExecution()\
        .executedPlan().toString()
    assert "element_at" not in plain_plan


def test_driver_chain_pushdown_and_pruning(spark, sf_dir):
    """The bench chain's self-filter reaches the parquet scan (the
    event_type IN-filter survives through the pillar projection) and
    unused source columns (props) are pruned from every scan."""
    import __spark_entry__ as entry_mod

    df = entry_mod.q_query_graph_job(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    assert scans, plan
    assert any("event_type" in s and "purchase" in s for s in scans)
    assert not any("props" in s for s in scans)


def test_batch_key_validated(spark):
    with pytest.raises(ValueError, match="batch_key"):
        QG.QueryGraphInput(_tables(spark), batch_key="uuid")


def test_context_key_added_to_consumer_select(spark):
    """A custom pillar whose default_select lacks the context key still
    compiles: build() adds the key to BOTH provider and consumer."""
    slim = QG.QueryNode(
        table_name="hierarchy",
        default_select=["id1", "id2", "node_id", "parent_id", "ts"],
        supported_join_keys=["parent_id"], default_join_keys=["parent_id"],
        available_fields=[], markers={QG.NODE_AGENT},
        join_keys_map={"parent_id": "node_id"})
    nodes = [QG.Table1().as_("T"),
             slim.as_("C").add_context_map_equality_filter("event_id")]
    out = QG.QueryGraph("t", nodes,
                        QG.QueryGraphInput(_tables(spark))).execute().df
    assert "C_event_id" in out.columns
    assert out.count() == 0  # no matching event_ids in the fixtures
