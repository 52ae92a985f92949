"""Oracle-SQL dtype lint: every oracle_sql() entry is executed in DuckDB
at sf0.001 and its Arrow schema inspected for HUGEINT-shaped columns.

DuckDB's SUM over any integer type (windowed or grouped) yields HUGEINT,
which Arrow exports as decimal128(38,0) and pandas renders as float64 —
while the matching Spark aggregate stays BIGINT/int64. That one dtype
drift caused every oracle hash failure to date (r01 ×2, r04 ×2:
sessionize, merge_intervals_islands); the guard is ``CAST(... AS
BIGINT)`` around the projected sum. This lint fails on any projected
scale-0 decimal so the drift is caught at test time, not by the driver
gate. (No Spark session needed — DuckDB only, so the whole sweep is
cheap.)
"""

import os

import duckdb
import pyarrow as pa
import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(p):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return c


@pytest.mark.parametrize("name", sorted(entry.oracle_sql()))
def test_oracle_projects_no_hugeint(con, name):
    sql = entry.oracle_sql()[name]
    schema = con.execute(sql).arrow().schema
    bad = [f.name for f in schema
           if pa.types.is_decimal(f.type) and f.type.scale == 0]
    assert not bad, (
        f"oracle {name!r} projects HUGEINT-shaped column(s) {bad} "
        f"(decimal128 scale 0): DuckDB integer SUMs widen to HUGEINT -> "
        f"pandas float64, while Spark stays int64 -> driver hash "
        f"mismatch. Wrap the projection in CAST(... AS BIGINT).")


def test_registry_structure():
    """Structural invariants the driver gate depends on: the head block
    (everything above the 50-entry budget boundary comment) holds
    EXACTLY 50 entries and leads the dict in source order, no registry
    key is defined twice (a duplicate dict key silently drops the first
    definition), every query has an oracle, and no oracle is orphaned."""
    import re

    src = open(os.path.join(os.path.dirname(os.path.abspath(
        entry.__file__)), "__spark_entry__.py")).read()
    i = src.index("def queries()")
    j = src.index("50-entry budget boundary", i)
    head = re.findall(r'"([a-z0-9_]+)": q_', src[i:j])
    assert len(head) == 50, f"budget head has {len(head)} entries, not 50"
    qs = entry.queries()
    assert list(qs)[:50] == head
    allsrc = re.findall(r'"([a-z0-9_]+)": q_',
                        src[i:src.index("def oracle_sql")])
    dupes = [k for k in set(allsrc) if allsrc.count(k) > 1]
    assert not dupes, f"duplicate registry keys: {dupes}"
    assert len(qs) == len(allsrc)
    oracles = entry.oracle_sql()
    assert not set(qs) - set(oracles), "query without oracle"
    assert not set(oracles) - set(qs), "orphaned oracle"
