"""SQL pushdown interface (reference omigo_ext/sql_helper.py:8-158 +
presto_ext/spark_ext): assemble SELECT ... FROM ... WHERE ... GROUP BY ...
HAVING ... ORDER BY ... LIMIT and execute.

On this engine the "external engine" IS Spark SQL — `execute_query` builds
the same statement shape the reference's HadoopSqlBase produced and runs
it through `spark.sql`, which parses/optimizes it in Catalyst. External
warehouses (Presto/Trino, JDBC) would plug in via `spark.read.jdbc`;
that transport is not available in this container.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..core.dataframe import OmigoDF


def _sel_pos(columns, gcol: str) -> int | None:
    """Reference effective-columns check (sql_helper.py:27-44): the
    1-based select position whose item equals the group column, comparing
    case-insensitively and ignoring an ``... AS alias`` suffix; None when
    not selected."""
    g = gcol.lower()
    for i, col in enumerate(columns):
        c = str(col).lower()
        idx = c.find(" as ")
        if idx != -1:
            c = c[:idx].strip()
        if c == g:
            return i + 1
    return None


def _col_selected(columns, gcol: str) -> bool:
    return _sel_pos(columns, gcol) is not None


def build_query(columns="*", table: str = "", where: str | None = None,
                group_by=None, having: str | None = None,
                order_by=None, limit: int | None = None,
                distinct: bool = False,
                sort_order: str | None = None) -> str:
    """Assemble the reference's query shape (sql_helper.py:58-87).

    ``group_by`` as a LIST follows the reference: group-by columns not
    already selected are prepended to the select list (alias-aware,
    case-insensitive) and GROUP BY is emitted as ordinals. Deliberate
    repair over the reference (sql_helper.py:70-72): ordinals point at
    each group col's ACTUAL select position — the reference's blind
    1..N ordinals produce INVALID SQL (grouping by an aggregate)
    whenever an already-selected group col sits after a non-group
    expression; every shape the reference emitted validly is unchanged.
    A plain string passes through unchanged (this engine's original
    convenience form).
    ``order_by`` may be a string or a list; ``sort_order`` ('asc'/'desc')
    appends once after the order list, as the reference does."""
    cols = list(columns) if isinstance(columns, (list, tuple)) else [str(columns)]
    group_expr = None
    if isinstance(group_by, (list, tuple)):
        prepend = [g for g in group_by if not _col_selected(cols, g)]
        cols = prepend + cols
        # ordinal of each group col's ACTUAL position in the final select
        # list — blind 1..N ordinals are wrong whenever a group col was
        # already selected after a non-group expression (e.g.
        # ['sum(x) AS s', 'a'] with group_by=['a'] must emit GROUP BY 2,
        # not GROUP BY 1 = the aggregate)
        group_expr = ", ".join(str(_sel_pos(cols, g)) for g in group_by)
    elif group_by:
        group_expr = str(group_by)
    q = f"SELECT {'DISTINCT ' if distinct else ''}{', '.join(cols)} FROM {table}"
    if where:
        q += f" WHERE {where}"
    if group_expr:
        q += f" GROUP BY {group_expr}"
    if having:
        q += f" HAVING {having}"
    if order_by:
        ob = (", ".join(order_by) if isinstance(order_by, (list, tuple))
              else str(order_by))
        q += f" ORDER BY {ob}"
        if sort_order:
            q += f" {sort_order}"
    if limit is not None:
        q += f" LIMIT {int(limit)}"
    return q


def execute_query(spark: SparkSession, columns="*", table: str = "",
                  where: str | None = None, group_by=None,
                  having: str | None = None, order_by=None,
                  limit: int | None = None, distinct: bool = False,
                  sort_order: str | None = None,
                  map_col: str | None = None) -> OmigoDF:
    """Build + run the statement. ``map_col`` names a map/struct-typed
    result column to serialize as a JSON string (reference
    sql_helper.py:120-140 json.dumps's it row by row; here it is one
    ``to_json`` expression, case-insensitive match like the reference)."""
    out = spark.sql(build_query(columns, table, where, group_by, having,
                                order_by, limit, distinct, sort_order))
    if map_col is not None:
        from pyspark.sql import functions as F

        hits = [c for c in out.columns if c.lower() == map_col.lower()]
        for c in hits:
            out = out.withColumn(c, F.to_json(F.col(c)))
    return OmigoDF(out)


def register_table(odf: OmigoDF, name: str) -> None:
    """Expose an OmigoDF to the SQL surface."""
    odf.df.createOrReplaceTempView(name)
