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


def build_query(columns="*", table: str = "", where: str | None = None,
                group_by: str | None = None, having: str | None = None,
                order_by: str | None = None, limit: int | None = None,
                distinct: bool = False) -> str:
    """Assemble the reference's query shape (sql_helper.py:58-87)."""
    cols = ", ".join(columns) if isinstance(columns, (list, tuple)) else str(columns)
    q = f"SELECT {'DISTINCT ' if distinct else ''}{cols} FROM {table}"
    if where:
        q += f" WHERE {where}"
    if group_by:
        q += f" GROUP BY {group_by}"
    if having:
        q += f" HAVING {having}"
    if order_by:
        q += f" ORDER BY {order_by}"
    if limit is not None:
        q += f" LIMIT {int(limit)}"
    return q


def execute_query(spark: SparkSession, columns="*", table: str = "",
                  where: str | None = None, group_by: str | None = None,
                  having: str | None = None, order_by: str | None = None,
                  limit: int | None = None, distinct: bool = False) -> OmigoDF:
    return OmigoDF(spark.sql(build_query(columns, table, where, group_by,
                                         having, order_by, limit, distinct)))


def register_table(odf: OmigoDF, name: str) -> None:
    """Expose an OmigoDF to the SQL surface."""
    odf.df.createOrReplaceTempView(name)
