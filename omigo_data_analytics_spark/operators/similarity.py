"""Similarity search over embedding columns (array<float>).

Two paths, per the standard ANN playbook:
  * brute-force cosine top-k — the exactness baseline. Corpus stays
    partitioned; the (small) query set is broadcast; per-partition the dot
    products are pure SQL expressions (zip_with/aggregate — codegen, no
    Python); top-k per query via window rank. At 100 TB the cost is one
    scan of the corpus per query batch.
  * LSH-bucketed (random hyperplane signs) — the scale path: corpus and
    queries hash to sign-pattern buckets (map-side expressions), candidates
    are bucket-equijoins, exact cosine re-ranks candidates only.

Hyperplane constants come from a seeded PRNG so results are reproducible
(and oracle-checkable: the plane matrix can be inlined into SQL).
"""

# NOTE: no `from __future__ import annotations` here — pandas_udf reads
# real annotation objects to infer the UDF eval type, and the future
# import would stringify them.
import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..core.dataframe import OmigoDF

_rng = random.Random(20260813)
NUM_PLANES = 6      # planes per hash table (bucket id = sign pattern, 2^6 buckets)
NUM_TABLES = 8      # independent tables; candidate iff bucket-match in ANY table
MAX_DIM = 64
# NUM_TABLES * NUM_PLANES hyperplanes over MAX_DIM dims, values in [-1, 1)
HYPERPLANES = [[_rng.uniform(-1.0, 1.0) for _ in range(MAX_DIM)]
               for _ in range(NUM_TABLES * NUM_PLANES)]


def _dot_expr(a: str, b: str) -> str:
    return (f"aggregate(zip_with(CAST({a} AS ARRAY<DOUBLE>), CAST({b} AS ARRAY<DOUBLE>), "
            f"(x, y) -> x * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v)")


def _norm_expr(a: str) -> str:
    return f"sqrt({_dot_expr(a, a)})"


def cosine_expr(a: str, b: str) -> str:
    return f"({_dot_expr(a, b)}) / (({_norm_expr(a)}) * ({_norm_expr(b)}))"


def cosine_topk(corpus: OmigoDF, queries: OmigoDF, k: int,
                id_col: str = "vec_id", vec_col: str = "embedding",
                query_id_col: str | None = None,
                precision: int = 6) -> OmigoDF:
    """Exact top-k cosine neighbors in `corpus` for each row of `queries`.

    Output: (query_id, vec_id, rank, cosine). Deterministic: cosine is
    rounded to `precision` BEFORE ranking and ties break on corpus id.
    """
    from .text import ensure_min_parallelism
    qid = query_id_col or id_col
    q = queries.df.select(F.col(qid).alias("query_id"), F.col(vec_col).alias("__qv__"))
    c = ensure_min_parallelism(corpus.df).select(F.col(id_col), F.col(vec_col).alias("__cv__"))
    joined = c.crossJoin(F.broadcast(q))
    cos = F.round(F.expr(cosine_expr("__cv__", "__qv__")), precision)
    scored = joined.select("query_id", id_col, cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return OmigoDF(
        scored.withColumn("rank", F.row_number().over(w))
              .where(F.col("rank") <= k)
              .select("query_id", id_col, "rank", "cosine"))


def _buckets_col(vec_col: str, num_planes: int = NUM_PLANES,
                 num_tables: int = NUM_TABLES):
    """All hash-table bucket ids for a vector as ONE array column, via a
    vectorized Pandas UDF: the whole Arrow batch of vectors multiplies the
    plane matrix in one numpy matmul (BLAS), then sign bits pack into
    per-table ints offset by (table << num_planes). This replaced an
    inlined-SQL-expression version whose 48 higher-order dot products per
    row ran interpreted — the one hot spot where a vectorized UDF beats
    Catalyst expressions. Assumes uniform embedding dimension (true for
    any real embedding column)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    P = np.asarray(HYPERPLANES[:num_tables * num_planes], dtype=np.float64)
    weights = (1 << np.arange(num_planes)).astype(np.int64)
    offsets = (np.arange(num_tables) << num_planes).astype(np.int64)

    @pandas_udf(ArrayType(IntegerType()))
    def _buckets(v: pd.Series) -> pd.Series:
        V = np.stack([np.asarray(x, dtype=np.float64) for x in v])
        S = (V @ P[:, :V.shape[1]].T) >= 0          # (n, T*P) sign bits
        B = (S.reshape(len(V), num_tables, num_planes) @ weights) + offsets
        return pd.Series(list(B.astype(np.int32)))

    return _buckets(F.col(vec_col))


def cosine_topk_lsh(corpus: OmigoDF, queries: OmigoDF, k: int,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    query_id_col: str | None = None, num_planes: int = NUM_PLANES,
                    num_tables: int = NUM_TABLES, precision: int = 6) -> OmigoDF:
    """Approximate top-k: a vector is a candidate for a query iff they share
    a bucket in ANY of `num_tables` independent hyperplane tables (queries
    additionally probe every 1-bit-flipped bucket per table); exact cosine
    re-ranks candidates. The corpus is scanned once, emitting `num_tables`
    (bucket, id, vec) rows per vector; queries are broadcast, so the only
    shuffle is the final per-query top-k."""
    from .text import ensure_min_parallelism
    qid = query_id_col or id_col
    # probe buckets: per table, own bucket + each 1-bit flip (table offset
    # bits sit above the plane bits, so flips stay within the table)
    q = (queries.df
         .select(F.col(qid).alias("query_id"), F.col(vec_col).alias("__qv__"),
                 _buckets_col("__qv__", num_planes, num_tables).alias("__bs__"))
         .withColumn("bucket", F.explode(F.expr(
             f"flatten(transform(__bs__, b -> array(b, "
             + ", ".join(f"b ^ {1 << p}" for p in range(num_planes)) + ")))")))
         .drop("__bs__"))
    c = (ensure_min_parallelism(corpus.df)
         .select(F.col(id_col), F.col(vec_col).alias("__cv__"),
                 _buckets_col("__cv__", num_planes, num_tables).alias("__bs__"))
         .withColumn("bucket", F.explode("__bs__")).drop("__bs__"))
    joined = c.join(F.broadcast(q), "bucket")
    cos = F.round(F.expr(cosine_expr("__cv__", "__qv__")), precision)
    scored = joined.select("query_id", id_col, cos.alias("cosine")).dropDuplicates(
        ["query_id", id_col])
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return OmigoDF(
        scored.withColumn("rank", F.row_number().over(w))
              .where(F.col("rank") <= k)
              .select("query_id", id_col, "rank", "cosine"))


# --------------------------------------------------------------- oracle sql
def cosine_sql_duck(a: str, b: str) -> str:
    """DuckDB-side cosine with the same left-to-right double accumulation
    (index-based zip; DuckDB lists are 1-indexed)."""
    ad, bd = f"CAST({a} AS DOUBLE[])", f"CAST({b} AS DOUBLE[])"
    dot = (f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
           f"list_transform(range(1, len({ad}) + 1), i -> ({ad})[i] * ({bd})[i])), "
           f"(acc, v) -> acc + v)")
    na = (f"sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), "
          f"list_transform({ad}, x -> x * x)), (acc, v) -> acc + v))")
    nb = (f"sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), "
          f"list_transform({bd}, x -> x * x)), (acc, v) -> acc + v))")
    return f"({dot}) / (({na}) * ({nb}))"
