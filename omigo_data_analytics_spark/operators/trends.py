"""Trends operators: per-group categorical distribution statistics and
time-paired distribution drift.

Re-expresses the semantics of the reference's own Spark trends job
(projects/matel/trends-analysis TrendsAnalysis.scala: generateDicts →
stats :740-781 — uniq/total/entropy per grouped value distribution —
and generatePairedStats :791-900 — cosine/jaccard similarity between a
key's value-count distributions in adjacent windows). The reference
implements both as RDD groupByKey + per-key Scala closures that
materialize every (value, count) list in memory; here both are pure
DataFrame aggregation algebra:

  * stats: two partial-aggregated shuffles (key,value → key), entropy
    folded as sum(p log p) without collecting the distribution;
  * drift: adjacent window pairing via a lead() window over the
    per-key DISTINCT bucket list (tiny: #buckets per key), then one
    equi-join on (key, value, bucket_next) whose output is
    matched-value-sized; cosine norms ride the same aggregates.

No per-key value lists ever materialize, so a key with 10^8 distinct
values costs a bigger shuffle, not an executor OOM — the property the
reference's groupByKey version gives up.

Delta from the reference, documented: TrendsAnalysis.computeCosSim
(:791-806) returns 0 when the two maps have unequal sizes — an apparent
bug (it zeroes similarity for any pair whose windows saw different
value sets). The repo computes the standard sparse cosine over the
union of values; jaccard matches the reference's computeJacSim (:845).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..core.dataframe import OmigoDF


def category_distribution_stats(odf: OmigoDF, key_cols, value_col: str) -> OmigoDF:
    """Per key: total_count, uniq_count, and Shannon entropy (bits) of
    the ``value_col`` categorical distribution."""
    keys = odf._resolve(key_cols)
    odf._resolve(value_col)
    counts = (odf.df.groupBy(*keys, value_col)
              .agg(F.count(F.lit(1)).alias("__c__")))
    # entropy = -sum(c/T * log2(c/T)) = log2(T) - sum(c*log2(c))/T
    out = (counts.groupBy(*keys)
           .agg(F.sum("__c__").alias("total_count"),
                F.count(F.lit(1)).alias("uniq_count"),
                F.sum(F.col("__c__") * F.log2("__c__")).alias("__clc__"))
           .select(*keys, "total_count", "uniq_count",
                   F.round(F.log2("total_count")
                           - F.col("__clc__") / F.col("total_count"), 6)
                   .alias("entropy")))
    return OmigoDF(out)


def category_stats_sql_duck(table: str, key_cols, value_col: str) -> str:
    keys = ", ".join(key_cols)
    return f"""
WITH c AS (SELECT {keys}, {value_col} AS v, COUNT(*) AS c
           FROM {table} GROUP BY {keys}, {value_col})
SELECT {keys}, CAST(SUM(c) AS BIGINT) AS total_count,
       CAST(COUNT(*) AS BIGINT) AS uniq_count,
       round(log2(SUM(c)) - SUM(c * log2(c)) / SUM(c), 6) AS entropy
FROM c GROUP BY {keys}
"""


def distribution_drift(odf: OmigoDF, key_cols, bucket_col: str,
                       value_col: str) -> OmigoDF:
    """Per key and adjacent bucket pair: cosine and Jaccard similarity
    between the value-count distributions of bucket and bucket_next —
    low similarity = the key's behavior drifted between windows.

    Returns (keys..., bucket, bucket_next, cosine_sim, jaccard_sim).
    Adjacency is over the buckets PRESENT for that key, in order (the
    reference iterates the sorted agg_key_value list the same way)."""
    keys = odf._resolve(key_cols)
    odf._resolve([bucket_col, value_col])
    counts = (odf.df.groupBy(*keys, bucket_col, value_col)
              .agg(F.count(F.lit(1)).alias("cnt")))
    norms = (counts.groupBy(*keys, bucket_col)
             .agg(F.sum(F.col("cnt") * F.col("cnt")).alias("sq"),
                  F.count(F.lit(1)).alias("nvals")))
    w = Window.partitionBy(*keys).orderBy(bucket_col)
    pairs = (norms
             .select(*keys, bucket_col, "sq", "nvals",
                     F.lead(bucket_col).over(w).alias("__bnext__"),
                     F.lead("sq").over(w).alias("sq2"),
                     F.lead("nvals").over(w).alias("nvals2"))
             .where(F.col("__bnext__").isNotNull()))
    a = counts.alias("a")
    b = counts.alias("b")
    pr = pairs.alias("p")
    dots = (pr
            .join(a, [F.col(f"a.{k}") == F.col(f"p.{k}") for k in keys]
                  + [F.col(f"a.{bucket_col}") == F.col(f"p.{bucket_col}")])
            .join(b, [F.col(f"b.{k}") == F.col(f"p.{k}") for k in keys]
                  + [F.col(f"b.{bucket_col}") == F.col("p.__bnext__"),
                     F.col(f"b.{value_col}") == F.col(f"a.{value_col}")])
            .groupBy(*[F.col(f"p.{k}").alias(k) for k in keys],
                     F.col(f"p.{bucket_col}").alias(bucket_col),
                     F.col("p.__bnext__").alias("bucket_next"),
                     F.col("p.sq").alias("sq"), F.col("p.sq2").alias("sq2"),
                     F.col("p.nvals").alias("nvals"),
                     F.col("p.nvals2").alias("nvals2"))
            .agg(F.sum(F.col("a.cnt") * F.col("b.cnt")).alias("dot"),
                 F.count(F.lit(1)).alias("matched")))
    # pairs with zero shared values drop out of the join; re-attach them
    # with dot=0, matched=0 via a left join from the pair list
    dsel = dots.select(*[F.col(k).alias(f"__d_{k}__") for k in keys],
                       F.col(bucket_col).alias("__d_b__"),
                       F.col("bucket_next").alias("__d_bn__"),
                       "dot", "matched")
    cond = [pairs[k] == dsel[f"__d_{k}__"] for k in keys]
    cond += [pairs[bucket_col] == dsel["__d_b__"],
             pairs["__bnext__"] == dsel["__d_bn__"]]
    full = (pairs.join(dsel, cond, "left")
            .select(*[pairs[k] for k in keys],
                    pairs[bucket_col],
                    pairs["__bnext__"].alias("bucket_next"),
                    F.round(F.coalesce(dsel["dot"], F.lit(0))
                            / F.sqrt(pairs["sq"] * pairs["sq2"]), 6)
                    .alias("cosine_sim"),
                    F.round(F.coalesce(dsel["matched"], F.lit(0)).cast("double")
                            / (pairs["nvals"] + pairs["nvals2"]
                               - F.coalesce(dsel["matched"], F.lit(0))), 6)
                    .alias("jaccard_sim")))
    return OmigoDF(full)


def distribution_drift_sql_duck(table: str, key_cols, bucket_col: str,
                                value_col: str) -> str:
    keys = ", ".join(key_cols)
    on_keys = " AND ".join(f"a.{k} = p.{k}" for k in key_cols)
    on_keys_b = " AND ".join(f"b.{k} = p.{k}" for k in key_cols)
    p_keys = ", ".join(f"p.{k}" for k in key_cols)
    return f"""
WITH c AS (SELECT {keys}, {bucket_col} AS bkt, {value_col} AS v,
                  COUNT(*) AS cnt
           FROM {table} GROUP BY {keys}, {bucket_col}, {value_col}),
n AS (SELECT {keys}, bkt, SUM(cnt * cnt) AS sq, COUNT(*) AS nvals
      FROM c GROUP BY {keys}, bkt),
p AS (SELECT {keys}, bkt, sq, nvals,
             lead(bkt) OVER (PARTITION BY {keys} ORDER BY bkt) AS bnext,
             lead(sq) OVER (PARTITION BY {keys} ORDER BY bkt) AS sq2,
             lead(nvals) OVER (PARTITION BY {keys} ORDER BY bkt) AS nvals2
      FROM n QUALIFY bnext IS NOT NULL),
d AS (SELECT {p_keys}, p.bkt, p.bnext,
             SUM(a.cnt * b.cnt) AS dot, COUNT(*) AS matched
      FROM p JOIN c a ON {on_keys} AND a.bkt = p.bkt
             JOIN c b ON {on_keys_b} AND b.bkt = p.bnext AND b.v = a.v
      GROUP BY {p_keys}, p.bkt, p.bnext)
SELECT {p_keys}, p.bkt AS {bucket_col}, p.bnext AS bucket_next,
       round(COALESCE(d.dot, 0) / sqrt(p.sq * p.sq2), 6) AS cosine_sim,
       round(CAST(COALESCE(d.matched, 0) AS DOUBLE)
             / (p.nvals + p.nvals2 - COALESCE(d.matched, 0)), 6)
           AS jaccard_sim
FROM p LEFT JOIN d ON {" AND ".join(f"d.{k} = p.{k}" for k in key_cols)}
                   AND d.bkt = p.bkt
"""
