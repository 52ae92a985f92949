"""Bloom-bitset substring search (operators/search): exactness, prefilter
selectivity, persisted-signature path, plan purity."""

import duckdb
import pytest
from pyspark.sql import functions as F

from omigo_data_analytics_spark import OmigoDF
from omigo_data_analytics_spark.operators import search as SR

SF = "/root/testdata/sf0.001"


def _docs(spark):
    from omigo_data_analytics_spark.sources.io import load_testdata

    return load_testdata(spark, SF, "documents")


def test_search_results_are_exact(spark):
    docs = _docs(spark)
    for q in ["window", "batch part", "zz-not-there"]:
        got = sorted(r["doc_id"] for r in
                     SR.bloom_substring_search(docs, q).df
                     .select("doc_id").collect())
        exp = sorted(r[0] for r in duckdb.sql(
            f"SELECT doc_id FROM '{SF}/documents.parquet' "
            f"WHERE contains(text, '{q}')").fetchall())
        assert got == exp, q


def test_prefilter_prunes_rare_queries(spark):
    docs = _docs(spark)
    # a string absent from the corpus: the bloom layer alone should
    # reject (almost) everything before any contains() runs
    assert SR.candidate_count(docs, "qzvjxkwpm") <= 2
    # and the prefilter never under-counts: candidates >= exact hits
    hits = SR.bloom_substring_search(docs, "window").df.count()
    assert SR.candidate_count(docs, "window") >= hits > 0


def test_persisted_signature_path(spark):
    docs = _docs(spark)
    sig = SR.add_search_signature(docs)
    assert "search_bits" in sig.df.columns
    a = sorted(r["doc_id"] for r in
               SR.bloom_substring_search(sig, "table", sig_col="search_bits")
               .df.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in
               SR.bloom_substring_search(docs, "table").df
               .select("doc_id").collect())
    assert a == b and len(a) > 0


def test_short_segment_query_degenerates_safely(spark):
    # every query segment shorter than phrase_len: empty signature, the
    # prefilter keeps everything, verification still makes it exact
    docs = _docs(spark)
    assert SR.query_signature("ab cd") == [0] * (SR.HASH_SPACE // 64)
    got = SR.bloom_substring_search(docs, "a b").df.count()
    exp = duckdb.sql(f"SELECT COUNT(*) FROM '{SF}/documents.parquet' "
                     "WHERE contains(text, 'a b')").fetchone()[0]
    assert got == exp


def test_search_plan_is_pure_codegen(spark):
    docs = _docs(spark)
    df = SR.bloom_substring_search(docs, "window").df
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in p  # signature + subset test are expressions
    assert "Exchange hashpartitioning" not in p  # map-side only


def test_python_and_spark_phrase_hash_agree(spark):
    # the subset test only works if both sides set the same bits
    phrases = ["abcde", "hello", "wörld", "12345"]
    rows = spark.createDataFrame([(p,) for p in phrases], ["p"]).select(
        "p", F.expr(f"{SR.hash_spark('p')} % {SR.HASH_SPACE}L").alias("b")
    ).collect()
    for r in rows:
        assert r["b"] == SR._py_phrase_bit(r["p"], SR.HASH_SPACE)
