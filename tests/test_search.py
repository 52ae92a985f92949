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


def _bm25_bruteforce(rows, query, k1=SR.BM25_K1, b=SR.BM25_B):
    """Pure-Python BM25 replay with the operator's exact op order:
    Lucene idf, term-sorted fold, round(…, 6)."""
    import math

    terms = sorted({t for t in query.lower().split() if t})
    toks = {r["doc_id"]: [t for t in r["text"].lower().split() if t]
            for r in rows}  # any-whitespace: mirrors the \s+ tokenizer
    n = len(toks)
    total_dl = sum(len(t) for t in toks.values())
    df = {t: sum(1 for tk in toks.values() if t in tk) for t in terms}
    out = {}
    for doc, tk in toks.items():
        dl = len(tk)
        s, m = 0.0, 0
        for t in terms:  # term-sorted fold, matching sort_array
            tf = tk.count(t)
            if tf == 0:
                continue
            m += 1
            s += (math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5)) * tf
                  * (k1 + 1)
                  / (tf + k1 * (1 - b + b * dl / (total_dl / n))))
        if m:
            out[doc] = (m, round(s, 6))
    return out


def test_bm25_matches_bruteforce(spark):
    docs = _docs(spark)
    rows = docs.df.select("doc_id", "text").collect()
    exp = _bm25_bruteforce(rows, "window merge vector")
    got = {r["doc_id"]: (r["n_terms_matched"], r["bm25"]) for r in
           SR.bm25_rank(docs, "window merge vector").df.collect()}
    assert set(got) == set(exp)
    for doc, (m, s) in exp.items():
        assert got[doc][0] == m, doc
        assert abs(got[doc][1] - s) <= 1e-6, (doc, got[doc][1], s)


def test_bm25_duckdb_oracle_hash_parity(spark):
    # the registry contract: Spark and the DuckDB replay agree bit-for-bit
    docs = _docs(spark)
    got = sorted((r["doc_id"], r["n_terms_matched"], r["bm25"]) for r in
                 SR.bm25_rank(docs, "window merge").df.collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM '{SF}/documents.parquet'")
    exp = sorted(tuple(r) for r in con.execute(
        SR.bm25_sql_duck("documents", "window merge")).fetchall())
    assert got == exp


def test_bm25_empty_query_raises(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError):
        SR.bm25_rank(docs, "   ")


def test_bm25_plan_has_no_python_and_one_corpus_shuffle(spark):
    docs = _docs(spark)
    df = SR.bm25_rank(docs, "window merge").df
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in p  # scoring is pure expression algebra
    # the pairs table is checkpointed, so the final plan must read it as
    # an existing RDD exactly once for the join probe side (the df agg
    # reads the same checkpoint) — never re-derive the corpus pipeline
    # (the naive self-referencing plan expanded THREE scan+explode
    # subtrees; only the broadcast-stats branch may touch the corpus)
    assert p.count("Generate explode") <= 1
    assert "ExistingRDD" in p
    # df and corpus stats ride broadcast, never a shuffled join
    assert "SortMergeJoin" not in p
    # the map-side term filter in the pairs stage: between the explode
    # (below) and the partial aggregation (above). Plan strings print
    # top-down: parent operators have smaller indexes.
    from omigo_data_analytics_spark.operators.search import (
        _bm25_pairs, _bm25_terms)
    from pyspark.sql import functions as SF
    from omigo_data_analytics_spark.operators.text import WS_RUN_SPARK
    toks = f"filter(split(lower(text), '{WS_RUN_SPARK}'), x -> x != '')"
    base = docs.df.select(SF.col("doc_id"),
                          SF.expr(toks).alias("__toks__"),
                          SF.expr(f"size({toks})").alias("dl"))
    pp = (_bm25_pairs(base, "doc_id", _bm25_terms("window merge", True))
          ._jdf.queryExecution().executedPlan().toString())
    f = pp.index("Filter")
    assert pp.index("HashAggregate") < f < pp.index("Generate")


def test_python_and_spark_phrase_hash_agree(spark):
    # the subset test only works if both sides set the same bits
    phrases = ["abcde", "hello", "wörld", "12345"]
    rows = spark.createDataFrame([(p,) for p in phrases], ["p"]).select(
        "p", F.expr(f"{SR.hash_spark('p')} % {SR.HASH_SPACE}L").alias("b")
    ).collect()
    for r in rows:
        assert r["b"] == SR._py_phrase_bit(r["p"], SR.HASH_SPACE)


def test_search_job_composes_and_is_exact(spark):
    docs = _docs(spark)
    out = SR.search_job(docs, must_contain="window",
                        rank_query="window merge", k=5)
    rows = out.df.collect()
    assert 0 < len(rows) <= 5
    # every hit really contains the must phrase
    texts = {r["doc_id"]: r for r in docs.df.collect()}
    for r in rows:
        assert "window" in texts[r["doc_id"]]["text"]
    # descending score, id tiebreak
    scores = [(r["bm25"], -r["doc_id"]) for r in rows]
    assert scores == sorted(scores, key=lambda t: (-t[0], -t[1]))
    # one lazy plan: no Python, prefilter below the BM25 machinery
    p = out.df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in p
    assert "TakeOrderedAndProject" in p  # distributed top-k, no global sort


def test_ws_class_parity_on_vertical_tab(spark, tmp_path):
    """r8 advice: Java \\s includes U+000B (vertical tab), RE2's (DuckDB)
    does not — the shared tokenizers now use the explicit WS_RUN class so
    both engines split identically on vertical-tab text, and U+000B
    consistently counts as a NON-space character on both sides."""
    from omigo_data_analytics_spark import OmigoDF
    from omigo_data_analytics_spark.operators.text import (
        WS_RUN_DUCK, WS_RUN_SPARK, fingerprint, fingerprint_sql_duck,
        token_estimate_exprs, token_estimates)

    rows = [(1, "a\x0bb c"), (2, "x\x0b\x0by"), (3, "a \t\n\f\r b"),
            (4, "plain text"), (5, ""), (6, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    p = str(tmp_path / "vt.parquet")
    df.coalesce(1).write.parquet(p)
    pg = f"{p}/*.parquet"  # Spark writes a directory; DuckDB needs the glob

    # 1) the raw split fragments agree token-for-token
    eng = {r["doc_id"]: r["t"] for r in spark.read.parquet(p).selectExpr(
        "doc_id",
        f"filter(split(lower(text), '{WS_RUN_SPARK}'), x -> x != '') AS t"
    ).collect()}
    ora = {r[0]: r[1] for r in duckdb.sql(
        f"SELECT doc_id, list_filter(string_split_regex(lower(text), "
        f"'{WS_RUN_DUCK}'), x -> x != '') FROM '{pg}'").fetchall()}
    assert eng == ora
    # U+000B is NOT whitespace on either side now
    assert eng[1] == ["a\x0bb", "c"]

    # 2) fingerprint + BPE token-estimate parity end-to-end
    od = OmigoDF(spark.read.parquet(p))
    fp = {r["doc_id"]: r["fingerprint"] for r in
          fingerprint(od).df.select("doc_id", "fingerprint").collect()}
    fpo = {r[0]: r[1] for r in duckdb.sql(
        f"SELECT doc_id, {fingerprint_sql_duck('text')} FROM '{pg}'"
    ).fetchall()}
    assert fp == fpo
    te = {r["doc_id"]: (r["pretoken_count"], r["token_estimate"])
          for r in token_estimates(od).df
          .select("doc_id", "pretoken_count", "token_estimate").collect()}
    ex = token_estimate_exprs("duckdb")
    teo = {r[0]: (r[1], r[2]) for r in duckdb.sql(
        f"SELECT doc_id, {ex['pretoken_count']}, {ex['token_estimate']} "
        f"FROM '{pg}'").fetchall()}
    assert te == teo

    # 3) bm25 engine/oracle parity on the vertical-tab corpus
    got = sorted(tuple(r) for r in SR.bm25_rank(
        OmigoDF(spark.read.parquet(p)), "c y b").df.collect())
    exp = sorted(tuple(r) for r in duckdb.sql(
        SR.bm25_sql_duck(f"'{pg}'", "c y b")).fetchall())
    assert got == exp and len(got) > 0
