"""Round-11 review fixes.

1. asof_join atomic payload carry (r10 ADVICE): when the winning right
   row has a NULL payload cell, that cell must come back NULL — the old
   per-column last(ignorenulls) carries backfilled it from an EARLIER
   right row, producing a torn row mixing payloads of two source rows.
2. semdedup auto-scaled num_clusters default (r10 verdict #2).
3. decontaminate_semantic num_clusters="auto" (r10 verdict #3).
4. ngram_jaccard_pairs candidate-pair census warning default-on
   (r10 verdict #4).
"""

import warnings

import pytest
from pyspark.sql import functions as F

from omigo_data_analytics_spark import OmigoDF
from omigo_data_analytics_spark.operators import timeseries as TS


def _mk(spark, rows, schema):
    return OmigoDF(spark.createDataFrame(rows, schema))


def test_asof_null_payload_cell_not_backfilled(spark):
    """Winning right row carries a NULL cell -> output keeps it NULL
    (torn-row advice fix). Earlier right row has a non-NULL value in
    that column; the old per-column carry leaked it through."""
    left = _mk(spark, [("k", 10.0)], "k string, t double")
    right = _mk(spark, [("k", 1.0, "old_a", "old_b"),
                        ("k", 5.0, None, "new_b")],
                "k string, t double, a string, b string")
    out = TS.asof_join(left, right, on="k", left_time="t",
                       suffix="q").df.collect()[0]
    assert out["q:b"] == "new_b"     # winning row's non-NULL cell
    assert out["q:a"] is None        # winning row's NULL cell stays NULL
    assert out["q:t"] == 5.0


def test_asof_null_payload_atomic_under_tiebreak(spark):
    """Same torn-row hazard at EQUAL times with tiebreak_cols: the
    max-tiebreak row wins as a whole row, NULL cells included."""
    left = _mk(spark, [("k", 10.0)], "k string, t double")
    right = _mk(spark, [("k", 5.0, 1, "lo"),
                        ("k", 5.0, 2, None)],
                "k string, t double, seq int, v string")
    out = TS.asof_join(left, right, on="k", left_time="t",
                       suffix="q", tiebreak_cols=["seq"]).df.collect()[0]
    assert out["q:seq"] == 2
    assert out["q:v"] is None        # the winner's NULL, not 'lo'


def test_asof_nearest_null_payload_atomic(spark):
    """direction='nearest' picks one whole row per direction too."""
    left = _mk(spark, [("k", 10.0)], "k string, t double")
    # forward match (t=11) is nearer than backward (t=1); its NULL cell
    # must survive, not fall back to the backward row's value
    right = _mk(spark, [("k", 1.0, "b_val", "x"),
                        ("k", 11.0, None, "y")],
                "k string, t double, a string, b string")
    out = TS.asof_join(left, right, on="k", left_time="t",
                       direction="nearest", suffix="q").df.collect()[0]
    assert out["q:b"] == "y"
    assert out["q:a"] is None


def test_asof_empty_right_payload_returns_left(spark):
    """Right side with only the key column: nothing to carry, left
    comes back unchanged (degenerate guard on the struct carry)."""
    left = _mk(spark, [("k", 1.0), ("z", 2.0)], "k string, t double")
    right = _mk(spark, [("k",)], "k string")
    out = TS.asof_join(left, right, on="k", left_time="t").df
    assert sorted(out.columns) == ["k", "t"]
    assert out.count() == 2


def test_semdedup_auto_k_valid_and_bounded(spark, embeddings):
    """num_clusters=None derives k from a corpus count (clamped n/1000);
    any k is a valid SemDeDup, so the auto default must still produce a
    subset of the input with survivors unique by id."""
    from omigo_data_analytics_spark.operators import dedup as DD
    e = OmigoDF(embeddings.df.limit(500))
    out = DD.semdedup(e, threshold=0.4).df   # default num_clusters=None
    n_in = e.df.count()
    n_out = out.count()
    assert 0 < n_out <= n_in
    assert out.select("vec_id").distinct().count() == n_out
    # survivors are a subset of the input ids
    extra = out.select("vec_id").join(e.df.select("vec_id"),
                                      "vec_id", "left_anti").count()
    assert extra == 0


def test_semdedup_auto_k_clamp():
    from omigo_data_analytics_spark.operators.dedup import _auto_num_clusters
    assert _auto_num_clusters(0) == 8
    assert _auto_num_clusters(500) == 8          # floor clamp
    assert _auto_num_clusters(80_000) == 80      # n/1000
    assert _auto_num_clusters(10_000_000) == 4096  # ceiling clamp


def test_semdedup_pinned_k_unchanged(spark, embeddings):
    """Explicit num_clusters still pins k exactly (the registry/oracle
    contract): pinned-k result is reproducible."""
    from omigo_data_analytics_spark.operators import dedup as DD
    e = OmigoDF(embeddings.df.limit(300))
    a = DD.semdedup(e, threshold=0.4, num_clusters=8, iters=2).df
    b = DD.semdedup(e, threshold=0.4, num_clusters=8, iters=2).df
    assert sorted(r["vec_id"] for r in a.select("vec_id").collect()) == \
           sorted(r["vec_id"] for r in b.select("vec_id").collect())


def test_decontaminate_semantic_auto_k(spark, documents):
    """num_clusters='auto' derives k ~ sqrt(|eval|) per the docstring;
    the screen still returns a subset of train and never drops rows the
    dense screen keeps... (auto is a recall<=dense screen by design)."""
    from omigo_data_analytics_spark.operators import curation as CU
    docs = OmigoDF(documents.df.limit(400))
    ev = OmigoDF(documents.df.orderBy("doc_id").limit(25))
    out = CU.decontaminate_semantic(docs, ev, "doc_id",
                                    threshold=0.6, dim=16,
                                    num_clusters="auto").df
    n_train = docs.df.count()
    assert 0 < out.count() <= n_train
    # clustered screen can only MISS contamination vs dense: every row
    # dense keeps, auto keeps
    dense = CU.decontaminate_semantic(docs, ev, "doc_id",
                                      threshold=0.6, dim=16).df
    missing = dense.select("doc_id").join(out.select("doc_id"),
                                          "doc_id", "left_anti").count()
    assert missing == 0


def test_decontaminate_auto_k_value():
    from omigo_data_analytics_spark.operators.curation import _auto_eval_k
    assert _auto_eval_k(0) == 2
    assert _auto_eval_k(4) == 2
    assert _auto_eval_k(100) == 10
    assert _auto_eval_k(10_000) == 100
    assert _auto_eval_k(100_000_000) == 4096


def test_ngram_jaccard_census_warns_by_default(spark):
    """Default warn_candidate_pairs is now ON (~10M): a dense corpus
    (every doc shares every shingle) must warn when the estimate
    crosses the caller-set threshold; explicit None opts out."""
    from omigo_data_analytics_spark.operators import dedup as DD
    rows = [(i, "alpha beta gamma delta epsilon zeta eta theta")
            for i in range(40)]
    docs = OmigoDF(spark.createDataFrame(rows, "doc_id int, text string"))
    # ~40 docs x identical shingles -> est pairs ~ s * 40*39/2 >> 100
    with pytest.warns(UserWarning, match="candidate pairs"):
        DD.ngram_jaccard_pairs(docs, warn_candidate_pairs=100).df.count()
    # opt-out: no census job, no warning
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        DD.ngram_jaccard_pairs(docs, warn_candidate_pairs=None).df.count()


def test_ngram_jaccard_default_threshold_silent_on_small(spark, documents):
    """The 10M default must NOT warn on an ordinary small corpus."""
    from omigo_data_analytics_spark.operators import dedup as DD
    docs = OmigoDF(documents.df.limit(200))
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        DD.ngram_jaccard_pairs(docs).df.count()


def test_train_ivf_centroids_auto_k(spark, embeddings):
    """num_centroids=None derives k from a corpus count (sqrt rule,
    clamped); explicit k still pins exactly."""
    from omigo_data_analytics_spark.operators import similarity as SM
    e = OmigoDF(embeddings.df.limit(400))
    cents = SM.train_ivf_centroids(e, num_centroids=None)
    assert 2 <= len(cents) <= 4096
    pinned = SM.train_ivf_centroids(e, num_centroids=5)
    assert len(pinned) == 5


def test_semdedup_auto_equals_pinned_when_k_matches(spark, embeddings):
    """For corpora under the floor clamp (n < 8000 -> auto k=8), the
    None default must produce BIT-IDENTICAL survivors to an explicit
    k=8 — auto-k changes parameter derivation, never semantics."""
    from omigo_data_analytics_spark.operators import dedup as DD
    e = OmigoDF(embeddings.df.limit(400))
    auto = DD.semdedup(e, threshold=0.4).df
    pinned = DD.semdedup(e, threshold=0.4, num_clusters=8).df
    ids = lambda df: sorted(r["vec_id"] for r in df.select("vec_id").collect())
    assert ids(auto) == ids(pinned)


def test_decontaminate_auto_equals_pinned_when_k_matches(spark, documents):
    """Same equivalence for the clustered decontamination: eval of 25
    docs -> auto k = int(sqrt(25)) = 5 must equal explicit k=5."""
    from omigo_data_analytics_spark.operators import curation as CU
    docs = OmigoDF(documents.df.limit(300))
    ev = OmigoDF(documents.df.orderBy("doc_id").limit(25))
    auto = CU.decontaminate_semantic(docs, ev, "doc_id", threshold=0.6,
                                     dim=16, num_clusters="auto").df
    pinned = CU.decontaminate_semantic(docs, ev, "doc_id", threshold=0.6,
                                       dim=16, num_clusters=5).df
    ids = lambda df: sorted(r["doc_id"] for r in df.select("doc_id").collect())
    assert ids(auto) == ids(pinned)


# ---------------------------------------------------------------- r11
# empty-input sweep fixes: the full registry was driven against 0-row
# copies of every table (real schemas); these pin the fixes that came
# out of the 22 findings (the rest are documented contract raises).

def test_ivf_centroids_empty_corpus_clear_error(spark):
    """Empty corpus -> plain ValueError, not the VOID-array
    INVALID_EXTRACT_BASE_FIELD_TYPE AnalysisException four operators
    (kmeans/semdedup/IVF/clustered-decon) used to die with."""
    from omigo_data_analytics_spark.operators import similarity as SM
    e = OmigoDF(spark.createDataFrame(
        [], "vec_id long, embedding array<float>"))
    with pytest.raises(ValueError, match="no rows"):
        SM.ivf_centroids(e, 4)
    with pytest.raises(ValueError, match="no rows"):
        SM.kmeans_centroids(e, 4)
    with pytest.raises(ValueError, match="empty"):
        SM.kmeans_assign(OmigoDF(spark.createDataFrame(
            [(1, [0.1, 0.2])], "vec_id long, embedding array<double>")), [])


def test_profile_exact_total_on_empty(spark):
    """profile(exact=True) on an empty table still emits one row per
    column with zero counts (schema-independent row set)."""
    e = OmigoDF(spark.createDataFrame([], "a string, b long"))
    rows = {r["column"]: r for r in e.profile(exact=True).df.collect()}
    assert set(rows) == {"a", "b"}
    assert rows["a"]["n_rows"] == 0 and rows["a"]["n_distinct"] == 0
    assert rows["b"]["min_str"] is None
    # non-empty parity with the approx path's row set
    d = OmigoDF(spark.createDataFrame([("x", 1), (None, 2)], "a string, b long"))
    got = {r["column"]: r for r in d.profile(exact=True).df.collect()}
    assert got["a"]["n_rows"] == 2 and got["a"]["n_null"] == 1
    assert got["a"]["n_distinct"] == 1 and got["b"]["n_distinct"] == 2


def test_split_str_pinned_width(spark):
    """width= pins the part-column schema independent of the data (and
    skips the width-discovery job); empty input keeps the columns."""
    d = OmigoDF(spark.createDataFrame([("a,b",), ("c",)], "v string"))
    out = d.split_str("v", prefix="p", width=3).df
    assert [c for c in out.columns if c.startswith("p:")] == \
        ["p:1", "p:2", "p:3"]
    got = {tuple(r) for r in out.select("p:1", "p:2", "p:3").collect()}
    assert got == {("a", "b", ""), ("c", "", "")}
    e = OmigoDF(spark.createDataFrame([], "v string"))
    assert "p:2" in e.split_str("v", prefix="p", width=2).df.columns


def test_reverse_transpose_pinned_values(spark):
    """key_values= pins pivot columns: no distinct-discovery job, stable
    schema on empty/filtered input, absent keys come back NULL."""
    d = OmigoDF(spark.createDataFrame(
        [("g1", "en", 5), ("g1", "fr", 7)], "g string, k string, n long"))
    out = d.reverse_transpose(["g"], "k", ["n"], key_values=["en", "fr", "zh"]).df
    assert sorted(out.columns) == ["g", "n:k:en", "n:k:fr", "n:k:zh"]
    r = out.collect()[0]
    assert r["n:k:en"] == 5 and r["n:k:zh"] is None
    e = OmigoDF(spark.createDataFrame([], "g string, k string, n long"))
    oute = e.reverse_transpose(["g"], "k", ["n"], key_values=["en"]).df
    assert sorted(oute.columns) == ["g", "n:k:en"] and oute.count() == 0
    # and the pinned plan really skips the distinct-values job: the
    # unpinned path must run >= 1 extra job to discover columns
    sc = spark.sparkContext
    t0 = sc.statusTracker().getJobIdsForGroup(None)
    _ = d.reverse_transpose(["g"], "k", ["n"], key_values=["en", "fr"]).df.schema
    jobs_pinned = len(spark.sparkContext.statusTracker().getJobIdsForGroup(None) or []) - len(t0 or [])
    assert jobs_pinned == 0  # schema known without touching the data


def test_unicode_case_fold_cross_engine_boundary(spark):
    """r11 unicode probe: a 60-doc multilingual hostile corpus (CJK,
    Cyrillic, Arabic, Hebrew, emoji, astral plane, combining marks,
    fullwidth, ligatures, Turkish) ran through all 22 text-family
    registry oracles: 18/22 hash-exact. The 4 misses all reduce to ONE
    token ('İstanbul') hitting Unicode SpecialCasing, where the JVM and
    utf8proc legitimately differ. This test pins the divergence class
    so a future change that WIDENS it (or an engine upgrade that closes
    it) is noticed."""
    from pyspark.sql import functions as F
    import duckdb
    s = "İ ß ﬁ Привет 日本語 ĞI"
    r = spark.range(1).select(F.lower(F.lit(s)).alias("lo")).collect()[0]["lo"]
    d = duckdb.sql("SELECT lower('İ ß ﬁ Привет 日本語 ĞI') ").fetchone()[0]
    # agreement everywhere except the SpecialCasing dot: stripping the
    # combining dot (U+0307) reconciles the two engines exactly
    assert r.replace("̇", "") == d.replace("̇", "")
    # the only divergent codepoint in the probe corpus is U+0130's map
    assert r.startswith("i̇"), "JVM SpecialCasing changed — re-probe"
    assert d.startswith("i "), "duckdb casing changed — re-probe"


# ---------------------------------------------------------------- r11
# NULL-heavy sweep fixes (full registry against a 20%-NULL-payload copy
# of every table; keys kept intact).

def test_normalize_null_values_score_null(spark):
    """NULL x (or junk via try_cast) must yield a NULL score, not the
    constant-group 0.0/0.5 fallback; NULL group keys (no stats match
    via the left join) likewise."""
    rows = [("A", "10"), ("A", "20"), ("A", None), ("A", "junk"),
            (None, "30")]
    d = OmigoDF(spark.createDataFrame(rows, "g string, v string"))
    z = {(r["g"], r["v"]): r["v:norm"] for r in
         d.normalize(["v"], method="zscore", group_cols=["g"]).df.collect()}
    assert z[("A", None)] is None and z[("A", "junk")] is None
    assert z[(None, "30")] is None          # NULL group: no stats row
    assert z[("A", "10")] is not None
    mm = {(r["g"], r["v"]): r["v:norm"] for r in
          d.normalize(["v"], method="minmax", group_cols=["g"]).df.collect()}
    assert mm[("A", None)] is None and mm[(None, "30")] is None
    assert mm[("A", "10")] == 0.0 and mm[("A", "20")] == 1.0
    # row preservation: no row is dropped
    assert d.normalize(["v"], group_cols=["g"]).df.count() == 5


def test_lsh_buckets_null_vectors_dropped(spark):
    """NULL embeddings can't bucket: the vectorized bucket UDF used to
    die on np.stack of a None-bearing Arrow batch; now those rows get
    NULL bucket arrays and fall out of candidate generation."""
    from omigo_data_analytics_spark.operators import similarity as SM
    rows = [(1, [1.0] * 8), (2, None), (3, [0.9] * 8), (4, None)]
    e = OmigoDF(spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"))
    q = OmigoDF(spark.createDataFrame(
        [(10, [1.0] * 8), (11, None)], "vec_id long, embedding array<double>"))
    out = SM.cosine_topk_lsh(e, q, k=2).df.collect()
    qids = {r["query_id"] for r in out}
    cands = {r["vec_id"] for r in out}
    assert 11 not in qids           # NULL query: no candidates
    assert cands <= {1, 3}          # NULL corpus rows never bucket
    # all-NULL batch corner
    allnull = OmigoDF(spark.createDataFrame(
        [(9, None)], "vec_id long, embedding array<double>"))
    assert SM.cosine_topk_lsh(allnull, q, k=2).df.count() == 0


def test_ws_placeholder_null_substitutes_empty(spark):
    """NULL cells substitute as '' in templates (reference TSV model) —
    literal 'None' must never leak into a request URL."""
    from omigo_data_analytics_spark.operators.enrich import _resolve
    assert _resolve("http://svc/{a}?q={b}", {"a": None, "b": 7}) == \
        "http://svc/?q=7"


def test_ivf_seeds_skip_null_vectors(spark):
    from omigo_data_analytics_spark.operators import similarity as SM
    rows = [(1, None), (2, [1.0, 0.0]), (3, None), (4, [0.0, 1.0])]
    e = OmigoDF(spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"))
    cents = SM.ivf_centroids(e, 3)
    assert [c for c, _ in cents] == [2, 4]   # NULLs skipped, order kept


# ---------------------------------------------------------------- r11
# extreme-values sweep fixes (NaN/±Inf/1e308/-0.0 planted in numeric
# payloads and inside embedding vectors).

def _mk_corrupt_embeddings(spark):
    rows = [(1, [1.0, 0.0]), (2, [float("nan"), 1.0]),
            (3, [0.9, 0.1]), (4, [float("inf"), 0.0]),
            (5, [0.8, 0.2]), (6, None)]
    return OmigoDF(spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"))


def test_centroid_training_screens_nonfinite(spark):
    """NaN seeds used to render as the bare token `nan` in the centroid
    literal (unparseable SQL); NaN members used to blow up the BIGINT
    micro-unit quantization under ANSI. Both screened now; training and
    seeding use finite vectors only."""
    from omigo_data_analytics_spark.operators import similarity as SM
    e = _mk_corrupt_embeddings(spark)
    cents = SM.ivf_centroids(e, 4)
    assert [c for c, _ in cents] == [1, 3, 5]
    trained = SM.kmeans_centroids(e, k=2, iters=2)
    assert all(all(x == x and abs(x) != float("inf") for x in v)
               for _, v in trained)
    # assignment still covers EVERY row, corrupt ones included
    assert SM.kmeans_assign(e, trained).df.count() == 6


def test_semdedup_corrupt_vectors_never_pair(spark):
    """NaN cosine compares >= threshold TRUE in both engines — without
    the finite-norm screen one corrupt embedding marks its whole
    cluster duplicate. Corrupt rows survive (never dropped), and no
    clean row is dropped on their account."""
    from omigo_data_analytics_spark.operators import dedup as DD
    e = _mk_corrupt_embeddings(spark)
    out = DD.semdedup(e, threshold=0.99, num_clusters=2).df
    ids = {r["vec_id"] for r in out.collect()}
    assert {2, 4, 6} <= ids            # corrupt/NULL rows all survive
    # the only genuine near-dup pair is (3,5): cos = 0.991 >= 0.99 —
    # the greedy keep-lowest-id drops 5, keeps 3; 1 is dissimilar.
    # Crucially, NOT every clean row vanished (pre-fix, the NaN row
    # "matched" everything in its cluster).
    assert 1 in ids and 3 in ids and 5 not in ids


def test_embedding_dup_pairs_screen_nonfinite(spark):
    from omigo_data_analytics_spark.operators import dedup as DD
    e = _mk_corrupt_embeddings(spark)
    pairs = DD.embedding_dup_pairs(e, threshold=0.4, method="exact").df
    bad = pairs.where("id_a IN (2,4,6) OR id_b IN (2,4,6)").count()
    assert bad == 0
    assert pairs.count() > 0           # clean near-dups still found


def test_lsh_buckets_nonfinite_excluded(spark):
    """numpy NaN>=0 is False but SQL NaN-is-greatest is True — a NaN
    component would bucket DIFFERENTLY in engine and oracle. Non-finite
    vectors now get NULL buckets like NULL vectors."""
    from omigo_data_analytics_spark.operators import similarity as SM
    e = _mk_corrupt_embeddings(spark)
    q = OmigoDF(spark.createDataFrame(
        [(10, [1.0, 0.0])], "vec_id long, embedding array<double>"))
    out = SM.cosine_topk_lsh(e, q, k=5).df
    assert {r["vec_id"] for r in out.collect()} <= {1, 3, 5}


def test_minmax_int_aggs_nonfinite_null_not_crash(spark):
    """minint/maxint on NaN/Inf/1e308: the second cast step is try_cast
    now — one corrupt cell must not kill the whole aggregation job."""
    rows = [("g", "1.5"), ("g", "nan"), ("g", "inf"), ("g", "1e308"),
            ("g", "7.2")]
    d = OmigoDF(spark.createDataFrame(rows, "k string, v string"))
    r = d.aggregate(["k"], ["v", "v", "v"],
                    ["minint", "maxint", "get_range_int"]).df.collect()[0]
    assert r["v:minint"] == 1 and r["v:maxint"] == 7
    assert r["v:get_range_int"] == 6


def test_collapse_exact_equivalence_and_null_survival(spark):
    """dedup_near/cluster_near_dups can collapse byte-identical docs to
    a representative before LSH (r11 duplicate-heavy probe: 5,000
    identical docs = 12.5M candidate pairs = 40-70s; collapsed:
    seconds). All three collapse_exact modes must agree bit-for-bit
    ('auto' picks by a sampled duplicate census — this corpus is 75%
    duplicated, so it collapses), and NULL-text docs (outside the
    mapping) must survive untouched."""
    from omigo_data_analytics_spark.operators import dedup as DD
    rows = ([(i, "same same text for everyone here ok") for i in range(40)]
            + [(100 + i, f"distinct doc {i} tokens {i * 3}") for i in range(10)]
            + [(900, None), (901, None), (902, "")])
    d = OmigoDF(spark.createDataFrame(rows, "doc_id long, text string"))
    outs = [sorted(r[0] for r in DD.dedup_near(d, collapse_exact=m)
                   .df.select("doc_id").collect())
            for m in ("auto", True, False)]
    assert outs[0] == outs[1] == outs[2]
    assert 900 in outs[0] and 901 in outs[0]   # NULL texts always survive
    cls = [sorted(tuple(r) for r in
                  DD.cluster_near_dups(d, collapse_exact=m)
                  .df.select("doc_id", "cluster_id").collect())
           for m in ("auto", True, False)]
    assert cls[0] == cls[1] == cls[2]
    # the identical block collapsed to one cluster rooted at its min id
    labels = dict(cls[0])
    assert all(labels[i] == 0 for i in range(40))
