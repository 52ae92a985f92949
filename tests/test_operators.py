"""Training-data operator tests: text metrics, dedup family, similarity
search, explode_json."""

from pyspark.sql import functions as F

from omigo_data_analytics_spark import OmigoDF
from omigo_data_analytics_spark.operators import dedup as DD
from omigo_data_analytics_spark.operators import similarity as SIM
from omigo_data_analytics_spark.operators import text as TX


def test_text_metrics(documents):
    m = TX.text_metrics(documents)
    row = m.df.select("text", *TX.METRICS).first()
    toks = [t for t in row["text"].split(" ") if t]
    assert row["token_count"] == len(toks)
    assert row["uniq_token_count"] == len(set(toks))
    assert 0 < row["type_token_ratio"] <= 1
    assert 0 <= row["stopword_ratio"] <= 1
    assert 0 < row["quality_score"] <= 1
    assert row["lang_guess"] in list(TX.LANG_MARKERS) + ["und"]


def test_fingerprint_identifies_exact_dups(spark):
    df = spark.createDataFrame(
        [(1, "a b  c"), (2, "A B C"), (3, "x y")], ["doc_id", "text"])
    fp = TX.fingerprint(OmigoDF(df))
    vals = {r["doc_id"]: r["fingerprint"] for r in fp.df.collect()}
    assert vals[1] == vals[2]  # case/whitespace-normalized
    assert vals[1] != vals[3]


def test_dedup_exact(spark):
    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, "other")], ["doc_id", "text"])
    out = DD.dedup_exact(OmigoDF(df), ["text"])
    rows = {r["doc_id"]: r["dup_count"] for r in out.df.collect()}
    assert rows == {1: 2, 3: 1}


def test_minhash_similar_docs_share_minhashes(spark):
    a = "the quick brown fox jumps over the lazy dog again and again today"
    b = a + " tomorrow"  # near-dup: most shingles shared
    c = "completely different words appear in this unrelated document text here"
    df = spark.createDataFrame([(1, a), (2, b), (3, c)], ["doc_id", "text"])
    sig = DD.minhash_signatures(OmigoDF(df))
    rows = {r["doc_id"]: [r[f"mh_{j}"] for j in range(DD.NUM_HASHES)]
            for r in sig.df.collect()}
    agree_ab = sum(x == y for x, y in zip(rows[1], rows[2]))
    agree_ac = sum(x == y for x, y in zip(rows[1], rows[3]))
    assert agree_ab > agree_ac
    assert agree_ab >= DD.NUM_HASHES // 2


def test_lsh_candidates_and_dedup_near(spark):
    a = "the quick brown fox jumps over the lazy dog again and again today"
    b = a + " tomorrow"
    c = "completely different words appear in this unrelated document text here"
    df = spark.createDataFrame([(1, a), (2, b), (3, c)], ["doc_id", "text"])
    cands = DD.lsh_candidate_pairs(OmigoDF(df))
    pairs = {(r["id_a"], r["id_b"]) for r in cands.df.collect()}
    assert (1, 2) in pairs and (1, 3) not in pairs
    kept = DD.dedup_near(OmigoDF(df), threshold=0.5)
    ids = sorted(r["doc_id"] for r in kept.df.collect())
    assert ids == [1, 3]  # higher id of the near-dup pair dropped


def test_ngram_jaccard_pairs(spark):
    a = "w1 w2 w3 w4 w5 w6"
    b = "w1 w2 w3 w4 w5 zz"
    c = "q1 q2 q3 q4 q5 q6"
    df = spark.createDataFrame([(1, a), (2, b), (3, c)], ["doc_id", "text"])
    out = DD.ngram_jaccard_pairs(OmigoDF(df), min_shared=1)
    rows = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out.df.collect()}
    assert (1, 2) in rows and (1, 3) not in rows
    # a has 4 shingles, b has 4, shared 3 -> jaccard 3/5
    assert abs(rows[(1, 2)] - 0.6) < 1e-9


def test_ngram_jaccard_hot_shingle_df_cap(spark):
    # 40 docs all sharing one boilerplate shingle ('x1 x2 x3' appears in
    # every doc): uncapped, that shingle alone emits 40*39/2 = 780 pairs.
    # With the DF cap below its frequency, the hot shingle is dropped from
    # candidate generation and only the genuinely-similar pair survives.
    boiler = "x1 x2 x3"
    docs = [(i, f"{boiler} u{i}a u{i}b u{i}c") for i in range(40)]
    docs.append((100, "y1 y2 y3 y4 y5"))
    docs.append((101, "y1 y2 y3 y4 zz"))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    capped = DD.ngram_jaccard_pairs(OmigoDF(df), min_shared=1, max_shingle_df=10)
    pairs = {(r["id_a"], r["id_b"]) for r in capped.df.collect()}
    assert pairs == {(100, 101)}
    uncapped = DD.ngram_jaccard_pairs(OmigoDF(df), min_shared=1, max_shingle_df=None)
    assert uncapped.df.count() == 780 + 1


def test_simhash_near_dup_low_hamming(spark):
    a = "the quick brown fox jumps over the lazy dog again and again today"
    b = a + " tomorrow"
    c = "completely different words appear in this unrelated document text here"
    df = spark.createDataFrame([(1, a), (2, b), (3, c)], ["doc_id", "text"])
    sh = {r["doc_id"]: r["simhash"] for r in DD.simhash(OmigoDF(df)).df.collect()}
    ham_ab = bin(sh[1] ^ sh[2]).count("1")
    ham_ac = bin(sh[1] ^ sh[3]).count("1")
    assert ham_ab < ham_ac


def test_cosine_topk_exact(embeddings):
    q = OmigoDF(embeddings.df.where("vec_id < 2"))
    c = OmigoDF(embeddings.df.where("vec_id >= 2"))
    out = SIM.cosine_topk(c, q, k=3)
    rows = out.df.collect()
    assert len(rows) == 6
    for r in rows:
        assert -1.0 <= r["cosine"] <= 1.0
    # rank 1 has max cosine within each query
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["cosine"]))
    for _, rs in by_q.items():
        rs.sort()
        assert all(rs[i][1] >= rs[i + 1][1] for i in range(len(rs) - 1))


def test_cosine_topk_lsh_recall(embeddings):
    q = OmigoDF(embeddings.df.where("vec_id < 5"))
    c = OmigoDF(embeddings.df.where("vec_id >= 5"))
    exact = {(r["query_id"], r["vec_id"])
             for r in SIM.cosine_topk(c, q, k=3).df.collect()}
    approx = {(r["query_id"], r["vec_id"])
              for r in SIM.cosine_topk_lsh(c, q, k=3).df.collect()}
    # multiprobe LSH should recover a decent share of exact neighbors
    assert len(exact & approx) >= len(exact) // 2


def test_explode_json(spark):
    df = spark.createDataFrame(
        [(1, '{"a": 1, "b": {"c": "x"}, "tags": [1, 2]}'),
         (2, '{"a": 5, "b": {"c": "y"}, "tags": []}')],
        ["id", "js"])
    out = OmigoDF(df).explode_json("js", "j")
    assert set(out.columns) == {"id", "j:a", "j:b:c", "j:tags"}
    rows = {r["id"]: r for r in out.df.collect()}
    assert rows[1]["j:a"] == "1" and rows[1]["j:b:c"] == "x" and rows[1]["j:tags"] == "1,2"
    assert rows[2]["j:tags"] == ""


def test_explode_json_array_of_structs(spark):
    df = spark.createDataFrame(
        [(1, '{"items": [{"k": "a", "v": 1}, {"k": "b", "v": 2}]}')],
        ["id", "js"])
    out = OmigoDF(df).explode_json("js", "j")
    assert out.num_rows() == 2
    ks = sorted(r["j:items:k"] for r in out.df.collect())
    assert ks == ["a", "b"]


def test_explode_json_cogroup_zips_parallel_lists(spark):
    js = '{"xs": [{"v": 1}, {"v": 2}, {"v": 3}], "ys": [{"w": "a"}, {"w": "b"}]}'
    df = spark.createDataFrame([(1, js)], ["id", "js"])
    # cogroup (reference default): positional zip, shorter list pads with ''
    out = OmigoDF(df).explode_json("js", "j", merge_list_method="cogroup",
                                   with_index=True)
    rows = sorted(((r["j:xs:v"], r["j:ys:w"], r["j:__explode_json_index__"])
                   for r in out.df.collect()))
    assert rows == [("1", "a", "0"), ("2", "b", "1"), ("3", "", "2")]
    # join: the combinatorial cartesian of the two lists
    outj = OmigoDF(df).explode_json("js", "j", merge_list_method="join")
    assert outj.num_rows() == 6


def test_explode_json_with_index_join_and_empty(spark):
    # join mode + with_index + >1 array: per-array index columns (a single
    # shared column would be overwritten by each successive explode)
    js = '{"xs": [{"v": 1}, {"v": 2}], "ys": [{"w": "a"}, {"w": "b"}, {"w": "c"}]}'
    df = spark.createDataFrame([(1, js)], ["id", "js"])
    outj = OmigoDF(df).explode_json("js", "j", merge_list_method="join",
                                    with_index=True)
    assert {"j:xs:__explode_json_index__", "j:ys:__explode_json_index__"} \
        <= set(outj.columns)
    rows = sorted((r["j:xs:v"], r["j:xs:__explode_json_index__"],
                   r["j:ys:w"], r["j:ys:__explode_json_index__"])
                  for r in outj.df.collect())
    assert len(rows) == 6 and rows[0] == ("1", "0", "a", "0")
    assert rows[-1] == ("2", "1", "c", "2")
    # single array keeps the reference's bare index name
    one = spark.createDataFrame([(1, '{"xs": [{"v": 7}]}')], ["id", "js"])
    out1 = OmigoDF(one).explode_json("js", "j", merge_list_method="join",
                                     with_index=True)
    assert out1.df.collect()[0]["j:__explode_json_index__"] == "0"
    # cogroup with all-empty lists: the padding row's index is '' like values
    js2 = '{"xs": [], "ys": []}'
    mixed = spark.createDataFrame([(1, js), (2, js2)], ["id", "js"])
    outc = OmigoDF(mixed).explode_json("js", "j", merge_list_method="cogroup",
                                       with_index=True)
    empt = [r for r in outc.df.collect() if r["id"] == 2]
    assert len(empt) == 1 and empt[0]["j:__explode_json_index__"] == ""


def test_explode_json_nested_cols_blob(spark):
    js = '{"a": 1, "meta": {"k1": "v1", "k2": "v2"}}'
    df = spark.createDataFrame([(1, js)], ["id", "js"])
    out = OmigoDF(df).explode_json("js", "j", nested_cols=["meta"])
    assert set(out.columns) == {"id", "j:a", "j:meta:json_encoded"}
    import urllib.parse
    blob = out.df.collect()[0]["j:meta:json_encoded"]
    import json as _json
    assert _json.loads(urllib.parse.unquote(blob)) == {"k1": "v1", "k2": "v2"}


def test_explode_json_transpose_col_groups(spark):
    js = '{"a": 1, "meta": {"k1": "v1", "k2": "v2"}}'
    df = spark.createDataFrame([(1, js)], ["id", "js"])
    out = OmigoDF(df).explode_json("js", "j", transpose_col_groups=["meta"])
    assert {"j:__key__", "j:__value__"} <= set(out.columns)
    kv = sorted((r["j:__key__"], r["j:__value__"]) for r in out.df.collect())
    assert kv == [("k1", "v1"), ("k2", "v2")]
    assert all(r["j:a"] == "1" for r in out.df.collect())


def test_explode_json_source_row_index(spark):
    df = spark.createDataFrame(
        [(1, '{"a": 1}'), (2, '{"a": 2}')], ["id", "js"])
    out = OmigoDF(df).explode_json("js", "j", add_json_index=True)
    rows = {r["id"]: r["j:__json_index__"] for r in out.df.collect()}
    assert sorted(rows.values()) == [1, 2]


def test_ivf_kmeans_trained_centroids(embeddings):
    cents = SIM.train_ivf_centroids(embeddings, num_centroids=8, iters=2)
    assert len(cents) == 8
    dim = SIM.detect_dim(embeddings.df, "embedding")
    assert all(len(v) == dim for _, v in cents)
    q = OmigoDF(embeddings.df.where("vec_id < 5"))
    c = OmigoDF(embeddings.df.where("vec_id >= 5"))
    exact = {(r["query_id"], r["vec_id"])
             for r in SIM.cosine_topk(c, q, k=3).df.collect()}
    trained = {(r["query_id"], r["vec_id"])
               for r in SIM.cosine_topk_ivf(c, q, k=3, nprobe=4,
                                            centroids=cents).df.collect()}
    # trained quantizer must keep useful recall
    assert len(exact & trained) >= len(exact) // 2


def test_cosine_topk_ivf_recall_and_shape(embeddings):
    q = OmigoDF(embeddings.df.where("vec_id < 5"))
    c = OmigoDF(embeddings.df.where("vec_id >= 5"))
    exact = {(r["query_id"], r["vec_id"])
             for r in SIM.cosine_topk(c, q, k=3).df.collect()}
    rows = SIM.cosine_topk_ivf(c, q, k=3, nprobe=8).df.collect()
    approx = {(r["query_id"], r["vec_id"]) for r in rows}
    # every query answered with k ranked candidates
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == [1, 2, 3] for v in by_q.values())
    # probing half the lists should recover a decent share of exact neighbors
    assert len(exact & approx) >= len(exact) // 2


def test_ivf_centroids_deterministic(embeddings):
    c = OmigoDF(embeddings.df.where("vec_id >= 5"))
    cents = SIM.ivf_centroids(c, num_centroids=4)
    assert [cid for cid, _ in cents] == [5, 6, 7, 8]
    assert all(len(v) == 64 for _, v in cents)


def test_embedding_dup_pairs_exact_vs_lsh(embeddings):
    # exact pairs at a moderate threshold (this corpus has no >=0.9 dups)
    pairs = DD.embedding_dup_pairs(embeddings, threshold=0.4).df.collect()
    assert all(r["id_a"] < r["id_b"] and r["cosine"] >= 0.4 for r in pairs)
    exact = {(r["id_a"], r["id_b"]) for r in pairs}
    assert exact  # threshold picked so sf0.001 has pairs
    # lsh candidates are a subset with identical cosines where found
    lsh = {(r["id_a"], r["id_b"])
           for r in DD.embedding_dup_pairs(embeddings, threshold=0.4,
                                           method="lsh").df.collect()}
    assert lsh <= exact


def test_dedup_embedding_drops_higher_ids(embeddings):
    before = embeddings.num_rows()
    pairs = DD.embedding_dup_pairs(embeddings, threshold=0.4).df.collect()
    doomed = {r["id_b"] for r in pairs}
    kept = {r["vec_id"]
            for r in DD.dedup_embedding(embeddings, threshold=0.4).df.collect()}
    assert kept == {r["vec_id"] for r in embeddings.df.collect()} - doomed
    assert len(kept) == before - len(doomed)


def test_chunk_documents(spark):
    import pytest as _pt
    from omigo_data_analytics_spark.core.dataframe import OmigoDF
    from omigo_data_analytics_spark.operators.text import chunk_documents

    text = " ".join(f"w{i}" for i in range(10))       # 10 tokens
    df = spark.createDataFrame([(1, text), (2, "a b"), (3, "")],
                               ["doc_id", "text"])
    out = chunk_documents(OmigoDF(df), "text", max_tokens=4, overlap=1).df
    rows = {(r["doc_id"], r["chunk_idx"]): (r["chunk"], r["chunk_n_tokens"])
            for r in out.collect()}
    # doc 1: starts every 3 tokens -> 0,3,6,9 -> 4 chunks
    assert rows[(1, 0)] == ("w0 w1 w2 w3", 4)
    assert rows[(1, 1)] == ("w3 w4 w5 w6", 4)       # 1-token overlap
    assert rows[(1, 2)] == ("w6 w7 w8 w9", 4)
    assert rows[(1, 3)] == ("w9", 1)                # short tail chunk
    # doc 2 fits in one chunk; doc 3 empty -> one empty chunk with ZERO
    # tokens (the filtered tokenizer no longer counts the phantom '' token)
    assert rows[(2, 0)] == ("a b", 2)
    assert rows[(3, 0)] == ("", 0)
    assert len(rows) == 6
    # every token of doc 1 appears in at least one chunk
    covered = set()
    for (d, _), (c, _) in rows.items():
        if d == 1:
            covered.update(c.split())
    assert covered == {f"w{i}" for i in range(10)}
    with _pt.raises(ValueError):
        chunk_documents(OmigoDF(df), "text", max_tokens=4, overlap=4)


def test_token_counts(spark):
    from omigo_data_analytics_spark.core.dataframe import OmigoDF
    from omigo_data_analytics_spark.operators.text import token_counts

    df = spark.createDataFrame(
        [(1, "the cat sat on the mat"),
         (2, "The dog"),
         (3, "")], ["doc_id", "text"])
    rows = {r["token"]: (r["count"], r["doc_freq"])
            for r in token_counts(OmigoDF(df), "text").df.collect()}
    assert rows["the"] == (3, 2)      # lowercased; twice in doc 1, once in doc 2
    assert rows["cat"] == (1, 1)
    assert "" not in rows
    # min_count prunes
    pruned = {r["token"] for r in
              token_counts(OmigoDF(df), "text", min_count=2).df.collect()}
    assert pruned == {"the"}
    # case-sensitive spelling
    cs = {r["token"]: r["count"] for r in
          token_counts(OmigoDF(df), "text", lowercase=False).df.collect()}
    assert cs["The"] == 1 and cs["the"] == 2


def test_ivf_persisted_index_prunes_partitions(spark, embeddings, tmp_path):
    from omigo_data_analytics_spark import OmigoDF
    from omigo_data_analytics_spark.operators import similarity as SIM
    from pyspark.sql import functions as F

    path = str(tmp_path / "ivf_index")
    cents = SIM.build_ivf_index(embeddings, path, num_centroids=8, iters=2)
    assert len(cents) == 8
    q = OmigoDF(embeddings.df.where("vec_id < 3"))
    got = SIM.cosine_topk_ivf_indexed(spark, path, q, k=5, nprobe=3).df
    # identical results to the in-memory IVF path with the same centroids
    want = SIM.cosine_topk_ivf(embeddings, q, k=5, nprobe=3,
                               centroids=cents).df
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # the probed-list filter must prune partitions at the scan
    corpus = spark.read.parquet(f"{path}/assignments")
    plan = (corpus.where(F.col("__list__").isin([cents[0][0]]))
            ._jdf.queryExecution().executedPlan().toString())
    assert "PartitionFilters: [" in plan and "__list__" in plan


def test_pack_sequences_contiguous_and_bounded(spark, documents):
    """Deterministic training-bin packing: bin ids contiguous from 0,
    volumes conserved, every non-last bin's assigned volume within one
    document of the budget, and the plan has NO global (unpartitioned)
    window over the data — the per-row cumsum windows are partitioned
    by hash bucket."""
    import collections
    import re

    from omigo_data_analytics_spark.operators import text as TX

    budget = 20000
    out = TX.pack_sequences(documents, "n_chars", budget=budget,
                            key_cols=["doc_id"])
    rows = {r["doc_id"]: (r["bin_id"], r["n_chars"])
            for r in out.df.select("doc_id", "bin_id", "n_chars").collect()}
    assert len(rows) == documents.num_rows()
    vol = collections.defaultdict(int)
    for b, n in rows.values():
        vol[b] += n
    mx = max(vol)
    assert set(vol) == set(range(mx + 1))
    maxdoc = max(n for _, n in rows.values())
    assert all(abs(v - budget) <= maxdoc
               for b, v in vol.items() if b != mx)
    # determinism
    again = {r["doc_id"]: r["bin_id"] for r in
             TX.pack_sequences(documents, "n_chars", budget=budget,
                               key_cols=["doc_id"])
             .df.select("doc_id", "bin_id").collect()}
    assert again == {k: b for k, (b, _) in rows.items()}
    # scale guard: every window over the document rows is partitioned;
    # the only orderBy-without-partitionBy window is the 256-row bucket
    # offset table (its child is the per-bucket aggregate, not the docs)
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    n_windows = len(re.findall(r"\bWindow \[", plan))
    n_partitioned = len(re.findall(
        r"Window \[[^\]]*\], \[__bkt__", plan))
    assert n_windows - n_partitioned <= 1


def test_pack_sequences_validates_budget(spark, documents):
    import pytest as _pt

    from omigo_data_analytics_spark.operators import text as TX
    with _pt.raises(ValueError, match="budget"):
        TX.pack_sequences(documents, "n_chars", budget=0, key_cols=["doc_id"])


def test_pack_sequences_check_unique_guard(spark, documents):
    """Opt-in duplicate-key detection: silent on a unique key, UserWarning
    (with counts) when key_cols doesn't uniquely identify rows — the
    cumsum order of duplicate-key rows is partition-order-dependent."""
    import warnings

    import pytest as _pt

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        TX.pack_sequences(documents, "n_chars", budget=20000,
                          key_cols=["doc_id"], check_unique=True)
    dup = OmigoDF(documents.df.limit(40)
                  .unionByName(documents.df.limit(40)))
    with _pt.warns(UserWarning, match="uniquely"):
        TX.pack_sequences(dup, "n_chars", budget=20000,
                          key_cols=["doc_id"], check_unique=True)


def test_span_dedup_key_bits(spark, documents):
    """120-bit removal keys (the mutation-safe default) agree exactly with
    the 60-bit path at collision-free test scale, and bad widths raise."""
    import pytest as _pt

    a = {(r["doc_id"], r["text"], r["removed_tokens"])
         for r in DD.remove_duplicate_spans(documents, n=8).df.collect()}
    b = {(r["doc_id"], r["text"], r["removed_tokens"])
         for r in DD.remove_duplicate_spans(documents, n=8,
                                            key_bits=60).df.collect()}
    assert a == b
    with _pt.raises(ValueError, match="60 or 120"):
        DD.wide_hash("spark", "x", bits=90)


def test_span_grams_expr_validates_key_bits():
    import pytest as _pt

    with _pt.raises(ValueError, match="60 or 120"):
        DD.span_grams_expr("spark", "text", 8, key_bits=90)


def test_redact_pii_leaves_dates_and_ranges(spark):
    """The phone pattern demands 10-15 digits: ISO dates and numeric
    ranges (8 digits) must survive; real phone shapes still redact."""
    df = OmigoDF(spark.createDataFrame(
        [(1, "released 2026-08-14 batch"),
         (2, "order 1000 - 2000 units"),
         (3, "call +1 415-555-0199 now"),
         (4, "call 4155550199 now")], ["doc_id", "text"]))
    got = {r["doc_id"]: r["text"] for r in TX.redact_pii(df).df.collect()}
    assert got[1] == "released 2026-08-14 batch"
    assert got[2] == "order 1000 - 2000 units"
    assert "<PHONE>" in got[3] and "<PHONE>" in got[4]


def test_lang_guess_und_reachable(spark):
    """Zero-signal documents (no marker words) must label 'und', not
    fall through to the first language in tie order."""
    df = OmigoDF(spark.createDataFrame(
        [(1, "xyzzy plugh zork"),      # no markers in any language
         (2, "the and is of house")],  # english markers
        ["doc_id", "text"]))
    got = {r["doc_id"]: r["lang_guess"]
           for r in TX.text_metrics(df).df.select("doc_id", "lang_guess")
           .collect()}
    assert got[1] == "und" and got[2] == "en"


def test_chunk_documents_collapses_whitespace_runs(spark):
    """Tokenization matches the token-count metric: runs of spaces must
    not produce phantom empty tokens that shift chunk boundaries."""
    from omigo_data_analytics_spark.operators.text import chunk_documents

    df = OmigoDF(spark.createDataFrame(
        [(1, "a  b   c d")], ["doc_id", "text"]))
    rows = chunk_documents(df, "text", max_tokens=3, overlap=0).df.collect()
    got = {(r["chunk_idx"]): (r["chunk"], r["chunk_n_tokens"]) for r in rows}
    assert got[0] == ("a b c", 3) and got[1] == ("d", 1)


def test_duplicate_span_stats_check_unique_warns(spark, documents):
    import warnings

    import pytest as _pt

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        DD.duplicate_span_stats(documents, n=8, check_unique=True)
    dup = OmigoDF(documents.df.limit(20)
                  .unionByName(documents.df.limit(20)))
    with _pt.warns(UserWarning, match="uniquely"):
        DD.duplicate_span_stats(dup, n=8, check_unique=True)


def test_similarity_builders_launch_no_driver_jobs(spark, embeddings):
    """Building the (lazy) top-k plan must not run Spark jobs — the old
    detect_dim probe executed the corpus plan once per API call for a
    value the dot/norm expressions never used."""
    sc = spark.sparkContext
    q = OmigoDF(embeddings.df.limit(3))
    sc.setJobGroup("simbuild", "plan construction only")
    try:
        SIM.cosine_topk(embeddings, q, k=2)
        SIM.cosine_topk_lsh(embeddings, q, k=2)
    finally:
        n_jobs = len(sc.statusTracker().getJobIdsForGroup("simbuild"))
        sc.setJobGroup(None, None)
    assert n_jobs == 0, f"plan construction launched {n_jobs} jobs"


def test_ensure_min_parallelism_no_eager_job_on_derived(spark, documents):
    """Regression (r8): probing df.rdd.getNumPartitions() on a DERIVED
    plan finalizes AQE query stages, eagerly running every upstream
    shuffle before the operator's own action — and the repartition it
    guarded discarded AQE's coalesced partitioning. The probe must now
    run only on exchange-free plans; derived plans pass through as-is."""
    sc = spark.sparkContext
    derived = documents.df.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    # sanity: the plan really does carry an exchange
    assert "Exchange" in derived._jdf.queryExecution().executedPlan().toString()
    sc.setJobGroup("emp_derived", "plan construction only")
    try:
        out = TX.ensure_min_parallelism(derived)
    finally:
        n_jobs = len(sc.statusTracker().getJobIdsForGroup("emp_derived"))
        sc.setJobGroup(None, None)
    assert n_jobs == 0, f"derived-plan probe ran {n_jobs} eager job(s)"
    assert out is derived  # untouched: AQE keeps its runtime coalesce


def test_ensure_min_parallelism_still_widens_bare_scan(spark, tmp_path):
    """The guard's original purpose survives: a single compacted file
    scans as ONE split (maxPartitionBytes cannot split a row group), and
    the map fan-out must still be widened there."""
    p = str(tmp_path / "one_file.parquet")
    spark.range(1000).coalesce(1).write.parquet(p)
    scan = spark.read.parquet(p)
    assert "Exchange" not in scan._jdf.queryExecution().executedPlan().toString()
    out = TX.ensure_min_parallelism(scan, min_parts=8)
    assert out.rdd.getNumPartitions() >= 8


def test_ensure_min_parallelism_widens_through_broadcast_join(spark, tmp_path):
    """Regression (r8 review): a BroadcastExchange never repartitions the
    probe side — a one-split corpus scan broadcast-joined to a small dim
    is still single-task. The 'derived' gate must match SHUFFLE
    exchanges only, or the guard silently dies on every
    broadcast-enriched input."""
    p = str(tmp_path / "one_file_bj.parquet")
    spark.range(1000).selectExpr("id", "CAST(id % 3 AS STRING) AS k") \
        .coalesce(1).write.parquet(p)
    scan = spark.read.parquet(p)
    dim = spark.createDataFrame([("0", "a"), ("1", "b")], ["k", "v"])
    j = scan.join(F.broadcast(dim), "k")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan  # sanity: only a broadcast exchange
    out = TX.ensure_min_parallelism(j, min_parts=8)
    assert out.rdd.getNumPartitions() >= 8


def test_shuffle_exchange_regex_matches_this_spark_version(spark, documents):
    """Version pin (r8 advice): the derived-plan gate reads
    executedPlan().toString(), whose formatting can drift across Spark
    versions. Assert the PRODUCTION regex recognizes every shuffle
    partitioning the running Spark actually prints — if an upgrade
    changes the plan text, this fails loudly instead of the gate
    silently treating every plan as exchange-free."""
    import re as _re

    def plan_of(df):
        return df._jdf.queryExecution().executedPlan().toString()

    d = documents.df
    shuffled = {
        "hashpartitioning": d.groupBy("lang").agg(F.count(F.lit(1)).alias("n")),
        "rangepartitioning": d.orderBy("doc_id"),
        "RoundRobinPartitioning": d.repartition(4),
        "SinglePartition": d.agg(F.count(F.lit(1)).alias("n")),
    }
    for kind, df in shuffled.items():
        p = plan_of(df)
        assert kind in p, f"{kind} not in this Spark's plan text:\n{p}"
        assert _re.search(TX._SHUFFLE_EXCHANGE_RE, p), \
            f"production regex missed {kind}:\n{p}"
    # and a broadcast-only plan must NOT match (the r8-review corner)
    dim = d.sparkSession.createDataFrame([("en", 1)], ["lang", "x"])
    bj = d.join(F.broadcast(dim), "lang")
    pb = plan_of(bj)
    assert "BroadcastExchange" in pb
    assert not _re.search(TX._SHUFFLE_EXCHANGE_RE, pb)


def test_ensure_min_parallelism_introspection_failure_passthrough(spark, tmp_path):
    """r8 advice: when plan introspection throws, the OLD fallback ran
    the eager probe — silently reintroducing the AQE stage-finalizing
    regression exactly when the gate was blind. The safe default is to
    return the plan untouched (the widen is an optimization; skipping it
    is always correct)."""
    p = str(tmp_path / "one_file_fb.parquet")
    spark.range(100).coalesce(1).write.parquet(p)
    scan = spark.read.parquet(p)

    class Broken:
        isStreaming = False

        def __init__(self, inner):
            self._inner = inner

        @property
        def sparkSession(self):
            return self._inner.sparkSession

        @property
        def _jdf(self):
            raise RuntimeError("introspection unavailable")

        @property
        def rdd(self):
            raise AssertionError(
                "eager probe must not run when introspection failed")

        def repartition(self, n):
            raise AssertionError("must not repartition blind")

    b = Broken(scan)
    assert TX.ensure_min_parallelism(b, min_parts=8) is b


def test_token_estimates_known_values(spark):
    from omigo_data_analytics_spark.operators.text import token_estimates

    d = OmigoDF(spark.createDataFrame(
        [(1, "foo.bar(x)"),          # foo . bar ( x )  -> 6 pieces
         (2, "hello world"),          # hello, " world"  -> 2 pieces
         (3, "internationalization"), # 1 piece, 20 chars -> ceil(20/4)=5
         (4, "isn't it"),             # isn 't " it"     -> 3 pieces
         (5, ""), (6, None)],
        "doc_id long, text string"))
    rows = {r["doc_id"]: r for r in token_estimates(d).df.collect()}
    assert rows[1]["pretoken_count"] == 6
    assert rows[2]["pretoken_count"] == 2
    assert rows[3]["pretoken_count"] == 1
    assert rows[3]["token_estimate"] == 5
    assert rows[4]["pretoken_count"] == 3
    assert rows[5]["pretoken_count"] == 0 and rows[5]["token_estimate"] == 0
    assert rows[6]["pretoken_count"] is None and rows[6]["token_estimate"] is None
    # punctuation-dense text: the BPE-ish count exceeds whitespace count
    # (text_metrics' ratio columns ANSI-divide by token_count, so feed it
    # only the non-degenerate row)
    from omigo_data_analytics_spark.operators.text import text_metrics
    ws = {r["doc_id"]: r["token_count"] for r in text_metrics(
        OmigoDF(d.df.where("doc_id = 1"))).df.collect()}
    assert rows[1]["pretoken_count"] > ws[1]


def test_token_estimates_matches_duckdb(documents):
    import duckdb
    import pandas as pd
    from omigo_data_analytics_spark.operators.text import (
        token_estimate_exprs, token_estimates)

    sp = (token_estimates(documents).df
          .select("doc_id", "pretoken_count", "token_estimate")
          .toPandas().sort_values("doc_id").reset_index(drop=True))
    ex = token_estimate_exprs("duckdb")
    du = duckdb.sql(
        f"SELECT doc_id, {ex['pretoken_count']} AS pretoken_count, "
        f"{ex['token_estimate']} AS token_estimate "
        f"FROM '/root/testdata/sf0.001/documents.parquet' "
        f"ORDER BY doc_id").df().reset_index(drop=True)
    pd.testing.assert_frame_equal(sp, du, check_dtype=False)


def test_token_estimates_is_map_side(documents):
    from omigo_data_analytics_spark.operators.text import token_estimates

    p = (token_estimates(documents).df
         ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange hashpartitioning" not in p
