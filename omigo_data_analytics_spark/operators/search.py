"""Bloom-bitset substring search — the reference's text-analysis Spark
job (projects/matel/text-analysis HashUtils.scala:22-130 +
BitSetOperations.scala:38-160) re-expressed as DataFrame algebra.

The idea: every document's words shred into sliding ``phrase_len``-char
phrases, each phrase hashes to a bit in a ``hash_space``-bit signature,
and a substring query becomes a SUBSET test — a doc can contain the
query only if the doc's signature has every bit of the query's
signature. The subset test is a handful of 64-bit AND/compare ops per
row (pure codegen, no shuffle, no Python), so a 100 TB corpus is
prefiltered at scan speed; survivors get the exact ``contains`` check,
making results EXACT (the bloom layer can only produce false
positives, which verification removes — the oracle is a plain LIKE).

Signatures can be computed once and persisted next to the corpus
(``add_search_signature`` + io.write_parquet), after which searches
never touch the text column until verification — the reference job's
serialize-bitsets-then-filter flow (BitSetOperations.bitSetMapFunction).

Delta from the reference, documented: its phrase hash is JVM
``String.hashCode`` seeding ``java.util.Random`` (HashUtils.scala:22-41)
— JVM-private; here phrases use the portable md5-polynomial hash
(operators/text.py) so the Python query side, the JVM doc side, and the
DuckDB oracle agree bit-for-bit. Word shredding follows
generatePhrasesV1 (HashUtils.scala:119-130): split on ``[:\\/,; -]``,
all sliding phrases of words >= phrase_len chars.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from ..core.colutils import qcol, quote

from ..core.dataframe import OmigoDF
from .text import (HASH_MOD, WS_RUN_DUCK, WS_RUN_SPARK,
                   ensure_min_parallelism, hash_spark, let_spark)

PHRASE_LEN = 5
HASH_SPACE = 1024  # bits -> 16 longs per signature
_SEP_SPARK = r"[:\\\\/,; -]"
_SEP_PY = r"[:\\/,; -]"


def _phrases_expr(col: str, phrase_len: int) -> str:
    """Sliding phrase list: split on the reference's separator class,
    keep words >= phrase_len, emit every phrase_len-char substring."""
    words = f"filter(split({quote(col)}, '{_SEP_SPARK}'), w -> length(w) >= {phrase_len})"
    grams = (f"transform(sequence(1, length(w0) - {phrase_len - 1}), "
             f"i -> substring(w0, i, {phrase_len}))")
    return (f"flatten(transform({words}, w0 -> {grams}))")


def signature_expr(col: str, phrase_len: int = PHRASE_LEN,
                   hash_space: int = HASH_SPACE) -> str:
    """array<bigint> signature (hash_space/64 words), bits OR-folded over
    the phrase hashes. Pure per-row expression — map-side, codegen."""
    n_words = hash_space // 64
    hashes = (f"transform({_phrases_expr(col, phrase_len)}, "
              f"p -> {hash_spark('p')} % {hash_space}L)")
    fold = (f"aggregate(h0, array_repeat(0L, {n_words}), (acc, b) -> "
            f"transform(acc, (w, wi) -> CASE WHEN CAST(b / 64 AS INT) = wi "
            f"THEN w | shiftleft(1L, CAST(b % 64 AS INT)) ELSE w END))")
    return let_spark(hashes, "h0", fold)


def _py_phrase_bit(phrase: str, hash_space: int) -> int:
    """Python twin of hash_spark(p) % hash_space."""
    h = int(hashlib.md5(phrase.encode()).hexdigest()[:15], 16) % HASH_MOD
    return h % hash_space


def query_signature(query: str, phrase_len: int = PHRASE_LEN,
                    hash_space: int = HASH_SPACE) -> list[int]:
    """Driver-side signature of a search string: same shredding as the
    doc side, but a query SEGMENT shorter than phrase_len contributes
    nothing (it may be a partial word in the document — skipping it can
    only weaken the prefilter, never produce a false negative)."""
    import re

    words = [w for w in re.split(_SEP_PY, query) if len(w) >= phrase_len]
    sig = [0] * (hash_space // 64)
    for w in words:
        for i in range(len(w) - phrase_len + 1):
            b = _py_phrase_bit(w[i:i + phrase_len], hash_space)
            sig[b // 64] |= 1 << (b % 64)
    return sig


def add_search_signature(odf: OmigoDF, col: str = "text",
                         new_col: str = "search_bits",
                         phrase_len: int = PHRASE_LEN,
                         hash_space: int = HASH_SPACE) -> OmigoDF:
    """Persistable signature column — compute once, search many."""
    odf._resolve(col)
    df = ensure_min_parallelism(odf.df)
    return OmigoDF(df.withColumn(
        new_col, F.expr(signature_expr(col, phrase_len, hash_space))))


def subset_filter(sig_col: str, qsig: list[int]):
    """(doc_sig AND q) == q over the non-zero words of the query
    signature — the candidate predicate. Empty query signature (all
    segments shorter than phrase_len) keeps every row: the prefilter
    degenerates but exactness is preserved by verification."""
    conds = None
    for wi, qw in enumerate(qsig):
        if qw == 0:
            continue
        c = (F.element_at(qcol(sig_col), wi + 1).bitwiseAND(F.lit(qw))
             == F.lit(qw))
        conds = c if conds is None else (conds & c)
    return conds if conds is not None else F.lit(True)


def bloom_substring_search(odf: OmigoDF, query: str, col: str = "text",
                           sig_col: str | None = None,
                           phrase_len: int = PHRASE_LEN,
                           hash_space: int = HASH_SPACE) -> OmigoDF:
    """Exact substring search with a bloom-bitset prefilter. If
    ``sig_col`` names a precomputed signature column it is used (the
    persisted-index path); otherwise signatures compute inline (single
    pass, still map-side)."""
    odf._resolve(col)
    df = odf.df
    qsig = query_signature(query, phrase_len, hash_space)
    if sig_col is None:
        sig = F.expr(signature_expr(col, phrase_len, hash_space))
        tmp = "__search_bits__"
        df = ensure_min_parallelism(df).withColumn(tmp, sig)
        out = (df.filter(subset_filter(tmp, qsig))
               .filter(F.instr(qcol(col), F.lit(query)) > 0)
               .drop(tmp))
    else:
        odf._resolve(sig_col)
        out = (df.filter(subset_filter(sig_col, qsig))
               .filter(F.instr(qcol(col), F.lit(query)) > 0))
    return OmigoDF(out)


BM25_K1 = 1.2
BM25_B = 0.75


def _bm25_terms(query: str, lowercase: bool) -> list[str]:
    terms = sorted({t for t in (query.lower() if lowercase else query).split()
                    if t})
    if not terms:
        raise ValueError("bm25_rank: query has no tokens")
    return terms


def _bm25_pairs(base, id_col: str, terms: list[str]):
    """Matched (doc, term) pairs with tf and doc length — the map-side
    heart of BM25: the IN-filter sits between the explode and the
    partial aggregation, so the shuffle carries matched pairs only."""
    return (base.select(qcol(id_col), "dl",
                        F.explode_outer("__toks__").alias("term"))
            .where(F.col("term").isin(terms))
            .groupBy(qcol(id_col), "term")
            .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")))


def bm25_rank(odf: OmigoDF, query: str, id_col: str = "doc_id",
              col: str = "text", k1: float = BM25_K1, b: float = BM25_B,
              lowercase: bool = True) -> OmigoDF:
    """BM25 relevance of every document matching a bag-of-words query —
    the ranking half of the text-retrieval pair (bloom_substring_search
    finds exact spans; this ranks by term relevance). Completes the
    tf-idf / inverted-index family (operators/text.py) with the scoring
    a retrieval-based curation pass (e.g. ranked decontamination review,
    nearest-benchmark inspection) actually runs. Per term t and doc d:

        idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))     (Lucene form,
                                                            never negative)
        score    = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    with df = docs containing t, dl = doc token count, avgdl the corpus
    mean. Returns (id_col, n_terms_matched, bm25) for docs matching >= 1
    query term; the per-doc sum folds over term-SORTED scores so the
    float order is deterministic and the DuckDB oracle (bm25_sql_duck)
    reproduces it bit-for-bit.

    Scale shape: the query-term IN-filter lands on the exploded token
    stream map-side, so the only corpus-sized work is the scan — the
    (id, term) aggregation carries matched pairs only (a vanishing
    fraction for real queries). The pairs table is lazily
    localCheckpoint-ed before the df aggregation: BM25 inherently joins
    the pairs with a per-term stat derived FROM those pairs, and without
    the lineage break Catalyst expands the self-reference into a second
    full scan+explode+filter pipeline (measured: 3 corpus subtrees in
    the naive plan). Checkpointing materializes only the matched pairs
    (executor-local, distributed), df then aggregates them with map-side
    combine — skew-free where a count-window over term would collapse a
    hot-term query into one sorted partition — and broadcasts back.
    Corpus stats (N, sum dl) are ONE scalar row cross-joined back
    broadcast; explode_outer (not explode) keeps the tf branch's
    exchange subtree byte-identical to the stats branch's — a plain
    explode pushes an implicit non-empty-array filter below the
    exchange, which defeats ReuseExchange and doubles the corpus
    shuffle when the min-parallelism repartition is active; the
    IN-filter drops the outer-null rows anyway. No driver collect
    anywhere."""
    odf._resolve([id_col, col])
    terms = _bm25_terms(query, lowercase)
    # a whitespace-run split (not ' '): the query side tokenizes with
    # Python .split() (any whitespace), so a space-only corpus split
    # would fuse tokens across newlines/tabs into unmatchable strings —
    # a silent recall hole on any multi-line corpus (r8 review). The
    # explicit WS_RUN class, not \s: Java's \s includes U+000B where
    # RE2's (DuckDB) does not, so \s broke parity on vertical-tab text
    # (r8 advice); neither side matches unicode spaces, as before.
    toks = (f"filter(split({'lower' if lowercase else ''}"
            f"({quote(col)}), '{WS_RUN_SPARK}'), x -> x != '')")
    base = (ensure_min_parallelism(odf.df)
            .select(qcol(id_col), F.expr(toks).alias("__toks__"),
                    F.expr(f"size({toks})").alias("dl")))
    stats = base.agg(F.count(F.lit(1)).alias("n"),
                     F.sum("dl").alias("total_dl"))
    tf = _bm25_pairs(base, id_col, terms).localCheckpoint(eager=False)
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    score = _bm25_score_sql(k1, b)
    sc = (tf.join(F.broadcast(df_), "term")
          .crossJoin(F.broadcast(stats))
          .select(qcol(id_col), "term", F.expr(score).alias("score")))
    out = (sc.groupBy(qcol(id_col))
           .agg(F.count(F.lit(1)).alias("n_terms_matched"),
                F.sort_array(F.collect_list(F.struct("term", "score")))
                .alias("__ts__"))
           .select(qcol(id_col), "n_terms_matched",
                   F.round(F.expr(
                       "aggregate(transform(__ts__, x -> x.score), 0D, "
                       "(a, x) -> a + x)"), 6).alias("bm25")))
    return OmigoDF(out)


def _bm25_score_sql(k1: float, b: float) -> str:
    """The literal score text shared by BOTH dialects — one definition,
    spliced verbatim into the engine's selectExpr and the DuckDB oracle:
    textual identity IS the bit-parity guarantee (identical IEEE op
    order). Every constant is DOUBLE-cast: a bare ``0.5``/``k1`` literal
    parses as DECIMAL in both engines, making the Lucene idf ratio a
    DECIMAL-DECIMAL division whose truncation behavior the engines need
    not share — the exact hazard `_micro_consts` documents for DSIR and
    the r8 advisor caught in lm_score (r9 audit closed it here too)."""
    half = "CAST(0.5 AS DOUBLE)"
    kd = f"CAST({k1!r} AS DOUBLE)"
    bd = f"CAST({b!r} AS DOUBLE)"
    return (f"ln(1 + (n - df + {half}) / (df + {half})) * tf * ({kd} + 1) "
            f"/ (tf + {kd} * (1 - {bd} + {bd} * dl "
            f"/ (CAST(total_dl AS DOUBLE) / n)))")


def bm25_sql_duck(table: str, query: str, id_col: str = "doc_id",
                  col: str = "text", k1: float = BM25_K1, b: float = BM25_B,
                  lowercase: bool = True) -> str:
    """DuckDB replay of bm25_rank: same tokens, same literal score text,
    same term-sorted fold."""
    terms = _bm25_terms(query, lowercase)
    # '' escaping: terms are user input; an apostrophe would otherwise
    # break the oracle (the Spark side's isin() was never at risk)
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    lc = "lower" if lowercase else ""
    score = _bm25_score_sql(k1, b)
    return f"""
WITH toks AS (SELECT {id_col},
                     list_filter(string_split_regex({lc}({col}), '{WS_RUN_DUCK}'),
                                 x -> x != '') AS t
              FROM {table}),
stats AS (SELECT COUNT(*) AS n, SUM(len(t)) AS total_dl FROM toks),
ex AS (SELECT {id_col}, len(t) AS dl, unnest(t) AS term FROM toks),
tf AS (SELECT {id_col}, term, COUNT(*) AS tf, ANY_VALUE(dl) AS dl
       FROM ex WHERE term IN ({in_list}) GROUP BY {id_col}, term),
d AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
sc AS (SELECT tf.{id_col}, tf.term, {score} AS score
       FROM tf JOIN d USING (term) CROSS JOIN stats)
SELECT {id_col}, CAST(COUNT(*) AS BIGINT) AS n_terms_matched,
       round(list_sum(list(score ORDER BY term)), 6) AS bm25
FROM sc GROUP BY {id_col}
"""


def search_job(odf: OmigoDF, must_contain: str, rank_query: str,
               k: int = 10, id_col: str = "doc_id", col: str = "text",
               sig_col: str | None = None,
               k1: float = BM25_K1, b: float = BM25_B) -> OmigoDF:
    """Executed search composition — the full retrieval flow as ONE lazy
    plan: bloom-bitset prefilter + exact ``must_contain`` verification
    narrows the corpus to candidates, BM25 ranks the candidates against
    ``rank_query`` (corpus statistics over the CANDIDATE set — standard
    filtered-retrieval semantics), global top-k by (bm25 desc, id asc).

    Scale shape: the prefilter is a scan-speed signature test (16 longs
    per row, persisted when ``sig_col`` names a precomputed column);
    BM25's shuffle carries matched (candidate, term) pairs only; the
    top-k is Spark's distributed TakeOrdered (per-partition heads, no
    single-partition sort). Deterministic: ties at the k boundary break
    by id."""
    # checkpoint the candidate set: bm25_rank's stats and tf branches
    # each derive their input, and without the lineage break the
    # signature fold + contains verify would run over the corpus TWICE
    # (r8 review; same pattern as fuzzy_pairs' base)
    cands = OmigoDF(bloom_substring_search(odf, must_contain, col=col,
                                           sig_col=sig_col)
                    .df.localCheckpoint(eager=False))
    ranked = bm25_rank(cands, rank_query, id_col=id_col, col=col,
                       k1=k1, b=b)
    return OmigoDF(ranked.df
                   .orderBy(F.desc("bm25"), F.asc(id_col))
                   .limit(int(k)))


def search_job_sql_duck(table: str, must_contain: str, rank_query: str,
                        k: int = 10, id_col: str = "doc_id",
                        col: str = "text",
                        k1: float = BM25_K1, b: float = BM25_B) -> str:
    """DuckDB replay: exact-contains candidate subquery feeds the bm25
    oracle (the prefilter admits only false positives, so plain
    contains() is the whole candidate semantics), then the same ordered
    LIMIT."""
    mc = must_contain.replace("'", "''")
    cand = f"(SELECT * FROM {table} WHERE contains({col}, '{mc}'))"
    body = bm25_sql_duck(cand, rank_query, id_col=id_col, col=col,
                         k1=k1, b=b)
    return f"{body.rstrip()}\nORDER BY bm25 DESC, {id_col} LIMIT {int(k)}"


def candidate_count(odf: OmigoDF, query: str, col: str = "text",
                    phrase_len: int = PHRASE_LEN,
                    hash_space: int = HASH_SPACE) -> int:
    """Diagnostic: how many rows survive the bloom prefilter alone
    (before exact verification) — the prefilter's selectivity."""
    df = ensure_min_parallelism(odf.df).withColumn(
        "__sb__", F.expr(signature_expr(col, phrase_len, hash_space)))
    qsig = query_signature(query, phrase_len, hash_space)
    return df.filter(subset_filter("__sb__", qsig)).count()
