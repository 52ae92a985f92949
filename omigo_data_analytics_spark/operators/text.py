"""Text-analysis operators for large-scale training-data pipelines:
tokenization stats, quality scoring, language-ID heuristic, document
fingerprinting.

Design: every metric is a pure SQL expression evaluated per row — no UDFs,
no shuffle, whole-stage codegen all the way. The same formula is emitted in
two dialects (Spark SQL for the engine, DuckDB SQL for the correctness
oracle) from one definition, so the oracle checks the exact semantics the
engine runs. At 100 TB these are embarrassingly parallel map-side
expressions over the scan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..core.dataframe import OmigoDF

# ------------------------------------------------------------------ shared
# Tokens: whitespace split, empties dropped. Both dialects agree.
_TOKENS_SPARK = "filter(split({col}, ' +'), x -> x != '')"
_TOKENS_DUCK = "list_filter(string_split_regex({col}, ' +'), x -> x != '')"

# Tiny per-language stopword marker sets for the n-gram/stopword language
# heuristic (public-knowledge common words).
LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "es": ("el", "la", "de"),
    "de": ("der", "die", "und"),
    "fr": ("le", "la", "et"),
    "zh": ("de", "shi", "bu"),
}
STOPWORDS = ("the", "a", "of", "and", "to", "in")

# Portable polynomial string hash: identical math in Spark SQL and DuckDB.
#   h(s) = fold over chars: acc <- (acc*31 + ascii(char)) mod 1000000007
HASH_MOD = 1000000007


def hash_spark(expr: str) -> str:
    return (f"aggregate(sequence(1, length({expr})), 0L, "
            f"(acc, i) -> (acc * 31 + ascii(substring({expr}, i, 1))) % {HASH_MOD}L)")


def hash_duck(expr: str) -> str:
    return (f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
            f"list_transform(range(1, length({expr}) + 1), "
            f"i -> CAST(ascii(substr({expr}, i, 1)) AS BIGINT))), "
            f"(acc, c) -> (acc * 31 + c) % {HASH_MOD})")


def _in_list(sql_items) -> str:
    return "(" + ", ".join(f"'{w}'" for w in sql_items) + ")"


def _metric_exprs(dialect: str, col: str = "text") -> dict[str, str]:
    """One definition, two dialects. Keys are output column names."""
    if dialect == "spark":
        toks = _TOKENS_SPARK.format(col=col)
        size, distinct = "size", "array_distinct"
        sumlen = f"aggregate({toks}, 0L, (a, x) -> a + length(x))"

        def count_in(words):
            return f"size(filter({toks}, x -> x in {_in_list(words)}))"
    else:
        toks = _TOKENS_DUCK.format(col=col)
        size, distinct = "len", "list_distinct"
        sumlen = f"list_sum(list_transform({toks}, x -> length(x)))"

        def count_in(words):
            return f"len(list_filter({toks}, x -> x in {_in_list(words)}))"

    n = f"{size}({toks})"
    uniq = f"{size}({distinct}({toks}))"
    stop = count_in(STOPWORDS)
    exprs = {
        "token_count": f"CAST({n} AS BIGINT)",
        "uniq_token_count": f"CAST({uniq} AS BIGINT)",
        "type_token_ratio": f"round(CAST({uniq} AS DOUBLE) / {n}, 6)",
        "avg_token_len": f"round(CAST({sumlen} AS DOUBLE) / {n}, 6)",
        "stopword_ratio": f"round(CAST({stop} AS DOUBLE) / {n}, 6)",
    }
    # quality: length credit + lexical diversity − stopword dominance
    exprs["quality_score"] = (
        f"round(0.3 * least(CAST({n} AS DOUBLE) / 100.0, 1.0)"
        f" + 0.4 * (CAST({uniq} AS DOUBLE) / {n})"
        f" + 0.3 * (1.0 - CAST({stop} AS DOUBLE) / {n}), 6)")
    # language-ID: argmax of marker-set hit counts, deterministic tie order
    scores = {lang: count_in(words) for lang, words in LANG_MARKERS.items()}
    order = list(LANG_MARKERS)
    case = "CASE "
    for i, lang in enumerate(order):
        conds = [f"{scores[lang]} >= {scores[o]}" for o in order[i + 1:]]
        conds += [f"{scores[lang]} > {scores[o]}" for o in order[:i]]
        cond = " AND ".join(conds) if conds else "TRUE"
        case += f"WHEN {cond} THEN '{lang}' "
    case += "ELSE 'und' END"
    exprs["lang_guess"] = case
    return exprs


METRICS = list(_metric_exprs("spark"))


# ------------------------------------------------------------------ engine
def text_metrics(odf: OmigoDF, col: str = "text", metrics=None) -> OmigoDF:
    """Append text metric columns. Pure expressions — map-side only."""
    exprs = _metric_exprs("spark", col)
    out = odf.df
    for name in (metrics or METRICS):
        out = out.withColumn(name, F.expr(exprs[name]))
    return OmigoDF(out)


def fingerprint(odf: OmigoDF, col: str = "text", new_col: str = "fingerprint") -> OmigoDF:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.
    (The rolling/shingle variants live in dedup.py.)"""
    norm = F.lower(F.regexp_replace(F.trim(F.col(col)), r"\s+", " "))
    return OmigoDF(odf.df.withColumn(new_col, F.md5(norm)))


# ------------------------------------------------------------------ oracle
def metric_sql(dialect: str, metric: str, col: str = "text") -> str:
    return _metric_exprs(dialect, col)[metric]


def fingerprint_sql_duck(col: str = "text") -> str:
    return f"md5(lower(regexp_replace(trim({col}), '\\s+', ' ', 'g')))"
