"""Structured Streaming surface: Kafka/file sources, watermarked windowed
aggregation, session windows, and a custom stateful operator.

The reference's Kafka extension is a batch micro-pull that was "not ready"
(reference omigo_ext/kafka_ext.py:13-73: constructor raises); its intended
semantics — read a stream, window it, aggregate — are Structured
Streaming natively. We expose:

  * kafka_source / file_source — readStream builders;
  * windowed_aggregate — event-time tumbling/sliding windows with a
    watermark for late data (replaces window_aggregate for streams);
  * sessionize — session windows by inactivity gap;
  * stream_dedup — watermark-bounded exact dedup (dedup_exact for
    continuously-landing data);
  * running_counts — applyInPandasWithState example of a custom stateful
    operator (per-key running count/sum that survives across batches).

Scale notes: all operators are incremental — state lives in the state
store keyed by group, watermarks bound state size, and sinks see only
updated keys. Nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..core.colutils import qcol

from ..functions.aggs import agg_expr


def decode_kafka_frame(sdf: DataFrame, value_as: str = "string",
                       json_schema=None) -> DataFrame:
    """Decode a Kafka wire-schema frame (key/value binary + topic/
    partition/offset/timestamp) into usable columns: value_as='string'
    casts, value_as='json' additionally expands the payload through
    from_json into top-level columns. Split from kafka_source so the
    decode path is testable without the connector jar (the embedded-fake
    test feeds the same wire schema from a file stream)."""
    if value_as not in ("binary", "string", "json"):
        raise ValueError(f"unknown value_as: {value_as}")
    if value_as == "binary":
        return sdf
    out = (sdf.withColumn("key", F.col("key").cast("string"))
              .withColumn("value", F.col("value").cast("string")))
    if value_as == "json":
        if json_schema is None:
            raise ValueError("value_as='json' requires json_schema")
        out = (out.withColumn("__j__", F.from_json("value", json_schema))
                  .select("*", "__j__.*").drop("__j__"))
    return out


def kafka_source(spark: SparkSession, brokers: str, topic: str,
                 starting_offsets: str = "earliest",
                 value_as: str = "string", json_schema=None) -> DataFrame:
    """Kafka readStream with the value decoded via decode_kafka_frame.
    Requires the spark-sql-kafka connector on the classpath; raises a
    clear error otherwise (this container ships without it)."""
    try:
        sdf = (spark.readStream.format("kafka")
               .option("kafka.bootstrap.servers", brokers)
               .option("subscribe", topic)
               .option("startingOffsets", starting_offsets)
               .load())
    except Exception as exc:  # pragma: no cover - connector-dependent
        raise RuntimeError(
            "kafka source requires the spark-sql-kafka-0-10 connector jar "
            "(pass --packages org.apache.spark:spark-sql-kafka-0-10_2.13)"
        ) from exc
    return decode_kafka_frame(sdf, value_as, json_schema)


def file_source(spark: SparkSession, path: str, schema, fmt: str = "parquet",
                max_files_per_trigger: int | None = None,
                glob_filter: str | None = None) -> DataFrame:
    """File-arrival stream (the landing-zone pattern: new files under a
    prefix become micro-batches). `path` must be a directory; use
    `glob_filter` to select specific files within it."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if glob_filter:
        reader = reader.option("pathGlobFilter", glob_filter)
    return reader.load(path)


def windowed_aggregate(sdf: DataFrame, ts_col: str, window_duration: str,
                       agg_cols, agg_funcs, grouping_cols=None,
                       slide_duration: str | None = None,
                       watermark: str = "10 minutes") -> DataFrame:
    """Event-time windowed aggregation with late-data watermark.

    Streaming counterpart of OmigoDF.window_aggregate: tumbling when
    slide_duration is None, sliding otherwise. agg_funcs follow the same
    names as the batch aggregate (sumfloat, mean, uniq_len, ...). Output
    has window_start / window_end plus ``<col>:<func>`` columns."""
    agg_cols = list(agg_cols)
    agg_funcs = list(agg_funcs)
    win = (F.window(ts_col, window_duration, slide_duration)
           if slide_duration else F.window(ts_col, window_duration))
    keys = [win.alias("__win__")] + [qcol(g) for g in (grouping_cols or [])]
    exprs = []
    for c, fn in zip(agg_cols, agg_funcs):
        name = fn if isinstance(fn, str) else getattr(fn, "__name__", str(fn))
        exprs.append(agg_expr(fn, qcol(c)).alias(f"{c}:{name}"))
    out = (sdf.withWatermark(ts_col, watermark)
           .groupBy(*keys).agg(*exprs))
    return out.select(
        F.col("__win__.start").alias("window_start"),
        F.col("__win__.end").alias("window_end"),
        *[c for c in out.columns if c != "__win__"])


def sessionize(sdf: DataFrame, key_col: str, ts_col: str, gap: str = "30 minutes",
               watermark: str = "10 minutes") -> DataFrame:
    """Session windows by inactivity gap: one output row per (key, session)
    with event count and session bounds."""
    return (sdf.withWatermark(ts_col, watermark)
            .groupBy(F.session_window(ts_col, gap).alias("__s__"), qcol(key_col))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(qcol(key_col),
                    F.col("__s__.start").alias("session_start"),
                    F.col("__s__.end").alias("session_end"),
                    "n_events"))


def stream_dedup(sdf: DataFrame, key_cols, ts_col: str | None = None,
                 watermark: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup by key — the stream-side counterpart of
    operators/dedup.dedup_exact for continuously-landing corpora.

    With `ts_col`, uses dropDuplicatesWithinWatermark: dedup state for a
    key is dropped once the watermark passes it, so state is bounded by
    (keys arriving within one watermark span) — the only shape that
    survives an unbounded stream. Without `ts_col`, falls back to plain
    dropDuplicates, whose state grows with total distinct keys forever —
    acceptable for bounded backfills only, and documented as such.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if ts_col is not None:
        return (sdf.withWatermark(ts_col, watermark)
                .dropDuplicatesWithinWatermark(keys))
    return sdf.dropDuplicates(keys)


def running_counts(sdf: DataFrame, key_col: str,
                   timeout: str = "NoTimeout") -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-key running
    event count maintained in the state store across micro-batches. The
    template for bespoke streaming state machines (dedupe-by-key,
    rate trackers, CEP fragments)."""
    out_schema = T.StructType([
        T.StructField("key", T.StringType()),
        T.StructField("total", T.LongType()),
    ])
    state_schema = T.StructType([T.StructField("total", T.LongType())])

    def _update(key, pdf_iter, state):
        prev = state.get[0] if state.exists else 0
        n = prev + sum(len(pdf) for pdf in pdf_iter)
        state.update((n,))
        yield __import__("pandas").DataFrame({"key": [key[0]], "total": [n]})

    return (sdf.select(qcol(key_col).cast("string").alias("key"))
            .groupBy("key")
            .applyInPandasWithState(_update, outputStructType=out_schema,
                                    stateStructType=state_schema,
                                    outputMode="update",
                                    timeoutConf=timeout))


def stream_near_dup_candidates(sdf: DataFrame, id_col: str = "doc_id",
                               text_col: str = "text",
                               rows_per_band: int = 2,
                               ts_col: str | None = None,
                               watermark: str = "1 hour",
                               state_ttl: str | None = None) -> DataFrame:
    """Streaming MinHash-LSH near-dup detection: the stream-side
    counterpart of operators/dedup.lsh_candidate_pairs for continuously
    landing corpora, where the batch bucket self-join cannot exist
    (the other side hasn't arrived yet).

    Map-side, per document: shingle → portable minhash signature → band
    keys (the exact expressions batch dedup uses, so thresholds and
    collision behavior match the batch pipeline bit-for-bit). Stateful,
    per (band, bucket) key via applyInPandasWithState: the state is the
    FIRST document id to claim the bucket; every later arrival emits a
    candidate row (band, band_key, doc_id, first_id). Downstream either
    drops flagged ids (streaming near-dedup) or routes candidates to an
    exact-verify job.

    Within one micro-batch arrivals sort by ``id_col`` so "first" is
    deterministic (min id claims the bucket) — which also makes the
    operator exactly replayable as a batch window query (the oracle).

    Scale/state: state is one long per DISTINCT bucket — the bucket
    registry, not the corpus. With ``ts_col`` the input is watermarked,
    and ``state_ttl`` (e.g. "2 hours") arms an EventTimeTimeout per
    bucket: once the watermark passes last-seen + ttl the registry entry
    is dropped, bounding state to the buckets active within one dedup
    horizon — the only shape that survives an unbounded stream. (A doc
    arriving after its bucket expired re-claims it as new: the ttl IS
    the dedup horizon, by design.) Nothing collects to the driver; the
    shuffle carries (band, band_key, id) triples only.
    """
    import pandas as pd

    from ..operators import dedup as DD

    if state_ttl is not None and ts_col is None:
        raise ValueError("state_ttl requires ts_col (event-time timeout "
                         "needs a watermark)")
    # the state stores one LONG per bucket and first-wins is NUMERIC
    # ordering; a string id would cast to NULL and crash the stateful UDF
    # (or silently collapse unparseable ids into one identity) — require
    # a numeric id loudly; map string ids to a dense numeric id first
    id_type = sdf.schema[id_col].dataType.typeName()
    if id_type not in ("long", "integer", "short", "byte"):
        raise ValueError(
            f"stream_near_dup_candidates: id_col {id_col!r} is {id_type}; "
            "a numeric id is required (the bucket registry stores a long "
            "and first-wins is numeric order) — assign a numeric id "
            "upstream, e.g. with generate_key_hash or add_seq_num")
    k = DD.NUM_HASHES
    sigs = sdf.select(
        qcol(id_col).cast("long").alias("doc_id"),
        *([qcol(ts_col).cast("timestamp").alias("__ts__")]
          if ts_col else []),
        F.expr(f"inline(array({DD.minhash_struct_expr(text_col)}))"))
    if ts_col:
        sigs = sigs.withWatermark("__ts__", watermark)
    structs = []
    for b in range(k // rows_per_band):
        key = F.concat_ws("_", *[
            F.col(f"mh_{b * rows_per_band + r}").cast("string")
            for r in range(rows_per_band)])
        structs.append(F.struct(F.lit(b).alias("band"), key.alias("band_key")))
    bands = (sigs.select("doc_id",
                         *(["__ts__"] if ts_col else []),
                         F.explode(F.array(*structs)).alias("__bb__"))
             .select(F.col("__bb__.band").alias("band"),
                     F.col("__bb__.band_key").alias("band_key"),
                     F.col("doc_id"),
                     *(["__ts__"] if ts_col else []))
             # same screen as batch lsh_candidate_pairs (r10 review):
             # NULL-text docs minhash to all-NULL, concat_ws to the ''
             # key — one hot state bucket per band collecting every
             # NULL doc and emitting phantom candidates that can never
             # verify. NULL ids would also crash the stateful UDF's
             # int() coercion.
             .where((F.col("band_key") != "") & F.col("doc_id").isNotNull()))

    out_schema = T.StructType([
        T.StructField("band", T.IntegerType()),
        T.StructField("band_key", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("first_id", T.LongType()),
    ])
    state_schema = T.StructType([T.StructField("first", T.LongType()),
                                 T.StructField("last_ms", T.LongType())])
    ttl_ms = None
    if state_ttl is not None:
        n, unit = state_ttl.split()
        ttl_ms = int(float(n) * {"second": 1000, "seconds": 1000,
                                 "minute": 60000, "minutes": 60000,
                                 "hour": 3600000, "hours": 3600000,
                                 "day": 86400000, "days": 86400000}[unit])

    def _claim(key, pdf_iter, state):
        if state.hasTimedOut:
            state.remove()  # idle bucket: watermark passed last-seen+ttl
            return
        ids, max_ts = set(), None
        for pdf in pdf_iter:
            ids.update(int(i) for i in pdf["doc_id"])
            if ttl_ms is not None and len(pdf):
                m = pdf["__ts__"].max()
                max_ts = m if max_ts is None else max(max_ts, m)
        ids = sorted(ids)
        if not ids:
            return
        max_ms = (int(max_ts.value // 1_000_000)
                  if ttl_ms is not None and max_ts is not None else 0)
        expired = False
        if ttl_ms is not None and state.exists:
            # keys WITH data in a batch never get the timed-out callback
            # (data takes precedence) — enforce the horizon inline: if the
            # watermark already passed last-seen + ttl, the old claim is
            # beyond the dedup horizon and the bucket restarts fresh
            expired = state.getCurrentWatermarkMs() > state.get[1] + ttl_ms
        if state.exists and not expired:
            first = state.get[0]
            last = max(state.get[1], max_ms) if ttl_ms is not None else 0
            if ttl_ms is not None:
                state.update((first, last))
        else:
            first = ids[0]
            last = max_ms
            state.update((first, last))
            ids = ids[1:]
        if ttl_ms is not None:
            # anchor the timeout on the STORED last-seen, not this batch's
            # max: a late/out-of-order batch (max_ms < stored last) must
            # not pull the expiry earlier than last_seen + ttl, or the
            # claim dies inside the advertised dedup horizon
            state.setTimeoutTimestamp(
                max(last + ttl_ms, state.getCurrentWatermarkMs() + 1))
        later = [i for i in ids if i != first]
        if later:
            yield pd.DataFrame({"band": [key[0]] * len(later),
                                "band_key": [key[1]] * len(later),
                                "doc_id": later,
                                "first_id": [first] * len(later)})

    return (bands.groupBy("band", "band_key")
            .applyInPandasWithState(
                _claim, outputStructType=out_schema,
                stateStructType=state_schema, outputMode="append",
                timeoutConf=("EventTimeTimeout" if ttl_ms is not None
                             else "NoTimeout")))
