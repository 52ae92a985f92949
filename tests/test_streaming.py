"""Structured Streaming tests: file source -> windowed agg / sessionize /
stateful running counts -> memory sink, verified against batch results."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from omigo_data_analytics_spark.streaming import stream as ST


@pytest.fixture(scope="module")
def event_dir(spark):
    d = tempfile.mkdtemp(prefix="omigo_stream_")
    rows = [(i, f"2024-01-01 00:{i % 60:02d}:{(7 * i) % 60:02d}",
             f"u{i % 3}", float(i)) for i in range(120)]
    df = spark.createDataFrame(rows, ["event_id", "ts_str", "user", "value"]) \
        .withColumn("ts", F.to_timestamp("ts_str")).drop("ts_str")
    df.coalesce(2).write.mode("overwrite").parquet(d)
    yield d, df
    shutil.rmtree(d, ignore_errors=True)


def _run_to_memory(sdf, name, output_mode):
    q = (sdf.writeStream.format("memory").queryName(name)
         .outputMode(output_mode).trigger(availableNow=True).start())
    q.awaitTermination(120)
    return q


def test_kafka_decode_path_with_embedded_fake(spark):
    """The Kafka path minus the connector: feed a stream with Kafka's
    exact wire schema (key/value binary + topic/partition/offset/
    timestamp) from files, run decode_kafka_frame(value_as='json') and
    the windowed aggregate — the same pipeline kafka_source produces."""
    import json

    d = tempfile.mkdtemp(prefix="omigo_kafka_fake_")
    try:
        rows = []
        for i in range(60):
            payload = json.dumps({"user": f"u{i % 3}", "amount": float(i)})
            rows.append((f"k{i}".encode(), payload.encode(), "events", i % 2,
                         i, f"2024-01-01 00:{i % 60:02d}:00"))
        wire = spark.createDataFrame(
            rows, ["key", "value", "topic", "partition", "offset", "ts_str"]) \
            .withColumn("timestamp", F.to_timestamp("ts_str")).drop("ts_str")
        wire.coalesce(2).write.mode("overwrite").parquet(d)

        sdf = ST.file_source(spark, d, wire.schema)
        decoded = ST.decode_kafka_frame(
            sdf, value_as="json", json_schema="user string, amount double")
        agg = ST.windowed_aggregate(decoded, "timestamp", "30 minutes",
                                    ["amount"], ["sumfloat"],
                                    grouping_cols=["user"])
        _run_to_memory(agg, "kafka_fake", "update")
        got = {(r["user"], r["window_start"].minute): r["amount:sumfloat"]
               for r in spark.sql("select * from kafka_fake").collect()}
        # 60 rows, users u0/u1/u2, windows [00:00,00:30) and [00:30,01:00)
        assert len(got) == 6
        assert sum(got.values()) == sum(float(i) for i in range(60))
        # decode really went through binary -> string -> json
        assert ST.decode_kafka_frame(wire, "string").schema["value"].dataType.typeName() == "string"
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_kafka_source_without_connector_raises_clear_error(spark):
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        ST.kafka_source(spark, "localhost:9092", "t")


@pytest.mark.skipif(
    "not config.getoption('--run-kafka', default=False)",
    reason="env: no spark-sql-kafka jar, no ivy cache, and no network in this "
           "container (DNS fails), so the connector can be neither vendored "
           "nor downloaded — see COVERAGE.md. Pass --run-kafka where the jar "
           "and a broker at localhost:9092 exist.")
def test_kafka_source_end_to_end(spark):
    """Full connector path: requires the spark-sql-kafka jar on the
    classpath and a broker with topic 'omigo_test' at localhost:9092."""
    decoded = ST.kafka_source(spark, "localhost:9092", "omigo_test",
                              value_as="json",
                              json_schema="user string, amount double")
    assert "user" in decoded.schema.fieldNames()
    q = (decoded.writeStream.format("memory").queryName("kafka_e2e")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert spark.sql("select count(*) from kafka_e2e").collect()[0][0] >= 0


def test_windowed_aggregate_matches_batch(spark, event_dir):
    d, batch_df = event_dir
    sdf = ST.file_source(spark, d, batch_df.schema)
    agg = ST.windowed_aggregate(sdf, "ts", "10 minutes",
                                ["value"], ["sumfloat"], grouping_cols=["user"])
    _run_to_memory(agg, "win_agg", "update")
    got = {(r["window_start"], r["user"]): r["value:sumfloat"]
           for r in spark.sql("select * from win_agg").collect()}
    exp = {(r["w"]["start"], r["user"]): float(r["s"])
           for r in batch_df.groupBy(F.window("ts", "10 minutes").alias("w"), "user")
                            .agg(F.sum("value").alias("s")).collect()}
    assert got == exp and len(got) >= 6


def test_sessionize_append_across_restart(spark, event_dir):
    """Session windows only support append mode: sessions emit once the
    watermark passes them. Phase 1 ingests the events; phase 2 (same
    checkpoint) ingests a far-future terminator event that advances the
    watermark and closes every real session."""
    d, batch_df = event_dir
    src = tempfile.mkdtemp(prefix="omigo_sess_src_")
    ckpt = tempfile.mkdtemp(prefix="omigo_sess_ckpt_")
    sink = tempfile.mkdtemp(prefix="omigo_sess_sink_")
    try:
        batch_df.coalesce(1).write.mode("overwrite").parquet(src)

        def _phase():
            sdf = ST.file_source(spark, src, batch_df.schema)
            ses = ST.sessionize(sdf, "user", "ts", gap="2 minutes",
                                watermark="1 minute")
            q = (ses.writeStream.format("parquet").option("path", sink)
                 .outputMode("append").option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            q.awaitTermination(120)

        _phase()
        term = spark.createDataFrame(
            [(999, "u0", 0.0)], ["event_id", "user", "value"]) \
            .withColumn("ts", F.to_timestamp(F.lit("2024-01-01 02:00:00"))) \
            .select(*batch_df.columns)
        term.coalesce(1).write.mode("append").parquet(src)
        _phase()

        rows = spark.read.parquet(sink).collect()
        assert sum(r["n_events"] for r in rows) == 120
        assert all(r["session_end"] > r["session_start"] for r in rows)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(sink, ignore_errors=True)


def test_running_counts_stateful(spark, event_dir):
    d, batch_df = event_dir
    sdf = ST.file_source(spark, d, batch_df.schema)
    rc = ST.running_counts(sdf, "user")
    _run_to_memory(rc, "running", "update")
    rows = spark.sql("select * from running").collect()
    # final state per key should equal the batch count
    last = {}
    for r in rows:
        last[r["key"]] = max(last.get(r["key"], 0), r["total"])
    assert last == {"u0": 40, "u1": 40, "u2": 40}


def test_stream_dedup_matches_batch(spark, event_dir):
    """Duplicate every event 3x (across separate files, so dupes span
    micro-batch file splits), stream through stream_dedup with a
    watermark, and land exactly the batch-distinct set."""
    d, batch_df = event_dir
    src = tempfile.mkdtemp(prefix="omigo_dedup_src_")
    try:
        tripled = batch_df.unionByName(batch_df).unionByName(batch_df)
        tripled.coalesce(3).write.mode("overwrite").parquet(src)

        sdf = ST.file_source(spark, src, batch_df.schema)
        deduped = ST.stream_dedup(sdf, ["event_id"], ts_col="ts",
                                  watermark="1 hour")
        _run_to_memory(deduped, "dedup_stream", "append")
        got = spark.sql("select * from dedup_stream")
        assert got.count() == 120
        assert got.select("event_id").distinct().count() == 120

        # keyless spelling: plain dropDuplicates on all key cols
        plain = ST.stream_dedup(sdf, "event_id")
        _run_to_memory(plain, "dedup_plain", "append")
        assert spark.sql(
            "select count(distinct event_id) c from dedup_plain"
        ).collect()[0]["c"] == 120
    finally:
        shutil.rmtree(src, ignore_errors=True)


def test_stream_near_dup_candidates_multi_batch(spark):
    """A bucket claimed in micro-batch 1 flags later arrivals in batch 2
    with the ORIGINAL first_id — the state survives across batches."""
    d = tempfile.mkdtemp(prefix="omigo_stream_lsh_")
    try:
        base = "alpha beta gamma delta epsilon zeta eta theta"
        rows1 = [(1, base), (2, "totally different words here now okay")]
        rows2 = [(3, base)]  # near-dup of doc 1, lands a batch later
        schema = "doc_id long, text string"
        spark.createDataFrame(rows1, schema).coalesce(1) \
            .write.mode("overwrite").parquet(d)
        spark.createDataFrame(rows2, schema).coalesce(1) \
            .write.mode("append").parquet(d)
        sdf = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", 1).parquet(d))
        out = ST.stream_near_dup_candidates(sdf)
        q = (out.writeStream.format("memory").queryName("snd_mb")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = spark.sql("select distinct doc_id, first_id from snd_mb") \
            .collect()
        assert {(r["doc_id"], r["first_id"]) for r in got} == {(3, 1)}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stream_near_dup_matches_batch_lsh(spark):
    """Single-batch run over the documents corpus == the batch window
    replay (first-wins per bucket, min doc_id claims)."""
    from omigo_data_analytics_spark import OmigoDF
    from omigo_data_analytics_spark.operators import dedup as DD

    sf = "/root/testdata/sf0.001"
    schema = spark.read.parquet(f"{sf}/documents.parquet").schema
    sdf = ST.file_source(spark, sf, schema, glob_filter="documents.parquet")
    out = ST.stream_near_dup_candidates(sdf)
    _run_to_memory(out, "snd_batch_eq", "append")
    got = {(r["band"], r["band_key"], r["doc_id"], r["first_id"])
           for r in spark.sql("select * from snd_batch_eq").collect()}
    # batch replay: min doc_id per (band, bucket) claims; later ids flagged
    sigs = DD.minhash_signatures(
        OmigoDF(spark.read.parquet(f"{sf}/documents.parquet"))).df
    from pyspark.sql import Window
    rpb = 2
    exp = set()
    import pyspark.sql.functions as SF
    for b in range(DD.NUM_HASHES // rpb):
        key = SF.concat_ws("_", *[SF.col(f"mh_{b * rpb + r}").cast("string")
                                  for r in range(rpb)])
        w = Window.partitionBy(key)
        rows = (sigs.select(SF.lit(b).alias("band"), key.alias("bk"),
                            "doc_id",
                            SF.min("doc_id").over(w).alias("first_id"))
                .where("doc_id > first_id").collect())
        exp |= {(r["band"], r["bk"], r["doc_id"], r["first_id"]) for r in rows}
    assert got == exp and len(got) > 0


def test_stream_near_dup_state_ttl_expires_buckets(spark):
    """EventTimeTimeout horizon: a bucket claimed at t0 expires once the
    watermark passes t0 + ttl, so the same content arriving later
    re-claims the bucket as NEW (no candidate row) — state is bounded by
    the dedup horizon, not stream lifetime."""
    import pyspark.sql.functions as SF

    base = "alpha beta gamma delta epsilon zeta eta theta"
    other = "unrelated filler words advancing the watermark forward now"
    d = tempfile.mkdtemp(prefix="omigo_lsh_ttl_")
    try:
        schema = "doc_id long, text string, ts timestamp"

        def _write(rows, mode):
            (spark.createDataFrame(rows, "doc_id long, text string, ts_s string")
             .withColumn("ts", SF.to_timestamp("ts_s")).drop("ts_s")
             .coalesce(1).write.mode(mode).parquet(d))

        # batch 1: doc 1 claims its buckets at 00:00
        _write([(1, base, "2024-01-01 00:00:00")], "overwrite")
        # batch 2: unrelated doc at 06:00 -> watermark (10m) advances to
        # ~05:50, far past 00:00 + 1h ttl -> doc 1's buckets time out
        _write([(50, other, "2024-01-01 06:00:00")], "append")
        # batch 3: same content as doc 1 at 06:00 -> bucket re-claimed,
        # NOT flagged against doc 1
        _write([(60, base, "2024-01-01 06:00:00")], "append")
        sdf = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", 1).parquet(d))
        out = ST.stream_near_dup_candidates(
            sdf, ts_col="ts", watermark="10 minutes", state_ttl="1 hour")
        q = (out.writeStream.format("memory").queryName("snd_ttl")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = spark.sql("select * from snd_ttl").collect()
        assert got == []  # doc 60 re-claimed expired buckets, no flags

        # control: without ttl the same stream flags 60 against 1
        sdf2 = (spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1).parquet(d))
        out2 = ST.stream_near_dup_candidates(
            sdf2, ts_col="ts", watermark="10 minutes")
        q2 = (out2.writeStream.format("memory").queryName("snd_ttl_ctl")
              .outputMode("append").trigger(availableNow=True).start())
        q2.awaitTermination(120)
        pairs = {(r["doc_id"], r["first_id"]) for r in
                 spark.sql("select distinct doc_id, first_id "
                           "from snd_ttl_ctl").collect()}
        assert pairs == {(60, 1)}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stream_near_dup_ttl_requires_ts(spark):
    import pytest

    sdf = (spark.readStream.schema("doc_id long, text string")
           .parquet("/root/testdata/sf0.001"))
    with pytest.raises(ValueError, match="state_ttl requires ts_col"):
        ST.stream_near_dup_candidates(sdf, state_ttl="1 hour")


def test_stream_near_dup_rejects_non_numeric_ids(spark):
    """String ids would cast to NULL and crash the stateful UDF (or
    collapse unparseable ids into one identity) — loud ValueError."""
    import pytest as _pt

    schema = "doc_id string, text string"
    sdf = (spark.readStream.schema(schema).format("rate").load()
           if False else None)
    # build a dummy streaming df with string id via rate + cast
    src = (spark.readStream.format("rate").option("rowsPerSecond", 1).load()
           .selectExpr("CAST(value AS STRING) AS doc_id",
                       "'some text here' AS text"))
    with _pt.raises(ValueError, match="numeric id"):
        ST.stream_near_dup_candidates(src)


def test_stateless_map_operators_compose_with_readstream(spark):
    """hash_embeddings (and every ensure_min_parallelism caller with a
    stateless plan) must accept a STREAMING input: the parallelism
    probe passes streaming plans through (.rdd is illegal there and
    micro-batch parallelism belongs to the source)."""
    from omigo_data_analytics_spark import OmigoDF
    from omigo_data_analytics_spark.operators import similarity as SIM
    d = tempfile.mkdtemp(prefix="omigo_stream_he_")
    try:
        schema = "doc_id long, text string"
        spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, "delta epsilon")], schema) \
            .coalesce(1).write.mode("overwrite").parquet(d)
        sdf = spark.readStream.schema(schema).parquet(d)
        out = SIM.hash_embeddings(OmigoDF(sdf), dim=8)
        _run_to_memory(out.df, "he_stream", "append")
        rows = spark.sql("select * from he_stream").collect()
        assert len(rows) == 2
        # identical vectors to the batch run over the same rows
        batch = {r["doc_id"]: list(r["embedding"]) for r in
                 SIM.hash_embeddings(
                     OmigoDF(spark.read.parquet(d)), dim=8).df.collect()}
        for r in rows:
            assert list(r["embedding"]) == batch[r["doc_id"]]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_token_estimates_composes_with_readstream(spark):
    """token_estimates is pure map-side, so it must run unchanged on a
    STREAMING input (the ensure_min_parallelism streaming passthrough)
    and produce batch-identical values per row."""
    from omigo_data_analytics_spark import OmigoDF
    from omigo_data_analytics_spark.operators.text import token_estimates
    d = tempfile.mkdtemp(prefix="omigo_stream_te_")
    try:
        schema = "doc_id long, text string"
        spark.createDataFrame(
            [(1, "foo.bar(x) isn't 42"), (2, "plain words only")], schema) \
            .coalesce(1).write.mode("overwrite").parquet(d)
        sdf = spark.readStream.schema(schema).parquet(d)
        out = token_estimates(OmigoDF(sdf))
        _run_to_memory(out.df, "te_stream", "append")
        rows = {r["doc_id"]: (r["pretoken_count"], r["token_estimate"])
                for r in spark.sql("select * from te_stream").collect()}
        batch = {r["doc_id"]: (r["pretoken_count"], r["token_estimate"])
                 for r in token_estimates(
                     OmigoDF(spark.read.parquet(d))).df.collect()}
        assert rows == batch and len(rows) == 2
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------------
# r12 hostile-input coverage (verdict optional #8): the empty/NULL rigs
# that fixed stream_lsh_candidates in r11, run against the other four
# streaming entries' harnesses. Pins the NULL contracts so a phantom-
# state regression (rows materializing under NULL keys/times that the
# batch counterpart would not produce) fails loudly.

@pytest.fixture(scope="module")
def hostile_event_dir(spark):
    import tempfile as _tf
    d = _tf.mkdtemp(prefix="omigo_stream_hostile_")
    rows = []
    for i in range(60):
        ts = None if i % 5 == 0 else f"2024-01-01 00:{i % 60:02d}:00"
        user = None if i % 7 == 0 else f"u{i % 3}"
        val = None if i % 11 == 0 else float(i)
        rows.append((i, ts, user, val))
    df = spark.createDataFrame(rows, ["event_id", "ts_str", "user", "value"]) \
        .withColumn("ts", F.to_timestamp("ts_str")).drop("ts_str")
    df.coalesce(2).write.mode("overwrite").parquet(d)
    yield d, df
    shutil.rmtree(d, ignore_errors=True)


def test_windowed_aggregate_null_ts_rows_excluded(spark, hostile_event_dir):
    """NULL event times cannot window (watermark semantics drop them) —
    the output must contain NO NULL-window group, and the non-NULL rows
    must aggregate exactly like the batch counterpart filtered to
    ts IS NOT NULL."""
    d, df = hostile_event_dir
    sdf = ST.file_source(spark, d, df.schema)
    agg = ST.windowed_aggregate(sdf, "ts", "30 minutes",
                                ["value"], ["sumfloat"])
    _run_to_memory(agg, "h_win_null", "update")
    got = {(str(r["window_start"]), r["value:sumfloat"])
           for r in spark.table("h_win_null").collect()}
    assert all(s != "None" for s, _ in got)
    want = {(str(r["ws"]), r["s"]) for r in
            df.where("ts IS NOT NULL")
              .groupBy(F.window("ts", "30 minutes").alias("w"))
              .agg(F.round(F.sum("value"), 6).alias("s"))
              .select(F.col("w.start").alias("ws"), "s").collect()}
    assert got == want


def test_sessionize_null_keys_and_null_ts(spark, hostile_event_dir):
    """NULL keys form their own sessions (groupBy semantics — a failed
    user-id extraction still counts events); NULL timestamps drop.
    Append mode only emits sessions the FINAL watermark (max event time
    - 10 min) has closed — parity is against exactly that batch set."""
    d, df = hostile_event_dir
    sdf = ST.file_source(spark, d, df.schema)
    ses = ST.sessionize(sdf, "user", "ts", gap="5 minutes")
    _run_to_memory(ses, "h_ses_null", "append")
    got = {(r["user"], str(r["session_start"]), r["n_events"])
           for r in spark.table("h_ses_null").collect()}
    max_ts = df.agg(F.max("ts")).first()[0]
    batch = (df.where("ts IS NOT NULL")
             .groupBy(F.session_window("ts", "5 minutes").alias("w"), "user")
             .agg(F.count(F.lit(1)).alias("n")))
    want = {(r["user"], str(r["w"]["start"]), r["n"])
            for r in batch.collect()
            if (max_ts - r["w"]["end"]).total_seconds() >= 600}
    assert got == want
    assert any(u is None for u, _, _ in got)     # NULL-key sessions exist


def test_stream_dedup_null_key_and_ts(spark, hostile_event_dir):
    """NULL keys dedupe to ONE representative (NULL is a key value, not
    a wildcard); the op survives NULL event times without phantom or
    dropped keys."""
    d, df = hostile_event_dir
    sdf = ST.file_source(spark, d, df.schema)
    dd = ST.stream_dedup(sdf, ["user"], ts_col="ts")
    _run_to_memory(dd, "h_dd_null", "append")
    out = spark.table("h_dd_null").collect()
    keys = [r["user"] for r in out]
    assert len(keys) == len(set(keys)) == 4          # u0 u1 u2 NULL
    assert None in keys


def test_running_counts_null_key(spark, hostile_event_dir):
    d, df = hostile_event_dir
    sdf = ST.file_source(spark, d, df.schema)
    rc = ST.running_counts(sdf, "user")
    _run_to_memory(rc, "h_rc_null", "update")
    got = {r["key"]: r["total"] for r in spark.table("h_rc_null").collect()}
    want = {r["user"]: r["count"] for r in
            df.groupBy("user").count().collect()}
    assert got == want and None in got


def test_streaming_ops_empty_input(spark):
    """0-row source: every op yields 0 rows, no crash, no phantom state."""
    import tempfile as _tf
    d = _tf.mkdtemp(prefix="omigo_stream_empty_")
    try:
        schema = "event_id long, ts timestamp, user string, value double"
        spark.createDataFrame([], schema).coalesce(1) \
            .write.mode("overwrite").parquet(d)
        sdf = ST.file_source(spark, d, schema)
        for i, (name, out) in enumerate([
            ("e_win", ST.windowed_aggregate(sdf, "ts", "30 minutes",
                                            ["value"], ["sumfloat"])),
            ("e_ses", ST.sessionize(sdf, "user", "ts", gap="5 minutes")),
            ("e_dd", ST.stream_dedup(sdf, ["user"], ts_col="ts")),
            ("e_rc", ST.running_counts(sdf, "user")),
        ]):
            mode = "update" if name in ("e_win", "e_rc") else "append"
            _run_to_memory(out, name, mode)
            assert spark.table(name).count() == 0, name
    finally:
        shutil.rmtree(d, ignore_errors=True)
