"""Deeper Structured Streaming semantics: watermark late-data dropping
across micro-batches, native session_window equivalence with the
lag-based batch sessionizer, and a foreachBatch parquet sink pipeline."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from rearc_data_engineer_takehome_spark.streaming import windows as win


def _write_batch(spark, rows, schema, path):
    df = (
        spark.createDataFrame(rows, "event_id long, ts_s string, value double")
        .select(
            "event_id",
            F.to_timestamp("ts_s").alias("ts"),
            "value",
        )
    )
    df.coalesce(1).write.mode("append").parquet(path)


def test_watermark_drops_late_data_across_batches(spark, tmp_path):
    """Two micro-batches (maxFilesPerTrigger=1): batch 1 advances the
    watermark past the 10:00 window; batch 2's late 10:00-window event
    must be dropped from the append-mode output."""
    src = str(tmp_path / "late_src")
    schema = "event_id long, ts timestamp, value double"
    # batch 1: events up to 12:59 → watermark (10 min) lands ~12:49
    _write_batch(
        spark,
        [(1, "2024-01-01 10:05:00", 1.0), (2, "2024-01-01 12:59:00", 1.0)],
        schema,
        src,
    )

    stream = spark.readStream.schema(schema).parquet(src)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .select(F.col("w.start").cast("long").alias("ws"), "n", "s")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_test")
        .outputMode("append")
        .start()
    )
    # batch 1 processes, advancing the watermark past the 10:00 window
    q.processAllAvailable()
    # batch 2: a 10:07 event — far behind the watermark → late, dropped
    _write_batch(spark, [(3, "2024-01-01 10:07:00", 5.0)], schema, src)
    q.processAllAvailable()
    # batch 3: advance event time so the 10:00 window FINALIZES and emits
    _write_batch(spark, [(4, "2024-01-01 14:00:00", 1.0)], schema, src)
    q.processAllAvailable()
    q.stop()
    rows = {r.ws: (r.n, r.s) for r in spark.table("late_test").collect()}
    ten_am = 1704103200  # 2024-01-01 10:00:00 UTC
    # the 10:00 window finalized with ONLY the on-time event; the late
    # event_id=3 (value 5.0) must not appear
    assert rows.get(ten_am) == (1, 1.0), f"late event leaked: {rows}"


def test_native_session_window_matches_lag_sessionizer(spark, sf_smoke):
    """Spark's built-in session_window must produce the same sessions
    (count + bounds) as the lag+cumsum batch formulation for completed
    sessions."""
    ev = spark.read.parquet(f"{sf_smoke}/events.parquet").select(
        "user_id", "ts", "value"
    )
    lag_based = win.sessionize(ev, "ts", "user_id", gap_minutes=30)
    native = (
        ev.groupBy(
            F.session_window(F.col("ts"), "30 minutes").alias("sw"), F.col("user_id")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    a = sorted((r.user_id, r.n_events) for r in lag_based.collect())
    b = sorted((r.user_id, r.n_events) for r in native.collect())
    # session COUNTS and sizes agree; bounds differ by definition
    # (session_window end = last_event + gap, lag-based end = last event)
    assert a == b


def test_foreachbatch_parquet_sink_pipeline(spark, tmp_path):
    """Streaming ETL: readStream → windowed agg → foreachBatch writing
    each micro-batch to a partitioned parquet sink (the pattern for
    sinks Structured Streaming lacks natively)."""
    src = str(tmp_path / "fb_src")
    out = str(tmp_path / "fb_out")
    schema = "event_id long, ts timestamp, value double"
    _write_batch(
        spark,
        [(i, f"2024-01-01 {10 + i % 2}:15:00", float(i)) for i in range(10)],
        schema,
        src,
    )

    def sink(batch_df, batch_id):
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(out)
        )

    stream = spark.readStream.schema(schema).parquet(src)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").cast("long").alias("ws"), "n")
    )
    q = (
        agg.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    back = spark.read.parquet(out)
    rows = {r.ws: r.n for r in back.collect()}
    assert sum(rows.values()) == 10
    assert len(rows) == 2  # two hourly windows


def test_stream_stream_interval_join(spark, tmp_path):
    """Stream-stream inner join with watermarks + a time-range condition
    (the streaming twin of the batch range join): impressions joined to
    clicks within 30 minutes after the impression."""
    imp_dir = str(tmp_path / "impressions")
    clk_dir = str(tmp_path / "clicks")
    schema = "event_id long, ts_s string, value double"
    # value doubles as the campaign key (stream-stream joins REQUIRE an
    # equality predicate alongside the time-range condition)
    _write_batch(
        spark,
        [(1, "2024-01-01 10:00:00", 7.0), (2, "2024-01-01 11:00:00", 8.0)],
        schema,
        imp_dir,
    )
    _write_batch(
        spark,
        [
            (101, "2024-01-01 10:10:00", 7.0),  # campaign 7, within 30 min of imp 1
            (102, "2024-01-01 10:50:00", 7.0),  # campaign 7, too late for imp 1
            (103, "2024-01-01 11:20:00", 8.0),  # campaign 8, within 30 min of imp 2
            (104, "2024-01-01 11:20:00", 7.0),  # campaign 7, too late for imp 1
        ],
        schema,
        clk_dir,
    )

    read_schema = "event_id long, ts timestamp, value double"
    imps = (
        spark.readStream.schema(read_schema).parquet(imp_dir)
        .selectExpr("event_id AS imp_id", "ts AS imp_ts", "value AS campaign")
        .withWatermark("imp_ts", "2 hours")
    )
    clicks = (
        spark.readStream.schema(read_schema).parquet(clk_dir)
        .selectExpr("event_id AS click_id", "ts AS click_ts", "value AS c_campaign")
        .withWatermark("click_ts", "2 hours")
    )
    import pyspark.sql.functions as FF

    joined = imps.join(
        clicks,
        FF.expr(
            "campaign = c_campaign AND click_ts >= imp_ts "
            "AND click_ts <= imp_ts + INTERVAL 30 MINUTES"
        ),
        "inner",
    )
    q = (
        joined.select("imp_id", "click_id")
        .writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {(r.imp_id, r.click_id) for r in spark.table("ss_join").collect()}
    assert got == {(1, 101), (2, 103)}


def test_stream_static_broadcast_enrichment(spark, tmp_path):
    """Stream-static join: each micro-batch of a fact stream enriches
    against a static dimension — no state store, no watermark needed
    (the static side is re-read per batch, broadcast when small)."""
    import pyspark.sql.functions as F

    src = str(tmp_path / "facts")
    schema = "user_id long, amount double"
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], "user_id long, tier string"
    )

    spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], schema
    ).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    enriched = stream.join(F.broadcast(dim), "user_id", "left")
    q = (
        enriched.writeStream.format("memory")
        .queryName("stream_static")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = {r.user_id: r.tier for r in spark.table("stream_static").collect()}
    # matched users enriched; unmatched user kept with null tier
    assert rows == {1: "gold", 2: "silver", 3: None}


def test_stream_stream_left_outer_emits_nulls_after_watermark(spark, tmp_path):
    """Stream-stream LEFT OUTER interval join: an unmatched left row may
    only emit (with null right side) once the watermark has passed its
    join window — the state-eviction semantics that make outer streaming
    joins bounded. The watermark lags one micro-batch, so the source is
    split into per-file micro-batches with later data that pushes the
    watermark past the first batch's window."""
    import pyspark.sql.functions as FF

    imp_dir = str(tmp_path / "lo_impressions")
    clk_dir = str(tmp_path / "lo_clicks")
    schema = "event_id long, ts_s string, value double"
    # one file per (source, hour) → maxFilesPerTrigger=1 gives ~3 batches
    _write_batch(spark, [(1, "2024-01-01 10:00:00", 7.0),
                         (2, "2024-01-01 10:00:00", 9.0)], schema, imp_dir)
    _write_batch(spark, [(3, "2024-01-01 13:00:00", 99.0)], schema, imp_dir)
    _write_batch(spark, [(4, "2024-01-01 15:00:00", 98.0)], schema, imp_dir)
    _write_batch(spark, [(101, "2024-01-01 10:10:00", 7.0)], schema, clk_dir)
    _write_batch(spark, [(102, "2024-01-01 13:00:00", 97.0)], schema, clk_dir)
    _write_batch(spark, [(103, "2024-01-01 15:00:00", 96.0)], schema, clk_dir)

    read_schema = "event_id long, ts timestamp, value double"
    imps = (
        spark.readStream.schema(read_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(imp_dir)
        .selectExpr("event_id AS imp_id", "ts AS imp_ts", "value AS campaign")
        .withWatermark("imp_ts", "10 minutes")
    )
    clicks = (
        spark.readStream.schema(read_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(clk_dir)
        .selectExpr("event_id AS click_id", "ts AS click_ts",
                    "value AS c_campaign")
        .withWatermark("click_ts", "10 minutes")
    )
    joined = imps.join(
        clicks,
        FF.expr(
            "campaign = c_campaign AND click_ts >= imp_ts "
            "AND click_ts <= imp_ts + INTERVAL 30 MINUTES"
        ),
        "left_outer",
    )
    q = (
        joined.select("imp_id", "click_id")
        .writeStream.format("memory")
        .queryName("ss_left_outer")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {(r.imp_id, r.click_id) for r in spark.table("ss_left_outer").collect()}
    # imp 1 matched; imp 2's window [10:00, 10:30] is far behind the final
    # watermark (~14:50), so its null row MUST have been emitted/evicted
    assert (1, 101) in got
    assert (2, None) in got


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: a re-delivered event (same
    event_id, timestamp within the watermark window) is emitted once;
    the dedup state is then dropped once the watermark passes, so the
    operator runs with BOUNDED state — the 100 TB requirement exactly
    (plain dropDuplicates on a stream keeps every key forever)."""
    src = str(tmp_path / "dedup_src")
    ckpt = str(tmp_path / "dedup_ckpt")
    schema = "event_id long, ts timestamp, value double"

    # batch 1: two events + a duplicate of the first
    _write_batch(
        spark,
        [
            (1, "2024-01-01 10:00:05", 1.0),
            (1, "2024-01-01 10:00:05", 1.0),  # same-batch duplicate
            (2, "2024-01-01 10:10:00", 2.0),
        ],
        schema,
        src,
    )
    # batch 2: a cross-batch re-delivery of event 1 (still inside the
    # 30 min watermark) + a fresh event advancing time
    _write_batch(
        spark,
        [
            (1, "2024-01-01 10:00:05", 1.0),
            (3, "2024-01-01 10:20:00", 3.0),
        ],
        schema,
        src,
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "30 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    rows = spark.table("dedup_test").collect()
    ids = sorted(r.event_id for r in rows)
    assert ids == [1, 2, 3], f"duplicate leaked or event lost: {rows}"


def test_streaming_curation_pipeline_matches_batch(spark, tmp_path):
    """End-to-end STREAMING curation: a document stream (ingest
    timestamps) flows through quality scoring → threshold filter →
    content-digest dedup within the watermark → parquet sink via
    foreachBatch. The curated set over two micro-batches (including a
    cross-batch exact re-delivery) must equal the batch pipeline's
    keep-one-per-digest result — the bounded-state streaming twin of
    curation_pipeline's score→filter→dedup stages."""
    from rearc_data_engineer_takehome_spark.operators.text import (
        quality_features,
    )

    src = str(tmp_path / "docs_src")
    out = str(tmp_path / "curated")
    ckpt = str(tmp_path / "cur_ckpt")
    schema = "doc_id long, text string, ts timestamp"

    def write_docs(rows, path):
        spark.createDataFrame(rows, "doc_id long, text string, ts_s string").select(
            "doc_id", "text", F.to_timestamp("ts_s").alias("ts")
        ).coalesce(1).write.mode("append").parquet(path)

    good = (
        "the quick brown fox jumps over the lazy dog and that was it for "
        "the day in the quiet town where it is always calm"
    )
    junk = "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"
    b1 = [
        (1, good + " one", "2024-01-01 10:00:00"),
        (2, good + " one", "2024-01-01 10:00:10"),  # exact dup of 1
        (3, junk, "2024-01-01 10:01:00"),  # fails quality threshold
        (4, good + " four", "2024-01-01 10:02:00"),
    ]
    b2 = [
        (5, good + " one", "2024-01-01 10:20:00"),  # cross-batch dup
        (6, good + " six", "2024-01-01 10:21:00"),
    ]
    write_docs(b1, src)
    write_docs(b2, src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    scored = quality_features(stream).where(F.col("quality_score") >= 0.5)
    curated = (
        scored.select("doc_id", "text", "ts", F.md5("text").alias("digest"))
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["digest"])
    )

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out)

    q = (
        curated.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = spark.read.parquet(out)
    # batch twin: same scoring + threshold, keep-first-by-id per digest
    batch = (
        quality_features(spark.read.parquet(src))
        .where(F.col("quality_score") >= 0.5)
        .groupBy(F.md5("text").alias("digest"))
        .agg(F.min("doc_id").alias("doc_id"))
    )
    got_digests = {r.digest for r in got.select("digest").collect()}
    want_digests = {r.digest for r in batch.collect()}
    assert got_digests == want_digests
    # the junk doc never reaches the sink; exactly one copy per content
    ids = sorted(r.doc_id for r in got.collect())
    assert 3 not in ids
    assert len(ids) == len(got_digests)


def test_foreachbatch_incremental_hll_equals_batch_rebuild(spark, tmp_path):
    """Incremental view maintenance with the mergeable HLL family:
    a foreachBatch sink MAX-merges each micro-batch's per-day
    registers into a persistent register table, and after three
    micro-batches the maintained estimate equals rebuilding the HLL
    from all events at once — the sketch rollup contract carried into
    Structured Streaming (the state store holds registers, never
    event keys)."""
    from rearc_data_engineer_takehome_spark.operators.sketch import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    src = str(tmp_path / "hll_src")
    state = str(tmp_path / "hll_registers")
    schema = "event_id long, ts timestamp, user_id long"

    def write_events(rows):
        (
            spark.createDataFrame(
                rows, "event_id long, ts_s string, user_id long"
            )
            .select(
                "event_id", F.to_timestamp("ts_s").alias("ts"), "user_id"
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )

    def merge_batch(batch_df, _batch_id):
        day_regs = hll_registers(
            batch_df.select(
                F.col("ts").cast("date").cast("string").alias("day"),
                F.col("user_id").cast("string").alias("uid"),
            ),
            "uid",
            group_cols=("day",),
        )
        import os

        if os.path.isdir(state):
            prev = batch_df.sparkSession.read.parquet(state)
            day_regs = hll_merge(
                prev.unionByName(day_regs), group_cols=("day",)
            )
        day_regs.write.mode("overwrite").parquet(f"{state}_next")
        # swap: atomic-enough for a test; production uses a table format
        import shutil

        if os.path.isdir(state):
            shutil.rmtree(state)
        shutil.move(f"{state}_next", state)

    # three micro-batches with overlapping users across days
    write_events([(1, "2024-01-01 01:00:00", 10), (2, "2024-01-01 02:00:00", 11)])
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = stream.writeStream.foreachBatch(merge_batch).option(
        "checkpointLocation", str(tmp_path / "ckpt")
    ).start()
    q.processAllAvailable()
    write_events([(3, "2024-01-01 03:00:00", 10), (4, "2024-01-02 01:00:00", 12)])
    q.processAllAvailable()
    write_events([(5, "2024-01-02 02:00:00", 12), (6, "2024-01-02 03:00:00", 13)])
    q.processAllAvailable()
    q.stop()

    maintained = {
        r["day"]: r["hll_est"]
        for r in hll_estimate(
            spark.read.parquet(state), group_cols=("day",)
        ).collect()
    }
    batch_all = spark.read.parquet(src).select(
        F.col("ts").cast("date").cast("string").alias("day"),
        F.col("user_id").cast("string").alias("uid"),
    )
    rebuilt = {
        r["day"]: r["hll_est"]
        for r in hll_estimate(
            hll_registers(batch_all, "uid", group_cols=("day",)),
            group_cols=("day",),
        ).collect()
    }
    assert maintained == rebuilt
    # sanity: two distinct users each day in this fixture
    assert set(maintained) == {"2024-01-01", "2024-01-02"}
