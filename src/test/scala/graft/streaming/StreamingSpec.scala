package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.OutputMode

class StreamingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("windowed counts via streaming equal the batch aggregation") {
    val streamed = Streams.runToMemory(spark,
      Streams.windowedCounts(Streams.readEventsStream(spark, dir)),
      "spec_windows", OutputMode.Complete())
      .collect().map(r => (r.getTimestamp(0), r.getString(2)) -> (r.getLong(3), r.getLong(4))).toMap
    val batch = graft.queries.Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(floor(col("value") * 100 + 0.5)).cast("long").as("c"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("append-mode windows = complete-mode windows minus the open tail") {
    val append = Streams.runToMemory(spark,
      Streams.windowedCountsAppend(Streams.readEventsStream(spark, dir), "1 hour"),
      "spec_windows_append", OutputMode.Append())
      .collect().map(r => (r.getTimestamp(0), r.getString(2)) -> ((r.getLong(3), r.getLong(4)))).toMap
    val complete = Streams.runToMemory(spark,
      Streams.windowedCounts(Streams.readEventsStream(spark, dir)),
      "spec_windows_complete2", OutputMode.Complete())
      .collect().map(r => ((r.getTimestamp(0), r.getString(2)), (r.getTimestamp(1), (r.getLong(3), r.getLong(4)))))
    val maxUs = graft.queries.Tables.events(spark, dir)
      .agg(max(unix_micros(col("ts")))).head().getLong(0)
    val wmMs = maxUs / 1000 - 3600000
    val (closed, open) = complete.partition { case (_, (end, _)) => end.getTime <= wmMs }
    assert(open.nonEmpty, "fixture should leave trailing windows open")
    assert(append == closed.map { case (k, (_, v)) => k -> v }.toMap)
  }

  test("streaming sessionize = batch gap-sessionization minus open sessions") {
    val streamed = Streams.runToMemory(spark,
      Streams.sessionize(Streams.readEventsStream(spark, dir), 30).toDF(),
      "spec_sessions", OutputMode.Append())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet

    // batch equivalent: lag-gap > 30 min starts a new session
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val sessions = graft.queries.Tables.events(spark, dir)
      .withColumn("prev", lag(col("ts"), 1).over(byUser))
      .withColumn("new_s", when(col("prev").isNull ||
        unix_micros(col("ts")) - unix_micros(col("prev")) > 1800L * 1000000L, 1)
        .otherwise(0))
      .withColumn("sid", sum(col("new_s")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sid"))
      .agg(unix_micros(min(col("ts"))).as("start_us"),
        unix_micros(max(col("ts"))).as("end_us"),
        count(lit(1)).cast("int").as("n_events"))
    // a user's LAST session is emitted only if its event-time timeout
    // fired: timeout (end + gap, ms) <= final watermark (max ts - delay,
    // ms); both gap and delay are 30 min here
    val maxUs = graft.queries.Tables.events(spark, dir)
      .agg(unix_micros(max(col("ts")))).collect().head.getLong(0)
    val gapMs = 30L * 60 * 1000
    val closed = sessions
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("start_us").desc)))
      .filter(col("rk") > 1 ||
        (col("end_us") / 1000).cast("long") + gapMs <= maxUs / 1000 - gapMs)
      .select("user_id", "start_us", "end_us", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet

    val onlyStream = streamed -- closed
    val onlyBatch = closed -- streamed
    assert(onlyStream.isEmpty && onlyBatch.isEmpty,
      s"stream-only(${onlyStream.size}): ${onlyStream.take(3)} batch-only(${onlyBatch.size}): ${onlyBatch.take(3)}")
    assert(streamed.nonEmpty)
  }

  test("built-in session_window sessions = custom-state sessionize sessions") {
    // both paths drain the same stream with the same gap; where both
    // emit (closed sessions), the (user, n_events) multiset must agree —
    // the built-in operator and the flatMapGroupsWithState operator are
    // two implementations of one semantic. Emission horizons differ
    // (sessionize's delay = gap = 30m; sessionWindows uses 1h), so
    // compare on the intersection-safe projection: sessions fully closed
    // under the LATER horizon exist in both outputs.
    val viaState = Streams.runToMemory(spark,
      Streams.sessionize(Streams.readEventsStream(spark, dir), 30).toDF(),
      "spec_sess_state", OutputMode.Append())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3).toLong)).toSet
    val viaWindow = Streams.runToMemory(spark,
      Streams.sessionWindows(Streams.readEventsStream(spark, dir), 30, "30 minutes"),
      "spec_sess_win", OutputMode.Append())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("n_events"))).toSet
    // same delay on both sides -> identical closed-session sets
    assert(viaWindow.nonEmpty)
    val onlyW = viaWindow -- viaState
    val onlyS = viaState -- viaWindow
    assert(onlyW.isEmpty && onlyS.isEmpty,
      s"window-only(${onlyW.size}): ${onlyW.take(3)} state-only(${onlyS.size}): ${onlyS.take(3)}")
  }

  test("stream dedup: doubled source really doubles, dedup restores exact counts") {
    val n = graft.queries.Tables.events(spark, dir).count()
    val raw = Streams.runToMemory(spark,
      Streams.readEventsStreamDoubled(spark, dir).select("event_id"),
      "spec_doubled_raw", OutputMode.Append()).count()
    assert(raw == 2 * n, s"staging should deliver every event twice: $raw vs 2*$n")
    val deduped = Streams.runToMemory(spark,
      Streams.dedupEvents(Streams.readEventsStreamDoubled(spark, dir)),
      "spec_doubled_dedup", OutputMode.Append()).count()
    assert(deduped == n)
  }

  test("streaming contamination = batch cross-side near-dup truth") {
    val streamed = Streams.runToMemory(spark,
      Streams.contaminationStream(spark, dir, n = 3, k = 128, bands = 32, threshold = 0.8),
      "spec_contamination", OutputMode.Append())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val all = spark.read.parquet(s"$dir/documents.parquet")
    val batch = graft.operators.Dedup.contaminatedNear(
        all.filter(col("doc_id") % 10 =!= 0), all.filter(col("doc_id") % 10 === 0),
        "doc_id", "text", n = 3, k = 128, bands = 32, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch)
  }

  test("streaming PII redaction = batch redactPii, masks fire on the stream") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("st-pii").toString + "/in"
    val rows = Seq(
      (1L, "mail alice@example.com from 10.0.0.1"),
      (2L, "clean text with no identifiers at all"),
      (3L, "dial 555-123-4567 ref 123456789012")
    ).toDF("doc_id", "text")
    rows.write.parquet(in)
    val stream = spark.readStream.schema("doc_id BIGINT, text STRING").parquet(in)
    val streamed = Streams.runToMemory(spark,
        graft.operators.TextAnalysis.redactPii(stream, "doc_id", "text"),
        "spec_pii", OutputMode.Append())
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val batch = graft.operators.TextAnalysis.redactPii(rows, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(streamed == batch)
    assert(streamed(1L) == "mail <EMAIL> from <IP>")
    assert(streamed(2L) == "clean text with no identifiers at all")
    assert(streamed(3L) == "dial <PHONE> ref <NUM>")
  }

  test("streaming importance scoring = batch importanceWeight") {
    val streamed = Streams.runToMemory(spark,
        Streams.importanceStream(spark, dir, targetSource = "src0", dims = 64),
        "spec_importance", OutputMode.Append())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val batch = graft.operators.TextAnalysis.importanceWeight(
        spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        isTarget = col("source") === "src0", dims = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streaming CDC chunking = batch cdcChunks") {
    val streamed = Streams.runToMemory(spark,
      graft.operators.TextAnalysis.cdcChunks(
        Streams.readDocumentsStream(spark, dir), "doc_id", "text", 4, 8),
      "spec_cdc", OutputMode.Append())
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(4))).toSet
    val batch = graft.operators.TextAnalysis.cdcChunks(
        spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", 4, 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(4))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streaming band join = batch RangeJoin.bandJoin") {
    val bands = spark.read.parquet(s"$dir/nation.parquet")
      .select(col("n_nationkey").as("band_id"),
        (col("n_nationkey") * 4.0).as("lo"),
        (col("n_nationkey") * 4.0 + 6.0).as("hi"))
    val streamed = Streams.runToMemory(spark,
      graft.operators.RangeJoin.bandJoin(
        Streams.readEventsStream(spark, dir).select(col("event_id"), col("value")),
        bands, "value", "lo", "hi", bucket = 5.0)
        .select("event_id", "band_id"),
      "spec_bands", OutputMode.Append())
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val batch = graft.operators.RangeJoin.bandJoin(
        graft.queries.Tables.events(spark, dir).select(col("event_id"), col("value")),
        bands, "value", "lo", "hi", bucket = 5.0)
      .select("event_id", "band_id")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streaming hash split = batch Sampling.split") {
    val streamed = Streams.runToMemory(spark,
      graft.operators.Sampling.split(
        Streams.readEventsStream(spark, dir).select(col("event_id")),
        "event_id", "spec17"),
      "spec_split", OutputMode.Append())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val batch = graft.operators.Sampling.split(
        graft.queries.Tables.events(spark, dir).select(col("event_id")),
        "event_id", "spec17")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streaming classifier scoring = batch classifierScore") {
    val streamed = Streams.runToMemory(spark,
      Streams.classifierStream(spark, dir, dims = 64, biasE6 = 250000L),
      "spec_classifier", OutputMode.Append())
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    val batch = graft.operators.TextAnalysis.classifierScore(
        spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        dims = 64, biasE6 = 250000L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  // Multiset compare (a click with two in-window errors emits two rows);
  // the heartbeat source must flush the tail clicks the plain source
  // strands (their join windows end past the final watermark).
  test("streaming left-outer interval join = batch left join") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))
    val streamed = Streams.runToMemory(spark,
      Streams.clicksWithRecentErrors(
        Streams.readEventsStreamWithHeartbeat(spark, dir), 30,
        joinType = "left_outer"),
      "spec_left_join", OutputMode.Append())
      .filter(col("user_id") =!= -1L)
      .collect().toSeq.map(key).groupBy(identity).view.mapValues(_.size).toMap
    val ev = graft.queries.Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"),
        col("event_id").as("error_id"))
    val batch = clicks.join(errors,
        col("c_user") === col("e_user") &&
          col("e_ts") >= col("c_ts") - expr("INTERVAL 30 MINUTES") &&
          col("e_ts") <= col("c_ts"),
        "left_outer")
      .select(col("c_user"), col("click_id"), col("error_id"))
      .collect().toSeq.map(key).groupBy(identity).view.mapValues(_.size).toMap
    assert(streamed == batch && streamed.nonEmpty)
    assert(streamed.keys.exists(_._3 == -1L), "expected unmatched clicks")
  }

  // The multi-batch replay must actually BE multi-batch (four data
  // micro-batches via maxFilesPerTrigger=1) and still reproduce the
  // single-batch sessionization exactly — state handed across batch
  // boundaries, closed sessions emitted at whichever batch their
  // timeout fires.
  test("sharded replay sessionization = single-batch, across >1 micro-batch") {
    import org.apache.spark.sql.streaming.Trigger
    val df = Streams.sessionize(
      Streams.readEventsStreamSharded(spark, dir, 4), 30).toDF()
    val q = df.writeStream.format("memory").queryName("spec_replay")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    assert(dataBatches >= 4, s"expected >=4 data micro-batches, saw $dataBatches")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))
    val sharded = spark.table("spec_replay").collect().map(key).toSet
    val single = Streams.runToMemory(spark,
      Streams.sessionize(Streams.readEventsStream(spark, dir), 30).toDF(),
      "spec_replay_single", OutputMode.Append())
      .collect().map(key).toSet
    assert(sharded == single && sharded.nonEmpty)
  }

  test("transformWithState sessionize: sharded replay = single batch") {
    // the arbitrary-state-v2 twin of the replay test above: ValueState
    // and event-time TIMERS must carry across micro-batch boundaries
    // (stale timers deleted on session extension), on RocksDB
    import org.apache.spark.sql.streaming.Trigger
    val key0 = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key0)
    spark.conf.set(key0,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val df = Streams.sessionizeTws(
        Streams.readEventsStreamSharded(spark, dir, 4), 30).toDF()
      val q = df.writeStream.format("memory").queryName("spec_tws_replay")
        .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))
      val sharded = spark.table("spec_tws_replay").collect().map(key).toSet
      val single = Streams.runToMemory(spark,
        Streams.sessionizeTws(Streams.readEventsStream(spark, dir), 30).toDF(),
        "spec_tws_single", OutputMode.Append())
        .collect().map(key).toSet
      assert(sharded == single && sharded.nonEmpty)
    } finally saved match {
      case Some(v) => spark.conf.set(key0, v)
      case None => spark.conf.unset(key0)
    }
  }

  test("streaming mixture sampling = batch mixtureSample") {
    val streamed = Streams.runToMemory(spark,
      Streams.mixtureSampleStream(spark, dir, budgetDocs = 100L, salt = "spec"),
      "spec_mixture", OutputMode.Append())
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val batch = graft.operators.Sampling.mixtureSample(
        spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "source",
        budgetDocs = 100L, salt = "spec")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streaming exact-dedup at ingest = batch Dedup.exact") {
    val streamed = Streams.runToMemory(spark,
      Streams.readDocumentsStream(spark, dir)
        .select(col("doc_id"), md5(col("text")).as("content_hash"))
        .groupBy(col("content_hash"))
        .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies")),
      "spec_ingest_dedup", OutputMode.Complete())
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val batch = graft.operators.Dedup.exact(
        spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch)
  }

  test("upsert-state drain: multi-batch updates converge to the batch truth") {
    // Force MULTIPLE micro-batches (one file per trigger over the doubled
    // stage): earlier batches upsert intermediate state, later ones must
    // REPLACE it — the converged sink equals the batch aggregation over
    // both copies, regardless of file arrival order.
    val base = "/tmp/graft-spec-upstate"
    val p = new org.apache.hadoop.fs.Path(base)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    Streams.readEventsStreamDoubled(spark, dir) // ensures the 2-file stage exists
    val schema = Streams.eventsRawSchema(spark, dir)
    val staged = s"/tmp/graft-stream/${dir.replaceAll("[^A-Za-z0-9]", "_")}/" +
      s"events2x_${schema("ts").dataType.typeName}"
    val stream = Streams.normalizeTs(spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(staged))
    Streams.runToSink(spark, Streams.lastClickState(stream),
      graft.config.OutputTable(name = "spec_upstate",
        target = graft.config.TargetSpec.File(s"$base/out"),
        refresh = graft.config.Refresh.Upsert, mergeKeys = Seq("user_id")),
      s"$base/ckpt", OutputMode.Update())
    val got = spark.read.parquet(s"$base/out")
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_clicks"), r.getAs[Long]("last_click_id"),
          r.getAs[Long]("last_click_cents")))).toMap
    val batch = Streams.lastClickState(
        graft.queries.Tables.events(spark, dir).union(
          graft.queries.Tables.events(spark, dir)))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == batch && got.nonEmpty)
  }

  test("RocksDB state store: stateful session windows match the default provider") {
    // every stateful-op scaladoc in Streams points at RocksDB as the
    // 100 TB state path; this proves the engine actually runs on it —
    // same query, same results, state off-heap on disk instead of in
    // executor memory.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val default = Streams.runToMemory(spark,
        Streams.sessionWindows(Streams.readEventsStream(spark, dir), 30, "1 hour"),
        "spec_ss_default", OutputMode.Append())
      .collect().map(_.toSeq).toSet
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rocks = Streams.runToMemory(spark,
          Streams.sessionWindows(Streams.readEventsStream(spark, dir), 30, "1 hour"),
          "spec_ss_rocks", OutputMode.Append())
        .collect().map(_.toSeq).toSet
      assert(rocks == default && rocks.nonEmpty)
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  // Fault tolerance: kill the sharded replay after its first data
  // batch, restart from the checkpoint, drain — the file sink's
  // _spark_metadata manifest plus the checkpoint WAL must yield the
  // exact single-batch answer with no duplicates and no losses,
  // WHEREVER the kill landed (the stop point varies run to run; the
  // drained result must not).
  test("checkpoint kill-and-resume drains to the exact single-batch answer") {
    import org.apache.spark.sql.streaming.Trigger
    val tmp = java.nio.file.Files.createTempDirectory("stream-resume").toString
    def stream() = Streams.sessionize(
      Streams.readEventsStreamSharded(spark, dir, 4), 30).toDF()
    val q1 = stream().writeStream.format("parquet")
      .option("path", s"$tmp/out").option("checkpointLocation", s"$tmp/ckpt")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(50)).start()
    val deadline = System.currentTimeMillis() + 60000
    while (!q1.recentProgress.exists(_.numInputRows > 0)
        && System.currentTimeMillis() < deadline) Thread.sleep(100)
    q1.stop(); q1.awaitTermination()
    assert(q1.recentProgress.exists(_.numInputRows > 0), "never saw a data batch")
    val q2 = stream().writeStream.format("parquet")
      .option("path", s"$tmp/out").option("checkpointLocation", s"$tmp/ckpt")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))
    val resumed = spark.read.parquet(s"$tmp/out")
      .select("user_id", "start_us", "end_us", "n_events")
      .collect().map(key).toSet
    val single = Streams.runToMemory(spark,
      Streams.sessionize(Streams.readEventsStream(spark, dir), 30).toDF(),
      "spec_resume_single", OutputMode.Append())
      .collect().map(key).toSet
    assert(resumed == single && resumed.nonEmpty)
  }

  test("file sink + checkpoint: rerun with no new files emits nothing") {
    val tmp = java.nio.file.Files.createTempDirectory("stream-spec").toString
    def runOnce(): Long = {
      val q = Streams.readEventsStream(spark, dir)
        .filter(col("event_type") === "click")
        .select("event_id", "ts", "user_id")
        .writeStream.format("parquet")
        .option("path", s"$tmp/out").option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.read.parquet(s"$tmp/out").count()
    }
    val n1 = runOnce()
    assert(n1 > 0)
    val n2 = runOnce() // same source files → checkpoint skips them
    assert(n2 == n1, s"rerun appended rows: $n1 -> $n2 (exactly-once broken)")
  }

  // The heap-state top-k must merge across micro-batches: a 4-batch
  // sharded replay (events arriving in time slices) has to reproduce
  // the batch window truth exactly — a heap that failed to union with
  // its restored state would surface a per-batch top-k instead.
  test("sharded replay windowed top-k = the batch window truth") {
    import org.apache.spark.sql.streaming.Trigger
    val df = Streams.windowedTopK(
      Streams.readEventsStreamSharded(spark, dir, 4), k = 3)
    val q = df.writeStream.format("memory").queryName("spec_topk_replay")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 4)
    val got = spark.table("spec_topk_replay")
      .select("window_start", "event_type", "event_id", "cents")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    import org.apache.spark.sql.expressions.Window
    val ev = Streams.normalizeTs(spark.read.parquet(s"$dir/events.parquet"))
    val wm = ev.agg(max(col("ts"))).head.getTimestamp(0)
    val batch = ev
      .select(date_trunc("hour", col("ts")).as("window_start"),
        col("event_type"), col("event_id"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("window_start"), col("event_type"))
          .orderBy(col("cents").desc, col("event_id").desc)))
      .filter(col("rn") <= 3)
      // append emits only windows the final watermark (max ts − 1h) closed
      .filter(unix_micros(col("window_start")) + 3600L * 1000000 <=
        lit(wm.getTime / 1000 * 1000 - 3600L * 1000) * 1000)
      .select("window_start", "event_type", "event_id", "cents")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == batch)
  }

  // A replayed quarantine batch must overwrite its failed attempt, not
  // append next to it: run the same bounded drain twice against the
  // same checkpoint — the second run replays nothing and both tables
  // keep their exact first-run contents.
  test("quarantine stream rerun adds no duplicate rows on either side") {
    val base = java.nio.file.Files.createTempDirectory("st-quar").toString
    new java.io.File(s"$base/in").mkdirs()
    val w = new java.io.PrintWriter(s"$base/in/data.csv")
    w.write("1|aa|10\n2|bb|20\n998|cc|notanint\n999|dd\n"); w.close()
    def drain(): (Long, Long) = {
      Streams.quarantineStream(spark, s"$base/in", "a INT, b STRING, c INT",
        Map("separator" -> "|"), s"$base/out", s"$base/q", s"$base/ckpt")
      (spark.read.parquet(s"$base/out").count(),
        spark.read.parquet(s"$base/q").count())
    }
    assert(drain() == ((2L, 2L)))
    assert(drain() == ((2L, 2L))) // identical after replay
  }

  test("streaming transitions: sharded replay pairs = batch lead() pairs") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    val df = Streams.transitionsStream(
      Streams.readEventsStreamSharded(spark, dir, 4)).toDF()
    val q = df.writeStream.format("memory").queryName("spec_transitions")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // the state handoff only proves anything across >1 micro-batch
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    assert(dataBatches >= 4, s"expected >=4 data micro-batches, saw $dataBatches")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getString(1), r.getString(2))
    // multiset compare: identical (user, from, to) pairs can repeat
    val streamed = spark.table("spec_transitions").collect().map(key)
      .groupBy(identity).view.mapValues(_.length).toMap
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val batch = graft.queries.Tables.events(spark, dir)
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("event_type").as("from_type"),
        lead(col("event_type"), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streaming funnel stage mins: changelog collapses to the batch truth") {
    val drained = Streams.runToMemory(spark,
      Streams.funnelStageMins(Streams.readEventsStream(spark, dir)),
      "spec_funnel", OutputMode.Update())
    // the Update-mode changelog may carry several rows per user; each
    // emission only tightens, so a per-user re-min is the fixed point
    val streamed = drained.groupBy(col("user_id"))
      .agg(min(col("t1")).as("t1"), min(col("t2")).as("t2"),
        min(col("t3")).as("t3"), min(col("t4")).as("t4"))
      .collect().map(r => r.getLong(0) ->
        (0 to 3).map(i => if (r.isNullAt(i + 1)) -1L else r.getLong(i + 1))).toMap
    val batch = Streams.funnelStageMins(graft.queries.Tables.events(spark, dir))
      .collect().map(r => r.getLong(0) ->
        (0 to 3).map(i => if (r.isNullAt(i + 1)) -1L else r.getLong(i + 1))).toMap
    assert(streamed == batch && streamed.nonEmpty)
  }
}
