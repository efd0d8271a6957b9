package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Round-7: the state-FORMAT evolution story for the stateful tier.
  *
  * The operational risk nothing pinned before: restart a
  * transformWithState query from a checkpoint written by the PREVIOUS
  * code version after the state case class gained a field. The
  * supported story must be either clean migration or a loud, NAMED
  * failure — never silent wrong answers. These cases pin what Spark
  * 4.1 actually does on each encoding format (unsaferow default vs
  * avro) so an operator upgrade is a known quantity.
  */
object StateEvolutionSpec {
  final case class StateV1(start: Long, last: Long, n: Int)
  final case class StateV2(start: Long, last: Long, n: Int, sum_us: Long)
  final case class Out(user_id: Long, start_us: Long, end_us: Long, n_events: Int)

  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

  /** Gap-sessionizer over ValueState[S]; V1/V2 differ ONLY in the state
    * schema (V2 adds a field), mimicking a code upgrade. */
  abstract class ProcBase[S](gapMin: Int) extends StatefulProcessor[Long, (Long, Long, java.sql.Timestamp), Out] {
    @transient protected var state: org.apache.spark.sql.streaming.ValueState[S] = _
    protected def mk(start: Long, last: Long, n: Int): S
    protected def fields(s: S): (Long, Long, Int)
    protected def enc: org.apache.spark.sql.Encoder[S]
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[S]("session", enc, TTLConfig.NONE)
    override def handleInputRows(user: Long,
        rows: Iterator[(Long, Long, java.sql.Timestamp)],
        timers: TimerValues): Iterator[Out] = {
      val gapUs = gapMin * 60L * 1000000L
      val times = rows.map(_._2).toArray.sorted
      val out = Seq.newBuilder[Out]
      var cur = if (state.exists()) Some(fields(state.get())) else None
      times.foreach { t =>
        cur match {
          case Some((st, la, n)) if t - la <= gapUs => cur = Some((st, t, n + 1))
          case Some((st, la, n)) =>
            out += Out(user, st, la, n); cur = Some((t, t, 1))
          case None => cur = Some((t, t, 1))
        }
      }
      cur.foreach { case (st, la, n) =>
        state.update(mk(st, la, n))
        getHandle.listTimers().foreach(getHandle.deleteTimer)
        getHandle.registerTimer(la / 1000 + gapMin * 60L * 1000)
      }
      out.result().iterator
    }
    override def handleExpiredTimer(user: Long, timers: TimerValues,
        info: ExpiredTimerInfo): Iterator[Out] =
      if (state.exists()) {
        val (st, la, n) = fields(state.get())
        state.clear()
        Iterator.single(Out(user, st, la, n))
      } else Iterator.empty
  }

  final class ProcV1(gapMin: Int) extends ProcBase[StateV1](gapMin) {
    protected def mk(start: Long, last: Long, n: Int) = StateV1(start, last, n)
    protected def fields(s: StateV1) = (s.start, s.last, s.n)
    protected def enc = Encoders.product[StateV1]
  }
  final class ProcV2(gapMin: Int) extends ProcBase[StateV2](gapMin) {
    protected def mk(start: Long, last: Long, n: Int) = StateV2(start, last, n, last - start)
    protected def fields(s: StateV2) = (s.start, s.last, s.n)
    protected def enc = Encoders.product[StateV2]
  }

  def sessionized(spark: SparkSession, src: DataFrame, proc: ProcBase[_]): DataFrame = {
    implicit val outEnc = Encoders.product[Out]
    implicit val longEnc = Encoders.scalaLong
    implicit val rowEnc = Encoders.tuple(
      Encoders.scalaLong, Encoders.scalaLong, Encoders.TIMESTAMP)
    src.withWatermark("ts", "30 minutes")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("ts"))
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .transformWithState(proc, TimeMode.EventTime(), OutputMode.Append())
      .toDF()
  }
}

class StateEvolutionSpec extends SparkSpec {
  import StateEvolutionSpec._

  private val dir = "/root/testdata/sf0.001"
  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Stage the events fixture as two TIME-split file batches (same users
    * in both, so run 2 must READ run 1's persisted state), run ProcV1
    * over batch 1 against a fresh checkpoint (leaving open sessions in
    * state), then restart the same checkpoint over batch 2 with the
    * evolved ProcV2. Returns run 2's outcome plus the output rows from
    * both runs. */
  private def upgradeRun(tag: String, encoding: String)
      : Either[Throwable, Set[(Long, Long, Long, Int)]] = {
    val tmp = java.nio.file.Files.createTempDirectory(s"evolve-$tag").toString
    val ev = graft.queries.Tables.events(spark, dir)
      .select(col("ts"), col("user_id"))
    val cut = ev.agg(expr("percentile(unix_micros(ts), 0.5)")).head().getDouble(0).toLong
    ev.filter(unix_micros(col("ts")) <= cut).write.parquet(s"$tmp/in/b1")
    val saved = spark.conf.getOption(providerKey)
    val savedEnc = spark.conf.getOption("spark.sql.streaming.stateStore.encodingFormat")
    spark.conf.set(providerKey, rocks)
    spark.conf.set("spark.sql.streaming.stateStore.encodingFormat", encoding)
    try {
      def src = spark.readStream
        .schema("ts TIMESTAMP, user_id BIGINT").parquet(s"$tmp/in/*")
      val q1 = sessionized(spark, src, new ProcV1(30))
        .writeStream.format("parquet")
        .option("path", s"$tmp/out").option("checkpointLocation", s"$tmp/ckpt")
        .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
      q1.awaitTermination()
      ev.filter(unix_micros(col("ts")) > cut).write.parquet(s"$tmp/in/b2")
      try {
        val q2 = sessionized(spark, src, new ProcV2(30))
          .writeStream.format("parquet")
          .option("path", s"$tmp/out").option("checkpointLocation", s"$tmp/ckpt")
          .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
        q2.awaitTermination()
        Right(spark.read.parquet(s"$tmp/out").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet)
      } catch { case t: Throwable => Left(t) }
    } finally {
      saved match { case Some(v) => spark.conf.set(providerKey, v)
                    case None => spark.conf.unset(providerKey) }
      savedEnc match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.encodingFormat", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.encodingFormat") }
    }
  }

  test("unsaferow encoding: schema change fails LOUDLY with the named error") {
    // The default state encoding refuses an evolved value schema at
    // restart — a hard stop with a documented error class, never a
    // silent misread of old bytes. This is the supported story when
    // avro encoding was not enabled before the upgrade: reprocess from
    // a fresh checkpoint.
    upgradeRun("unsafe", "unsaferow") match {
      case Right(_) => fail("unsaferow restart with an evolved schema must not succeed")
      case Left(t) =>
        assert(String.valueOf(t.getMessage)
          .contains("STATE_STORE_VALUE_SCHEMA_NOT_COMPATIBLE"),
          s"expected the named schema error, got: ${t.getMessage}")
    }
  }

  test("avro encoding: added state field migrates cleanly and continues V1 sessions") {
    // With avro state encoding, adding a field is a CLEAN migration:
    // run 2 reads V1-written sessions through the evolved schema (the
    // new field reads as its zero default) and the combined output
    // equals a fresh single pass over all the data.
    upgradeRun("avro", "avro") match {
      case Left(t) => fail(s"avro evolution should migrate cleanly: ${t.getMessage}")
      case Right(upgraded) =>
        val saved = spark.conf.getOption(providerKey)
        spark.conf.set(providerKey, rocks)
        val fresh =
          try Streams.runToMemory(spark,
            sessionized(spark, Streams.readEventsStream(spark, dir)
              .select(col("ts"), col("user_id")), new ProcV2(30)),
            "spec_evolve_fresh", OutputMode.Append())
            .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
          finally saved match {
            case Some(v) => spark.conf.set(providerKey, v)
            case None => spark.conf.unset(providerKey)
          }
        assert(upgraded == fresh && upgraded.nonEmpty,
          s"upgraded=${upgraded.size} fresh=${fresh.size}")
    }
  }
}
