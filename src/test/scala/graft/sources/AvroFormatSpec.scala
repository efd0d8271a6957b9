package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class AvroFormatSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"avro-$tag").toString + "/t"

  test("avro round-trip: primitives, nulls, date and timestamp-micros") {
    val dir = tmp("prim")
    val df = spark.sql(
      """SELECT id,
               CAST(id AS INT) AS i,
               CAST(id * 1.5 AS DOUBLE) AS d,
               CASE WHEN id % 3 = 0 THEN NULL ELSE concat('s', id) END AS s,
               id % 2 = 0 AS b,
               CAST(id AS FLOAT) AS f,
               DATE '2026-01-01' + make_interval(0, 0, 0, CAST(id AS INT)) AS dt,
               timestamp_micros(1700000000000000 + id * 1000001) AS ts,
               encode(concat('b', id), 'UTF-8') AS bin
        FROM range(100)""")
    df.write.format("avro").save(dir)
    val back = spark.read.format("avro").load(dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("avro round-trip: array, map, nested struct") {
    val dir = tmp("nested")
    val df = spark.sql(
      """SELECT id,
               array(id, id + 1, NULL) AS arr,
               map(concat('k', id), id * 2, 'fixed', NULL) AS m,
               named_struct('a', id, 'b', concat('x', id),
                            'c', named_struct('deep', id * 10)) AS st
        FROM range(50)""")
    df.write.format("avro").save(dir)
    val back = spark.read.format("avro").load(dir)
    // file sources force nullable on read schemas (parquet behaves the same)
    def allNullable(dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.DataType = dt match {
      case st: org.apache.spark.sql.types.StructType =>
        org.apache.spark.sql.types.StructType(
          st.fields.map(f => f.copy(dataType = allNullable(f.dataType), nullable = true)))
      case at: org.apache.spark.sql.types.ArrayType =>
        at.copy(elementType = allNullable(at.elementType))
      case mt: org.apache.spark.sql.types.MapType =>
        mt.copy(valueType = allNullable(mt.valueType))
      case o => o
    }
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, allNullable(f.dataType))))
    // MapType is not comparable via exceptAll; compare exploded
    def canon(x: org.apache.spark.sql.DataFrame) =
      x.select(col("id"), col("arr"),
          map_entries(col("m")).as("me"), col("st"))
        .withColumn("me", array_sort(col("me")))
        .collect().map(_.toString).sorted.toSeq
    assert(canon(back) == canon(df))
  }

  test("avro read prunes columns and fills evolved-away columns with null") {
    val dir = tmp("evol")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").write.format("avro").save(dir)
    // pruned read: only v
    assert(spark.read.format("avro").load(dir).select("v")
      .as[String].collect().sorted.toSeq == Seq("a", "b"))
    // evolved read: explicit schema with a column the files lack -> null
    val evolved = spark.read.format("avro")
      .schema("k BIGINT, v STRING, missing INT").load(dir)
    assert(evolved.filter(col("missing").isNull).count() == 2)
  }

  test("avro write partitions by key and the partitioned read restores it") {
    val dir = tmp("part")
    Seq((1, "x", "p1"), (2, "y", "p2"), (3, "z", "p1"))
      .toDF("k", "v", "p").write.format("avro").partitionBy("p").save(dir)
    val back = spark.read.format("avro").load(dir)
    assert(back.select("k", "v", "p").collect().toSet ==
      Set(Row(1, "x", "p1"), Row(2, "y", "p2"), Row(3, "z", "p1")))
    // partition pruning applies (file listing level)
    assert(back.filter(col("p") === "p1").count() == 2)
  }

  test("avro splits: a multi-block file reads identically and in parallel") {
    val dir = tmp("split")
    // force tiny avro blocks (sync interval floor is 32 bytes... use many
    // rows so the file spans MANY sync blocks), then read with a tiny
    // maxPartitionBytes so Spark carves the file into >1 split
    spark.range(20000)
      .select(col("id"), concat(lit("payload_"), col("id")).as(("s")))
      .coalesce(1)
      .write.format("avro").option("compression", "null").save(dir)
    withSQLConf("spark.sql.files.maxPartitionBytes" -> "16384",
                "spark.sql.files.openCostInBytes" -> "0") {
      val back = spark.read.format("avro").load(dir)
      assert(back.rdd.getNumPartitions > 1,
        s"expected >1 split, got ${back.rdd.getNumPartitions}")
      assert(back.count() == 20000)
      assert(back.agg(sum("id")).as[Long].head == 20000L * 19999 / 2)
    }
  }

  test("avro as a file STREAM source (readStream through the FileFormat)") {
    val dir = tmp("stream")
    spark.range(500).select(col("id"), concat(lit("v"), col("id")).as("v"))
      .write.format("avro").save(dir)
    val q = spark.readStream.schema("id BIGINT, v STRING").format("avro")
      .load(dir)
      .groupBy().agg(count(lit(1)).as("n"), sum(col("id")).as("s"))
      .writeStream.format("memory").queryName("avro_stream_t")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val r = spark.table("avro_stream_t").collect().head
    assert(r.getLong(0) == 500L && r.getLong(1) == 500L * 499 / 2)
  }

  test("avro via the framework source/sink path (Sources.load + Sinks)") {
    val dir = tmp("fw")
    val df = Seq((1, "a"), (2, "b")).toDF("k", "v")
    graft.sinks.Sinks.write(spark, df,
      graft.config.OutputTable(name = "avro_out",
        target = graft.config.TargetSpec.File(dir), format = "avro"))
    val back = Sources.load(spark, graft.config.SourceSpec.File(
      location = dir, format = "avro", options = Map.empty, schema = None))
    assert(back.collect().toSet == Set(Row(1, "a"), Row(2, "b")))
  }

  test("avro tables compact through the maintenance pass") {
    val dir = tmp("compact")
    // three appends -> >=3 files; compact to 1, content preserved
    (1 to 3).foreach { i =>
      spark.range((i - 1) * 10, i * 10).toDF("id")
        .write.format("avro").mode("append").save(dir)
    }
    def files() = new java.io.File(dir).listFiles
      .count(f => f.getName.endsWith(".avro"))
    assert(files() >= 3)
    graft.sinks.Sinks.compact(spark, dir, "avro", nFiles = 1)
    assert(files() == 1)
    assert(spark.read.format("avro").load(dir)
      .agg(sum(col("id"))).as[Long].head == (0 until 30).sum.toLong)
  }

  test("avro honors ignoreCorruptFiles: valid shards survive a garbage one") {
    val dir = tmp("corrupt")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").write.format("avro").save(dir)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-garbage.avro"),
      Array.fill[Byte](64)(0x5a))
    // strict default: the corrupt shard is an error, not silent data loss
    intercept[org.apache.spark.SparkException] {
      spark.read.format("avro").schema("k BIGINT, v STRING").load(dir).collect()
    }
    withSQLConf("spark.sql.files.ignoreCorruptFiles" -> "true") {
      val back = spark.read.format("avro").schema("k BIGINT, v STRING").load(dir)
      assert(back.count() == 2)
    }
  }

  test("property: random nested rows survive the avro round-trip") {
    import org.scalacheck.Gen
    // one rich fixed schema, many random valuations (incl. nulls, empty
    // arrays/maps, unicode strings, negative numbers, epoch-edge
    // timestamps) — the value-conversion surface the example-based tests
    // can't sweep
    val gen: Gen[(Long, Option[String], Option[Double], List[Option[Long]],
                  Map[String, Option[Int]], (Int, Option[String]))] = for {
      id <- Gen.choose(Long.MinValue / 2, Long.MaxValue / 2)
      s  <- Gen.option(Gen.oneOf(Gen.alphaNumStr,
              Gen.const("héllo 世界"), Gen.const("")))
      d  <- Gen.option(Gen.oneOf(Gen.choose(-1e12, 1e12), Gen.const(0.0)))
      ar <- Gen.listOfN(3, Gen.option(Gen.choose(-1000L, 1000L)))
      mp <- Gen.mapOfN(2, Gen.zip(Gen.identifier.map(_.take(8)),
              Gen.option(Gen.choose(-50, 50))))
      st <- Gen.zip(Gen.choose(-100, 100), Gen.option(Gen.alphaNumStr))
    } yield (id, s, d, ar, mp, st)
    val rows = Gen.listOfN(200, gen).sample.getOrElse(Nil)
    assert(rows.nonEmpty)
    val df = rows.map { case (id, s, d, ar, mp, st) =>
        (id, s.orNull, d.map(java.lang.Double.valueOf).orNull,
         ar.map(_.map(java.lang.Long.valueOf).orNull),
         mp.map { case (k, v) => k -> v.map(java.lang.Integer.valueOf).orNull },
         st match { case (a, b) => (a, b.orNull) })
      }.toDF("id", "s", "d", "ar", "mp", "st")
    val dir = tmp("prop")
    df.write.format("avro").save(dir)
    val back = spark.read.format("avro").load(dir)
    def canon(x: org.apache.spark.sql.DataFrame) =
      x.select(col("id"), col("s"), col("d"), col("ar"),
          array_sort(map_entries(col("mp"))).as("me"), col("st"))
        .collect().map(_.toString).sorted.toSeq
    assert(canon(back) == canon(df))
  }

  private def withSQLConf[T](pairs: (String, String)*)(f: => T): T = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
