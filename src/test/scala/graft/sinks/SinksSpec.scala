package graft.sinks

import graft.SparkSpec
import graft.config._

class SinksSpec extends SparkSpec {
  import spark.implicits._

  private def out(tmpl: OutputTable => OutputTable): OutputTable =
    tmpl(OutputTable(name = "t", target = TargetSpec.File("/tmp/x")))

  test("repartition wins over coalesce (reference Q10)") {
    val df = (1 to 100).toDF("n").repartition(10)
    val both = Sinks.shaped(df, out(_.copy(repartition = Some(3), coalesce = Some(1))))
    assert(both.rdd.getNumPartitions == 3)
    val coal = Sinks.shaped(df, out(_.copy(coalesce = Some(2))))
    assert(coal.rdd.getNumPartitions == 2)
    val none = Sinks.shaped(df, out(identity))
    assert(none.rdd.getNumPartitions == 10)
  }

  test("full refresh overwrites, incremental appends") {
    val dir = java.nio.file.Files.createTempDirectory("sinks-spec").toString + "/out"
    val df = Seq(1, 2, 3).toDF("n")
    Sinks.write(spark, df, out(_.copy(target = TargetSpec.File(dir))))
    Sinks.write(spark, df, out(_.copy(target = TargetSpec.File(dir))))
    assert(spark.read.parquet(dir).count() == 3) // full: purged then rewritten
    Sinks.write(spark, df, out(_.copy(target = TargetSpec.File(dir),
      refresh = Refresh.Incremental)))
    assert(spark.read.parquet(dir).count() == 6) // incremental: appended
  }

  test("upsert merges on keys: replaced, surviving, and inserted rows") {
    val dir = java.nio.file.Files.createTempDirectory("sinks-spec").toString + "/up"
    val upsert = out(_.copy(target = graft.config.TargetSpec.File(dir),
      refresh = Refresh.Upsert, mergeKeys = Seq("k")))
    Sinks.write(spark, Seq((1, "old1"), (2, "old2")).toDF("k", "v"),
      out(_.copy(target = graft.config.TargetSpec.File(dir))))
    Sinks.write(spark, Seq((2, "new2"), (3, "new3")).toDF("k", "v"), upsert)
    val back = spark.read.parquet(dir).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(back == Map(1 -> "old1", 2 -> "new2", 3 -> "new3"))
    // upsert into a missing target just writes
    val dir2 = java.nio.file.Files.createTempDirectory("sinks-spec").toString + "/up2"
    Sinks.write(spark, Seq((9, "x")).toDF("k", "v"),
      out(_.copy(target = graft.config.TargetSpec.File(dir2),
        refresh = Refresh.Upsert, mergeKeys = Seq("k"))))
    assert(spark.read.parquet(dir2).count() == 1)
    // upsert without merge_keys is a named config error
    val e = intercept[graft.config.ConfigError](Sinks.write(spark,
      Seq((1, "x")).toDF("k", "v"),
      out(_.copy(target = graft.config.TargetSpec.File(dir), refresh = Refresh.Upsert))))
    assert(e.getMessage.contains("merge_keys"))
  }

  test("pruned upsert: untouched partitions keep their files (mtimes), key moves delete at the source") {
    val base = java.nio.file.Files.createTempDirectory("sinks-spec").toString
    val dir = base + "/upp"
    def files(sub: String) = {
      val d = new java.io.File(s"$dir/p=$sub")
      if (!d.exists()) Map.empty[String, Long]
      else d.listFiles().filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith(".")).map(f => f.getName -> f.lastModified).toMap
    }
    // seed three partitions via full refresh
    Sinks.write(spark,
      Seq((1, "a", "v1"), (2, "a", "v1"), (3, "b", "v1"), (4, "c", "v1")).toDF("k", "p", "v"),
      out(_.copy(target = TargetSpec.File(dir), partitionKeys = Seq("p"))))
    val cBefore = files("c")
    assert(cBefore.nonEmpty)
    Thread.sleep(1100) // cross FS mtime resolution so a rewrite WOULD show
    // merge: k=1 updates in place (a), k=3 MOVES b -> a, k=9 inserts (a)
    Sinks.write(spark,
      Seq((1, "a", "v2"), (3, "a", "v2"), (9, "a", "v2")).toDF("k", "p", "v"),
      out(_.copy(target = TargetSpec.File(dir), refresh = Refresh.Upsert,
        mergeKeys = Seq("k"), partitionKeys = Seq("p"))))
    val back = spark.read.parquet(dir).collect()
      .map(r => (r.getAs[Int]("k"), r.getAs[String]("p"), r.getAs[String]("v"))).toSet
    assert(back == Set((1, "a", "v2"), (2, "a", "v1"), (3, "a", "v2"),
      (9, "a", "v2"), (4, "c", "v1")))
    // the key move emptied partition b: its directory is gone, not stale
    assert(files("b").isEmpty)
    // untouched partition c: same files, same mtimes — never rewritten
    assert(files("c") == cBefore)
    // staging cleaned up after the per-partition swap
    assert(!new java.io.File(s"$base/.upp.__staging__").exists())
  }

  test("observe metrics under upsert count the published table exactly once") {
    // regression: observing the INCOMING snapshot upstream of the merge
    // multiplied the counts (its subtree appears twice in the merge plan:
    // anti-join probe + union branch). Attached to the merged frame the
    // metrics must equal the published table, counted once.
    val dir = java.nio.file.Files.createTempDirectory("sinks-spec").toString + "/obs"
    val obsOut = out(_.copy(target = TargetSpec.File(dir),
      refresh = Refresh.Upsert, mergeKeys = Seq("k"), observeCols = Seq("v")))
    Sinks.write(spark, Seq((1, "old1"), (2, "old2")).toDF("k", "v"),
      out(_.copy(target = TargetSpec.File(dir))))
    val m = Sinks.write(spark,
      Seq((2, "new2"), (3, null.asInstanceOf[String])).toDF("k", "v"), obsOut).toMap
    // published table = {1->old1, 2->new2, 3->null}: 3 rows, 2 non-null v
    assert(m("n_rows") == 3L)
    assert(m("nonnull_v") == 2L)
    // plain full refresh still audits the incoming frame
    val m2 = Sinks.write(spark, Seq((7, "x"), (8, "y")).toDF("k", "v"),
      out(_.copy(target = TargetSpec.File(dir), observeCols = Seq("v")))).toMap
    assert(m2("n_rows") == 2L && m2("nonnull_v") == 2L)
  }

  test("scd2: versions open, close, survive deletes, and reopen across batches") {
    val dir = java.nio.file.Files.createTempDirectory("sinks-spec").toString + "/scd2"
    val scd2 = out(_.copy(target = graft.config.TargetSpec.File(dir),
      refresh = Refresh.Scd2, mergeKeys = Seq("k")))
    def history() = spark.read.parquet(dir).collect().map { r =>
      (r.getInt(0), r.getString(1), r.getInt(2),
        if (r.isNullAt(3)) -1 else r.getInt(3), r.getBoolean(4))
    }.toSet
    def row(k: Int, v: String, from: Int, to: Int, cur: Boolean) = (k, v, from, to, cur)

    // batch 1: two keys open
    Sinks.write(spark, Seq((1, "a"), (2, "b")).toDF("k", "v"), scd2)
    assert(history() == Set(row(1, "a", 1, -1, true), row(2, "b", 1, -1, true)))
    // batch 2: key 1 unchanged, key 2 changed, key 3 new
    Sinks.write(spark, Seq((1, "a"), (2, "b2"), (3, "c")).toDF("k", "v"), scd2)
    assert(history() == Set(
      row(1, "a", 1, -1, true),
      row(2, "b", 1, 2, false), row(2, "b2", 2, -1, true),
      row(3, "c", 2, -1, true)))
    // batch 3: key 1 deleted (missing from snapshot), key 2 reverts to "b"
    Sinks.write(spark, Seq((2, "b"), (3, "c")).toDF("k", "v"), scd2)
    assert(history() == Set(
      row(1, "a", 1, 3, false),
      row(2, "b", 1, 2, false), row(2, "b2", 2, 3, false), row(2, "b", 3, -1, true),
      row(3, "c", 2, -1, true)))
    // metadata-column collision is a named config error
    val e = intercept[graft.config.ConfigError](Sinks.write(spark,
      Seq((1, true)).toDF("k", "_is_current"), scd2))
    assert(e.getMessage.contains("_is_current"))
  }

  test("bucketed catalog sink writes the bucket spec into the table") {
    spark.sql("DROP TABLE IF EXISTS default.sink_bkt")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val p = new org.apache.hadoop.fs.Path(s"$wh/sink_bkt")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val df = (1 to 50).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    Sinks.write(spark, df, out(_.copy(name = "sink_bkt",
      target = TargetSpec.Catalog("default", governed = false),
      bucketKeys = Seq("k"), buckets = Some(4))))
    val desc = spark.sql("DESCRIBE EXTENDED default.sink_bkt").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc.get("Num Buckets").contains("4"), desc)
    assert(desc.get("Bucket Columns").exists(_.contains("k")))
    assert(spark.table("default.sink_bkt").count() == 50)
  }

  test("A15 atomicity: a failing overwrite leaves the previous output intact") {
    val dir = java.nio.file.Files.createTempDirectory("sinks-spec").toString + "/atomic"
    val target = out(_.copy(target = graft.config.TargetSpec.File(dir)))
    Sinks.write(spark, Seq(1, 2, 3).toDF("n"), target)
    // a frame that fails during execution (ANSI division by zero)
    val poison = spark.range(10).selectExpr("CAST(id / (id - 5) AS BIGINT) AS n")
    intercept[Throwable](Sinks.write(spark, poison.toDF(), target))
    // the governed-write contract: no partial output, old data still there
    assert(spark.read.parquet(dir).as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
  }

  test("data-quality gate: each check type violates with a named error") {
    import graft.config.DqChecks
    val df = Seq((1L, "a"), (2L, "b"), (2L, null.asInstanceOf[String])).toDF("k", "v")
    // all three pass on clean data
    DataQuality.enforce(Seq((1L, "a"), (2L, "b")).toDF("k", "v"),
      DqChecks(Some(2L), Seq("k", "v"), Seq("k")), "t")
    val e1 = intercept[graft.config.ConfigError](
      DataQuality.enforce(df, DqChecks(minRows = Some(10L)), "t"))
    assert(e1.getMessage.contains("min_rows") && e1.getMessage.contains("3"))
    val e2 = intercept[graft.config.ConfigError](
      DataQuality.enforce(df, DqChecks(notNull = Seq("v")), "t"))
    assert(e2.getMessage.contains("not_null(v): 1"))
    val e3 = intercept[graft.config.ConfigError](
      DataQuality.enforce(df, DqChecks(unique = Seq("k")), "t"))
    assert(e3.getMessage.contains("unique(k)") && e3.getMessage.contains("2 distinct"))
    // several violations report together
    val e4 = intercept[graft.config.ConfigError](
      DataQuality.enforce(df, DqChecks(Some(10L), Seq("v"), Seq("k")), "t"))
    assert(e4.getMessage.contains("min_rows") &&
      e4.getMessage.contains("not_null") && e4.getMessage.contains("unique"))
  }

  test("profile: per-column stats with planted nulls and duplicates") {
    val df = Seq((1L, Some("a")), (2L, Some("a")), (3L, None))
      .toDF("k", "v")
    val r = DataQuality.profile(df).collect()
      .map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getString(4), x.getString(5)))).toMap
    assert(r("k") == ((3L, 0L, 3L, "1", "3")))
    assert(r("v") == ((3L, 1L, 1L, "a", "a"))) // null excluded from distinct/min/max
    assert(r.size == 2)
    // a column whose NAME contains a dot must not parse as field access
    val dotted = DataQuality.profile(Seq(1, 2).toDF("a.b")).collect()
    assert(dotted.head.getString(0) == "a.b" && dotted.head.getLong(3) == 2L)
  }

  test("compact merges part-files, preserves content, and fails safe") {
    val dir = java.nio.file.Files.createTempDirectory("sinks-spec").toString + "/cmp"
    (1 to 100).toDF("n").repartition(8).write.parquet(dir)
    def parts = new java.io.File(dir).listFiles()
      .count(f => f.getName.startsWith("part-"))
    assert(parts == 8)
    Sinks.compact(spark, dir, "parquet", nFiles = 2)
    assert(parts == 2)
    assert(spark.read.parquet(dir).as[Int].collect().sorted.toSeq == (1 to 100))
    // idempotent: compacting again is a no-op on content
    Sinks.compact(spark, dir, "parquet", nFiles = 2)
    assert(spark.read.parquet(dir).count() == 100)
    // a missing target is a named error, not an empty overwrite
    val e = intercept[graft.config.ConfigError](
      Sinks.compact(spark, dir + "-missing", "parquet", 1))
    assert(e.getMessage.contains("does not exist"))
  }

  test("retain drops expired partitions by decoded value, keeps null partition") {
    val dir = java.nio.file.Files.createTempDirectory("sinks-spec").toString + "/ret"
    Seq(("2024-12-31", 1), ("2025-01-01", 2), ("2025-02-01", 3),
        ("with space", 4), (null: String, 5))
      .toDF("d", "v").write.partitionBy("d").parquet(dir)
    val dropped = Sinks.retain(spark, dir, "d", keepFrom = "2025-01-01")
    assert(dropped.toSet == Set("d=2024-12-31"))
    // URL-encoded dir ('with space' -> with%20space) compared decoded:
    // 'w...' >= '2025...' so it survives; null partition always survives
    val back = spark.read.parquet(dir).collect()
      .map(x => Option(x.getAs[String]("d")) -> x.getAs[Int]("v")).toMap
    assert(back == Map(Some("2025-01-01") -> 2, Some("2025-02-01") -> 3,
      Some("with space") -> 4, None -> 5))
    // idempotent: a second pass drops nothing
    assert(Sinks.retain(spark, dir, "d", "2025-01-01").isEmpty)
    // missing target and wrong partition column are named errors
    assert(intercept[graft.config.ConfigError](
      Sinks.retain(spark, dir + "-missing", "d", "x")).getMessage.contains("does not exist"))
    assert(intercept[graft.config.ConfigError](
      Sinks.retain(spark, dir, "nope", "x")).getMessage.contains("partition directories"))
  }

  test("vacuum removes only staging orphans whose live table exists") {
    val dir = java.nio.file.Files.createTempDirectory("sinks-spec").toString + "/db"
    (1 to 10).toDF("n").write.parquet(dir + "/t")
    (1 to 5).toDF("n").write.parquet(dir + "/.t.__staging__")
    // mid-swap crash shape: staging holds the ONLY copy — must survive
    (1 to 5).toDF("n").write.parquet(dir + "/.lost.__staging__")
    val removed = Sinks.vacuum(spark, dir)
    assert(removed == Seq(".t.__staging__"))
    assert(spark.read.parquet(dir + "/t").count() == 10)             // table intact
    assert(spark.read.parquet(dir + "/.lost.__staging__").count() == 5) // recovery kept
    assert(Sinks.vacuum(spark, dir).isEmpty)                         // idempotent
    assert(intercept[graft.config.ConfigError](
      Sinks.vacuum(spark, dir + "-missing")).getMessage.contains("does not exist"))
  }

  test("compact refuses a partitioned table root") {
    val dir = java.nio.file.Files.createTempDirectory("sinks-spec").toString + "/pt"
    Seq(("a", 1), ("b", 2)).toDF("p", "v").write.partitionBy("p").parquet(dir)
    val e = intercept[graft.config.ConfigError](Sinks.compact(spark, dir, "parquet", 1))
    assert(e.getMessage.contains("partitioned table root"))
    // compacting ONE partition directory is the prescribed form
    Sinks.compact(spark, dir + "/p=a", "parquet", 1)
    assert(spark.read.parquet(dir).count() == 2)
  }

  test("clusterZOrder: content preserved, disjoint z-ranges, both columns prune") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("sinks-spec").toString + "/zo"
    // two independent uniform-ish keys; round-robin layout destroys locality
    val df = spark.range(4096).select(
      (col("id") % 256).as("x"),
      ((col("id") * 7919) % 256).as("y"),
      col("id").as("v"))
    df.repartition(8).write.parquet(dir)
    Sinks.clusterZOrder(spark, dir, "parquet", Seq("x", "y"), nFiles = 16)
    val parts = new java.io.File(dir).listFiles().count(_.getName.startsWith("part-"))
    assert(parts == 16)
    val back = spark.read.parquet(dir)
    assert(back.agg(sum("v")).head().getLong(0) == (0L until 4096L).sum)
    assert(back.count() == 4096)
    // per-file min/max boxes: a narrow band on EITHER column must prune
    // most files (the multi-column win a single-column sort cannot give)
    val boxes = Sinks.zOrdered(back.withColumn("__f", input_file_name()), Seq("x", "y"))
      .groupBy("__f")
      .agg(min("x").as("x0"), max("x").as("x1"),
        min("y").as("y0"), max("y").as("y1"),
        min("__z").as("z0"), max("__z").as("z1"))
      .collect()
    val sorted = boxes.sortBy(_.getAs[Long]("z0"))
    sorted.sliding(2).foreach {
      case Array(a, b) => assert(a.getAs[Long]("z1") <= b.getAs[Long]("z0"))
      case _ => ()
    }
    def hit(lo: Long, hi: Long, c0: String, c1: String) =
      boxes.count(r => r.getAs[Long](c1) >= lo && r.getAs[Long](c0) <= hi)
    // a 1/8th-range band intersects a minority of the 16 files on BOTH axes
    assert(hit(0, 31, "x0", "x1") <= 8, s"x-band hit ${hit(0, 31, "x0", "x1")}/16 files")
    assert(hit(0, 31, "y0", "y1") <= 8, s"y-band hit ${hit(0, 31, "y0", "y1")}/16 files")
    // idempotent on content
    Sinks.clusterZOrder(spark, dir, "parquet", Seq("x", "y"), nFiles = 16)
    assert(spark.read.parquet(dir).count() == 4096)
  }

  test("clusterHilbert: content preserved, disjoint ranges, both columns prune at least as tightly as z-order") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("sinks-spec").toString + "/hi"
    val df = spark.range(4096).select(
      (col("id") % 256).as("x"),
      ((col("id") * 7919) % 256).as("y"),
      col("id").as("v"))
    df.repartition(8).write.parquet(dir)
    Sinks.clusterHilbert(spark, dir, "parquet", Seq("x", "y"), nFiles = 16)
    val parts = new java.io.File(dir).listFiles().count(_.getName.startsWith("part-"))
    assert(parts == 16)
    val back = spark.read.parquet(dir)
    assert(back.agg(sum("v")).head().getLong(0) == (0L until 4096L).sum)
    assert(back.count() == 4096)
    val boxes = Sinks.hilbertOrdered(back.withColumn("__f", input_file_name()), Seq("x", "y"))
      .groupBy("__f")
      .agg(min("x").as("x0"), max("x").as("x1"),
        min("y").as("y0"), max("y").as("y1"),
        min("__z").as("z0"), max("__z").as("z1"))
      .collect()
    val sorted = boxes.sortBy(_.getAs[Long]("z0"))
    sorted.sliding(2).foreach {
      case Array(a, b) => assert(a.getAs[Long]("z1") <= b.getAs[Long]("z0"))
      case _ => ()
    }
    def hit(lo: Long, hi: Long, c0: String, c1: String) =
      boxes.count(r => r.getAs[Long](c1) >= lo && r.getAs[Long](c0) <= hi)
    // the same both-column pruning contract as z-order — the unit-step
    // curve keeps per-file boxes compact on BOTH axes
    assert(hit(0, 31, "x0", "x1") <= 8, s"x-band hit ${hit(0, 31, "x0", "x1")}/16 files")
    assert(hit(0, 31, "y0", "y1") <= 8, s"y-band hit ${hit(0, 31, "y0", "y1")}/16 files")
    // idempotent on content
    Sinks.clusterHilbert(spark, dir, "parquet", Seq("x", "y"), nFiles = 16)
    assert(spark.read.parquet(dir).count() == 4096)
  }

  test("hilbert vs z-order: skewed-aspect band scans open fewer files under hilbert (measured, r12 verdict #7)") {
    import org.apache.spark.sql.functions._
    // the survey row claims Hilbert's unit-step curve gives better
    // per-file locality at SKEWED aspect ratios than the Z interleave —
    // measure it: the same full 128x128 grid clustered both ways into a
    // file count that does NOT align with a power-of-2 split (24 — an
    // aligned split gives both curves perfect squares and hides the
    // difference), then count the files a zone-map reader OPENS (box
    // intersects rectangle) over a family of 16:1-skewed bands.
    val base = java.nio.file.Files.createTempDirectory("sinks-spec").toString
    val grid = spark.range(16384).select(
      (col("id") % 128).as("x"), expr("id div 128").as("y"), col("id").as("v"))
    def boxes(dir: String): Array[(Long, Long, Long, Long)] = {
      spark.read.parquet(dir).withColumn("__f", input_file_name())
        .groupBy("__f")
        .agg(min("x").as("x0"), max("x").as("x1"),
          min("y").as("y0"), max("y").as("y1"))
        .collect()
        .map(r => (r.getAs[Long]("x0"), r.getAs[Long]("x1"),
          r.getAs[Long]("y0"), r.getAs[Long]("y1")))
    }
    grid.repartition(8).write.parquet(s"$base/z")
    Sinks.clusterZOrder(spark, s"$base/z", "parquet", Seq("x", "y"), nFiles = 24)
    grid.repartition(8).write.parquet(s"$base/h")
    Sinks.clusterHilbert(spark, s"$base/h", "parquet", Seq("x", "y"), nFiles = 24)
    val (zb, hb) = (boxes(s"$base/z"), boxes(s"$base/h"))
    assert(zb.length == 24 && hb.length == 24)
    // 16 skewed bands: eight 128-wide x 8-tall, eight 8-wide x 128-tall
    val rects =
      (0 until 128 by 16).map(o => (0L, 127L, o.toLong, o + 7L)) ++
        (0 until 128 by 16).map(o => (o.toLong, o + 7L, 0L, 127L))
    def opened(bs: Array[(Long, Long, Long, Long)],
               r: (Long, Long, Long, Long)): Int =
      bs.count { case (x0, x1, y0, y1) =>
        x1 >= r._1 && x0 <= r._2 && y1 >= r._3 && y0 <= r._4 }
    val zTotal = rects.map(opened(zb, _)).sum
    val hTotal = rects.map(opened(hb, _)).sum
    info(s"skewed-band file opens over ${rects.size} bands: hilbert $hTotal vs z-order $zTotal")
    assert(hTotal < zTotal,
      s"hilbert must open fewer files than z-order over the skewed-band " +
        s"family, got hilbert $hTotal vs z $zTotal")
  }

  test("manifest: refreshed on append, counts the whole table, ignored by readers") {
    val dir = java.nio.file.Files.createTempDirectory("sinks-spec").toString + "/mf"
    val target = out(_.copy(target = TargetSpec.File(dir),
      refresh = Refresh.Incremental, manifest = true))
    def manifest: String = {
      val src = scala.io.Source.fromFile(s"$dir/_graft_manifest.json", "UTF-8")
      try src.mkString finally src.close()
    }
    Sinks.write(spark, (1 to 50).toDF("n"), target)
    assert(manifest.contains("\"row_count\":50"))
    // second append: the manifest must describe the WHOLE table now
    Sinks.write(spark, (51 to 80).toDF("n"), target)
    assert(manifest.contains("\"row_count\":80"))
    // the underscore file is metadata, not data
    assert(spark.read.parquet(dir).count() == 80)
    // staged full refresh: manifest swaps in atomically with the data
    val full = out(_.copy(target = TargetSpec.File(dir), manifest = true))
    Sinks.write(spark, (1 to 7).toDF("n"), full)
    assert(manifest.contains("\"row_count\":7"))
    assert(spark.read.parquet(dir).as[Int].collect().sorted.toSeq == (1 to 7))
  }

  test("clusterZOrder: named errors for bad columns, types, and targets") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("sinks-spec").toString + "/zerr"
    Seq((1L, "a"), (2L, "b")).toDF("k", "s").write.parquet(dir)
    val e1 = intercept[IllegalArgumentException](
      Sinks.clusterZOrder(spark, dir, "parquet", Seq("k"), 2))
    assert(e1.getMessage.contains(">= 2"))
    val e2 = intercept[graft.config.ConfigError](
      Sinks.clusterZOrder(spark, dir, "parquet", Seq("k", "nope"), 2))
    assert(e2.getMessage.contains("not in table schema"))
    val e3 = intercept[graft.config.ConfigError](
      Sinks.clusterZOrder(spark, dir, "parquet", Seq("k", "s"), 2))
    assert(e3.getMessage.contains("numeric/date/timestamp"))
    val e4 = intercept[graft.config.ConfigError](
      Sinks.clusterZOrder(spark, dir + "-missing", "parquet", Seq("k", "s"), 2))
    assert(e4.getMessage.contains("does not exist"))
    // partitioned-root guard (same contract as compact)
    val pdir = java.nio.file.Files.createTempDirectory("sinks-spec").toString + "/zpt"
    Seq(("a", 1L, 2L), ("b", 3L, 4L)).toDF("p", "k", "w")
      .write.partitionBy("p").parquet(pdir)
    val e5 = intercept[graft.config.ConfigError](
      Sinks.clusterZOrder(spark, pdir, "parquet", Seq("k", "w"), 2))
    assert(e5.getMessage.contains("partitioned table root"))
    // failure leaves the original table intact (staged publish contract):
    // the type error above threw before any write — content unchanged
    assert(spark.read.parquet(dir).count() == 2)
  }

  test("dynamic partition overwrite touches only result partitions") {
    val dir = java.nio.file.Files.createTempDirectory("sinks-spec").toString + "/part"
    val target = out(_.copy(target = TargetSpec.File(dir), partitionKeys = Seq("p")))
    Sinks.write(spark, Seq(("a", 1), ("b", 2)).toDF("p", "v"), target)
    Sinks.write(spark, Seq(("b", 99)).toDF("p", "v"), target)
    val back = spark.read.parquet(dir).collect()
      .map(r => r.getAs[String]("p") -> r.getInt(0)).toMap
    assert(back == Map("a" -> 1, "b" -> 99)) // partition a survived
  }

  test("mask:hash is keyed — spark.graft.mask.key changes the tokens") {
    val df = Seq(("alice", 1), ("bob", 2)).toDF("name", "v")
    val masked = out(_.copy(mask = Map("name" -> "hash")))
    def tokens: Map[Int, String] = Sinks.applyMask(df, masked).collect()
      .map(r => r.getInt(1) -> r.getString(0)).toMap
    val defaults = tokens
    // fixture default: the documented literal, stable for the oracles
    assert(Sinks.maskKey(df) == "graft-mask-v1")
    try {
      spark.conf.set("spark.graft.mask.key", "deployment-secret-42")
      val keyed = tokens
      assert(keyed.values.toSet.intersect(defaults.values.toSet).isEmpty,
        "a per-deployment key must produce different tokens than the public default")
      // deterministic per deployment — joins survive masking
      assert(tokens == keyed)
      // the keyed path must match the documented sha2 form exactly
      // (the UDF closure and the codegen'd expression are two spellings
      // of one function)
      val expected = spark.sql(
        "SELECT substring(sha2(concat('deployment-secret-42:', 'alice'), 256), 1, 16)")
        .head.getString(0)
      assert(keyed(1) == expected)
      // SECRET HYGIENE (r11 ADVICE): the configured key must not appear
      // anywhere in the plan — not in explain text, not in the SQL tab
      val plans = Seq(
        Sinks.applyMask(df, masked).queryExecution.executedPlan.toString,
        Sinks.applyMask(df, masked).queryExecution.analyzed.toString)
      plans.foreach(p => assert(!p.contains("deployment-secret-42"),
        "the mask key must never serialize into plan text"))
      // null input stays null through the keyed path
      val withNull = Seq((null.asInstanceOf[String], 9)).toDF("name", "v")
      assert(Sinks.applyMask(withNull, masked).head.isNullAt(0))
    } finally spark.conf.unset("spark.graft.mask.key")
    // the default key DOES appear in plans (it is public) — the loud
    // warning is the guard; assert the paths stay consistent
    assert(defaults(1) == spark.sql(
      "SELECT substring(sha2(concat('graft-mask-v1:', 'alice'), 256), 1, 16)")
      .head.getString(0))
  }
}
