package graft.sinks

import graft.SparkSpec
import graft.config._

/** The A15 no-partial-output contract for PLAIN (non-versioned) sinks on
  * overwrite-only stores: full-rewrite publishes route through the
  * pluggable [[CommitCoordinator]] via the generation-pointer protocol
  * (data in a unique `_gen/` dir, visibility via a CAS-published
  * `_graft_ptr/vN.json`). The lockfile coordinator restricts itself to
  * overwrite-only-store primitives (PUT to a unique key, LIST, EXISTS),
  * so running these tests on the local FS IS the no-CAS-store simulation
  * — the same discipline as VersionedTableSpec's race tests. */
class PointerPublishSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"ptr-$tag").toString + "/t"

  private def fsOf(loc: String) = {
    val p = new org.apache.hadoop.fs.Path(loc)
    (p, p.getFileSystem(spark.sparkContext.hadoopConfiguration))
  }

  private def withLockfile[A](body: => A): A = {
    val prev = VersionedTable.commitCoordinator
    VersionedTable.setCommitCoordinator(new LockFileCommitCoordinator(20))
    try body finally VersionedTable.setCommitCoordinator(prev)
  }

  private def out(loc: String)(tmpl: OutputTable => OutputTable): OutputTable =
    tmpl(OutputTable(name = "t", target = TargetSpec.File(loc)))

  private def readBack(loc: String) =
    spark.read.parquet(Sinks.resolveDataPath(spark, loc))

  private def genDirs(loc: String): Seq[String] = {
    val (p, fs) = fsOf(loc)
    val gr = new org.apache.hadoop.fs.Path(p, "_gen")
    if (!fs.exists(gr)) Nil
    else fs.listStatus(gr).map(_.getPath.getName).toSeq.sorted
  }

  private def ptrFiles(loc: String): Seq[String] = {
    val (p, fs) = fsOf(loc)
    val pd = new org.apache.hadoop.fs.Path(p, "_graft_ptr")
    if (!fs.exists(pd)) Nil
    else fs.listStatus(pd).map(_.getPath.getName).toSeq.sorted
  }

  test("pointer publish: full-refresh lifecycle is atomic, purged, and reads resolve") {
    val loc = tmp("life")
    withLockfile {
      Sinks.write(spark, Seq((1, "a"), (2, "b")).toDF("k", "v"), out(loc)(identity))
      assert(readBack(loc).collect().map(r => (r.getInt(0), r.getString(1))).toSet ==
        Set((1, "a"), (2, "b")))
      Sinks.write(spark, Seq((3, "c")).toDF("k", "v"), out(loc)(identity))
      assert(readBack(loc).collect().map(r => (r.getInt(0), r.getString(1))).toSet ==
        Set((3, "c")), "second full refresh replaces the first")
    }
    // superseded state purged WITH the default keep-2 grace: both
    // generations and pointers v1+v2 remain after two publishes (v1 is
    // the one-publish reader grace; a third publish would purge it)
    assert(genDirs(loc).size == 2, s"keep-2 grace must retain both generations: ${genDirs(loc)}")
    assert(ptrFiles(loc) == Seq("v000000000001.json", "v000000000002.json"),
      s"keep-2 grace must retain pointers v1+v2: ${ptrFiles(loc)}")
    // no plain-layout data at the root: a raw reader fails loudly
    // instead of silently mixing generations
    val (p, fs) = fsOf(loc)
    val rootEntries = fs.listStatus(p).map(_.getPath.getName).toSet
    assert(rootEntries == Set("_gen", "_graft_ptr"), rootEntries.toString)
    // the read keeps resolving after the coordinator reverts to rename:
    // the layout, not the active config, decides
    assert(readBack(loc).count() == 1)
  }

  test("pointer publish: upsert merges through the pointer (whole-table on pointer layout)") {
    val loc = tmp("upsert")
    withLockfile {
      Sinks.write(spark, Seq((1, "old1"), (2, "old2")).toDF("k", "v"), out(loc)(identity))
      Sinks.write(spark, Seq((2, "new2"), (3, "new3")).toDF("k", "v"),
        out(loc)(_.copy(refresh = Refresh.Upsert, mergeKeys = Seq("k"))))
      assert(readBack(loc).collect().map(r => (r.getInt(0), r.getString(1))).toMap ==
        Map(1 -> "old1", 2 -> "new2", 3 -> "new3"))
      // a PARTITIONED upsert on a pointer table takes the whole-table
      // merge (prunedUpsert's per-partition rename swap is rename-store-
      // only) and stays correct
      val loc2 = tmp("upsertp")
      Sinks.write(spark, Seq((1, "a", "x"), (2, "b", "y")).toDF("k", "p", "v"),
        out(loc2)(_.copy(partitionKeys = Seq("p"))))
      Sinks.write(spark, Seq((2, "b", "y2"), (5, "a", "z")).toDF("k", "p", "v"),
        out(loc2)(_.copy(refresh = Refresh.Upsert, mergeKeys = Seq("k"),
          partitionKeys = Seq("p"))))
      assert(readBack(loc2).collect()
        .map(r => (r.getAs[Int]("k"), r.getAs[String]("p"), r.getAs[String]("v"))).toSet ==
        Set((1, "a", "x"), (2, "b", "y2"), (5, "a", "z")))
    }
  }

  test("pointer publish: incremental append lands inside the current generation") {
    val loc = tmp("append")
    withLockfile {
      Sinks.write(spark, Seq(1, 2).toDF("n"), out(loc)(identity))
      Sinks.write(spark, Seq(3).toDF("n"),
        out(loc)(_.copy(refresh = Refresh.Incremental)))
      assert(readBack(loc).count() == 3)
    }
    // appends do not mint generations or pointer versions
    assert(genDirs(loc).size == 1)
    assert(ptrFiles(loc) == Seq("v000000000001.json"))
  }

  test("pointer publish: scd2 history accumulates through the pointer") {
    val loc = tmp("scd2")
    withLockfile {
      val o = out(loc)(_.copy(refresh = Refresh.Scd2, mergeKeys = Seq("k")))
      Sinks.write(spark, Seq((1, "a"), (2, "b")).toDF("k", "v"), o)
      Sinks.write(spark, Seq((1, "a2"), (2, "b")).toDF("k", "v"), o)
      val back = readBack(loc).collect().map(r => (r.getAs[Int]("k"),
        r.getAs[String]("v"), r.getAs[Boolean]("_is_current"))).toSet
      assert(back == Set((1, "a", false), (1, "a2", true), (2, "b", true)))
    }
    assert(genDirs(loc).size == 2) // scd2 = 2 full rewrites, keep-2 grace
  }

  test("pointer race: N concurrent full refreshes — every writer wins a distinct version, the table is never torn") {
    val loc = tmp("race")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    withLockfile {
      try {
        val futures = (1 to 8).map { i =>
          pool.submit(new java.util.concurrent.Callable[Unit] {
            def call(): Unit = Sinks.write(spark,
              Seq.fill(50)(i).toDF("writer"), out(loc)(identity)): Unit
          })
        }
        futures.foreach(_.get())
      } finally pool.shutdown()
      // last-writer-wins: the final table is exactly ONE writer's full
      // result — 50 rows, one writer id — never a mix of generations
      val back = readBack(loc).collect().map(_.getInt(0))
      assert(back.length == 50, s"torn table: ${back.length} rows")
      assert(back.toSet.size == 1, s"mixed generations: ${back.toSet}")
      // every writer won a distinct version: 8 pointer publishes happened
      // (losers retried at the next version); the latest plus the keep-2
      // grace survive
      assert(ptrFiles(loc) == Seq("v000000000007.json", "v000000000008.json"),
        s"expected pointers v7+v8 to survive under the keep-2 grace: ${ptrFiles(loc)}")
      assert(genDirs(loc).size == 2,
        s"generations beyond the keep-2 grace must be purged: ${genDirs(loc)}")
    }
  }

  test("pointer crash-window: a writer that dies before its pointer publish leaves the table intact; vacuum reclaims the orphan after the TTL") {
    val base = java.nio.file.Files.createTempDirectory("ptr-crash").toString
    val loc = s"$base/t"
    withLockfile {
      Sinks.write(spark, Seq((1, "keep")).toDF("k", "v"), out(loc)(identity))
      // simulate the crash: a complete generation written, no pointer
      val (p, fs) = fsOf(loc)
      val orphan = new org.apache.hadoop.fs.Path(p,
        s"_gen/g-${"%013d".format(System.currentTimeMillis() - 10000)}-deadbeef")
      Seq((9, "lost")).toDF("k", "v").write.parquet(orphan.toString)
      // the published table is untouched by the orphan
      assert(readBack(loc).collect().map(r => (r.getInt(0), r.getString(1))).toSet ==
        Set((1, "keep")))
      assert(genDirs(loc).size == 2)
      // default TTL (1h): the orphan is too young to reclaim — it may be
      // a concurrent writer about to publish
      assert(!Sinks.vacuum(spark, base).exists(_.contains("deadbeef")))
      assert(genDirs(loc).size == 2)
      // ttl=0: crash debris, reclaimed; the live generation survives
      spark.conf.set("spark.graft.vacuum.gen.ttl.ms", "0")
      try {
        val deleted = Sinks.vacuum(spark, base)
        assert(deleted.exists(_.contains("deadbeef")), deleted.toString)
      } finally spark.conf.unset("spark.graft.vacuum.gen.ttl.ms")
      assert(genDirs(loc).size == 1)
      assert(readBack(loc).count() == 1)
      // and the next publish proceeds normally
      Sinks.write(spark, Seq((2, "next")).toDF("k", "v"), out(loc)(identity))
      assert(readBack(loc).collect().map(r => (r.getInt(0), r.getString(1))).toSet ==
        Set((2, "next")))
    }
  }

  test("pointer publish: compact rewrites through the pointer, content preserved") {
    val loc = tmp("compact")
    withLockfile {
      Sinks.write(spark, (1 to 100).toDF("n").repartition(8), out(loc)(identity))
      Sinks.compact(spark, loc, "parquet", 1)
      val gen = genDirs(loc)
      assert(gen.size == 2, gen.toString) // pre- and post-compact (keep-2 grace)
      val files = new java.io.File(Sinks.resolveDataPath(spark, loc))
        .listFiles().count(f => f.getName.endsWith(".parquet"))
      assert(files == 1, s"expected 1 compacted file, got $files")
      assert(readBack(loc).collect().map(_.getInt(0)).sorted.toSeq == (1 to 100))
      assert(ptrFiles(loc) == Seq("v000000000001.json", "v000000000002.json"))
    }
  }

  test("pointer publish: in-place modes on a LEGACY plain table never destroy prior rows") {
    // an existing append table built under the rename coordinator; the
    // deployment then switches to lockfile — appends must keep landing
    // beside the legacy rows (minting a generation from one batch would
    // orphan + purge them), and the upgrade happens at the next full
    // rewrite, which carries everything
    val loc = tmp("legacy-append")
    Sinks.write(spark, Seq(1, 2).toDF("n"), out(loc)(identity))
    // legacy PARTITIONED table, seeded under the rename coordinator too
    val loc2 = tmp("legacy-dyn")
    Sinks.write(spark, Seq((1, "a"), (2, "b")).toDF("k", "p"),
      out(loc2)(_.copy(partitionKeys = Seq("p"))))
    withLockfile {
      Sinks.write(spark, Seq(3).toDF("n"),
        out(loc)(_.copy(refresh = Refresh.Incremental)))
      assert(ptrFiles(loc).isEmpty, "a legacy table must stay plain under append")
      assert(spark.read.parquet(loc).collect().map(_.getInt(0)).sorted.toSeq ==
        Seq(1, 2, 3), "legacy rows must survive the coordinator switch")
      // dynamic partition overwrite on the legacy partitioned table:
      // the untouched partition survives
      Sinks.write(spark, Seq((9, "a")).toDF("k", "p"),
        out(loc2)(_.copy(partitionKeys = Seq("p"))))
      assert(ptrFiles(loc2).isEmpty)
      assert(spark.read.parquet(loc2).collect()
        .map(r => (r.getInt(0), r.getString(1))).toSet == Set((9, "a"), (2, "b")),
        "dynamic overwrite must replace only the touched partition")
    }
  }

  test("pointer publish: a plain-layout table upgrades in place on its first lockfile publish") {
    val loc = tmp("upgrade")
    // written under the default rename coordinator: plain layout
    Sinks.write(spark, Seq((1, "old")).toDF("k", "v"), out(loc)(identity))
    assert(ptrFiles(loc).isEmpty)
    withLockfile {
      // the deployment switches to an overwrite-only store: the next
      // full refresh publishes a generation and purges the legacy root
      // files (they are superseded by definition)
      Sinks.write(spark, Seq((2, "new")).toDF("k", "v"), out(loc)(identity))
    }
    assert(ptrFiles(loc) == Seq("v000000000001.json"))
    val (p, fs) = fsOf(loc)
    val rootEntries = fs.listStatus(p).map(_.getPath.getName).toSet
    assert(rootEntries == Set("_gen", "_graft_ptr"),
      s"legacy plain-layout files must be purged: $rootEntries")
    assert(readBack(loc).collect().map(r => (r.getInt(0), r.getString(1))).toSet ==
      Set((2, "new")))
  }

  test("pointer purge grace: a pinned reader survives keep-1 publishes and fails loudly past the grace") {
    val loc = tmp("grace")
    withLockfile {
      Sinks.write(spark, Seq((1, "g1")).toDF("k", "v"), out(loc)(identity))
      // a reader resolves just before the next publish and holds the path
      val pinned = Sinks.resolveDataPath(spark, loc)
      Sinks.write(spark, Seq((2, "g2")).toDF("k", "v"), out(loc)(identity))
      // default keepGenerations=2: the superseded generation survives
      // one publish, so the pinned scan completes on exactly its snapshot
      assert(spark.read.parquet(pinned).collect()
        .map(r => (r.getInt(0), r.getString(1))).toSet == Set((1, "g1")),
        "the pinned reader must still see its resolved snapshot under the grace")
      Sinks.write(spark, Seq((3, "g3")).toDF("k", "v"), out(loc)(identity))
      // past the grace: the generation is GONE and the read fails
      // loudly (missing path) — never a silently mixed or empty table
      val (_, fs) = fsOf(loc)
      assert(!fs.exists(new org.apache.hadoop.fs.Path(pinned)),
        "past the grace the pinned generation must be purged")
      intercept[Exception] { spark.read.parquet(pinned).collect() }
      // the live read is the latest publish throughout
      assert(readBack(loc).collect()
        .map(r => (r.getInt(0), r.getString(1))).toSet == Set((3, "g3")))
    }
  }

  test("pointer straggler: withPointerRetry re-resolves ONCE past K+1 publishes, loud when truly gone") {
    val loc = tmp("strag")
    withLockfile {
      Sinks.write(spark, Seq((1, "g1")).toDF("k", "v"), out(loc)(identity))
      // the straggler scenario: the read starts on the CURRENT
      // generation, K+1 publishes land DURING the scan (purging it),
      // and the action fails on the missing path — the helper must
      // re-resolve once and complete on the fresh snapshot
      var attempts = 0
      val got = Sinks.withPointerRetry(spark, loc) { p =>
        attempts += 1
        if (attempts == 1) {
          // K+1 = 2 publishes at default keepGenerations=2 purge g1
          Sinks.write(spark, Seq((2, "g2")).toDF("k", "v"), out(loc)(identity))
          Sinks.write(spark, Seq((3, "g3")).toDF("k", "v"), out(loc)(identity))
          val (_, fs) = fsOf(loc)
          assert(!fs.exists(new org.apache.hadoop.fs.Path(p)),
            "precondition: the straggler's generation must be purged")
        }
        spark.read.parquet(p).collect().map(r => (r.getInt(0), r.getString(1))).toSet
      }
      assert(attempts == 2, "the helper must retry exactly once")
      assert(got == Set((3, "g3")),
        "the retried read must be the FRESH snapshot, not a mix")
      // loud when the failure is NOT a vanished generation: a fresh
      // resolve that equals the first attempt rethrows the original
      var calls = 0
      val boom = intercept[java.io.FileNotFoundException] {
        Sinks.withPointerRetry(spark, loc) { _ =>
          calls += 1
          throw new java.io.FileNotFoundException("some OTHER missing file")
        }
      }
      assert(calls == 1 && boom.getMessage.contains("OTHER"),
        "same-path re-resolve must rethrow the original failure without re-reading")
      // a NON-pointer location never retries (no pointer to re-resolve)
      val plainDir = java.nio.file.Files.createTempDirectory("plain").toString
      Seq((9, "x")).toDF("k", "v").write.mode("overwrite").parquet(plainDir)
      var plainCalls = 0
      intercept[java.io.FileNotFoundException] {
        Sinks.withPointerRetry(spark, plainDir) { _ =>
          plainCalls += 1
          throw new java.io.FileNotFoundException("plain")
        }
      }
      assert(plainCalls == 1, "plain locations must fail without retry")
    }
  }

  test("pointer purge grace: keepGenerations widens the lag, 1 restores the eager purge, floor is validated") {
    withLockfile {
      // keep=3: a pinned reader survives TWO publishes, dies at the third
      val loc = tmp("grace3")
      spark.conf.set("spark.graft.pointer.keepGenerations", "3")
      try {
        Sinks.write(spark, Seq(1).toDF("n"), out(loc)(identity))
        val pinned = Sinks.resolveDataPath(spark, loc)
        Sinks.write(spark, Seq(2).toDF("n"), out(loc)(identity))
        Sinks.write(spark, Seq(3).toDF("n"), out(loc)(identity))
        assert(spark.read.parquet(pinned).collect().map(_.getInt(0)).toSeq == Seq(1))
        Sinks.write(spark, Seq(4).toDF("n"), out(loc)(identity))
        val (_, fs) = fsOf(loc)
        assert(!fs.exists(new org.apache.hadoop.fs.Path(pinned)))
        assert(ptrFiles(loc) == Seq("v000000000002.json",
          "v000000000003.json", "v000000000004.json"))
        assert(genDirs(loc).size == 3)
      } finally spark.conf.unset("spark.graft.pointer.keepGenerations")
      // keep=1: the pre-grace eager purge (live generation only)
      val loc1 = tmp("grace1")
      spark.conf.set("spark.graft.pointer.keepGenerations", "1")
      try {
        Sinks.write(spark, Seq(1).toDF("n"), out(loc1)(identity))
        Sinks.write(spark, Seq(2).toDF("n"), out(loc1)(identity))
        assert(genDirs(loc1).size == 1)
        assert(ptrFiles(loc1) == Seq("v000000000002.json"))
      } finally spark.conf.unset("spark.graft.pointer.keepGenerations")
      // the settle-floor validation discipline: 0 and junk are named errors
      val locBad = tmp("graceBad")
      for (bad <- Seq("0", "-2", "many")) {
        spark.conf.set("spark.graft.pointer.keepGenerations", bad)
        try {
          val e = intercept[graft.config.ConfigError] {
            Sinks.write(spark, Seq(1).toDF("n"), out(locBad)(identity))
          }
          assert(e.getMessage.contains("keepGenerations"), e.getMessage)
        } finally spark.conf.unset("spark.graft.pointer.keepGenerations")
      }
    }
  }
}
