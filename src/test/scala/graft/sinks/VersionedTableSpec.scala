package graft.sinks

import graft.SparkSpec

class VersionedTableSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String) =
    java.nio.file.Files.createTempDirectory("vt-spec").toString + s"/$name"

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Int, String)] =
    df.collect().map(r => (r.getAs[Int]("k"), r.getAs[String]("v"))).toSet

  test("commit/read roundtrip: overwrite snapshots, append accumulates") {
    val loc = tmp("t1")
    val v1 = VersionedTable.commit(spark, loc, Seq((1, "a")).toDF("k", "v"), "overwrite")
    val v2 = VersionedTable.commit(spark, loc, Seq((2, "b")).toDF("k", "v"), "append")
    val v3 = VersionedTable.commit(spark, loc, Seq((9, "z")).toDF("k", "v"), "overwrite")
    assert((v1, v2, v3) == ((1L, 2L, 3L)))
    assert(rows(VersionedTable.read(spark, loc)) == Set((9, "z")))
    assert(rows(VersionedTable.read(spark, loc, asOf = Some(2L))) == Set((1, "a"), (2, "b")))
    assert(rows(VersionedTable.read(spark, loc, asOf = Some(1L))) == Set((1, "a")))
    assert(VersionedTable.versions(spark, loc) == Seq(1L, 2L, 3L))
  }

  test("snapshot isolation: a frame planned at version N never sees N+1") {
    val loc = tmp("t2")
    VersionedTable.commit(spark, loc, Seq((1, "a")).toDF("k", "v"), "overwrite")
    val pinned = VersionedTable.read(spark, loc) // resolved at v1
    VersionedTable.commit(spark, loc, Seq((2, "b")).toDF("k", "v"), "append")
    assert(rows(pinned) == Set((1, "a")))          // still v1's file list
    assert(rows(VersionedTable.read(spark, loc)) == Set((1, "a"), (2, "b")))
  }

  test("commit CAS: losing the version race rebases appends, never drops data") {
    val loc = tmp("t3")
    VersionedTable.commit(spark, loc, Seq((1, "a")).toDF("k", "v"), "overwrite")
    // simulate a concurrent writer landing v2 between our read and CAS:
    // plant a valid v2 manifest (copy of v1) so the next commit's first
    // attempt loses the create-if-absent race and must rebase to v3
    val log = new java.io.File(s"$loc/_graft_log")
    java.nio.file.Files.copy(
      new java.io.File(log, "v00001.json").toPath,
      new java.io.File(log, "v00002.json").toPath)
    val v = VersionedTable.commit(spark, loc, Seq((2, "b")).toDF("k", "v"), "append")
    assert(v == 3L) // rebased past the planted v2
    assert(rows(VersionedTable.read(spark, loc)) == Set((1, "a"), (2, "b")))
  }

  test("dead writers are invisible: unreferenced data files never read, vacuumed later") {
    val loc = tmp("t4")
    VersionedTable.commit(spark, loc, Seq((1, "a")).toDF("k", "v"), "overwrite")
    // a writer that died after moving files but before its manifest:
    // plant a stray parquet into data/
    Seq((99, "dead")).toDF("k", "v").write.parquet(s"$loc/.orphan")
    val part = new java.io.File(s"$loc/.orphan").listFiles()
      .filter(_.getName.startsWith("part-")).head
    java.nio.file.Files.copy(part.toPath,
      new java.io.File(s"$loc/data/deadbeef-${part.getName}").toPath)
    assert(rows(VersionedTable.read(spark, loc)) == Set((1, "a")))
    VersionedTable.commit(spark, loc, Seq((2, "b")).toDF("k", "v"), "append")
    val dropped = VersionedTable.vacuumVersions(spark, loc, keepFromVersion = 2L)
    assert(dropped.exists(_.contains("deadbeef")))       // orphan reclaimed
    assert(dropped.exists(_.contains("v00001.json")))    // old manifest gone
    assert(rows(VersionedTable.read(spark, loc)) == Set((1, "a"), (2, "b")))
    val e = intercept[graft.config.ConfigError](
      VersionedTable.vacuumVersions(spark, loc, keepFromVersion = 99L))
    assert(e.getMessage.contains("refusing to empty"))
  }

  test("txn commits are exactly-once: a replayed batch id is skipped, not re-appended") {
    val loc = tmp("t6")
    val v1 = VersionedTable.commit(spark, loc, Seq((1, "a")).toDF("k", "v"),
      "append", txn = Some(("ckpt-A", 0L)))
    // WAL replay of batch 0 (crash between sink commit and checkpoint
    // advance): must return the already-committed version, write nothing
    val vReplay = VersionedTable.commit(spark, loc, Seq((1, "a")).toDF("k", "v"),
      "append", txn = Some(("ckpt-A", 0L)))
    assert(v1 == 1L && vReplay == 1L)
    assert(VersionedTable.versions(spark, loc) == Seq(1L))
    assert(rows(VersionedTable.read(spark, loc)) == Set((1, "a")))
    // the NEXT batch commits; an older batch id offered later also skips
    val v2 = VersionedTable.commit(spark, loc, Seq((2, "b")).toDF("k", "v"),
      "append", txn = Some(("ckpt-A", 1L)))
    val vOld = VersionedTable.commit(spark, loc, Seq((9, "x")).toDF("k", "v"),
      "append", txn = Some(("ckpt-A", 0L)))
    assert(v2 == 2L && vOld == 2L)
    assert(rows(VersionedTable.read(spark, loc)) == Set((1, "a"), (2, "b")))
    // a DIFFERENT app's batch 0 is unrelated and commits
    val v3 = VersionedTable.commit(spark, loc, Seq((3, "c")).toDF("k", "v"),
      "append", txn = Some(("ckpt-B", 0L)))
    assert(v3 == 3L)
    assert(rows(VersionedTable.read(spark, loc)) == Set((1, "a"), (2, "b"), (3, "c")))
  }

  test("maintenance on a versioned root goes THROUGH the protocol, never flattens it") {
    val loc = tmp("t7")
    def kw(df: org.apache.spark.sql.DataFrame): Set[(Int, Int)] =
      df.collect().map(r => (r.getAs[Int]("k"), r.getAs[Int]("w"))).toSet
    // two commits -> latest snapshot spread over several files
    VersionedTable.commit(spark, loc,
      Seq((1, 10), (2, 20)).toDF("k", "w").repartition(4), "overwrite")
    VersionedTable.commit(spark, loc, Seq((3, 30)).toDF("k", "w"), "append")
    val filesBefore = new java.io.File(s"$loc/data").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(filesBefore >= 3)
    Sinks.compact(spark, loc, "parquet", nFiles = 1)
    // compaction published as v3: same content, history intact
    assert(VersionedTable.versions(spark, loc) == Seq(1L, 2L, 3L))
    assert(kw(VersionedTable.read(spark, loc)) == Set((1, 10), (2, 20), (3, 30)))
    assert(kw(VersionedTable.read(spark, loc, asOf = Some(1L))) == Set((1, 10), (2, 20)))
    // z-order clustering also commits through the protocol
    Sinks.clusterZOrder(spark, loc, "parquet", Seq("k", "w"), nFiles = 1)
    assert(VersionedTable.versions(spark, loc) == Seq(1L, 2L, 3L, 4L))
    assert(kw(VersionedTable.read(spark, loc)) == Set((1, 10), (2, 20), (3, 30)))
  }

  test("read errors are named: empty table, unknown version") {
    val loc = tmp("t5")
    val e1 = intercept[graft.config.ConfigError](VersionedTable.read(spark, loc))
    assert(e1.getMessage.contains("no committed versions"))
    VersionedTable.commit(spark, loc, Seq((1, "a")).toDF("k", "v"), "overwrite")
    val e2 = intercept[graft.config.ConfigError](
      VersionedTable.read(spark, loc, asOf = Some(7L)))
    assert(e2.getMessage.contains("not in committed set"))
  }
}
