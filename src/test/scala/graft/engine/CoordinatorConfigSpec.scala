package graft.engine

import graft.SparkSpec
import graft.config.{ConfigError, ConfigParser}

/** `spark.graft.commit.coordinator` selects the versioned-table
  * commit-publish primitive per deployment (spark_config/--conf), no
  * code change — the Delta LogStore-class pattern. */
class CoordinatorConfigSpec extends SparkSpec {
  import spark.implicits._

  private def runTrivialJob(): Unit = {
    val base = java.nio.file.Files.createTempDirectory("coord-spec").toString
    Seq((1, "a")).toDF("k", "v").write.parquet(s"$base/in")
    Engine.run(spark, ConfigParser.parse(
      s"""job: {name: j, type: spark-sql}
         |input_tables:
         |  - {name: t, source: s3, location: $base/in}
         |output_table:
         |  name: o
         |  target: s3
         |  location: $base/out
         |  versioned: "true"
         |sql: SELECT k, v FROM t
         |""".stripMargin), "default"): Unit
  }

  test("spark.graft.commit.coordinator switches the publish primitive") {
    val prev = graft.sinks.VersionedTable.commitCoordinator
    try {
      spark.conf.set("spark.graft.commit.coordinator", "lockfile")
      spark.conf.set("spark.graft.commit.lockfile.settle.ms", "60")
      runTrivialJob()
      assert(graft.sinks.VersionedTable.commitCoordinator
        .isInstanceOf[graft.sinks.LockFileCommitCoordinator])
      spark.conf.set("spark.graft.commit.coordinator", "rename")
      runTrivialJob()
      assert(graft.sinks.VersionedTable.commitCoordinator eq
        graft.sinks.RenameCommitCoordinator)
      // unknown coordinator: a named ConfigError before any job work
      spark.conf.set("spark.graft.commit.coordinator", "zookeeper")
      val e = intercept[ConfigError](runTrivialJob())
      assert(e.getMessage.contains("zookeeper"))
    } finally {
      spark.conf.unset("spark.graft.commit.coordinator")
      spark.conf.unset("spark.graft.commit.lockfile.settle.ms")
      graft.sinks.VersionedTable.setCommitCoordinator(prev)
    }
  }

  test("lockfile windows validate at CONFIG time: settle floor, lease dominance, non-numeric") {
    val prev = graft.sinks.VersionedTable.commitCoordinator
    try {
      spark.conf.set("spark.graft.commit.coordinator", "lockfile")
      // a tiny settle silently voids the election's safety assumption
      // (settle > store visibility lag + clock skew) — named error, not
      // a two-winner clobber in production
      spark.conf.set("spark.graft.commit.lockfile.settle.ms", "5")
      val e1 = intercept[ConfigError](runTrivialJob())
      assert(e1.getMessage.contains("50 ms floor"), e1.getMessage)
      spark.conf.unset("spark.graft.commit.lockfile.settle.ms")
      // the lease must dominate the settle window (crashed-writer GC)
      spark.conf.set("spark.graft.commit.lockfile.lease.ms", "200")
      val e2 = intercept[ConfigError](runTrivialJob())
      assert(e2.getMessage.contains("2x the settle"), e2.getMessage)
      spark.conf.unset("spark.graft.commit.lockfile.lease.ms")
      // non-numeric values are named errors, not NumberFormatException
      spark.conf.set("spark.graft.commit.lockfile.settle.ms", "fast")
      val e3 = intercept[ConfigError](runTrivialJob())
      assert(e3.getMessage.contains("millisecond"), e3.getMessage)
      spark.conf.unset("spark.graft.commit.lockfile.settle.ms")
      // a valid custom lease takes effect without error
      spark.conf.set("spark.graft.commit.lockfile.lease.ms", "5000")
      runTrivialJob()
      assert(graft.sinks.VersionedTable.commitCoordinator
        .isInstanceOf[graft.sinks.LockFileCommitCoordinator])
    } finally {
      spark.conf.unset("spark.graft.commit.coordinator")
      spark.conf.unset("spark.graft.commit.lockfile.settle.ms")
      spark.conf.unset("spark.graft.commit.lockfile.lease.ms")
      graft.sinks.VersionedTable.setCommitCoordinator(prev)
    }
  }
}
