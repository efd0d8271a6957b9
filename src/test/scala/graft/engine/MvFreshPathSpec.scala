package graft.engine

import graft.SparkSpec
import graft.config.ConfigParser
import org.apache.spark.sql.functions.col

/** The materialized-view FRESH short-circuit must replay with the same
  * read parameters the stale-path commit used — the output's configured
  * format/options — and pinned to the RECORDED version, not whatever is
  * latest at the MV location. */
class MvFreshPathSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String) =
    java.nio.file.Files.createTempDirectory("mvfresh").toString + s"/$name"

  test("fresh replay honors the output format and pins the recorded version") {
    val base = tmp("mv")
    val srcLoc = s"$base/src"
    val mvLoc = s"$base/mv"
    graft.sinks.VersionedTable.commit(spark, srcLoc,
      Seq(("A", 1L), ("A", 2L), ("B", 5L)).toDF("k", "x"), "overwrite")
    val yaml =
      s"""job:
         |  name: mv-fresh-orc
         |  type: spark-sql
         |input_tables:
         |  - name: src
         |    source: s3
         |    location: $srcLoc
         |    versioned: "true"
         |output_table:
         |  name: mv_out
         |  target: s3
         |  location: $mvLoc
         |  format: orc
         |  versioned: true
         |  materialized: true
         |sql: >
         |  SELECT k, CAST(sum(x) AS BIGINT) AS total FROM src GROUP BY k
         |""".stripMargin
    val job = ConfigParser.parse(yaml)
    Engine.runSparkSqlJob(spark, job, "default")
    assert(graft.sinks.VersionedTable.versions(spark, mvLoc) == Seq(1L))
    // fresh run: with the fix it reads the MV back as ORC; the old code
    // read with the default parquet format and blew up on orc files
    val fresh = Engine.runSparkSqlJob(spark, job, "default")
    assert(graft.sinks.VersionedTable.versions(spark, mvLoc) == Seq(1L))
    assert(fresh.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("A", 3L), ("B", 5L)))
    // pinning: a commit at the MV location that the MV state does NOT
    // know about (e.g. an out-of-band writer) must not change what the
    // fresh short-circuit returns — it reads asOf the recorded version
    graft.sinks.VersionedTable.commit(spark, mvLoc,
      Seq(("Z", 99L)).toDF("k", "total"), "append", format = "orc")
    val pinned = Engine.runSparkSqlJob(spark, job, "default")
    assert(pinned.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("A", 3L), ("B", 5L)))
    assert(!pinned.collect().exists(_.getString(0) == "Z"))
  }

  test("fresh replay passes format options through") {
    val base = tmp("mvopt")
    val srcLoc = s"$base/src"
    val mvLoc = s"$base/mv"
    graft.sinks.VersionedTable.commit(spark, srcLoc,
      Seq((1, "a")).toDF("k", "v"), "overwrite")
    val yaml =
      s"""job:
         |  name: mv-fresh-opts
         |  type: spark-sql
         |input_tables:
         |  - name: src
         |    source: s3
         |    location: $srcLoc
         |    versioned: "true"
         |output_table:
         |  name: mv_out
         |  target: s3
         |  location: $mvLoc
         |  format: parquet
         |  format_options:
         |    compression: snappy
         |  versioned: true
         |  materialized: true
         |sql: SELECT k, v FROM src
         |""".stripMargin
    val job = ConfigParser.parse(yaml)
    Engine.runSparkSqlJob(spark, job, "default")
    val fresh = Engine.runSparkSqlJob(spark, job, "default")
    assert(fresh.collect().map(r => (r.getInt(0), r.getString(1))).toSet ==
      Set((1, "a")))
  }
}
