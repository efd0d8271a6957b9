package graft.sinks

import graft.SparkSpec

class MaterializedViewSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String) =
    java.nio.file.Files.createTempDirectory("mv-spec").toString + s"/$name"

  test("refresh: recompute only when a source moved; compute is lazy when fresh") {
    val base = tmp("mv")
    val src = s"$base/src"; val mv = s"$base/mv"
    VersionedTable.commit(spark, src, Seq((1, 10), (2, 20)).toDF("k", "x"), "overwrite")
    var computes = 0
    def view = {
      computes += 1
      VersionedTable.read(spark, src).groupBy().sum("x").toDF("total")
    }
    val (v1, r1) = MaterializedView.refresh(spark, mv, Seq(("src", src)), view)
    assert((v1, r1, computes) == ((1L, true, 1)))
    assert(VersionedTable.read(spark, mv).collect().head.getLong(0) == 30L)
    // fresh: compute must NOT build (by-name param never forced)
    val (v2, r2) = MaterializedView.refresh(spark, mv, Seq(("src", src)), view)
    assert((v2, r2, computes) == ((1L, false, 1)))
    // source append invalidates
    VersionedTable.commit(spark, src, Seq((3, 5)).toDF("k", "x"), "append")
    val (v3, r3) = MaterializedView.refresh(spark, mv, Seq(("src", src)), view)
    assert((v3, r3, computes) == ((2L, true, 2)))
    assert(VersionedTable.read(spark, mv).collect().head.getLong(0) == 35L)
    // past refreshes remain time-travelable
    assert(VersionedTable.read(spark, mv, asOf = Some(1L)).collect().head.getLong(0) == 30L)
  }
}
