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

  test("refreshAdditive: delta fold == full recompute; fallback on non-append") {
    val base = java.nio.file.Files.createTempDirectory("mv-spec").toString
    val src = s"$base/src"; val mv = s"$base/mv"
    VersionedTable.commit(spark, src,
      Seq(("a", 10L), ("b", 20L), ("a", 5L)).toDF("k", "x"), "overwrite")
    val (v1, p1) = MaterializedView.refreshAdditive(spark, mv, "src", src,
      Seq("k"), Map("total" -> "x"))
    assert((v1, p1) == ((1L, "full")))
    def mvRows = VersionedTable.read(spark, mv).collect()
      .map(r => (r.getAs[String]("k"), r.getAs[Long]("total"), r.getAs[Long]("n_rows"))).toSet
    assert(mvRows == Set(("a", 15L, 2L), ("b", 20L, 1L)))
    // fresh: zero work
    assert(MaterializedView.refreshAdditive(spark, mv, "src", src,
      Seq("k"), Map("total" -> "x"))._2 == "fresh")
    // two appends -> ONE incremental fold over just the delta
    VersionedTable.commit(spark, src, Seq(("b", 1L), ("c", 7L)).toDF("k", "x"), "append")
    VersionedTable.commit(spark, src, Seq(("a", 100L)).toDF("k", "x"), "append")
    val (_, p2) = MaterializedView.refreshAdditive(spark, mv, "src", src,
      Seq("k"), Map("total" -> "x"))
    assert(p2 == "incremental")
    assert(mvRows == Set(("a", 115L, 3L), ("b", 21L, 2L), ("c", 7L, 1L)))
    // a DELETE on the source breaks additivity -> full recompute fallback
    VersionedTable.deleteWhere(spark, src, "k = 'b' AND x = 20")
    val (_, p3) = MaterializedView.refreshAdditive(spark, mv, "src", src,
      Seq("k"), Map("total" -> "x"))
    assert(p3 == "full")
    assert(mvRows == Set(("a", 115L, 3L), ("b", 1L, 1L), ("c", 7L, 1L)))
  }

  test("refreshAdditiveMulti: per-source deltas fold; one bad source -> full") {
    val base = java.nio.file.Files.createTempDirectory("mv-spec").toString
    val s1 = s"$base/s1"; val s2 = s"$base/s2"; val mv = s"$base/mv"
    VersionedTable.commit(spark, s1, Seq(("a", 1L)).toDF("k", "x"), "overwrite")
    VersionedTable.commit(spark, s2, Seq(("a", 2L), ("b", 3L)).toDF("k", "x"), "overwrite")
    def refresh() = MaterializedView.refreshAdditiveMulti(spark, mv,
      Seq(("s1", s1), ("s2", s2)), Seq("k"), Map("total" -> "x"))
    assert(refresh()._2 == "full")
    def mvRows = VersionedTable.read(spark, mv).collect()
      .map(r => (r.getAs[String]("k"), r.getAs[Long]("total"), r.getAs[Long]("n_rows"))).toSet
    assert(mvRows == Set(("a", 3L, 2L), ("b", 3L, 1L)))
    assert(refresh()._2 == "fresh")
    // only s2 moves: one delta folds
    VersionedTable.commit(spark, s2, Seq(("b", 10L)).toDF("k", "x"), "append")
    assert(refresh()._2 == "incremental")
    assert(mvRows == Set(("a", 3L, 2L), ("b", 13L, 2L)))
    // both move, one with a delete: whole refresh goes full, stays right
    VersionedTable.commit(spark, s1, Seq(("c", 4L)).toDF("k", "x"), "append")
    VersionedTable.deleteWhere(spark, s2, "k = 'a'")
    assert(refresh()._2 == "full")
    assert(mvRows == Set(("a", 1L, 1L), ("b", 13L, 2L), ("c", 4L, 1L)))
  }
}
