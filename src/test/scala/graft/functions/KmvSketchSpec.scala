package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[KmvSketch]]: exactness below k, the KMV estimate above k,
  * partition-count invariance (the merge path), and duplicate/null
  * handling. */
class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  private def hashed(n: Int, parts: Int) =
    (1 to n).map(i => s"tok$i").toDF("t").repartition(parts)
      .select(expr("CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT)").as("hv"))

  test("under k distinct values the sketch IS the exact distinct set") {
    graft.sql.GraftExtensions.ensureRegistered(spark)
    val df = hashed(40, 5).union(hashed(40, 3)) // duplicates collapse
    val ks = df.agg(expr("kmv_sketch(hv, 128)").as("ks"))
      .select(size(col("ks"))).head().getInt(0)
    assert(ks == 40)
  }

  test("estimate lands near the truth for cardinalities well above k") {
    graft.sql.GraftExtensions.ensureRegistered(spark)
    for (n <- Seq(2000, 10000)) {
      val est = hashed(n, 7)
        .agg(expr("kmv_sketch(hv, 128)").as("ks"))
        .select(floor(lit(127.0) * pow(lit(2.0), lit(60.0)) /
          element_at(col("ks"), 128) + lit(0.5)).cast("long"))
        .head().getLong(0)
      // KMV standard error ~ 1/sqrt(k-2) ≈ 9% at k=128; allow 3 sigma
      assert(math.abs(est - n) < 0.27 * n, s"n=$n est=$est")
    }
  }

  test("result is independent of partitioning (merge path == single buffer)") {
    graft.sql.GraftExtensions.ensureRegistered(spark)
    val a = hashed(5000, 1).agg(expr("kmv_sketch(hv, 64)")).head().getSeq[Long](0)
    val b = hashed(5000, 17).agg(expr("kmv_sketch(hv, 64)")).head().getSeq[Long](0)
    assert(a == b && a.length == 64 && a == a.sorted)
  }

  test("nulls are skipped") {
    graft.sql.GraftExtensions.ensureRegistered(spark)
    val df = Seq[java.lang.Long](1L, null, 2L, null, 1L).toDF("hv")
    val ks = df.agg(expr("kmv_sketch(hv, 8)")).head().getSeq[Long](0)
    assert(ks == Seq(1L, 2L))
  }
}
