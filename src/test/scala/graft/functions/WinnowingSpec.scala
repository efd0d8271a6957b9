package graft.functions

import graft.SparkSpec

class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  test("winnowing guarantee: a shared substring of length >= w+k-1 shares a fingerprint") {
    graft.sql.GraftExtensions.ensureRegistered(spark)
    // k=12, w=8 → guarantee length 19; share a 40-char run
    val shared = "abcdefghijklmnopqrstuvwxyz0123456789zyxw"
    val df = Seq(
      (1L, s"prefix one two $shared suffix alpha"),
      (2L, s"completely different lead-in $shared and another tail")
    ).toDF("id", "text")
    val fps = df.selectExpr("id", "winnow_fps(text, 12, 8) f").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty)
  }

  test("short text (< k chars) yields empty fingerprints, null yields null") {
    graft.sql.GraftExtensions.ensureRegistered(spark)
    val r = Seq((1L, "tiny")).toDF("id", "text")
      .selectExpr("size(winnow_fps(text, 12, 8))").head().getInt(0)
    assert(r == 0)
    assert(spark.sql("SELECT winnow_fps(CAST(NULL AS string), 12, 8)").head().isNullAt(0))
  }

  test("winnowPairs finds exact copies and skips unrelated docs") {
    import graft.operators.Dedup
    val base = "the quick brown fox jumps over the lazy dog again and again today friend"
    val docs = Seq(
      (1L, base), (2L, base),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }
}
