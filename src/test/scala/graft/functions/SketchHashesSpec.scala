package graft.functions

import graft.SparkSpec

class SketchHashesSpec extends SparkSpec {
  import spark.implicits._

  test("minhash_sig matches the xxhash64 HOF formulation bit-for-bit") {
    graft.sql.GraftExtensions.ensureRegistered(spark)
    val df = Seq(
      (1L, Seq(11L, -7L, 123456789L)),
      (2L, Seq(Long.MinValue, 0L, Long.MaxValue)),
      (3L, Seq(42L))
    ).toDF("id", "hs")
    val drift = df.selectExpr("id",
        "minhash_sig(hs, 16) AS fast",
        "transform(sequence(0, 15), j -> array_min(transform(hs, h -> xxhash64(h, j)))) AS slow")
      .filter("fast <> slow").count()
    assert(drift == 0)
  }

  test("simhash64 matches a hand-computed vote tally") {
    graft.sql.GraftExtensions.ensureRegistered(spark)
    def brute(hs: Seq[Long]): Long = {
      (0 until 64).foldLeft(0L) { (acc, j) =>
        val votes = hs.map(h => if (((h >>> j) & 1L) == 1L) 1 else -1).sum
        if (votes > 0) acc | (1L << j) else acc
      }
    }
    val inputs = Seq(Seq(5L, 5L, -1L), Seq(0L), Seq(Long.MaxValue, Long.MinValue, 77L))
    val df = inputs.zipWithIndex.map { case (hs, i) => (i.toLong, hs) }.toDF("id", "hs")
    val got = df.selectExpr("id", "simhash64(hs) s").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    inputs.zipWithIndex.foreach { case (hs, i) =>
      assert(got(i.toLong) == brute(hs), s"input $i")
    }
  }

  test("empty feature set: minhash = MaxValue sentinels, simhash = 0") {
    graft.sql.GraftExtensions.ensureRegistered(spark)
    val r = Seq((1L, Seq.empty[Long])).toDF("id", "hs")
      .selectExpr("minhash_sig(hs, 4) m", "simhash64(hs) s").head()
    assert(r.getSeq[Long](0) == Seq.fill(4)(Long.MaxValue))
    assert(r.getLong(1) == 0L)
  }
}
