package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SaltedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join result equals the plain join on skewed data") {
    // one hot key (90% of rows) + a long tail
    val big = ((1 to 9000).map(i => ("hot", i.toLong)) ++
      (1 to 1000).map(i => (s"k${i % 50}", i.toLong))).toDF("k", "v")
    val small = (Seq("hot") ++ (0 until 50).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, s"dim$i") }.toDF("k", "d")

    val plain = big.join(small, Seq("k")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted
    val salted = SaltedJoin.inner(big, small, Seq("k"), salts = 8).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted
    assert(salted.toSeq == plain.toSeq)
    assert(plain.length == 10000)
  }

  test("the hot key really spreads across salt values") {
    val big = (1 to 5000).map(i => ("hot", i.toLong)).toDF("k", "v")
    val spread = big.withColumn("__salt",
        pmod(xxhash64(struct(big.columns.map(col): _*)), lit(8)).cast("int"))
      .groupBy("__salt").count().collect().map(_.getLong(1))
    assert(spread.length == 8)                 // all 8 salts occupied
    assert(spread.max < 5000 * 0.25)           // no salt owns the key alone
  }
}
