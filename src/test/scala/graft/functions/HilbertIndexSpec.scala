package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The Hilbert-curve law, convention-free: the index is a BIJECTION
  * onto [0, 2^(k·bits)) and CONSECUTIVE positions are UNIT STEPS (the
  * coordinates differ in exactly one dimension, by exactly 1). That
  * pair of properties is what makes it a Hilbert curve — and the unit
  * step is precisely the locality the Z-interleave lacks (Z takes
  * quadrant-boundary jumps), i.e. why `cluster.curve: hilbert` exists. */
class HilbertIndexSpec extends SparkSpec {
  import spark.implicits._

  private def curve(dims: Int, bits: Int): Array[Array[Long]] = {
    val side = 1L << bits
    val cells = Seq.tabulate(math.pow(side.toDouble, dims.toDouble).toInt) { i =>
      var r = i.toLong
      val c = new Array[Long](dims)
      var d = dims - 1
      while (d >= 0) { c(d) = r % side; r /= side; d -= 1 }
      Tuple1(c.toSeq)
    }
    graft.sql.GraftExtensions.ensureRegistered(spark)
    cells.toDF("c")
      .select(col("c"), call_function("hilbert_index", col("c"), lit(bits)).as("h"))
      .collect()
      .sortBy(_.getAs[Long]("h"))
      .map(r => (r.getAs[Long]("h"), r.getSeq[Long](0).toArray))
      .map { case (_, c) => c }
  }

  private def assertHilbert(dims: Int, bits: Int): Unit = {
    val byIndex = curve(dims, bits)
    val n = byIndex.length
    assert(n == math.pow((1L << bits).toDouble, dims.toDouble).toInt)
    // bijection is implied by n distinct sort positions + the unit-step
    // walk below (a collision would produce a 0-distance step)
    byIndex.sliding(2).zipWithIndex.foreach {
      case (Array(a, b), i) =>
        val diffs = a.zip(b).map { case (x, y) => math.abs(x - y) }
        assert(diffs.sum == 1 && diffs.max == 1,
          s"dims=$dims bits=$bits: step $i is not a unit step: " +
            s"${a.mkString(",")} -> ${b.mkString(",")}")
      case _ => ()
    }
  }

  test("2-D curves walk in unit steps at every depth") {
    assertHilbert(2, 1); assertHilbert(2, 2); assertHilbert(2, 4)
  }

  test("3-D and 4-D curves walk in unit steps") {
    assertHilbert(3, 2); assertHilbert(4, 2)
  }

  test("out-of-range coordinates and a broken bit budget are named errors") {
    graft.sql.GraftExtensions.ensureRegistered(spark)
    val e1 = intercept[Exception](
      Seq(Tuple1(Seq(5L, 0L))).toDF("c")
        .select(call_function("hilbert_index", col("c"), lit(2))).collect())
    assert(e1.getMessage != null && e1.getMessage.contains("outside"),
      s"got: ${e1.getMessage}")
    val e2 = intercept[Exception](
      Seq(Tuple1(Seq.fill(8)(0L))).toDF("c")
        .select(call_function("hilbert_index", col("c"), lit(16))).collect())
    assert(e2.getMessage != null && e2.getMessage.contains("62"),
      s"got: ${e2.getMessage}")
    // a NULL element must error, never silently read as coordinate 0
    val e3 = intercept[Exception](
      spark.sql("SELECT hilbert_index(array(CAST(NULL AS BIGINT), 5L), 16)").collect())
    assert(e3.getMessage != null && e3.getMessage.contains("null coordinate"),
      s"got: ${e3.getMessage}")
  }

  test("the index is deterministic and null-safe") {
    graft.sql.GraftExtensions.ensureRegistered(spark)
    val out = Seq(Tuple1(Seq(3L, 1L)), Tuple1(null.asInstanceOf[Seq[Long]]))
      .toDF("c")
      .select(call_function("hilbert_index", col("c"), lit(4)).as("h"))
      .collect()
    val again = Seq(Tuple1(Seq(3L, 1L))).toDF("c")
      .select(call_function("hilbert_index", col("c"), lit(4)).as("h"))
      .head.getLong(0)
    assert(out(0).getLong(0) == again)
    assert(out(1).isNullAt(0))
  }
}
