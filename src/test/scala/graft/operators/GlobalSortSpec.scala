package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GlobalSortSpec extends SparkSpec {
  import spark.implicits._

  test("row numbers are the exact global sort order, 1..N, no gaps") {
    val df = (1 to 1000).map(i => (i * 37 % 1000, i.toLong)).toDF("k", "uid")
      .repartition(7)
    val numbered = GlobalSort.withRowNumber(df, "rn", col("k").asc, col("uid").asc)
      .collect().sortBy(_.getAs[Long]("rn"))
    assert(numbered.map(_.getAs[Long]("rn")).toSeq == (1L to 1000L))
    val keys = numbered.map(r => (r.getInt(0), r.getLong(1)))
    assert(keys.toSeq == keys.toSeq.sorted)
  }

  test("numbering matches single-partition row_number exactly") {
    val df = Seq(("b", 1L), ("a", 2L), ("a", 1L), ("c", 0L)).toDF("k", "uid")
    val got = GlobalSort.withRowNumber(df, "rn", col("k").asc, col("uid").asc)
      .select("k", "uid", "rn").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._3)
    assert(got.toSeq == Seq(("a", 1L, 1L), ("a", 2L, 2L), ("b", 1L, 3L), ("c", 0L, 4L)))
  }
}
