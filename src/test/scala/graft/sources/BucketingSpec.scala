package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("co-bucketed tables join with zero shuffle exchanges") {
    val cust = Bucketed.ensureTable(spark, "spec_bkt", "cust_b",
      spark.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey"), col("c_mktsegment")),
      "c_custkey", buckets = 4)
    val ord = Bucketed.ensureTable(spark, "spec_bkt", "ord_b",
      spark.read.parquet(s"$dir/orders.parquet")
        .select(col("o_custkey"), col("o_totalprice")),
      "o_custkey", buckets = 4)
    // hint("merge") forces a sort-merge join so a broadcast can't dodge
    // the exchange question: co-located buckets must satisfy the join's
    // distribution requirement straight off the scan.
    val j = spark.table(cust).hint("merge")
      .join(spark.table(ord), col("c_custkey") === col("o_custkey"))
    j.collect()
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")

    // the same merge join over raw parquet shuffles both sides
    val raw = spark.read.parquet(s"$dir/customer.parquet").hint("merge")
      .join(spark.read.parquet(s"$dir/orders.parquet"),
        col("c_custkey") === col("o_custkey"))
    raw.collect()
    assert(raw.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("rebuilding a bucketed table is idempotent and readable") {
    val df = spark.range(100).selectExpr("id AS k", "id * 2 AS v")
    Bucketed.ensureTable(spark, "spec_bkt", "idem", df, "k", buckets = 2)
    val name = Bucketed.ensureTable(spark, "spec_bkt", "idem", df, "k", buckets = 2)
    assert(spark.table(name).count() == 100)
  }
}
