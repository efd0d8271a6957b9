package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine_sim is callable from SQL text after registration") {
    graft.sql.GraftExtensions.ensureRegistered(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) a," +
        "       cosine_sim(array(1.0d, 0.0d), array(0.0d, 1.0d)) b," +
        "       cosine_sim(array(1.0d, 1.0d), array(1.0d, 0.0d)) c").head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 0.0)
    assert(math.abs(r.getDouble(2) - math.sqrt(2) / 2) < 1e-12)
  }

  test("float arrays work without an explicit cast") {
    graft.sql.GraftExtensions.ensureRegistered(spark)
    val r = Seq((Seq(1f, 2f, 3f), Seq(1f, 2f, 3f))).toDF("a", "b")
      .selectExpr("cosine_sim(a, b) c").head().getDouble(0)
    assert(r == 1.0)
  }

  test("matches the higher-order-function formulation exactly") {
    graft.sql.GraftExtensions.ensureRegistered(spark)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(50).selectExpr("vec_id", "CAST(embedding AS array<double>) v")
    val pairs = e.as("l").crossJoin(e.as("r"))
      .selectExpr("l.vec_id a", "r.vec_id b",
        "cosine_sim(l.v, r.v) AS fast",
        """aggregate(zip_with(l.v, r.v, (x, y) -> x * y), 0.0d, (acc, x) -> acc + x)
          | / (sqrt(aggregate(transform(l.v, x -> x * x), 0.0d, (acc, x) -> acc + x))
          |    * sqrt(aggregate(transform(r.v, x -> x * x), 0.0d, (acc, x) -> acc + x))) AS slow""".stripMargin)
    val drift = pairs.filter(col("fast") =!= col("slow")).count()
    assert(drift == 0, s"$drift pairs differ between codegen and HOF paths")
  }

  test("null array gives null, not a crash") {
    graft.sql.GraftExtensions.ensureRegistered(spark)
    val r = spark.sql("SELECT cosine_sim(CAST(NULL AS array<double>), array(1.0d))").head()
    assert(r.isNullAt(0))
  }

  test("mismatched dimensions error instead of silently truncating") {
    graft.sql.GraftExtensions.ensureRegistered(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT cosine_sim(array(1.0d, 2.0d, 3.0d), array(1.0d, 2.0d))").head()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c => String.valueOf(c.getMessage).contains("dimensions differ")))
  }
}
