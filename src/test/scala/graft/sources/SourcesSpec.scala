package graft.sources

import graft.SparkSpec
import graft.config.{ConfigError, SourceSpec}

class SourcesSpec extends SparkSpec {

  test("Glue format_options map to Spark reader options") {
    assert(Sources.mapOptions(Map(
      "withHeader" -> "true", "separator" -> "|", "quoteChar" -> "'",
      "escaper" -> "\\", "multiline" -> "true",
      "optimizePerformance" -> "true", // Glue-only knob: dropped
      "inferSchema" -> "true" // native Spark option: passes through
    )) == Map("header" -> "true", "sep" -> "|", "quote" -> "'",
      "escape" -> "\\", "multiLine" -> "true", "inferSchema" -> "true"))
  }

  test("unknown format is a config error, not a runtime crash") {
    // ("avro" was the canonical unknown until round 6 made it real,
    // then "xml" until round 7 wired Spark 4's built-in source)
    val e = intercept[ConfigError](Sources.load(spark,
      SourceSpec.File("/tmp/x", "iceberg", Map.empty)))
    assert(e.getMessage.contains("iceberg") && e.getMessage.contains("parquet"))
  }

  test("csv options drive a real read") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sources-spec").toString + "/csv"
    Seq((1, "x"), (2, "y")).toDF("id", "s")
      .write.option("header", "true").option("sep", "|").csv(dir)
    val back = Sources.load(spark, SourceSpec.File(dir, "csv",
      Map("withHeader" -> "true", "separator" -> "|", "inferSchema" -> "true")))
    assert(back.columns.toSeq == Seq("id", "s"))
    assert(back.count() == 2)
  }

  test("quarantine split is exact under EVERY query shape (column pruning)") {
    val dir = java.nio.file.Files.createTempDirectory("quarantine-prune").toString
    new java.io.File(s"$dir/in").mkdirs()
    val g = new java.io.PrintWriter(s"$dir/in/data.csv")
    g.write("1|aa|10\n2|bb|20\n998|cc|notanint\n999|dd\n"); g.close()
    val good = Sources.loadWithQuarantine(spark,
      SourceSpec.File(s"$dir/in", "csv", Map("separator" -> "|"),
        Some("a INT, b STRING, c INT")),
      s"$dir/q")
    // a DROPMALFORMED-reader view fails all three of these: pruning makes
    // malformed-ness relative to the columns each query parses (measured:
    // count()=4). The from_csv-expression view must be shape-independent.
    assert(good.count() == 2)
    assert(good.select("a").count() == 2)
    assert(good.collect().length == 2)
    val quarantined = spark.read.parquet(s"$dir/q")
    assert(quarantined.select("raw_record").collect().map(_.getString(0)).toSet ==
      Set("998|cc|notanint", "999|dd"))
    // re-run: overwrite semantics — same rejects, no duplicates
    Sources.loadWithQuarantine(spark,
      SourceSpec.File(s"$dir/in", "csv", Map("separator" -> "|"),
        Some("a INT, b STRING, c INT")),
      s"$dir/q").count()
    assert(spark.read.parquet(s"$dir/q").count() == 2)
  }
}
