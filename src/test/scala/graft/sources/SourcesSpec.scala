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
    // ("avro" was the canonical unknown until round 6 made it real —
    // sources/AvroFormat.scala)
    val e = intercept[ConfigError](Sources.load(spark,
      SourceSpec.File("/tmp/x", "xml", Map.empty)))
    assert(e.getMessage.contains("xml") && e.getMessage.contains("parquet"))
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
}
