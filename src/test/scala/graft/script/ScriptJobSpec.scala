package graft.script

import graft.SparkSpec
import graft.config.{ConfigError, ConfigParser}

class ScriptJobSpec extends SparkSpec {

  test("script_jar loads a job class that is NOT on the engine classpath") {
    intercept[ClassNotFoundException] {
      Class.forName("example.jobs.ExternalScoreJob")
    }
    val out = graft.SparkEntry.queries("fw_script_jar")(spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    assert(rows.nonEmpty)
    // UDF defined in the external jar executed inside tasks
    assert(rows.forall(r => r.getAs[Long]("score") == r.getAs[String]("n_name").length * 3L + 1))
  }

  test("script_jar parse + missing-jar is a ConfigError before anything runs") {
    val job = ConfigParser.parse(
      """job:
        |  name: j
        |  type: script
        |script_class: example.jobs.ExternalScoreJob
        |script_jar: /no/such/path.jar
        |""".stripMargin)
    assert(job.scriptJar.contains("/no/such/path.jar"))
    val e = intercept[ConfigError] {
      ScriptRunner.run(spark, job, Map.empty)
    }
    assert(e.getMessage.contains("script_jar"))
  }

  test("script_class outside any jar must implement ScriptJob") {
    val job = ConfigParser.parse(
      """job:
        |  name: j
        |  type: script
        |script_class: java.lang.Object
        |""".stripMargin)
    val e = intercept[ConfigError] { ScriptRunner.run(spark, job, Map.empty) }
    assert(e.getMessage.contains("does not implement"))
  }
}
