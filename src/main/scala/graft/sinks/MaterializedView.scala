package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.hadoop.fs.Path

/** Version-aware MATERIALIZED VIEW over versioned-table sources: the MV
  * is itself a versioned table, plus a state record of the source
  * snapshot versions it was computed FROM. A refresh first compares the
  * sources' current latest versions against that record — metadata
  * listings only — and recomputes ONLY when some source moved. At
  * 100 TB this is the difference between a dashboard rollup that
  * re-reads the lake on every schedule tick and one that answers "no
  * upstream commit since last run" for the cost of a few directory
  * listings.
  *
  * Consistency: the fingerprint is taken BEFORE the compute reads its
  * sources, so a source commit racing the refresh makes the recorded
  * fingerprint stale-conservative — the next refresh sees a mismatch
  * and recomputes (never wrongly "fresh"). The state file is written
  * AFTER the MV commit: a crash between the two leaves a fresh MV with
  * stale state, which the next refresh idempotently overwrites. The MV
  * itself inherits the versioned protocol (snapshot isolation, time
  * travel over past refreshes, vacuum).
  */
object MaterializedView {

  private def statePath(root: Path) = new Path(root, "_graft_log/mv-state.json")

  /** Fingerprint of the sources' CURRENT latest versions:
    * `name=vN,name=vN,...` sorted by name (0 for a not-yet-created
    * source — a later bootstrap invalidates). */
  def fingerprint(spark: SparkSession, sources: Seq[(String, String)]): String =
    sources.sortBy(_._1).map { case (n, loc) =>
      s"$n=v${VersionedTable.versions(spark, loc).lastOption.getOrElse(0L)}"
    }.mkString(",")

  /** The recorded (fingerprint, mvVersion) of the last completed
    * refresh, if any. */
  def currentState(spark: SparkSession, location: String): Option[(String, Long)] = {
    val root = new Path(location)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = statePath(root)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val text = try {
        val out = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, out, 8192, false)
        out.toString("UTF-8")
      } finally in.close()
      for {
        fp <- """"fingerprint":"((?:[^"\\]|\\.)*)"""".r.findFirstMatchIn(text)
          .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
        v <- """"mv_version":(\d+)""".r.findFirstMatchIn(text).map(_.group(1).toLong)
      } yield (fp, v)
    }
  }

  /** Refresh the MV iff some source moved since the recorded state.
    * `compute` is by-name: a fresh MV never builds the plan, let alone
    * runs it. Returns (mvVersion, recomputed). */
  def refresh(spark: SparkSession, location: String,
              sources: Seq[(String, String)], compute: => DataFrame,
              format: String = "parquet",
              options: Map[String, String] = Map.empty,
              statsColumns: Seq[String] = Nil): (Long, Boolean) = {
    require(sources.nonEmpty, "materialized view: needs at least one source")
    val fp = fingerprint(spark, sources)
    val existing = currentState(spark, location)
    val mvVersions = VersionedTable.versions(spark, location)
    existing match {
      case Some((oldFp, v)) if oldFp == fp && mvVersions.contains(v) =>
        graft.log.Log.info("materialized view fresh",
          "location" -> location, "fingerprint" -> fp, "version" -> s"v$v")
        (v, false)
      case _ =>
        val v = VersionedTable.commit(spark, location, compute, "overwrite",
          format, options, statsColumns = statsColumns)
        recordState(spark, location, fp, v)
        graft.log.Log.info("materialized view refreshed",
          "location" -> location, "fingerprint" -> fp, "version" -> s"v$v")
        (v, true)
    }
  }

  /** Record a completed refresh (also used by the engine path, whose
    * commit goes through the ordinary sink machinery). Overwrites any
    * previous state — the record is a cache key, not history. */
  def recordState(spark: SparkSession, location: String,
                  fp: String, version: Long): Unit = {
    val root = new Path(location)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val json = s"""{"fingerprint":${jstr(fp)},"mv_version":$version,""" +
      s""""ts":${System.currentTimeMillis()}}"""
    val os = fs.create(statePath(root), true)
    try os.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally os.close()
  }

  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
