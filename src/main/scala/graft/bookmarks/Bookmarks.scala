package graft.bookmarks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit

/** Incremental-source bookmark — reference A22: Glue job bookmarks track
  * processed input per `transformation_ctx` so re-runs skip old files
  * (`glue/glue_etl_framework.py:101,115,186,227,438`). Glue keeps that
  * state in its service; the OSS analog here is a high-watermark store:
  * a JSON file of `source -> max processed file mtime`.
  *
  * Design (SURVEY §7 risk 3 — deterministic and testable):
  *   - `plan()` lists the location ONCE and pins the exact file set with
  *     mtime > watermark, plus the new watermark (max mtime of the files
  *     actually included). Reading explicit paths rather than Spark's
  *     `modifiedAfter` option avoids two correctness holes: the option's
  *     second-granularity timestamp parse, and a commit that re-lists the
  *     directory and could advance the watermark past files that were
  *     never read (landed mid-run) — silently dropping them forever.
  *   - `commit()` persists only the planned watermark, and only after the
  *     job's sink write succeeds (Engine calls it like the reference's
  *     trailing `job.commit()`, `:438`) — a failed run reprocesses.
  *
  * Scale: the driver-side listing is the same FileSystem listing Spark's
  * own FileIndex performs on every read; no extra cost class.
  */
class BookmarkStore(spark: SparkSession, statePath: String) {
  private val hadoopConf = spark.sparkContext.hadoopConfiguration

  private def fs(p: org.apache.hadoop.fs.Path) = p.getFileSystem(hadoopConf)

  /** Exact incremental read plan: the new files and the watermark to
    * commit once they are durably processed. */
  final case class IncrementalPlan(source: String, files: Seq[String],
                                   newWatermark: Long, location: String)

  /** source name -> high watermark (epoch millis) */
  def load(): Map[String, Long] = {
    val p = new org.apache.hadoop.fs.Path(statePath)
    val f = fs(p)
    if (!f.exists(p)) Map.empty
    else {
      val in = f.open(p)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      parse(text)
    }
  }

  def save(marks: Map[String, Long]): Unit = {
    val p = new org.apache.hadoop.fs.Path(statePath)
    val f = fs(p)
    val out = f.create(p, true)
    try out.write(render(marks).getBytes("UTF-8")) finally out.close()
  }

  /** List `location` recursively; keep visible data files newer than the
    * stored watermark for `source`. */
  def plan(source: String, location: String): IncrementalPlan = {
    val watermark = load().getOrElse(source, Long.MinValue)
    val root = new org.apache.hadoop.fs.Path(location)
    val f = fs(root)
    val picked = Seq.newBuilder[String]
    var maxT = watermark
    val it = f.listFiles(root, true)
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      val hidden = name.startsWith("_") || name.startsWith(".")
      if (!hidden && st.getModificationTime > watermark) {
        picked += st.getPath.toString
        if (st.getModificationTime > maxT) maxT = st.getModificationTime
      }
    }
    IncrementalPlan(source, picked.result(), maxT, location)
  }

  /** Read the planned files. An empty plan returns an empty frame with
    * the location's schema (schema-only read, no data scan). */
  def read(plan: IncrementalPlan, format: String,
           options: Map[String, String] = Map.empty): DataFrame = {
    val reader = spark.read.format(format).options(options)
    if (plan.files.nonEmpty) reader.load(plan.files: _*)
    else reader.load(plan.location).filter(lit(false))
  }

  /** Persist the plan's watermark — call only after the downstream write
    * succeeded. */
  def commit(plan: IncrementalPlan): Unit =
    if (plan.newWatermark > Long.MinValue)
      save(load() + (plan.source -> plan.newWatermark))

  // minimal flat {"name": millis} codec — no JSON library needed
  private def render(m: Map[String, Long]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) => s""""${k.replace("\"", "\\\"")}": $v""" }
      .mkString("{", ", ", "}")
  private def parse(text: String): Map[String, Long] = {
    val Entry = raw""""((?:[^"\\]|\\.)*)"\s*:\s*(-?\d+)""".r
    Entry.findAllMatchIn(text).map(m => m.group(1).replace("\\\"", "\"") -> m.group(2).toLong).toMap
  }
}
