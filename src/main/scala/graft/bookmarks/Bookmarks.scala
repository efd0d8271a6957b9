package graft.bookmarks

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incremental-source bookmark — reference A22: Glue job bookmarks track
  * processed input per `transformation_ctx` so re-runs skip old files
  * (`glue/glue_etl_framework.py:101,115,186,227,438`). Glue keeps that
  * state in its service; the OSS analog here is a high-watermark store:
  * a JSON file of `source -> max processed file mtime`, applied on read
  * via Spark's `modifiedAfter` option, advanced by `commit()` like
  * `job.commit()` does (`:438`).
  *
  * Deterministic + testable (SURVEY §7 risk 3): listing and clock come
  * from Hadoop FS, and commit writes the max mtime actually observed, not
  * wall-clock now — a file that lands mid-run with an older mtime is
  * picked up next run.
  */
class BookmarkStore(spark: SparkSession, statePath: String) {
  private val hadoopConf = spark.sparkContext.hadoopConfiguration

  private def fs(p: org.apache.hadoop.fs.Path) = p.getFileSystem(hadoopConf)

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

  /** Read only files newer than the stored watermark for `source`. */
  def readIncremental(source: String, format: String, path: String,
                      options: Map[String, String] = Map.empty): DataFrame = {
    val marks = load()
    val reader = spark.read.format(format).options(options)
    marks.get(source) match {
      case Some(ts) =>
        val iso = java.time.Instant.ofEpochMilli(ts).toString
        reader.option("modifiedAfter", iso).load(path)
      case None => reader.load(path)
    }
  }

  /** Advance the watermark for `source` to the max mtime under `path`. */
  def commit(source: String, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val f = fs(p)
    val it = f.listFiles(p, true)
    var maxT = load().getOrElse(source, 0L)
    while (it.hasNext) { val s = it.next(); if (s.getModificationTime > maxT) maxT = s.getModificationTime }
    save(load() + (source -> maxT))
  }

  // minimal flat {"name": millis} codec — no JSON library needed
  private def render(m: Map[String, Long]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) => s""""${k.replace("\"", "\\\"")}": $v""" }
      .mkString("{", ", ", "}")
  private def parse(text: String): Map[String, Long] = {
    val Entry = raw""""((?:[^"\\]|\\.)*)"\s*:\s*(\d+)""".r
    Entry.findAllMatchIn(text).map(m => m.group(1).replace("\\\"", "\"") -> m.group(2).toLong).toMap
  }
}
