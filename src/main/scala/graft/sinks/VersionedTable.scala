package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.hadoop.fs.{FileSystem, Path}

/** Versioned-manifest table — the minimal TABLE FORMAT the A15/A16
  * contracts were missing (SURVEY "what's missing" #2): multi-writer
  * atomic commits, snapshot-isolated reads, and time travel, built on
  * nothing but the filesystem primitives every object store / HDFS
  * provides. A tiny Delta-shaped log, not a Delta dependency (none is
  * available offline — and the protocol is ~200 lines).
  *
  * Layout:
  * {{{
  *   <table>/data/<commit-uuid>-part-*.parquet   (append-only namespace)
  *   <table>/_graft_log/v00001.json              (one manifest per version)
  * }}}
  *
  * Protocol:
  *  - WRITE: stage the frame to a scratch dir, move the part files into
  *    `data/` under a commit-unique prefix (invisible: readers only see
  *    files a manifest references), then publish manifest `v{N+1}` with
  *    `fs.create(path, overwrite = false)` — the CREATE-IF-ABSENT is the
  *    commit point and the CAS: two writers racing to the same version
  *    number have exactly one winner; the loser re-reads the new latest
  *    and REBASES (append: new base file list; overwrite: nothing to
  *    rebase) up to `maxRetries` times. Optimistic concurrency, the
  *    Delta/Iceberg commit shape.
  *  - READ: resolve the latest (or `asOf`) manifest and load EXACTLY its
  *    file list. A reader planned at version N never sees version N+1's
  *    files — snapshot isolation by construction. Data files never
  *    referenced (a writer that died before its manifest) are invisible
  *    forever and reclaimed by [[vacuumVersions]].
  *  - A failed commit leaves only unreferenced data files — the table is
  *    never partially visible (the A15 contract, now PER COMMIT rather
  *    than per staged-swap window, and concurrency-safe).
  *
  * At 100 TB: commits move metadata, not data (the manifest lists files;
  * an append rewrites nothing); readers plan from one small JSON instead
  * of a directory listing of millions of files; upsert composes as
  * read-latest → merge → overwrite-commit with snapshot isolation.
  * Atomicity of create-if-absent holds on HDFS and local filesystems;
  * on S3 proper it needs a coordination layer (documented deviation —
  * the same one Delta-on-S3 has).
  */
object VersionedTable {

  private def fsFor(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def logDir(root: Path) = new Path(root, "_graft_log")
  private def dataDir(root: Path) = new Path(root, "data")
  private def manifestPath(root: Path, v: Long) =
    new Path(logDir(root), f"v$v%05d.json")

  /** Committed versions, ascending (empty for a fresh location). */
  def versions(spark: SparkSession, location: String): Seq[Long] = {
    val root = new Path(location)
    val fs = fsFor(spark, root)
    if (!fs.exists(logDir(root))) Seq.empty
    else fs.listStatus(logDir(root)).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
        n.stripPrefix("v").stripSuffix(".json").toLong }
      .sorted
  }

  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def writeManifestCas(fs: FileSystem, root: Path, v: Long,
                               mode: String, files: Seq[(String, Long)],
                               txn: Option[(String, Long)]): Boolean = {
    val fileJson = files.sortBy(_._1)
      .map { case (n, b) => s"""{"name":${jstr(n)},"bytes":$b}""" }
      .mkString("[", ",", "]")
    val txnJson = txn.map { case (app, batch) =>
      s""""txn_app":${jstr(app)},"txn_batch":$batch,""" }.getOrElse("")
    val json = s"""{"version":$v,"mode":${jstr(mode)},$txnJson""" +
      s""""n_files":${files.size},"files":$fileJson}"""
    val p = manifestPath(root, v)
    try {
      // overwrite = false IS the commit CAS: exactly one creator wins
      val os = fs.create(p, false)
      try os.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally os.close()
      true
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      case e: java.io.IOException if e.getMessage != null &&
        e.getMessage.contains("already exists") => false
    }
  }

  private def manifestText(fs: FileSystem, root: Path, v: Long): String = {
    val in = fs.open(manifestPath(root, v))
    try {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 8192, false)
      out.toString("UTF-8")
    } finally in.close()
  }

  private def readManifest(fs: FileSystem, root: Path, v: Long): Seq[String] = {
    // the manifest is machine-written flat JSON; extract the file names
    """"name":"((?:[^"\\]|\\.)*)"""".r.findAllMatchIn(manifestText(fs, root, v))
      .map(m => m.group(1).replace("\\\"", "\"").replace("\\\\", "\\")).toSeq
  }

  /** The highest batch id `app` has committed (and its version), scanning
    * newest-first. The streaming exactly-once check: a foreachBatch
    * REPLAY (crash between sink commit and checkpoint commit) re-offers
    * a batch id the table already holds — the commit must be skipped,
    * not appended twice. */
  private def lastTxn(fs: FileSystem, root: Path, vs: Seq[Long],
                      app: String): Option[(Long, Long)] = {
    val appJson = jstr(app)
    vs.sorted.reverse.iterator.map { v =>
      val text = manifestText(fs, root, v)
      if (text.contains(s""""txn_app":$appJson"""))
        """"txn_batch":(\d+)""".r.findFirstMatchIn(text)
          .map(m => (m.group(1).toLong, v))
      else None
    }.collectFirst { case Some(hit) => hit }
  }

  /** Atomically commit `df` as the next version. `mode` = "overwrite"
    * (the new version IS this frame) or "append" (new version = latest
    * version's files + this frame's). Returns the committed version.
    * `expectedLatest` turns the commit SERIALIZABLE: when set, the
    * commit succeeds only if the table's latest version still equals it
    * — a concurrent commit since the caller's snapshot aborts loudly
    * (the read-merge-write upsert shape needs this: a silent rebase
    * would overwrite the concurrent writer's rows with a stale merge). */
  def commit(spark: SparkSession, location: String, df: DataFrame,
             mode: String, format: String = "parquet",
             options: Map[String, String] = Map.empty,
             maxRetries: Int = 10,
             expectedLatest: Option[Long] = None,
             txn: Option[(String, Long)] = None): Long = {
    require(mode == "overwrite" || mode == "append",
      s"versioned commit: mode must be overwrite|append, got '$mode'")
    val root = new Path(location)
    val fs = fsFor(spark, root)
    fs.mkdirs(dataDir(root))
    fs.mkdirs(logDir(root))
    // exactly-once for streaming foreachBatch: if this (app, batch) — or
    // a later batch of the same app — is already committed, the offer is
    // a WAL replay: skip BEFORE any data is written, return the version
    // that already holds it
    txn.foreach { case (app, batch) =>
      lastTxn(fs, root, versions(spark, location), app).foreach {
        case (lastBatch, atV) =>
          if (lastBatch >= batch) {
            graft.log.Log.info("versioned commit: txn replay skipped",
              "location" -> location, "app" -> app,
              "batch" -> batch.toString, "committed_at" -> s"v$atV")
            return atV
          }
      }
    }
    // stage, then move parts into the append-only data namespace under a
    // commit-unique prefix (invisible until a manifest references them)
    val commitId = java.util.UUID.randomUUID().toString.take(8)
    val stage = new Path(root, s".stage-$commitId")
    df.write.format(format).options(graft.sources.Sources.mapOptions(options))
      .mode(SaveMode.Overwrite).save(stage.toString)
    val moved = fs.globStatus(new Path(stage, "part-*")).toSeq.map { st =>
      val name = s"$commitId-${st.getPath.getName}"
      val dst = new Path(dataDir(root), name)
      if (!fs.rename(st.getPath, dst))
        throw new java.io.IOException(s"versioned commit: move ${st.getPath} -> $dst failed")
      (name, st.getLen)
    }
    fs.delete(stage, true)
    var attempt = 0
    while (attempt < maxRetries) {
      val latest = versions(spark, location).lastOption
      expectedLatest.foreach { exp =>
        if (latest.getOrElse(0L) != exp) throw new java.util.ConcurrentModificationException(
          s"versioned commit: serializable conflict at '$location' — snapshot " +
            s"was v$exp, latest is v${latest.getOrElse(0L)}; re-read and re-merge")
      }
      val base: Seq[(String, Long)] =
        if (mode == "append")
          latest.toSeq.flatMap(v => readManifest(fs, root, v)).map { n =>
            (n, fs.getFileStatus(new Path(dataDir(root), n)).getLen)
          }
        else Seq.empty
      val v = latest.getOrElse(0L) + 1
      if (writeManifestCas(fs, root, v, mode, base ++ moved, txn)) return v
      attempt += 1 // lost the race: re-read latest and rebase
    }
    throw new java.io.IOException(
      s"versioned commit: lost the version race $maxRetries times at '$location'")
  }

  /** Snapshot read: exactly the file list of `asOf` (default: latest).
    * The returned frame is pinned to that version — later commits never
    * change what it reads. */
  def read(spark: SparkSession, location: String,
           asOf: Option[Long] = None, format: String = "parquet",
           options: Map[String, String] = Map.empty): DataFrame = {
    val root = new Path(location)
    val fs = fsFor(spark, root)
    val vs = versions(spark, location)
    if (vs.isEmpty) throw new graft.config.ConfigError(
      s"versioned read: no committed versions at '$location'")
    val v = asOf.getOrElse(vs.last)
    if (!vs.contains(v)) throw new graft.config.ConfigError(
      s"versioned read: version $v not in committed set ${vs.mkString("[", ",", "]")}")
    val files = readManifest(fs, root, v)
      .map(n => new Path(dataDir(root), n).toString)
    if (files.isEmpty)
      throw new graft.config.ConfigError(
        s"versioned read: version $v of '$location' references no files")
    spark.read.format(format)
      .options(graft.sources.Sources.mapOptions(options))
      .load(files: _*)
  }

  /** Reclaim space: delete manifests BELOW `keepFromVersion` and every
    * data file no kept manifest references (including dead writers'
    * never-referenced orphans). Namespace-only, cost ∝ file count. */
  def vacuumVersions(spark: SparkSession, location: String,
                     keepFromVersion: Long): Seq[String] = {
    val root = new Path(location)
    val fs = fsFor(spark, root)
    val vs = versions(spark, location)
    if (vs.isEmpty) throw new graft.config.ConfigError(
      s"versioned vacuum: no committed versions at '$location'")
    val kept = vs.filter(_ >= keepFromVersion)
    if (kept.isEmpty) throw new graft.config.ConfigError(
      s"versioned vacuum: keep_from $keepFromVersion would drop EVERY version " +
        s"(latest is ${vs.last}) — refusing to empty the table")
    val referenced = kept.flatMap(v => readManifest(fs, root, v)).toSet
    val dropped = scala.collection.mutable.ArrayBuffer.empty[String]
    fs.listStatus(dataDir(root)).foreach { st =>
      if (st.isFile && !referenced.contains(st.getPath.getName)) {
        fs.delete(st.getPath, false)
        dropped += s"data/${st.getPath.getName}"
      }
    }
    vs.filter(_ < keepFromVersion).foreach { v =>
      fs.delete(manifestPath(root, v), false)
      dropped += f"_graft_log/v$v%05d.json"
    }
    dropped.toSeq
  }
}
