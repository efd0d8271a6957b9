package graft.config

import scala.jdk.CollectionConverters._

/** Typed model of the job-spec surface described by the reference's
  * README config table (`/root/reference/README.md:29-61`) and realized in
  * `glue/glue_etl_framework.py:363-436` (YAML parse + dispatch).
  *
  * Design (SURVEY.md §7 module 1): a sealed-trait ADT instead of a raw
  * dict; `{var}` interpolation is a pure Map substitution (no globals —
  * the reference injects variables into Python `globals()`,
  * `glue_etl_framework.py:20-34`), and unknown variables are a hard error
  * (the reference silently swallows them, SURVEY Appendix Q6).
  */
sealed trait SourceSpec
object SourceSpec {
  /** File scan: reference A1 (`glue_etl_framework.py:81-102`). `schema` is
    * our declared deviation (SURVEY §1): an optional DDL string
    * (`"a INT, b STRING"`) applied to the reader — headerless csv/json
    * gets real column names AND skips the schema-inference pre-scan, which
    * at 100 TB is a full extra read of the input. */
  final case class File(location: String, format: String,
                        options: Map[String, String],
                        schema: Option[String] = None) extends SourceSpec
  /** Catalog scan: reference A2 (`glue_etl_framework.py:105-116`).
    * `table` defaults to the view name (Appendix Q8 adds the override). */
  final case class Catalog(database: String, table: String) extends SourceSpec
  /** JDBC scan: reference A3 is a stub (`glue_etl_framework.py:119-120`);
    * we implement it for real. */
  final case class Jdbc(url: String, database: String, table: String,
                        options: Map[String, String]) extends SourceSpec
  /** One parsed `prune:` clause on a versioned input: column, op
    * (= < <= > >=), and the literal — a long or a (single-quoted)
    * string, matching the zone-map token kinds. */
  final case class PruneClause(column: String, op: String,
                               longValue: Option[Long], stringValue: Option[String]) {
    def value: Any = longValue.getOrElse(stringValue.get)
  }

  /** Versioned-manifest table scan (`versioned: true` on the input,
    * beyond-reference; [[graft.sinks.VersionedTable]]): snapshot read of
    * the latest — or `as_of_version: N` — committed version. `prune:`
    * clauses (AND-joined comparisons) plan the scan from the manifest
    * zone maps — files that cannot match are never opened — and are
    * re-applied as an ordinary filter on the kept files, so the
    * registered view is EXACTLY the predicate's rows. */
  final case class Versioned(location: String, format: String,
                             options: Map[String, String],
                             asOfVersion: Option[Long] = None,
                             prune: Seq[PruneClause] = Nil,
                             /** epoch millis: resolved to the latest
                               * version committed at or before it
                               * ([[graft.sinks.VersionedTable.versionAt]]). */
                             asOfTimestampMillis: Option[Long] = None,
                             /** read a BRANCH head instead of main
                               * (the WAP audit read). */
                             branch: Option[String] = None) extends SourceSpec
}

/** `incrementalSource`: reference A22 (Glue job bookmarks) — when true,
  * file reads skip data already processed per the job's bookmark store.
  * `quarantine`: beyond-reference — a path collecting MALFORMED ROWS of a
  * csv/json file source (raw line + source file + error) instead of
  * failing the job or silently dropping them; the registered view holds
  * only the rows that parsed. Requires an explicit `schema:`. */
final case class InputTable(name: String, source: SourceSpec,
                            incrementalSource: Boolean = false,
                            quarantine: Option[String] = None)

sealed trait Refresh
object Refresh {
  /** Purge-then-write, the default (`glue_etl_framework.py:212-219`). */
  case object Full extends Refresh
  /** Append without purge (`glue_etl_framework.py:217,240`). */
  case object Incremental extends Refresh
  /** Row-level merge on `merge_keys` — the README's claimed UPSERT
    * (`README.md:68`, A16) which the reference never actually implements
    * (its code only purges or appends). Requires `merge_keys` on the
    * output table. */
  case object Upsert extends Refresh
  /** Slowly-changing-dimension type 2: the incoming frame is a FULL
    * snapshot; instead of replacing rows, every version is kept with
    * validity metadata (`_valid_from_batch`, `_valid_to_batch`,
    * `_is_current`). Batch numbers are a deterministic sequence (prior
    * max + 1), not wall-clock timestamps, so reruns are replayable and
    * the history is oracle-checkable. Requires `merge_keys`; beyond
    * the reference's claimed UPSERT (A16) — the audit-trail variant a
    * data lake actually wants. */
  case object Scd2 extends Refresh
  def parse(s: String): Refresh = s.trim.toLowerCase match {
    case "" | "full"    => Full
    case "incremental"  => Incremental
    case "upsert"       => Upsert
    case "scd2"         => Scd2
    case other => throw new ConfigError(s"unknown refresh mode '$other'")
  }
}

sealed trait TargetSpec
object TargetSpec {
  final case class File(location: String) extends TargetSpec
  final case class Catalog(database: String, governed: Boolean) extends TargetSpec
  /** JDBC sink — beyond the reference (its code errors on any target
    * other than s3/gdc, `glue_etl_framework.py:272-275`, despite the
    * README implying one); completes the source/sink matrix. */
  final case class Jdbc(url: String, table: String) extends TargetSpec
}

/** `dq_checks:` block — declarative data-quality gates evaluated on the
  * RESULT before it is published (beyond-reference; the Glue Data
  * Quality / Deequ capability the reference lacks). A violated check
  * fails the job with a named error and the sink is never written — the
  * publish-guard extension of the A15 no-partial-output contract. */
final case class DqChecks(minRows: Option[Long] = None,
                          notNull: Seq[String] = Nil,
                          unique: Seq[String] = Nil)

/** Output table: reference A8-A16 (`glue_etl_framework.py:190-275`). */
final case class OutputTable(
    name: String,
    target: TargetSpec,
    format: String = "parquet",
    options: Map[String, String] = Map.empty,
    refresh: Refresh = Refresh.Full,
    partitionKeys: Seq[String] = Nil,
    repartition: Option[Int] = None,
    coalesce: Option[Int] = None,
    mergeKeys: Seq[String] = Nil,
    /** `observe_cols: c1,c2` attaches Spark Observation metrics to the
      * sink action — row count plus per-column non-null counts measured
      * DURING the write (no second scan: at 100 TB a metrics rescan is
      * a second job), published as `_graft_metrics.json` beside the
      * table (file targets). */
    observeCols: Seq[String] = Nil,
    bucketKeys: Seq[String] = Nil,
    buckets: Option[Int] = None,
    sortKeys: Seq[String] = Nil,
    dqChecks: Option[DqChecks] = None,
    /** `manifest: true` writes `_graft_manifest.json` into the published
      * table — row count, file list, byte sizes — so downstream
      * consumers verify a 100 TB handoff against metadata instead of a
      * rescan (beyond-reference; the underscore prefix keeps every
      * Spark/Hive reader from seeing it as data). */
    manifest: Boolean = false,
    /** `versioned: true` publishes through the versioned-manifest table
      * protocol ([[graft.sinks.VersionedTable]]): atomic multi-writer
      * commits (create-if-absent CAS), snapshot reads, time travel.
      * refresh full = overwrite commit, incremental = append commit,
      * upsert = snapshot merge + serializable commit (aborts loudly if
      * a concurrent commit landed since the snapshot). File targets
      * only. */
    versioned: Boolean = false,
    /** `materialized: true` (versioned file sinks only): the output is a
      * MATERIALIZED VIEW over the job's `versioned: true` inputs — the
      * engine fingerprints the inputs' latest versions BEFORE running
      * the SQL and skips the whole pipeline when nothing moved since
      * the recorded state ([[graft.sinks.MaterializedView]]). */
    materialized: Boolean = false,
    /** `branch: name` (versioned sinks only): commits land on the named
      * BRANCH instead of main — the WAP staging write. Create the
      * branch first (`maintenance.action: create_branch`); publish with
      * `publish_branch`. */
    branch: Option[String] = None,
    /** `mask:` — column masking applied to the PUBLISHED frame (the
      * release transform): `hash` (stable salted-sha2 token, the ext145
      * pseudonymization rule), `null` (typed null), `last4` (string
      * columns: all but the last 4 chars starred). Applied before
      * dq_checks and the sink, on the batch AND streaming paths. */
    mask: Map[String, String] = Map.empty,
    /** `stats_columns: c1,c2` (versioned sinks only) records per-FILE
      * min/max/null-count zone maps for the named columns in the commit
      * manifest; [[graft.sinks.VersionedTable.readPruned]] then skips
      * whole files from metadata — the first pruning tier before any
      * parquet footer is opened. Costs one scan of the commit's NEW
      * files. Pair with `range_partition_keys` so file ranges are
      * disjoint and the maps are sharp. */
    statsColumns: Seq[String] = Nil,
    /** `range_partition_keys: c1,c2` range-partitions rows across output
      * files (`repartitionByRange`, honoring `repartition: N` as the
      * file count): each file holds a disjoint key range, which is what
      * makes zone maps / parquet row-group stats prune instead of
      * matching every file. */
    rangeKeys: Seq[String] = Nil)

sealed trait JobType
object JobType {
  case object SparkSql extends JobType
  /** Script job: reference A17 (`glue_etl_framework.py:279-309`), realized
    * as a reflection-loaded class instead of `exec()`. */
  case object Script extends JobType
  /** Maintenance job (beyond-reference): operational passes over an
    * existing target — currently `compact` (small-file compaction,
    * [[graft.sinks.Sinks.compact]]). */
  case object Maintenance extends JobType
}

/** `maintenance:` block for `job.type: maintenance`. `files` is the
  * compact target; `output` is where profile writes its stats table;
  * `partitionCol`/`keepFrom` drive retain (drop partitions whose value
  * sorts below the threshold). */
final case class MaintenanceSpec(action: String, location: String,
                                 format: String, files: Option[Int] = None,
                                 output: Option[String] = None,
                                 partitionCol: Option[String] = None,
                                 keepFrom: Option[String] = None,
                                 clusterBy: Seq[String] = Nil,
                                 /** cluster action's space-filling curve:
                                   * `zorder` (default) or `hilbert`. */
                                 curve: String = "zorder",
                                 where: Option[String] = None,
                                 set: Map[String, String] = Map.empty,
                                 branch: Option[String] = None,
                                 keepLast: Option[Long] = None,
                                 minDeletedFraction: Option[Double] = None,
                                 options: Map[String, String] = Map.empty,
                                 /** `to_version` — the restore target
                                   * (string: `{var}` interpolates at run
                                   * time; numeric validated at parse). */
                                 toVersion: Option[String] = None)

final case class JobSpec(
    name: String,
    jobType: JobType,
    sparkConfig: Map[String, String],
    variables: Map[String, Map[String, String]], // pipeline -> vars
    inputTables: Seq[InputTable],
    outputTable: Option[OutputTable],
    sql: Option[String],
    sqlFile: Option[String],
    scriptClass: Option[String],
    scriptJar: Option[String] = None,
    bookmarkPath: Option[String] = None,
    /** `job.streaming: available_now` runs the same declared pipeline as
      * one bounded Structured Streaming drain (new files since the last
      * checkpoint → SQL → sink), our streaming extension of the
      * reference's batch-only surface. */
    streaming: Boolean = false,
    checkpointLocation: Option[String] = None,
    maintenance: Option[MaintenanceSpec] = None) {

  /** Variables for one pipeline; error on unknown pipeline (the reference
    * indexes the dict directly, `glue_etl_framework.py:413-415`). */
  def varsFor(pipeline: String): Map[String, String] =
    variables.getOrElse(pipeline,
      if (variables.isEmpty) Map.empty
      else throw new ConfigError(s"pipeline '$pipeline' not in variables ${variables.keySet}"))
}

final class ConfigError(msg: String) extends RuntimeException(msg)

/** `{var}` interpolation over config values and SQL text — reference A6/A20
  * (`glue_etl_framework.py:36-48,171-178`). Unlike the reference we do NOT
  * collapse whitespace or swap quotes (Appendix Q1/Q2 — those corrupt `--`
  * comments and quoted literals), and unknown `{name}` is a named error
  * rather than a silent no-op (Q6). `{{`/`}}` escape a literal brace, so
  * SQL containing `format_string('{}')`-style text can be written. */
object Interpolate {
  private val Var = raw"\{([A-Za-z_][A-Za-z0-9_]*)\}".r
  def apply(text: String, vars: Map[String, String]): String = {
    val protectedText = text.replace("{{", "\u0001").replace("}}", "\u0002")
    val out = Var.replaceAllIn(protectedText, m =>
      vars.get(m.group(1)) match {
        case Some(v) => scala.util.matching.Regex.quoteReplacement(v)
        case None => throw new ConfigError(
          s"unknown variable '{${m.group(1)}}' (have: ${vars.keySet.toSeq.sorted.mkString(", ")})")
      })
    out.replace("\u0001", "{").replace("\u0002", "}")
  }
}

/** YAML → JobSpec. Names, sources and targets are lowercased to match the
  * reference's case folding (`glue_etl_framework.py:66-67,190-195`,
  * Appendix Q9); variable VALUES are left untouched. */
object ConfigParser {
  private def asMap(v: Any, ctx: String): Map[String, Any] = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, vv) => k.toString -> vv }.toMap
    case null  => Map.empty
    case other => throw new ConfigError(s"$ctx: expected mapping, got ${other.getClass.getSimpleName}")
  }
  private def asList(v: Any, ctx: String): Seq[Any] = v match {
    case l: java.util.List[_] => l.asScala.toSeq
    case null => Nil
    case other => throw new ConfigError(s"$ctx: expected list, got ${other.getClass.getSimpleName}")
  }
  private val PruneClauseRe =
    """^([A-Za-z_][A-Za-z0-9_]*)\s*(<=|>=|=|<|>)\s*(.+)$""".r

  /** Split on the word AND only OUTSIDE single-quoted literals — a
    * value like 'SMITH AND SONS' must stay one clause. */
  private def splitPruneClauses(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inQuote = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'') { inQuote = !inQuote; cur.append(c); i += 1 }
      else if (!inQuote && (i + 3 <= s.length) &&
        s.regionMatches(true, i, "AND", 0, 3) &&
        (i == 0 || !Character.isLetterOrDigit(s.charAt(i - 1))) &&
        (i + 3 == s.length || !Character.isLetterOrDigit(s.charAt(i + 3)))) {
        out += cur.toString; cur.clear(); i += 3
      } else { cur.append(c); i += 1 }
    }
    out += cur.toString
    out.toSeq
  }

  /** `prune: "c_custkey <= 20 AND c_mktsegment = 'BUILDING'"` — a small
    * AND-joined comparison list (the zone-map-skippable shapes), parsed
    * AT CONFIG TIME so a typo fails before the job runs. Literals:
    * longs, or single-quoted strings. */
  private def parsePrune(name: String, s: String): Seq[SourceSpec.PruneClause] =
    splitPruneClauses(s).map(_.trim).filter(_.nonEmpty).map {
      case PruneClauseRe(colName, op, rawLit) =>
        val l = rawLit.trim
        if (l.length >= 2 && l.startsWith("'") && l.endsWith("'"))
          SourceSpec.PruneClause(colName, op, None, Some(l.substring(1, l.length - 1)))
        else try SourceSpec.PruneClause(colName, op, Some(l.toLong), None)
        catch { case _: NumberFormatException => throw new ConfigError(
          s"input '$name': prune literal '$l' must be an integer or a " +
            "single-quoted string") }
      case clause => throw new ConfigError(
        s"input '$name': prune clause '$clause' must be <column> <op> <literal> " +
          "with op one of = < <= > >= (clauses joined by AND)")
    }

  private def str(m: Map[String, Any], k: String): Option[String] =
    m.get(k).filter(_ != null).map(_.toString)
  private def strMap(v: Any, ctx: String): Map[String, String] =
    asMap(v, ctx).map { case (k, vv) => k -> String.valueOf(vv) }

  def parse(yamlText: String): JobSpec = {
    val root = asMap(new org.yaml.snakeyaml.Yaml().load[Any](yamlText), "config root")

    val job = asMap(root.getOrElse("job", null), "job")
    val jobType = str(job, "type").map(_.toLowerCase) match {
      case Some("spark-sql") => JobType.SparkSql
      // reference: `python-script` (README.md:35); ours runs a JVM class.
      case Some("python-script") | Some("script") => JobType.Script
      case Some("maintenance") => JobType.Maintenance
      case Some(other) => throw new ConfigError(s"unknown job.type '$other'")
      case None => throw new ConfigError("job.type is required")
    }
    // job.spark_config / spark-config: YAML list of single-entry maps
    // (README.md:36) or a plain map — accept both.
    val sparkConf = job.get("spark_config").orElse(job.get("spark-config")) match {
      case Some(l: java.util.List[_]) =>
        asList(l, "spark_config").flatMap(e => strMap(e, "spark_config entry")).toMap
      case Some(m: java.util.Map[_, _]) => strMap(m, "spark_config")
      case _ => Map.empty[String, String]
    }

    val variables = asMap(root.getOrElse("variables", null), "variables")
      .map { case (p, v) => p -> strMap(v, s"variables.$p") }

    val inputs = asList(root.getOrElse("input_tables", null), "input_tables").map { e =>
      val t = asMap(e, "input_tables entry")
      val name = str(t, "name").getOrElse(throw new ConfigError("input table: name required"))
        .toLowerCase
      val fmtOpts = t.get("format_options").map(strMap(_, "format_options")).getOrElse(Map.empty)
      val versionedIn = str(t, "versioned")
        .exists(v => Set("yes", "true").contains(v.toLowerCase))
      val asOf = str(t, "as_of_version").map { v =>
        try v.trim.toLong catch { case _: NumberFormatException =>
          throw new ConfigError(s"input '$name': as_of_version must be an integer, got '$v'") }
      }
      if (asOf.nonEmpty && !versionedIn) throw new ConfigError(
        s"input '$name': as_of_version requires versioned: true")
      val asOfTs = str(t, "as_of_timestamp").map { v =>
        try v.trim.toLong catch { case _: NumberFormatException =>
          throw new ConfigError(
            s"input '$name': as_of_timestamp must be epoch millis, got '$v'") }
      }
      if (asOfTs.nonEmpty && !versionedIn) throw new ConfigError(
        s"input '$name': as_of_timestamp requires versioned: true")
      if (asOfTs.nonEmpty && asOf.nonEmpty) throw new ConfigError(
        s"input '$name': as_of_version and as_of_timestamp are mutually exclusive")
      val pruneClauses = str(t, "prune").map(parsePrune(name, _)).getOrElse(Nil)
      if (pruneClauses.nonEmpty && !versionedIn) throw new ConfigError(
        s"input '$name': prune requires versioned: true " +
          "(file skipping plans from the commit manifest's zone maps)")
      val branchIn = str(t, "branch").map(_.trim).filter(_.nonEmpty)
      if (branchIn.nonEmpty && !versionedIn) throw new ConfigError(
        s"input '$name': branch requires versioned: true")
      if (branchIn.nonEmpty && (asOf.nonEmpty || asOfTs.nonEmpty || pruneClauses.nonEmpty))
        throw new ConfigError(
          s"input '$name': branch reads the branch HEAD — it cannot be " +
            "combined with as_of_version / as_of_timestamp / prune")
      val source = str(t, "source").getOrElse("s3").toLowerCase match {
        case "s3" | "file" if versionedIn =>
          if (str(t, "schema").exists(_.trim.nonEmpty)) throw new ConfigError(
            s"input '$name': versioned reads take the schema from the committed files; drop schema:")
          SourceSpec.Versioned(
            str(t, "location").getOrElse(throw new ConfigError(s"input '$name': location required for s3 source")),
            str(t, "format").getOrElse("parquet").toLowerCase, fmtOpts, asOf,
            pruneClauses, asOfTs, branchIn)
        case _ if versionedIn => throw new ConfigError(
          s"input '$name': versioned is supported for s3/file sources only")
        case "s3" | "file" => SourceSpec.File(
          str(t, "location").getOrElse(throw new ConfigError(s"input '$name': location required for s3 source")),
          str(t, "format").getOrElse("parquet").toLowerCase, fmtOpts,
          str(t, "schema").map(_.trim).filter(_.nonEmpty))
        case "gdc" | "catalog" => SourceSpec.Catalog(
          str(t, "database").getOrElse(throw new ConfigError(s"input '$name': database required for gdc source")),
          str(t, "table").getOrElse(name))
        case "jdbc" => SourceSpec.Jdbc(
          str(t, "url").getOrElse(throw new ConfigError(s"input '$name': url required for jdbc source")),
          str(t, "database").getOrElse(""), str(t, "table").getOrElse(name), fmtOpts)
        case other => throw new ConfigError(s"input '$name': unknown source '$other'")
      }
      val incremental = str(t, "incremental_source")
        .exists(v => Set("yes", "true").contains(v.toLowerCase))
      if (incremental && versionedIn) throw new ConfigError(
        s"input '$name': incremental_source with versioned is not supported " +
          "(bookmarks track file paths; versioned reads resolve a manifest — " +
          "read a pinned as_of_version instead)")
      val quarantine = str(t, "quarantine").map(_.trim).filter(_.nonEmpty)
      quarantine.foreach { _ =>
        source match {
          case SourceSpec.File(_, fmt, opts, schema) =>
            if (fmt != "csv" && fmt != "json") throw new ConfigError(
              s"input '$name': quarantine is only supported for csv/json sources (parquet/orc/avro fail at file granularity — use ignoreCorruptFiles)")
            if (schema.isEmpty) throw new ConfigError(
              s"input '$name': quarantine needs an explicit `schema:` (malformed-row capture re-parses against the declared schema)")
            if (fmt == "csv" && opts.get("withHeader").orElse(opts.get("header"))
                .exists(v => Set("yes", "true").contains(v.toLowerCase)))
              throw new ConfigError(
                s"input '$name': quarantine with csv needs headerless input (the raw-line re-parse cannot tell a header from a bad row); drop withHeader and declare `schema:`")
            if (opts.get("multiline").orElse(opts.get("multiLine"))
                .exists(v => Set("yes", "true").contains(v.toLowerCase)))
              throw new ConfigError(
                s"input '$name': quarantine needs line-delimited input (the raw re-parse is line-based); drop multiline")
          case _ => throw new ConfigError(
            s"input '$name': quarantine is only supported for file sources")
        }
        if (incremental) throw new ConfigError(
          s"input '$name': quarantine with incremental_source is not supported (the bookmark read path would bypass the malformed-row split)")
      }
      InputTable(name, source, incremental, quarantine)
    }
    // each quarantined input needs its OWN path: rejects are overwritten
    // per run for idempotent re-runs, so a shared path would let one
    // input's (possibly empty) write destroy another's captured rows
    locally {
      val qPaths = inputs.flatMap(_.quarantine)
      val dup = qPaths.groupBy(identity).collect { case (p, ps) if ps.size > 1 => p }
      if (dup.nonEmpty) throw new ConfigError(
        s"inputs share quarantine path(s) ${dup.mkString(", ")} — give each input its own")
    }

    val output = root.get("output_table").filter(_ != null).map { o =>
      val t = asMap(o, "output_table")
      val name = str(t, "name").getOrElse(throw new ConfigError("output_table.name required")).toLowerCase
      val target = str(t, "target").getOrElse("s3").toLowerCase match {
        case "s3" | "file" => TargetSpec.File(
          str(t, "location").getOrElse(throw new ConfigError("output_table.location required for s3 target")))
        case "gdc" | "catalog" => TargetSpec.Catalog(
          str(t, "database").getOrElse(throw new ConfigError("output_table.database required for gdc target")),
          governed = str(t, "governed").exists(v => Set("yes", "true").contains(v.toLowerCase)))
        case "jdbc" => TargetSpec.Jdbc(
          str(t, "url").getOrElse(throw new ConfigError("output_table.url required for jdbc target")),
          str(t, "table").getOrElse(name))
        case other => throw new ConfigError(s"unknown target '$other'")
      }
      val parsed = OutputTable(
        name = name,
        target = target,
        // reference default output format `glueparquet` → parquet (Q11)
        format = str(t, "format").getOrElse("parquet").toLowerCase match {
          case "glueparquet" => "parquet"; case f => f },
        options = t.get("format_options").map(strMap(_, "format_options")).getOrElse(Map.empty),
        refresh = Refresh.parse(str(t, "refresh").getOrElse("full")),
        partitionKeys = str(t, "partition_keys").map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil),
        repartition = str(t, "repartition").map(_.toInt).filter(_ > 0),
        coalesce = str(t, "coalesce").map(_.toInt).filter(_ > 0),
        mergeKeys = str(t, "merge_keys")
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil),
        observeCols = str(t, "observe_cols")
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil),
        bucketKeys = str(t, "bucket_by")
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil),
        buckets = str(t, "buckets").map(_.toInt).filter(_ > 0),
        sortKeys = str(t, "sort_by")
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil),
        dqChecks = t.get("dq_checks").filter(_ != null).map { dq =>
          val m = asMap(dq, "dq_checks")
          val unknown = m.keySet -- Set("min_rows", "not_null", "unique")
          if (unknown.nonEmpty) throw new ConfigError(
            s"dq_checks: unknown check(s) ${unknown.toSeq.sorted.mkString(", ")} " +
              "(supported: min_rows, not_null, unique)")
          val parsedDq = DqChecks(
            minRows = str(m, "min_rows").map(_.toLong),
            notNull = str(m, "not_null")
              .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil),
            unique = str(m, "unique")
              .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil))
          if (parsedDq.minRows.isEmpty && parsedDq.notNull.isEmpty && parsedDq.unique.isEmpty)
            throw new ConfigError("dq_checks: at least one check is required")
          if (parsedDq.minRows.exists(_ < 0)) throw new ConfigError(
            "dq_checks.min_rows must be non-negative")
          parsedDq
        },
        manifest = str(t, "manifest").map(_.toLowerCase) match {
          case None | Some("false") | Some("no") => false
          case Some("true") | Some("yes") => true
          case Some(other) => throw new ConfigError(
            s"output '$name': manifest must be true/false, got '$other'")
        },
        versioned = str(t, "versioned").map(_.toLowerCase) match {
          case None | Some("false") | Some("no") => false
          case Some("true") | Some("yes") => true
          case Some(other) => throw new ConfigError(
            s"output '$name': versioned must be true/false, got '$other'")
        },
        materialized = str(t, "materialized").map(_.toLowerCase) match {
          case None | Some("false") | Some("no") => false
          case Some("true") | Some("yes") => true
          case Some(other) => throw new ConfigError(
            s"output '$name': materialized must be true/false, got '$other'")
        },
        branch = str(t, "branch").map(_.trim).filter(_.nonEmpty),
        mask = {
          val m = t.get("mask").map(strMap(_, "mask")).getOrElse(Map.empty[String, String])
          m.foreach { case (c, rule) =>
            if (!Set("hash", "null", "last4")(rule.trim.toLowerCase))
              throw new ConfigError(
                s"output '$name': mask.$c must be hash|null|last4, got '$rule'")
          }
          m.map { case (c, r) => (c, r.trim.toLowerCase) }
        },
        statsColumns = str(t, "stats_columns")
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil),
        rangeKeys = str(t, "range_partition_keys")
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil))
      // Validate upsert AT PARSE TIME — a misconfigured job must fail
      // before its (possibly hours-long) query runs, not at sink time
      // (r3 verdict, "What's wrong" #5).
      if (parsed.refresh == Refresh.Upsert || parsed.refresh == Refresh.Scd2) {
        val m = if (parsed.refresh == Refresh.Upsert) "upsert" else "scd2"
        if (!parsed.target.isInstanceOf[TargetSpec.File]) throw new ConfigError(
          s"output '$name': refresh $m is supported for s3/file targets only " +
            "(catalog/jdbc row-level merge needs a table format)")
        if (parsed.mergeKeys.isEmpty) throw new ConfigError(
          s"output '$name': refresh $m requires merge_keys")
      }
      // versioned publish: file targets only; the protocol owns the
      // directory layout, so the features that assume a flat/Hive layout
      // are rejected by name rather than silently fighting it.
      if (parsed.versioned) {
        if (!parsed.target.isInstanceOf[TargetSpec.File]) throw new ConfigError(
          s"output '$name': versioned is supported for s3/file targets only")
        if (parsed.partitionKeys.nonEmpty) throw new ConfigError(
          s"output '$name': versioned cannot be combined with partition_keys " +
            "(manifests list files, not Hive directories; cluster or sort instead)")
        if (parsed.manifest) throw new ConfigError(
          s"output '$name': versioned tables have per-version manifests already; drop manifest:")
        if (parsed.refresh == Refresh.Scd2) throw new ConfigError(
          s"output '$name': refresh scd2 with versioned is not supported " +
            "(the version log IS the history; use refresh upsert + as_of_version reads)")
        if (parsed.branch.nonEmpty) {
          if (parsed.refresh == Refresh.Upsert) throw new ConfigError(
            s"output '$name': branch commits support refresh full/incremental only " +
              "(merge on a branch would need branch-side zone maps; publish first)")
          if (parsed.statsColumns.nonEmpty) throw new ConfigError(
            s"output '$name': stats_columns with branch is not supported " +
              "(branch commits are staging writes; zone maps are computed on publish-side maintenance)")
          if (parsed.materialized) throw new ConfigError(
            s"output '$name': materialized with branch is not supported")
        }
      }
      if (parsed.branch.nonEmpty && !parsed.versioned) throw new ConfigError(
        s"output '$name': branch requires versioned: true")
      if (parsed.materialized) {
        if (!parsed.versioned) throw new ConfigError(
          s"output '$name': materialized requires versioned: true " +
            "(the MV is a versioned table plus a source-version state record)")
        if (parsed.refresh != Refresh.Full) throw new ConfigError(
          s"output '$name': materialized requires refresh full " +
            "(each refresh IS a full recompute of the view)")
      }
      // zone maps live in the versioned manifest — nowhere else to put
      // them; range partitioning fights bucketing's layout and
      // coalesce's "don't shuffle" contract.
      if (parsed.statsColumns.nonEmpty && !parsed.versioned) throw new ConfigError(
        s"output '$name': stats_columns requires versioned: true " +
          "(zone maps are recorded in the commit manifest)")
      if (parsed.rangeKeys.nonEmpty) {
        if (parsed.bucketKeys.nonEmpty) throw new ConfigError(
          s"output '$name': range_partition_keys cannot be combined with bucket_by " +
            "(the bucket spec owns the file layout)")
        if (parsed.coalesce.nonEmpty) throw new ConfigError(
          s"output '$name': range_partition_keys cannot be combined with coalesce " +
            "(range placement is a shuffle; use repartition: N for the file count)")
      }
      // manifest is a FILE-table artifact: catalog/jdbc targets have
      // their own metadata layer (the manifest would describe a path
      // the catalog controls).
      if (parsed.manifest && !parsed.target.isInstanceOf[TargetSpec.File])
        throw new ConfigError(
          s"output '$name': manifest is supported for s3/file targets only")
      // observe metrics publish as _graft_metrics.json beside the table
      if (parsed.observeCols.nonEmpty && !parsed.target.isInstanceOf[TargetSpec.File])
        throw new ConfigError(
          s"output '$name': observe_cols is supported for s3/file targets only")
      // sort_by orders rows WITHIN each written file (parquet row-group
      // min/max pruning for range scans); under bucketing the bucket
      // spec's own sortBy governs — combining would be ambiguous.
      if (parsed.sortKeys.nonEmpty && parsed.bucketKeys.nonEmpty)
        throw new ConfigError(
          s"output '$name': sort_by cannot be combined with bucket_by " +
            "(the bucket spec carries its own sort order)")
      // Same parse-time discipline for bucketing: Spark only honors a
      // bucket spec through saveAsTable, and the dynamic-partition-
      // overwrite path (insertInto) cannot guarantee the bucket invariant.
      if (parsed.bucketKeys.nonEmpty || parsed.buckets.nonEmpty) {
        if (parsed.bucketKeys.isEmpty || parsed.buckets.isEmpty) throw new ConfigError(
          s"output '$name': bucket_by and buckets must be set together")
        if (!parsed.target.isInstanceOf[TargetSpec.Catalog]) throw new ConfigError(
          s"output '$name': bucket_by is supported for gdc (catalog) targets only")
        if (parsed.partitionKeys.nonEmpty) throw new ConfigError(
          s"output '$name': bucket_by cannot be combined with partition_keys " +
            "(the dynamic-overwrite path cannot preserve the bucket invariant)")
      }
      parsed
    }

    val streaming = str(job, "streaming").map(_.toLowerCase) match {
      case None | Some("") | Some("no") | Some("false") => false
      case Some("available_now") | Some("true") | Some("yes") => true
      case Some(other) => throw new ConfigError(
        s"job.streaming: unknown mode '$other' (use 'available_now')")
    }
    // Streaming jobs are validated AT PARSE TIME like upsert/bucketing —
    // every constraint below would otherwise surface only after the
    // query is already running.
    if (streaming) {
      // the flag only means anything on the spark-sql path — accepting
      // it on script/maintenance jobs would silently run them as plain
      // batch while the user believes checkpointed streaming semantics
      // apply
      if (jobType != JobType.SparkSql) throw new ConfigError(
        "job.streaming applies to job.type spark-sql only")
      if (output.isEmpty) throw new ConfigError(
        "streaming jobs need an output_table (the drain writes through the sink)")
      if (str(job, "checkpoint_location").isEmpty) throw new ConfigError(
        "streaming jobs need job.checkpoint_location (exactly-once progress tracking)")
      inputs.foreach { t =>
        t.source match {
          case SourceSpec.File(_, _, _, schema) =>
            if (schema.isEmpty) throw new ConfigError(
              s"input '${t.name}': streaming file sources need an explicit `schema:` " +
                "(no inference pre-scan on an unbounded source)")
          case _ => throw new ConfigError(
            s"input '${t.name}': streaming supports file sources only")
        }
        if (t.incrementalSource) throw new ConfigError(
          s"input '${t.name}': incremental_source is redundant under streaming " +
            "(the checkpoint already tracks processed files)")
      }
      output.foreach { o =>
        if (!o.target.isInstanceOf[TargetSpec.File]) throw new ConfigError(
          s"output '${o.name}': streaming writes to s3/file targets only")
        if (o.refresh != Refresh.Incremental) throw new ConfigError(
          s"output '${o.name}': streaming requires refresh: incremental " +
            "(a full-refresh purge would race earlier micro-batches)")
        if (o.dqChecks.nonEmpty) throw new ConfigError(
          s"output '${o.name}': dq_checks are batch-only (a per-micro-batch " +
            "check sees partial data; gate the drained output instead)")
      }
    }

    // Maintenance jobs carry their whole contract in the `maintenance:`
    // block — validated AT PARSE TIME like upsert/bucketing/streaming.
    val maintenance = root.get("maintenance").filter(_ != null).map { m =>
      val t = asMap(m, "maintenance")
      val action = str(t, "action").getOrElse("compact").toLowerCase
      if (!Set("compact", "profile", "retain", "vacuum", "cluster",
        "version_vacuum", "history", "delete", "update",
        "create_branch", "publish_branch", "drop_branch", "rebase_branch",
        "compact_deletes", "restore")(action)) throw new ConfigError(
        s"maintenance.action: unknown action '$action' (supported: compact, " +
          "profile, retain, vacuum, cluster, version_vacuum, history, delete, " +
          "update, create_branch, publish_branch, drop_branch, rebase_branch, " +
          "compact_deletes, restore)")
      // restore: to_version is required and must be a version number at
      // PARSE time ({var} interpolations resolve at run time and are exempt)
      val toVersionRaw = str(t, "to_version")
      if (action == "restore" && toVersionRaw.isEmpty) throw new ConfigError(
        "maintenance.to_version (the version to roll back to) is required for restore")
      if (action != "restore" && toVersionRaw.nonEmpty) throw new ConfigError(
        s"maintenance.to_version only applies to restore, not '$action'")
      if (toVersionRaw.exists(v => !v.contains("{") &&
          scala.util.Try(v.trim.toLong).isFailure)) throw new ConfigError(
        s"maintenance.to_version must be a version number, got '${toVersionRaw.get}'")
      val files = str(t, "files").map(_.toInt)
      if (action == "compact" && files.isEmpty) throw new ConfigError(
        "maintenance.files (target part-file count) is required for compact")
      val clusterBy = str(t, "cluster_by")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
      if (action == "cluster" && clusterBy.size < 2) throw new ConfigError(
        "maintenance.cluster_by needs >= 2 comma-separated columns for cluster " +
          "(one column is the sort_by output key, not a Z-curve)")
      if (action == "cluster" && files.isEmpty) throw new ConfigError(
        "maintenance.files (target part-file count) is required for cluster")
      if (action != "cluster" && clusterBy.nonEmpty) throw new ConfigError(
        s"maintenance.cluster_by only applies to action cluster, not '$action'")
      val curve = str(t, "curve").map(_.toLowerCase).getOrElse("zorder")
      if (!Set("zorder", "hilbert")(curve)) throw new ConfigError(
        s"maintenance.curve: unknown curve '$curve' (supported: zorder, hilbert)")
      if (action != "cluster" && str(t, "curve").nonEmpty) throw new ConfigError(
        s"maintenance.curve only applies to action cluster, not '$action'")
      if (files.exists(_ <= 0)) throw new ConfigError(
        s"maintenance.files must be positive, got ${files.get}")
      val outLoc = str(t, "output")
      if (action == "profile" && outLoc.isEmpty) throw new ConfigError(
        "maintenance.output (stats table location) is required for profile")
      val partCol = str(t, "partition_col")
      val keepFrom = str(t, "keep_from")
      if (action == "retain" && partCol.isEmpty) throw new ConfigError(
        "maintenance.partition_col (the partition key to expire by) is required for retain")
      if (action == "retain" && keepFrom.isEmpty) throw new ConfigError(
        "maintenance.keep_from (partitions below this value are dropped) is required for retain")
      val keepLast = str(t, "keep_last").map { v =>
        val n = try v.trim.toLong catch { case _: NumberFormatException =>
          throw new ConfigError(
            s"maintenance.keep_last must be a positive count, got '$v'") }
        if (n <= 0) throw new ConfigError(
          s"maintenance.keep_last must be a positive count, got '$v'")
        n
      }
      if (keepLast.nonEmpty && action != "version_vacuum") throw new ConfigError(
        s"maintenance.keep_last only applies to version_vacuum, not '$action'")
      if (action == "version_vacuum") {
        if (keepFrom.isEmpty && keepLast.isEmpty) throw new ConfigError(
          "version_vacuum needs maintenance.keep_from (versions below this " +
            "are dropped) or maintenance.keep_last (how many newest versions survive)")
        if (keepFrom.nonEmpty && keepLast.nonEmpty) throw new ConfigError(
          "maintenance.keep_from and keep_last are mutually exclusive")
        if (keepFrom.exists(v => scala.util.Try(v.trim.toLong).isFailure)) throw new ConfigError(
          s"maintenance.keep_from must be a version number for version_vacuum, got '${keepFrom.get}'")
      }
      // create_branch repurposes keep_from as the fork version — same
      // numeric contract as version_vacuum, enforced at PARSE time so a
      // typo surfaces as a ConfigError, not a NumberFormatException
      // mid-maintenance ({var} interpolations are resolved at run time
      // and exempt here)
      if (action == "create_branch" &&
          keepFrom.exists(v => !v.contains("{") &&
            scala.util.Try(v.trim.toLong).isFailure)) throw new ConfigError(
        s"maintenance.keep_from must be a version number (the fork version) " +
          s"for create_branch, got '${keepFrom.get}'")
      if (action == "history" && outLoc.isEmpty) throw new ConfigError(
        "maintenance.output (where the history table is written) is required for history")
      val where = str(t, "where")
      if (Set("delete", "update")(action) && where.forall(_.trim.isEmpty))
        throw new ConfigError(
          s"maintenance.where (the row predicate) is required for $action")
      if (!Set("delete", "update")(action) && where.nonEmpty) throw new ConfigError(
        s"maintenance.where only applies to actions delete/update, not '$action'")
      val minDelFrac = str(t, "min_deleted_fraction").map { v =>
        val x = try v.trim.toDouble catch { case _: NumberFormatException =>
          throw new ConfigError(
            s"maintenance.min_deleted_fraction must be a number in (0,1], got '$v'") }
        if (x <= 0 || x > 1) throw new ConfigError(
          s"maintenance.min_deleted_fraction must be in (0,1], got '$v'")
        x
      }
      if (minDelFrac.nonEmpty && action != "compact_deletes") throw new ConfigError(
        s"maintenance.min_deleted_fraction only applies to compact_deletes, not '$action'")
      val branchM = str(t, "branch").map(_.trim).filter(_.nonEmpty)
      val branchActions = Set("create_branch", "publish_branch", "drop_branch",
        "rebase_branch")
      if (branchActions(action) && branchM.isEmpty) throw new ConfigError(
        s"maintenance.branch (the branch name) is required for $action")
      if (!branchActions(action) && branchM.nonEmpty) throw new ConfigError(
        s"maintenance.branch only applies to the branch actions, not '$action'")
      val setMap = t.get("set").map(strMap(_, "set")).getOrElse(Map.empty[String, String])
      if (action == "update" && setMap.isEmpty) throw new ConfigError(
        "maintenance.set (column -> SQL expression map) is required for update")
      if (action != "update" && setMap.nonEmpty) throw new ConfigError(
        s"maintenance.set only applies to action update, not '$action'")
      MaintenanceSpec(
        action = action,
        location = str(t, "location").getOrElse(throw new ConfigError(
          "maintenance.location is required")),
        format = str(t, "format").getOrElse("parquet").toLowerCase,
        files = files,
        output = outLoc,
        partitionCol = partCol,
        keepFrom = keepFrom,
        clusterBy = clusterBy,
        curve = curve,
        where = where,
        set = setMap,
        branch = branchM,
        keepLast = keepLast,
        minDeletedFraction = minDelFrac,
        options = t.get("format_options").map(strMap(_, "format_options"))
          .getOrElse(Map.empty),
        toVersion = toVersionRaw)
    }
    // a materialized output needs versioned inputs to fingerprint —
    // without one the staleness check could never trigger a recompute
    if (output.exists(_.materialized) &&
      !inputs.exists(_.source.isInstanceOf[SourceSpec.Versioned]))
      throw new ConfigError(
        "output materialized: true requires at least one `versioned: true` " +
          "input table (the MV fingerprints its sources' versions)")
    if (jobType == JobType.Maintenance && maintenance.isEmpty)
      throw new ConfigError("job.type maintenance needs a `maintenance:` block")
    if (jobType != JobType.Maintenance && maintenance.nonEmpty)
      throw new ConfigError("`maintenance:` block requires job.type maintenance")

    // A17 DECLARED DEVIATION, surfaced at parse time instead of a
    // ClassNotFoundException at run time: the reference's python-script
    // job downloads and exec()s arbitrary Python with full session
    // access (glue_etl_framework.py:279-309). This engine's script
    // escape hatch is a JVM one — a graft.script.ScriptJob
    // implementation loaded from script_jar. A config whose
    // python_file actually points at a .py file gets the migration
    // path by name, not a class-loader stack trace.
    str(root, "python_file").filter(_.trim.toLowerCase.endsWith(".py")).foreach { p =>
      throw new ConfigError(
        s"python_file '$p': Python script jobs are a declared deviation " +
          "(SURVEY.md §2A/A17) — this engine does not exec() Python. Port the " +
          "script to a graft.script.ScriptJob implementation and reference it " +
          "via script_class (fully-qualified class name) + script_jar " +
          "(path to the user jar); the engine registers the same input-table " +
          "views the SQL path sees.")
    }

    JobSpec(
      name = str(job, "name").getOrElse("graft-job"),
      jobType = jobType,
      sparkConfig = sparkConf,
      variables = variables,
      inputTables = inputs,
      outputTable = output,
      sql = str(root, "sql"),
      sqlFile = str(root, "sql_file"),
      scriptClass = str(root, "python_file").orElse(str(root, "script_class")),
      scriptJar = str(root, "script_jar"),
      bookmarkPath = str(job, "bookmark_path"),
      streaming = streaming,
      checkpointLocation = str(job, "checkpoint_location"),
      maintenance = maintenance)
  }
}
