package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.config.{ConfigError, DqChecks}

/** Publish-guard evaluation of an output's `dq_checks:` — the declarative
  * data-quality gate (the Glue Data Quality / Deequ capability the
  * reference lacks). All declared checks evaluate in ONE aggregation pass
  * over the result; any violation fails the job with a named error
  * listing every failed check and its observed value, BEFORE the sink is
  * touched — bad data never replaces good data (the A15 contract
  * extended from "no partial output" to "no invalid output").
  *
  * Scale shape: one map-side-combinable global aggregate — a count, one
  * conditional sum per not_null column, one count_distinct over the
  * unique key — so the gate costs a single scan of the result. That scan
  * is an EXTRA action before the write's own: callers whose result is
  * expensive should persist it (or rely on a cheap source re-scan); the
  * alternative — write first, audit after — publishes bad data before
  * noticing, which is the failure mode this gate exists to prevent.
  */
object DataQuality {

  // Backtick-quoted resolution: a column literally named `a.b` (legal in
  // parquet/JSON-derived schemas) would otherwise parse as field access
  // on `a` and throw, both for the source column and for our generated
  // `__nn_a.b`-style aliases.
  private def qcol(name: String) = col(s"`$name`")

  /** Column-statistics profile of a frame — the crawler/catalog-stats
    * pass (`maintenance.action: profile`): one row per column with row
    * count, null count, exact distinct count, and min/max rendered as
    * strings. ONE aggregation pass computes every statistic (all
    * map-side combinable; distinct-count state is O(distinct values) per
    * column — swap in approx_count_distinct for unbounded-cardinality
    * columns at extreme scale), then a single-row explode melts the wide
    * result into the narrow stats table. No collect: the melt is a plan
    * transform, not a driver loop. */
  def profile(df: DataFrame): DataFrame = {
    val fields = df.schema.fields.toSeq
    require(fields.nonEmpty, "profile: frame has no columns")
    val aggs = fields.flatMap { f => Seq(
      sum(when(qcol(f.name).isNull, 1L).otherwise(0L)).as(s"__nn_${f.name}"),
      count_distinct(qcol(f.name)).as(s"__nd_${f.name}"),
      min(qcol(f.name)).cast("string").as(s"__mn_${f.name}"),
      max(qcol(f.name)).cast("string").as(s"__mx_${f.name}"))
    } :+ count(lit(1)).as("__n")
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(fields.map { f =>
        struct(lit(f.name).as("col_name"), col("__n").as("n_rows"),
          qcol(s"__nn_${f.name}").as("n_nulls"),
          qcol(s"__nd_${f.name}").as("n_distinct"),
          qcol(s"__mn_${f.name}").as("min_value"),
          qcol(s"__mx_${f.name}").as("max_value"))
      }: _*)).as("p"))
      .select(col("p.*"))
  }

  /** Throws [[ConfigError]] naming every violated check. */
  def enforce(df: DataFrame, checks: DqChecks, outName: String): Unit = {
    val aggs =
      Seq(count(lit(1)).as("__n")) ++
        checks.notNull.map(c =>
          sum(when(qcol(c).isNull, 1L).otherwise(0L)).as(s"__null_$c")) ++
        (if (checks.unique.nonEmpty)
          Seq(count_distinct(struct(checks.unique.map(qcol): _*)).as("__distinct"))
        else Nil)
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getAs[Long]("__n")
    val violations = Seq.newBuilder[String]
    checks.minRows.filter(n < _).foreach(m =>
      violations += s"min_rows: got $n rows, need >= $m")
    checks.notNull.foreach { c =>
      val nulls = row.getAs[Long](s"__null_$c")
      if (nulls > 0) violations += s"not_null($c): $nulls null row(s)"
    }
    if (checks.unique.nonEmpty) {
      val distinct = row.getAs[Long]("__distinct")
      if (distinct != n)
        violations += s"unique(${checks.unique.mkString(",")}): " +
          s"$n rows but only $distinct distinct key(s)"
    }
    val v = violations.result()
    if (v.nonEmpty) throw new ConfigError(
      s"output '$outName': data-quality checks failed — ${v.mkString("; ")}")
    graft.log.Log.info("data-quality checks passed",
      "output" -> outName, "rows" -> n.toString)
  }

  /** k-anonymity / l-diversity audit (Sweeney '02; Machanavajjhala et
    * al. '07) — the privacy-governance counterpart to the PII scrub:
    * group the frame by its quasi-identifier columns and report, per
    * equivalence class, its size (k-anonymity = the min over classes),
    * the number of DISTINCT sensitive values it carries (l-diversity —
    * a class where every member shares one sensitive value leaks it
    * even at high k), and whether the class meets the thresholds.
    * Rows in failing classes are the re-identification surface a
    * release would have to suppress or generalize.
    *
    * Scale shape: one hash aggregate on the QI key (map-side
    * combinable; the distinct-sensitive count is state ∝ distinct
    * sensitive values per class, the quantity the audit is measuring)
    * — a single scan at any table size, no self-joins, no window. */
  def kAnonymityReport(df: DataFrame, qiCols: Seq[String],
                       sensitiveCol: String, k: Int, l: Int): DataFrame = {
    require(qiCols.nonEmpty, "kAnonymityReport: need at least one quasi-identifier")
    require(k >= 1 && l >= 1, "kAnonymityReport: k and l must be >= 1")
    df.groupBy(qiCols.map(qcol): _*)
      .agg(count(lit(1)).as("class_size"),
        count_distinct(qcol(sensitiveCol)).as("l_distinct"))
      .withColumn("meets_k", col("class_size") >= k)
      .withColumn("meets_l", col("l_distinct") >= l)
  }

  /** Generalization ladder — the FIX side of [[kAnonymityReport]]: for
    * each finest-level QI class, the minimal generalization level at
    * which it reaches `k` members. `ladder` is the ordered QI hierarchy,
    * finest first: level 0 groups by all columns, each next level drops
    * the last (the classic drop-a-column generalization; a
    * domain-generalization column like region-for-nation is expressed by
    * pre-deriving it and placing it later in the ladder). Level
    * `ladder.size` (beyond the coarsest) means "suppress".
    *
    * Scale shape: ONE full scan builds the finest classes; every coarser
    * level aggregates the CLASS table (rows ∝ #classes, bounded by the
    * QI domain product, never by data), joined back equality-keyed. */
  def generalizationLadder(df: DataFrame, ladder: Seq[String],
                           k: Int): DataFrame = {
    require(ladder.size >= 2, "generalizationLadder: need >= 2 levels")
    require(k >= 1, "generalizationLadder: k must be >= 1")
    val l0 = df.groupBy(ladder.map(qcol): _*)
      .agg(count(lit(1)).as("size_l0"))
    // fold coarser levels onto the class table: level i drops the last
    // i columns of the ladder and sums the finest-class sizes
    val withSizes = (1 until ladder.size).foldLeft(l0) { (acc, i) =>
      val keys = ladder.dropRight(i)
      val lvl = l0.groupBy(keys.map(qcol): _*)
        .agg(sum(col("size_l0")).as(s"size_l$i"))
      acc.join(broadcast(lvl), keys, "left")
    }
    val genLevel = (0 until ladder.size).reverse.foldLeft(
      lit(ladder.size)) { (els, i) =>
      when(col(s"size_l$i") >= k, i).otherwise(els)
    }
    withSizes.withColumn("gen_level", genLevel)
  }
}
