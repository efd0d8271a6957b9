package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join (SURVEY.md §2B B8): for each left row, attach the latest
  * right row whose timestamp is at-or-before the left timestamp, per key.
  *
  * Implementation is the scale-friendly union+window form rather than a
  * range join: tag both sides, union, sort by (keys, ts, side) once, and
  * carry the right side's values forward with `last(_, ignoreNulls)` over
  * an unbounded-preceding frame. Cost: ONE shuffle on the keys and a
  * partition-local sort — no cartesian candidate blow-up, no skew from
  * wide time bands; at 100 TB this is the same shape as a sort-merge
  * join. (A native Catalyst `SparkStrategy` would only change the
  * operator name, not the data movement.)
  *
  * Ties: a right row at exactly left.ts matches (>= semantics, same as
  * DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`), implemented by sorting the
  * right-side tag before the left at equal timestamps.
  */
object AsOfJoin {

  /** @param left     probe side; all its columns are preserved
    * @param right    reference side; its non-key, non-ts columns are
    *                 appended (null when no earlier right row exists)
    * @param keys     equi-join key columns present on both sides
    * @param leftTs   event-time column on `left`
    * @param rightTs  event-time column on `right` */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String): DataFrame = {
    val valueCols = right.columns.filterNot(c => keys.contains(c) || c == rightTs).toSeq
    val leftCols = left.columns.filterNot(keys.contains).toSeq
    require(valueCols.intersect(leftCols).isEmpty,
      s"as-of join: right value columns ${valueCols.intersect(leftCols).mkString(",")} collide with left columns — alias them first")

    // Common layout: keys ++ ts ++ side ++ left-cols ++ right-cols
    val lPart = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("__ts"), lit(1).as("__side")) ++
        leftCols.map(col) ++ valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val rPart = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("__ts"), lit(0).as("__side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++ valueCols.map(col): _*)

    // side=0 (right) sorts before side=1 (left) at equal ts → ">=" match.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)

    val carried = lPart.unionByName(rPart)
      .select(Seq(col("__side")) ++ keys.map(col) ++ leftCols.map(col) ++
        valueCols.map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)

    carried.filter(col("__side") === 1).drop("__side")
  }

  /** Convenience overload when both sides share the time column name. */
  def apply(left: DataFrame, right: DataFrame, keys: Seq[String],
            tsCol: String): DataFrame = join(left, right, keys, tsCol, tsCol)

  /** The same as-of semantics as [[join]], planned as graft's NATIVE
    * Catalyst operator ([[graft.plans.AsOfJoinNode]] →
    * [[graft.plans.AsOfJoinExec]]): a merge scan over co-clustered,
    * (keys, ts)-sorted children. Because the operator DECLARES its
    * distribution/ordering requirements instead of baking a
    * union+window into the plan, already-co-partitioned inputs
    * (bucketed tables, upstream aggregates on the same keys) run with
    * zero exchanges — the union form cannot, since the union discards
    * both sides' partitioning.
    *
    * One deliberate semantic refinement vs [[join]]: the match is
    * ROW-level (the latest right row's values, nulls included — DuckDB
    * `ASOF JOIN` semantics), where the union form's
    * `last(_, ignoreNulls)` carries each VALUE column forward
    * independently when right-side values contain nulls. Identical
    * whenever right values are non-null (AsOfJoinPlanSpec pins both
    * facts). */
  def joinPlanned(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTs: String, rightTs: String): DataFrame = {
    val spark = left.sparkSession
    // lazy strategy injection: idempotent, works even for sessions not
    // built with spark.sql.extensions=graft.sql.GraftExtensions. The
    // check-then-append races on concurrent first calls over one shared
    // session (extraStrategies is session-global mutable state), so the
    // pair is guarded — double registration would plan the node twice.
    val em = spark.experimental
    AsOfJoin.synchronized {
      if (!em.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
        em.extraStrategies = em.extraStrategies :+ graft.plans.AsOfJoinStrategy
    }

    // session-resolver comparison, so name lookup is case-insensitive
    // exactly like [[join]]'s col()-based resolution (default config)
    val res = spark.sessionState.analyzer.resolver
    def isKey(c: String) = keys.exists(res(_, c))
    val valueCols = right.columns.filterNot(c => isKey(c) || res(c, rightTs)).toSeq
    val leftCols = left.columns.filterNot(isKey).toSeq
    val collisions = valueCols.filter(v => leftCols.exists(res(_, v)))
    require(collisions.isEmpty,
      s"as-of join: right value columns ${collisions.mkString(",")} collide with left columns — alias them first")

    val lPlan = left.queryExecution.analyzed
    // re-alias the right side so a self-join can't alias-collide exprIds
    val rAliased = right.select(right.columns.map(c => col(c).as(c)).toSeq: _*)
    val rPlan = rAliased.queryExecution.analyzed
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             name: String) = plan.output.find(a => res(a.name, name)).getOrElse(
      throw new IllegalArgumentException(s"as-of join: no column '$name' in ${plan.output.map(_.name).mkString(",")}"))
    org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      graft.plans.AsOfJoinNode(lPlan, rPlan,
        keys.map(attr(lPlan, _)), keys.map(attr(rPlan, _)),
        attr(lPlan, leftTs), attr(rPlan, rightTs),
        valueCols.map(attr(rPlan, _))))
  }
}
