package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The general (ANSI-shaped) MERGE action surface for
  * [[VersionedTable.merge]] — the conditional / multi-action semantics
  * the r12 SQL router rejected by name (`WHEN MATCHED AND <cond> THEN
  * UPDATE/DELETE`, column-level `UPDATE SET c = e`, `WHEN NOT MATCHED
  * [BY SOURCE]`).
  *
  * Conditions and assignment expressions are SQL strings evaluated over
  * a row holding two STRUCT columns: `t` (the target row) and `s` (the
  * source row) — so `t.cents < s.cents` reads exactly like the MERGE
  * statement it came from, with no name-collision games. Within each
  * action list the FIRST action whose condition holds wins (the ANSI
  * rule); a row no action claims keeps its default (target rows stay,
  * unmatched source rows are not inserted).
  *
  * Scale shape of the evaluator ([[MergeActions.apply]]): ONE
  * equality-keyed full-outer join of the touched-file rows against the
  * arrivals, then a single codegen'd projection building each output
  * column as a when-chain — no per-action pass, no driver iteration.
  * Every output column is cast to the TARGET column's type (the ANSI
  * store-assignment rule; Spark's ANSI mode makes a lossy cast a loud
  * error). */
final case class MergeActions(
    matched: Seq[MergeActions.Matched],
    notMatched: Seq[MergeActions.NotMatched],
    bySource: Seq[MergeActions.BySource]) {
  def isEmpty: Boolean = matched.isEmpty && notMatched.isEmpty && bySource.isEmpty
  /** Does any action read the whole source row (`UPDATE SET *` /
    * `INSERT *`)? Those require the source to carry every target
    * column. */
  def needsFullSourceRow: Boolean =
    matched.exists(_.isInstanceOf[MergeActions.UpdateAll]) ||
      notMatched.exists(_.isInstanceOf[MergeActions.InsertAll])
}

object MergeActions {
  sealed trait Matched { def cond: Option[String] }
  /** WHEN MATCHED [AND cond] THEN UPDATE SET * */
  final case class UpdateAll(cond: Option[String]) extends Matched
  /** WHEN MATCHED [AND cond] THEN UPDATE SET c = e, ... */
  final case class UpdateSet(cond: Option[String], set: Seq[(String, String)]) extends Matched
  /** WHEN MATCHED [AND cond] THEN DELETE */
  final case class Delete(cond: Option[String]) extends Matched

  sealed trait NotMatched { def cond: Option[String] }
  /** WHEN NOT MATCHED [AND cond] THEN INSERT * */
  final case class InsertAll(cond: Option[String]) extends NotMatched
  /** WHEN NOT MATCHED [AND cond] THEN INSERT (c, ...) VALUES (e, ...) —
    * unassigned target columns insert NULL (the ANSI rule) */
  final case class InsertValues(cond: Option[String], values: Seq[(String, String)]) extends NotMatched

  sealed trait BySource { def cond: Option[String] }
  /** WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE SET c = e, ... */
  final case class BySourceUpdate(cond: Option[String], set: Seq[(String, String)]) extends BySource
  /** WHEN NOT MATCHED BY SOURCE [AND cond] THEN DELETE */
  final case class BySourceDelete(cond: Option[String]) extends BySource

  /** The classic row-replace upsert as actions — recognised by
    * [[VersionedTable.merge]] to take the unrestricted (multi-row-key)
    * anti-join+union fast path. */
  val RowReplace: MergeActions =
    MergeActions(Seq(UpdateAll(None)), Seq(InsertAll(None)), Nil)

  /** Evaluate the action lists over target rows `target` (the touched
    * files' live rows, table schema) and source rows `arrivals`, joined
    * full-outer on `keys` equality. Returns rows in the TARGET schema.
    * NULL join keys never match (both sides' null-key rows take the
    * not-matched branches — the same rule as the row-replace path). */
  private[sinks] def apply(target: DataFrame, arrivals: DataFrame,
                           keys: Seq[String], actions: MergeActions): DataFrame = {
    val schema: StructType = target.schema
    val cols = schema.fields.map(_.name).toSeq
    val t = target.select(struct(cols.map(col): _*).as("t"))
    val s = arrivals.select(struct(arrivals.columns.toSeq.map(col): _*).as("s"))
    val joinCond = keys.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _)
    val j = t.join(s, joinCond, "full_outer")
    evaluate(j, schema, actions, col("t").isNotNull, col("s").isNotNull)
  }

  /** The not-matched-only degenerate case (no target rows touched):
    * apply the insert chain directly over the arrivals — same output
    * as [[apply]] with an empty target, without a join on nothing.
    * A NULL-typed `t` struct stands in for the absent target side so
    * the evaluator's (never-taken) target branches still analyze —
    * exactly the shape a full-outer join's unmatched side has. */
  private[sinks] def applyInsertOnly(arrivals: DataFrame, schema: StructType,
                                     actions: MergeActions): DataFrame = {
    val s = arrivals.select(lit(null).cast(schema).as("t"),
      struct(arrivals.columns.toSeq.map(col): _*).as("s"))
    evaluate(s, schema, actions, lit(false), lit(true))
  }

  /** BY SOURCE evaluation over bare target rows that are KNOWN to have
    * no source match (zone-miss files, or rows already anti-joined
    * against the arrival keys) — the deletion-vector merge path's half
    * of the evaluator. Rows are framed as (`t` struct, NULL `s` struct)
    * so conditions and SET expressions read exactly as they do in
    * [[apply]]; `passthrough` columns (the file/row-position metadata)
    * survive unchanged. Returns ONLY the rows some BY SOURCE action
    * claims, tagged `__gm_act` with the winning (first-true) action
    * index — computed in a single projection, so a non-deterministic
    * condition picks one branch per row. Callers localCheckpoint the
    * result before deriving the DV and the re-images from it. */
  private[sinks] def claimBySource(rows: DataFrame, schema: StructType,
                                   sourceSchema: StructType, actions: MergeActions,
                                   passthrough: Seq[String]): DataFrame = {
    val framed = rows.select(
      struct(schema.fieldNames.toSeq.map(col): _*).as("t") +:
        lit(null).cast(sourceSchema).as("s") +:
        passthrough.map(col): _*)
    val winner = actions.bySource.zipWithIndex.foldRight(lit(-1)) {
      case ((a, i), rest) =>
        when(expr(a.cond.getOrElse("true")), lit(i)).otherwise(rest)
    }
    framed.withColumn("__gm_act", winner).filter(col("__gm_act") >= 0)
  }

  /** The updated re-images of [[claimBySource]] rows won by a
    * `BySourceUpdate` action, in the TARGET schema (delete-claimed rows
    * contribute nothing — their positions go to the DV only). */
  private[sinks] def bySourceImages(claimed: DataFrame, schema: StructType,
                                    actions: MergeActions): DataFrame = {
    val updates = actions.bySource.zipWithIndex.collect {
      case (u: BySourceUpdate, i) => (u, i) }
    claimed
      .filter(col("__gm_act").isin(updates.map(_._2): _*))
      .select(schema.fields.toSeq.map { f =>
        val base = col(s"t.${f.name}")
        def assigned(set: Seq[(String, String)]): Option[Column] =
          set.collectFirst { case (n, e) if n.equalsIgnoreCase(f.name) =>
            expr(e).cast(f.dataType) }
        updates.foldRight(base) { case ((u, i), rest) =>
          when(col("__gm_act") === i, assigned(u.set).getOrElse(base))
            .otherwise(rest)
        }.as(f.name)
      }: _*)
  }

  private def evaluate(j: DataFrame, schema: StructType, actions: MergeActions,
                       tPresent: Column, sPresent: Column): DataFrame = {
    val matchedRow = tPresent && sPresent
    val tOnlyRow = tPresent && !sPresent
    // Each action condition is MATERIALIZED once per row as a boolean
    // column, and every when-chain references that column. Without
    // this, a condition would re-evaluate once per output column and
    // once more in the keep filter — a NON-DETERMINISTIC condition
    // (rand(), a volatile UDF) could then take different branches per
    // column and emit torn rows. CollapseProject never inlines
    // non-deterministic projections, so the materialized column is
    // computed exactly once per row (the Delta rule: one condition
    // evaluation per row per action).
    def condAlias(prefix: String, i: Int) = s"__gm_c_$prefix$i"
    val condCols: Seq[Column] =
      actions.matched.zipWithIndex.map { case (a, i) =>
        expr(a.cond.getOrElse("true")).as(condAlias("m", i)) } ++
      actions.bySource.zipWithIndex.map { case (a, i) =>
        expr(a.cond.getOrElse("true")).as(condAlias("b", i)) } ++
      actions.notMatched.zipWithIndex.map { case (a, i) =>
        expr(a.cond.getOrElse("true")).as(condAlias("n", i)) }
    val jc = j.select(col("*") +: condCols: _*)
    // first-condition-wins chain: fold the actions right-to-left so the
    // head action is the outermost WHEN
    def chain[A](as: Seq[A], prefix: String, out: A => Column,
                 default: Column): Column =
      as.zipWithIndex.foldRight(default) { case ((a, i), rest) =>
        when(col(condAlias(prefix, i)), out(a)).otherwise(rest) }

    def valueOf(c: org.apache.spark.sql.types.StructField): Column = {
      val tc = col(s"t.${c.name}")
      val sc = col(s"s.${c.name}")
      // assignment names match the target column CASE-INSENSITIVELY —
      // Spark's default identifier resolution, and the rule the SQL
      // router validates with; a case-sensitive compare here would
      // silently no-op `UPDATE SET CENTS = ...` against column `cents`
      def assigned(set: Seq[(String, String)]): Option[Column] =
        set.collectFirst { case (n, e) if n.equalsIgnoreCase(c.name) =>
          expr(e).cast(c.dataType) }
      val fromMatched = chain[Matched](actions.matched, "m", {
        case UpdateAll(_) => sc.cast(c.dataType)
        case UpdateSet(_, set) => assigned(set).getOrElse(tc)
        case Delete(_) => tc // value irrelevant: the keep flag drops the row
      }, tc)
      val fromBySource = chain[BySource](actions.bySource, "b", {
        case BySourceUpdate(_, set) => assigned(set).getOrElse(tc)
        case BySourceDelete(_) => tc
      }, tc)
      val fromNotMatched = chain[NotMatched](actions.notMatched, "n", {
        case InsertAll(_) => sc.cast(c.dataType)
        case InsertValues(_, values) =>
          assigned(values).getOrElse(lit(null).cast(c.dataType))
      }, lit(null).cast(c.dataType))
      when(matchedRow, fromMatched)
        .when(tOnlyRow, fromBySource)
        .otherwise(fromNotMatched)
        .as(c.name)
    }

    val keep = {
      val m = chain[Matched](actions.matched, "m", {
        case Delete(_) => lit(false)
        case _ => lit(true)
      }, lit(true))
      val b = chain[BySource](actions.bySource, "b", {
        case BySourceDelete(_) => lit(false)
        case _ => lit(true)
      }, lit(true))
      val n = chain[NotMatched](actions.notMatched, "n",
        (_: NotMatched) => lit(true), lit(false))
      when(matchedRow, m).when(tOnlyRow, b).otherwise(n)
    }
    jc.filter(keep).select(schema.fields.toSeq.map(valueOf): _*)
  }
}
