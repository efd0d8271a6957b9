package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Safety rail for the config surface: the engine runs arbitrary user
  * SQL, and a window with ORDER BY but no PARTITION BY (`row_number()
  * OVER (ORDER BY ...)`) forces every row through ONE task — at 100 TB
  * that's a guaranteed straggler/OOM discovered hours into the job.
  * Spark only logs a WARN; this rule makes it a structured-log event
  * and, with `spark.graft.failOnGlobalWindow=true`, a fail-fast error
  * pointing at [[graft.operators.GlobalSort]] as the scale-safe form.
  *
  * Injected as an optimizer rule by [[GraftExtensions]]; it only
  * inspects (never rewrites) the plan.
  */
class GuardUnpartitionedWindow(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    plan.foreach {
      case w: Window if w.partitionSpec.isEmpty && w.orderSpec.nonEmpty =>
        val exprs = w.windowExpressions.map(_.sql).mkString(", ").take(200)
        if (spark.conf.get("spark.graft.failOnGlobalWindow", "false").toBoolean)
          throw new graft.config.ConfigError(
            s"window [$exprs] has ORDER BY but no PARTITION BY: all rows would move " +
              "to a single task. Partition the window, or use GlobalSort.withRowNumber " +
              "for a distributed total order. (Set spark.graft.failOnGlobalWindow=false " +
              "to demote this to a warning.)")
        else graft.log.Log.warn("unpartitioned window (single-task at scale)",
          "window" -> exprs)
      case _ =>
    }
    plan
  }
}
