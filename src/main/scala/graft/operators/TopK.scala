package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Top-k rows per key WITHOUT a window sort (SURVEY §2B B18/B19 scale
  * path; the aggregate itself is [[graft.functions.TopKBy]]).
  *
  * `row_number() OVER (PARTITION BY key ORDER BY ord) <= k` moves every
  * fact row through the exchange; `top_k_by` rides two-phase hash
  * aggregation, so each map task contributes at most k rows per key to
  * the shuffle and no task ever sorts its input. Same result set when
  * `ordCols ++ tiebreak` is a total order.
  *
  * The 100 TB shape: shuffle volume drops from O(rows) to
  * O(keys × k × map_tasks), and the reducer does a k-way heap merge
  * instead of a full partition sort.
  */
object TopK {

  /** For each distinct value of `keys`, keep the k rows with the
    * largest (`largest=true`) or smallest `ordCols` (lexicographic;
    * append a unique tiebreaker for determinism). All input columns
    * survive. */
  def perKey(df: DataFrame, keys: Seq[String], ordCols: Seq[Column], k: Int,
             largest: Boolean = true): DataFrame = {
    graft.sql.GraftExtensions.ensureRegistered(df.sparkSession)
    val payload = struct(df.columns.map(col).toSeq: _*)
    val ord = if (ordCols.size == 1) ordCols.head else struct(ordCols: _*)
    df.groupBy(keys.map(col): _*)
      .agg(call_function("top_k_by", ord, payload, lit(k),
        lit(if (largest) "desc" else "asc")).as("__topk"))
      .select(explode(col("__topk.item")).as("__row"))
      .select(col("__row.*"))
  }
}
