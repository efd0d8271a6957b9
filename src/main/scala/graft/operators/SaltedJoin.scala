package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY §7 risk "skewed keys →
  * salting or AQE skew-join").
  *
  * AQE's skew-join handles sort-merge skew by splitting oversized
  * partitions, but it can't help when a single JOIN KEY is hot enough
  * that one task still owns it (AQE splits partitions, not keys, on the
  * build side of a shuffled-hash join) or when AQE is unavailable
  * (streaming plans). The classic fix: widen the hot keys explicitly —
  *
  *   - the BIG side gets a deterministic per-row salt in [0, salts);
  *   - the SMALL side is replicated once per salt value;
  *   - the join runs on (keys..., salt), spreading each hot key over
  *     `salts` tasks at the cost of replicating the small side.
  *
  * Semantics: identical to `left.join(right, keys, "inner")` — every
  * (left-row, right-row) key match still meets exactly once, under
  * exactly one salt value. The salt is derived from xxhash64 of the
  * whole left row (deterministic, no RNG in the plan).
  */
object SaltedJoin {

  def inner(big: DataFrame, small: DataFrame, keys: Seq[String],
            salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    require(keys.nonEmpty, "salted join needs at least one key column")
    val salted = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(salts)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, keys :+ "__salt")
      .drop("__salt")
  }
}
