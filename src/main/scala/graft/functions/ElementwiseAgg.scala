package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Elementwise fold over fixed-width Long vectors — the aggregation
  * primitive behind MinHash signatures (elementwise MIN of hashed shingle
  * vectors) and SimHash bit tallies (elementwise SUM of ±1 bit votes).
  *
  * Why a typed [[Aggregator]] and not `collect_list` + a transform: the
  * aggregator state is a fixed `dim`-long array regardless of how many
  * shingles a document has, and Spark runs it with map-side partial
  * aggregation — at 100 TB the shuffle carries one ~1 KB signature per
  * document instead of every (doc, shingle) row. This is the
  * `Aggregator`-for-sketches design from SURVEY §7 module 8.
  */
final class ElementwiseLongAgg(dim: Int, op: (Long, Long) => Long, neutral: Long)
    extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(dim)(neutral)

  override def reduce(acc: Array[Long], row: Seq[Long]): Array[Long] = {
    require(row.length == dim, s"expected $dim elements, got ${row.length}")
    var i = 0
    val it = row.iterator
    while (it.hasNext) { acc(i) = op(acc(i), it.next()); i += 1 }
    acc
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < dim) { a(i) = op(a(i), b(i)); i += 1 }
    a
  }

  override def finish(acc: Array[Long]): Seq[Long] = acc.toSeq

  override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

object ElementwiseLongAgg {
  import org.apache.spark.sql.functions.udaf

  /** Column-level elementwise min over array<long> groups. */
  def minUdaf(dim: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new ElementwiseLongAgg(dim, math.min, Long.MaxValue), ExpressionEncoder[Seq[Long]]())

  /** Column-level elementwise sum over array<long> groups. */
  def sumUdaf(dim: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new ElementwiseLongAgg(dim, _ + _, 0L), ExpressionEncoder[Seq[Long]]())
}
