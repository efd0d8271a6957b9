package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `gram_cells(q)`: the upper-triangle second-moment cells of a quantized
  * embedding — for a row vector q of length d, one struct per dimension
  * pair (i ≤ j): (i, j, xy = q[i]·q[j], x = q[i], y = q[j]), d(d+1)/2
  * structs in index order.
  *
  * This is the native replacement for the nested higher-order-function
  * form
  *
  *   flatten(transform(sequence(0, size(q)-1), i ->
  *     transform(sequence(i, size(q)-1), j -> struct(...))))
  *
  * whose lambdas are evaluated by the INTERPRETED expression evaluator
  * once per cell — d²/2 interpreted closure calls plus two materialized
  * nested arrays per row. Here the same cells come out of one primitive
  * Scala loop over a pre-extracted primitive array. Value semantics are
  * identical, including null elements: a null q[i] nulls xy and x exactly
  * as the Cast/multiply chain did.
  *
  * Interpreted eval only (CodegenFallback): the loop body is already
  * primitive arithmetic; per-row cost is the d²/2 struct construction,
  * not expression dispatch.
  */
case class GramCells(child: Expression)
    extends UnaryExpression with CodegenFallback with Serializable {

  private val cellType = StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("xy", LongType, nullable = true),
    StructField("x", LongType, nullable = true),
    StructField("y", LongType, nullable = true)))

  override def dataType: DataType = ArrayType(cellType, containsNull = false)
  override def prettyName: String = "gram_cells"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gram_cells expects array<bigint>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val d = arr.numElements()
    val vals = new Array[Long](d)
    val isNull = new Array[Boolean](d)
    var k = 0
    while (k < d) {
      if (arr.isNullAt(k)) isNull(k) = true else vals(k) = arr.getLong(k)
      k += 1
    }
    val out = new Array[Any](d * (d + 1) / 2)
    var idx = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val row = new GenericInternalRow(5)
        row.update(0, i)
        row.update(1, j)
        if (isNull(i) || isNull(j)) row.setNullAt(2)
        else row.update(2, vals(i) * vals(j))
        if (isNull(i)) row.setNullAt(3) else row.update(3, vals(i))
        if (isNull(j)) row.setNullAt(4) else row.update(4, vals(j))
        out(idx) = row.asInstanceOf[InternalRow]
        idx += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): GramCells =
    copy(child = newChild)
}
