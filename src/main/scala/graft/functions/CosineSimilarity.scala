package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd cosine similarity over two `array<double>` columns
  * (`array<float>` implicitly casts) — the hot-path scalar of the
  * similarity tier (SURVEY §7: "a native `Expression` (codegen) for
  * cosine/dot over ArrayType if UDF overhead shows up").
  *
  * Why an Expression and not `zip_with`+`aggregate`: the higher-order
  * form allocates an intermediate array per row and walks it with
  * per-element lambda dispatch, and needs three passes (dot, |a|², |b|²).
  * This compiles to ONE fused primitive loop inside whole-stage codegen —
  * no allocation, no boxing — which matters when the ANN path scores
  * millions of candidate pairs per executor.
  *
  * Accumulation is sequential in index order, double precision — the same
  * order/precision as the naive loop every other engine (and the DuckDB
  * oracle on `DOUBLE[]`) uses, so results stay bit-comparable.
  *
  * Null handling: null array → null result; individual elements are
  * assumed non-null (embedding vectors), matching the reference fixtures.
  *
  * Mismatched dimensions are an ERROR, not a truncated min-length score: a
  * dimension mismatch in an embedding pipeline is always a data bug, and a
  * plausible-looking similarity over the common prefix would silently
  * poison every downstream threshold. (A zero vector still yields NaN,
  * which `>= threshold` filters drop — that one is a data property, not a
  * length bug.)
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  // AbstractDataType (and with it ImplicitCastInputTypes) is private[sql]
  // in Spark 4, so the double/float check is explicit; float arrays are
  // handled by reading either width in the loop below.
  private def ok(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
    case _ => false
  }
  private def isFloat(t: DataType): Boolean =
    t match { case ArrayType(FloatType, _) => true; case _ => false }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects array<double> or array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  private def get(v: ArrayData, i: Int, float: Boolean): Double =
    if (float) v.getFloat(i).toDouble else v.getDouble(i)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = isFloat(left.dataType); val rf = isFloat(right.dataType)
    if (x.numElements() != y.numElements())
      throw new IllegalArgumentException(
        s"cosine_sim: vector dimensions differ (${x.numElements()} vs ${y.numElements()})")
    val n = x.numElements()
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = get(x, i, lf); val yv = get(y, i, rf)
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      def read(v: String, idx: String, float: Boolean) =
        if (float) s"(double) $v.getFloat($idx)" else s"$v.getDouble($idx)"
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "cosine_sim: vector dimensions differ (" + $a.numElements() + " vs " + $b.numElements() + ")");
         |}
         |int $n = $a.numElements();
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = ${read(a, i, isFloat(left.dataType))};
         |  double $yv = ${read(b, i, isFloat(right.dataType))};
         |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
