package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native sketch-signature expressions over a document's shingle-hash set
  * (`array<long>`). The higher-order-function forms they replace allocate
  * k temporary arrays per document (`transform(sequence(0,k-1), j ->
  * array_min(transform(hs, ...)))`) or a 64-long vote array per shingle;
  * these compile to one fused loop with a fixed local accumulator.
  *
  * Hash family: identical to Spark's `xxhash64(h, j)` fold with an INT
  * j (XXH64.hashInt(j, XXH64.hashLong(h, 42))) — `sequence(0, k-1)`
  * produces ints — so results match the HOF formulation bit-for-bit.
  */

/** `minhash_sig(hs, k)`: k-permutation MinHash signature. */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckFailure(s"minhash_sig: k must be positive, got $k")
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<long>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val acc = Array.fill(k)(Long.MaxValue)
    var i = 0
    val n = hs.numElements()
    while (i < n) {
      val base = XXH64.hashLong(hs.getLong(i), 42L)
      var j = 0
      while (j < k) {
        val v = XXH64.hashInt(j, base)
        if (v < acc(j)) acc(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val xxh = classOf[XXH64].getName
      val gad = classOf[GenericArrayData].getName
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val base = ctx.freshName("base")
      val v = ctx.freshName("v")
      s"""
         |long[] $acc = new long[$k];
         |java.util.Arrays.fill($acc, Long.MAX_VALUE);
         |for (int $i = 0; $i < $hs.numElements(); $i++) {
         |  long $base = $xxh.hashLong($hs.getLong($i), 42L);
         |  for (int $j = 0; $j < $k; $j++) {
         |    long $v = $xxh.hashInt($j, $base);
         |    if ($v < $acc[$j]) $acc[$j] = $v;
         |  }
         |}
         |${ev.value} = new $gad($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** `simhash64(hs)`: 64-bit SimHash — bit j of the result is the sign of
  * the ±1 votes of all feature hashes' bit j. */
case class SimHash64(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<long>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val tally = new Array[Int](64)
    var i = 0
    val n = hs.numElements()
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) tally(j) += 1 else tally(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (tally(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val tally = ctx.freshName("tally")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |int[] $tally = new int[64];
         |for (int $i = 0; $i < $hs.numElements(); $i++) {
         |  long $h = $hs.getLong($i);
         |  for (int $j = 0; $j < 64; $j++) {
         |    if ((($h >>> $j) & 1L) == 1L) $tally[$j]++; else $tally[$j]--;
         |  }
         |}
         |long $out = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($tally[$j] > 0) $out |= (1L << $j);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
