package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression computing a FULL MinHash signature in one
  * pass: for an array of 60-bit shingle hashes, returns
  * `[min_i((a_i·(x mod P)+b_i) mod P) for i < numHashes]`.
  *
  * Why an Expression and not `functions.transform`+`array_min`: Spark's
  * higher-order array functions are interpreted (no codegen), so 16 chained
  * transforms cost 16 lambda-dispatched traversals plus 16 intermediate
  * arrays PER ROW. This operator stays inside whole-stage codegen — one
  * tight `long[]` loop, zero intermediate allocation — which is exactly the
  * case the Spark-first design reserves custom Catalyst work for. The math
  * is bit-identical to the chained form (and to the DuckDB oracle).
  */
final case class MinHashSig(child: Expression, a: Seq[Long], b: Seq[Long], p: Long)
    extends UnaryExpression {

  require(a.length == b.length && a.nonEmpty, "coefficient arrays must align")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  private val n = a.length

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(n)(p)
    var j = 0
    while (j < arr.numElements()) {
      if (!arr.isNullAt(j)) {
        val x = arr.getLong(j) % p
        var i = 0
        while (i < n) {
          val h = (a(i) * x + b(i)) % p
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", a.toArray, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", b.toArray, "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val mins = ctx.freshName("mins")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val h = ctx.freshName("h")
      s"""
         |long[] $mins = new long[$n];
         |java.util.Arrays.fill($mins, ${p}L);
         |for (int $j = 0; $j < $arr.numElements(); $j++) {
         |  if (!$arr.isNullAt($j)) {
         |    long $x = $arr.getLong($j) % ${p}L;
         |    for (int $i = 0; $i < $n; $i++) {
         |      long $h = ($aRef[$i] * $x + $bRef[$i]) % ${p}L;
         |      if ($h < $mins[$i]) $mins[$i] = $h;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
