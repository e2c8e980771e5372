package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression hashing EVERY element of a string array to
  * graft's portable 60-bit hash (`('0x' || substr(md5(s),1,15))::BIGINT` in
  * the DuckDB oracle) in one codegen'd pass.
  *
  * Why an Expression and not `transform(arr, hash60)`: higher-order array
  * functions are interpreted, so the per-shingle md5 runs behind a
  * lambda-dispatched traversal with an intermediate array per row — on the
  * MinHash path this is the last interpreted step between the tokenizer and
  * the [[MinHashSig]] kernel. The first 15 hex chars of the digest equal
  * the first 8 digest bytes read big-endian shifted right one nibble, so
  * the value never materializes a hex string. Null elements stay null
  * (matching `md5(NULL)`); a null array is null.
  */
final case class Hash60Array(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType,
    containsNull = child.dataType.asInstanceOf[ArrayType].containsNull)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hash60_array"

  // interpreted-path digest, one per THREAD — getInstance per ROW would be
  // a JCA provider lookup per document, and a single shared instance would
  // corrupt hashes if two plans ever eval the same (immutable, shared)
  // expression tree concurrently
  @transient private lazy val evalMd =
    ThreadLocal.withInitial[java.security.MessageDigest](
      () => java.security.MessageDigest.getInstance("MD5"))

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val out = new Array[Any](arr.numElements())
    val md = evalMd.get()
    var j = 0
    while (j < arr.numElements()) {
      if (!arr.isNullAt(j)) {
        out(j) = Hash60Array.hash60(md, arr.getUTF8String(j))
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mdCls = "java.security.MessageDigest"
    val md = ctx.addMutableState(mdCls, "hash60Md",
      v => s"""try { $v = $mdCls.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
              |""".stripMargin)
    nullSafeCodeGen(ctx, ev, arr => {
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      s"""
         |Object[] $out = new Object[$arr.numElements()];
         |for (int $j = 0; $j < $arr.numElements(); $j++) {
         |  if (!$arr.isNullAt($j)) {
         |    $out[$j] = graft.functions.Hash60Array.hash60($md, $arr.getUTF8String($j));
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Hash60Array =
    copy(child = newChild)
}

object Hash60Array {
  /** First 15 hex chars of md5 as a non-negative long: the top 8 digest
    * bytes big-endian, dropped one nibble. Shared by eval and codegen. */
  def hash60(md: java.security.MessageDigest, s: UTF8String): Long = {
    md.reset()
    val dg = md.digest(s.getBytes)
    var v = 0L
    var k = 0
    while (k < 8) { v = (v << 8) | (dg(k) & 0xffL); k += 1 }
    v >>> 4
  }
}
