package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused shingle builder: the whole
  * `hash60_array(array_distinct(transform(seq, i -> concat_ws(' ',
  * slice(toks, i+1, n)))))` composition — the first stage of EVERY
  * text-dedup pipeline in the engine — as ONE codegen'd pass.
  *
  * Why: the `transform` that builds n-token windows is a higher-order array
  * function, so each window costs an interpreted lambda dispatch plus an
  * intermediate `slice` array and a `concat_ws` row; `array_distinct` then
  * re-traverses the result, and the hash kernel traverses it again. The
  * fused form walks the token array once, joins each window directly into a
  * UTF8 buffer, dedupes, and hashes — no lambdas, no intermediate arrays.
  *
  * Exactness contract (bit-parity proved in TextOpsSpec): distinctness is
  * decided on the SHINGLE STRING (first occurrence kept, like
  * `array_distinct`), NOT on the hash — a 60-bit collision between two
  * distinct shingles must produce two equal longs here exactly as the
  * unfused form (and the DuckDB oracle, which also dedupes strings before
  * hashing) would. Null tokens are skipped by the join, matching
  * `concat_ws`. Fewer than n tokens → the single whole-array shingle,
  * matching [[graft.llm.TextOps.shingles]]. */
final case class ShingleHash60(child: Expression, n: Int,
                               mode: String = ShingleHash60.Distinct)
  extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")
  require(ShingleHash60.Modes.contains(mode), s"unknown mode: $mode")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hash60"

  @transient private lazy val evalMd =
    ThreadLocal.withInitial[java.security.MessageDigest](
      () => java.security.MessageDigest.getInstance("MD5"))

  override protected def nullSafeEval(input: Any): Any =
    ShingleHash60.compute(evalMd.get(), input.asInstanceOf[ArrayData], n, mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mdCls = "java.security.MessageDigest"
    val md = ctx.addMutableState(mdCls, "shingleMd",
      v => s"""try { $v = $mdCls.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
              |""".stripMargin)
    nullSafeCodeGen(ctx, ev, arr => s"""
       |${ev.value} = graft.functions.ShingleHash60.compute($md, $arr, $n, "$mode");
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHash60 =
    copy(child = newChild)
}

object ShingleHash60 {
  /** `array_distinct` window semantics with whole-array fallback under n —
    * the [[graft.llm.TextOps.shingles]] composition. */
  val Distinct = "distinct"
  /** Non-distinct windows with whole-array fallback — the
    * [[graft.llm.TextOps.ngrams]] composition (multiset consumers:
    * winnowing, repetition). */
  val Multi = "multi"
  /** Non-distinct windows, EMPTY result under n tokens — the positional
    * k-gram shape of the substring-dedup pipeline. */
  val Positional = "positional"
  private[functions] val Modes = Set(Distinct, Multi, Positional)

  private val Sep = UTF8String.fromString(" ")

  /** Shared eval/codegen body: windows of `n` tokens joined with a single
    * space, hashed to the portable 60-bit value; window set and dedup per
    * `mode` above. */
  def compute(md: java.security.MessageDigest, toks: ArrayData, n: Int,
              mode: String): ArrayData = {
    val len = toks.numElements()
    val short = len < n
    if (short && mode == Positional) return new GenericArrayData(Array.empty[Any])
    val nWindows = if (short) 1 else len - n + 1
    val width = if (short) len else n
    val parts = new Array[UTF8String](width)
    val distinct = mode == Distinct
    val seen = if (distinct)
      new java.util.LinkedHashMap[UTF8String, java.lang.Long](nWindows * 2) else null
    val direct = if (distinct) null else new Array[Any](nWindows)
    var i = 0
    while (i < nWindows) {
      var j = 0
      while (j < width) {
        // concat_ws skips SQL nulls: represent them as null UTF8String,
        // which UTF8String.concatWs skips identically
        parts(j) = if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
        j += 1
      }
      val s = UTF8String.concatWs(Sep, parts: _*)
      if (distinct) { if (!seen.containsKey(s)) seen.put(s, Hash60Array.hash60(md, s)) }
      else direct(i) = Hash60Array.hash60(md, s)
      i += 1
    }
    if (!distinct) return new GenericArrayData(direct)
    val out = new Array[Any](seen.size())
    val it = seen.values().iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next().longValue(); k += 1 }
    new GenericArrayData(out)
  }
}
