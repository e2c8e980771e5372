package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-language stopword hit counts over a token array in ONE codegen'd
  * traversal — the native twin of one `size(filter(toks, isin(...)))` per
  * language ([[graft.llm.TextOps.langScore]]), which runs |languages|
  * interpreted lambda traversals with ~10 string comparisons per token each.
  * Here every token does a single hash-map probe yielding a membership
  * BITMASK over all languages at once ("en" is an es-stopword and "un" is
  * es+fr — multi-membership is real), and the counts accumulate in a local
  * array.
  *
  * Output: array<long> of length |TextOps.LangStopwords| in declaration
  * order (en, de, es, fr). Null tokens count nothing; a null array is null.
  * The interpreted `langScore` form stays as the executable spec this kernel
  * is verified against (TextOpsSpec). */
final case class LangHits(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lang_hits"

  override protected def nullSafeEval(input: Any): Any =
    LangHits.hits(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.LangHits.hits($arr);")

  override protected def withNewChildInternal(newChild: Expression): LangHits =
    copy(child = newChild)
}

object LangHits {
  /** Fixed inventories — single source of truth in TextOps. */
  private val langs: Seq[Seq[String]] = graft.llm.TextOps.LangStopwords.map(_._2)
  val NumLangs: Int = langs.length

  /** token → bitmask of language memberships (bit i = language i). */
  private val masks: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    langs.zipWithIndex.foreach { case (ws, i) =>
      ws.foreach { w =>
        val k = UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, Integer.valueOf((if (prev == null) 0 else prev.intValue()) | (1 << i)))
      }
    }
    m
  }

  /** Shared by eval and codegen: one traversal, one probe per token. */
  def hits(arr: ArrayData): GenericArrayData = {
    val counts = new Array[Long](NumLangs)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val m = masks.get(arr.getUTF8String(j))
        if (m != null) {
          var bits = m.intValue()
          while (bits != 0) {
            val i = java.lang.Integer.numberOfTrailingZeros(bits)
            counts(i) += 1
            bits &= bits - 1
          }
        }
      }
      j += 1
    }
    new GenericArrayData(counts)
  }
}
