package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.llm.Bpe

/** Native BPE piece kernel: applies a learned merge list (in rank order,
  * each rule exhaustively, left-to-right) in one codegen'd pass.
  *
  * Two modes on the same input type `array<string>`:
  *  - `perWord = true`: the array is a document's WORD list — each word is
  *    split to characters, encoded independently, and the per-word pieces
  *    are flattened in document order (empty words contribute nothing);
  *  - `perWord = false`: the array IS one symbol sequence — the rules apply
  *    to it directly (the distributed trainer's per-round apply step).
  *
  * Why an Expression: the fold-per-rule is inherently sequential per word —
  * as a Column composition it would be `nRules` chained interpreted
  * higher-order `aggregate` traversals per row (the exact pattern CLAUDE.md
  * bans); here the whole rule cascade runs in compiled Java inside
  * whole-stage codegen. The merge table rides along as a plan reference
  * object (bounded: it is the trained model, ≤ a few thousand entries). */
final case class BpePieces(child: Expression, rules: Seq[(String, String)],
                           perWord: Boolean, byteLevel: Boolean = false)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_pieces"

  @transient private lazy val lhsArr: Array[String] = rules.map(_._1).toArray
  @transient private lazy val rhsArr: Array[String] = rules.map(_._2).toArray

  override protected def nullSafeEval(input: Any): Any =
    BpePieces.encode(input.asInstanceOf[ArrayData], lhsArr, rhsArr, perWord, byteLevel)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lRef = ctx.addReferenceObj("bpeLhs", rules.map(_._1).toArray, "java.lang.String[]")
    val rRef = ctx.addReferenceObj("bpeRhs", rules.map(_._2).toArray, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, arr => {
      s"${ev.value} = graft.functions.BpePieces.encode($arr, $lRef, $rRef, $perWord, $byteLevel);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BpePieces =
    copy(child = newChild)
}

object BpePieces {

  /** Shared by eval and codegen. Null elements are skipped (a null word has
    * no pieces); the output array never contains nulls. */
  def encode(arr: ArrayData, lhs: Array[String], rhs: Array[String],
             perWord: Boolean, byteLevel: Boolean): GenericArrayData = {
    // hot path: only the two long-lived parallel arrays are touched — no
    // per-row tuple Seq (this kernel exists to keep the scan allocation-lean)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    if (perWord) {
      var j = 0
      while (j < arr.numElements()) {
        if (!arr.isNullAt(j)) {
          val w = arr.getUTF8String(j).toString
          if (w.nonEmpty) {
            val pieces =
              if (byteLevel) Bpe.encodeWordBytes(w, lhs, rhs)
              else Bpe.encodeWord(w, lhs, rhs)
            var k = 0
            while (k < pieces.length) {
              out += UTF8String.fromString(pieces(k)); k += 1
            }
          }
        }
        j += 1
      }
    } else {
      var syms = new Array[String](arr.numElements())
      var n = 0
      var j = 0
      while (j < arr.numElements()) {
        if (!arr.isNullAt(j)) { syms(n) = arr.getUTF8String(j).toString; n += 1 }
        j += 1
      }
      if (n < syms.length) syms = java.util.Arrays.copyOf(syms, n)
      var i = 0
      while (i < lhs.length) {
        if (syms.length > 1) syms = Bpe.applyRule(syms, lhs(i), rhs(i))
        i += 1
      }
      var k = 0
      while (k < syms.length) { out += UTF8String.fromString(syms(k)); k += 1 }
    }
    new GenericArrayData(out.toArray)
  }
}
