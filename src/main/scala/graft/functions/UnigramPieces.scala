package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.llm.Unigram

/** Native unigram-LM Viterbi encode kernel: each word of the input array is
  * segmented by the integer-order Viterbi DP of [[graft.llm.Unigram]]
  * (fewest pieces → max summed score → longest piece), flattened in
  * document order; a word with an uncoverable position contributes one
  * `[UNK]` piece.
  *
  * Why an Expression (same adjudication as [[WordPieces]]/[[BpePieces]]):
  * the per-word DP is inherently sequential with a hash probe per
  * (position, length) candidate — as Column compositions it would be an
  * interpreted higher-order traversal per row. The learned vocabulary
  * rides along as a bounded plan reference: a [[UnigramPieces.Model]]
  * whose score map is built LAZILY ONCE per (de)serialized instance — per
  * task, not per row. The vocabulary is a `Seq` so case-class equality is
  * structural and Catalyst canonicalization/subexpression reuse can fire. */
final case class UnigramPieces(child: Expression, vocab: Seq[(String, Long)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unigram_pieces"

  @transient private lazy val model = new UnigramPieces.Model(vocab)

  override protected def nullSafeEval(input: Any): Any =
    UnigramPieces.encode(input.asInstanceOf[ArrayData], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("ugModel", new UnigramPieces.Model(vocab),
      classOf[UnigramPieces.Model].getName)
    nullSafeCodeGen(ctx, ev, arr => {
      s"${ev.value} = graft.functions.UnigramPieces.encode($arr, $mRef);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramPieces =
    copy(child = newChild)
}

object UnigramPieces {

  /** The learned vocabulary, shipped once per plan: the score map derives
    * lazily on first use after deserialization — one build per task. */
  final class Model(val vocab: Seq[(String, Long)]) extends Serializable {
    @transient lazy val score: java.util.HashMap[String, java.lang.Long] = {
      val m = new java.util.HashMap[String, java.lang.Long](vocab.size * 2)
      vocab.foreach { case (p, c) => m.put(p, java.lang.Long.valueOf(c)) }
      m
    }
  }

  private val UnkU = UTF8String.fromString(Unigram.Unk)

  /** Shared by eval and codegen. Null/empty words contribute nothing;
    * uncoverable words contribute one `[UNK]`. */
  def encode(arr: ArrayData, model: Model): GenericArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var j = 0
    while (j < arr.numElements()) {
      if (!arr.isNullAt(j)) {
        val w = arr.getUTF8String(j).toString
        if (w.nonEmpty) {
          val ps = Unigram.segment(w, model.score)
          if (ps == null) out += UnkU
          else {
            var k = 0
            while (k < ps.length) { out += UTF8String.fromString(ps(k)); k += 1 }
          }
        }
      }
      j += 1
    }
    new GenericArrayData(out.toArray)
  }
}
