package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.llm.Wordpiece

/** Native WordPiece encode kernel: greedy longest-match-first against a
  * learned vocabulary per word, flattened in document order; a word with an
  * uncoverable position contributes the single `[UNK]` piece (the BERT
  * convention — [[graft.llm.Wordpiece]]).
  *
  * Why an Expression (same adjudication as [[BpePieces]]): the per-word
  * cursor walk is inherently sequential and the vocabulary probe is a hash
  * lookup per candidate length — as Column compositions both would be
  * interpreted higher-order traversals per row. The vocabulary rides along
  * as a bounded plan reference object (base alphabet + one merge per
  * training round): the reference is a [[WordPieces.Model]] whose hash set
  * and max-piece-length are built LAZILY ONCE per (de)serialized instance —
  * per task, not per row, and with no global interning map to leak.
  *
  * The vocabulary is a `Seq` (not `Array`) so the case-class equals/
  * hashCode are structural — two plans carrying the same learned vocab
  * canonicalize equal and Catalyst subexpression reuse can fire (the
  * [[BpePieces]] precedent). */
final case class WordPieces(child: Expression, pieces: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_pieces"

  @transient private lazy val model = new WordPieces.Model(pieces)

  override protected def nullSafeEval(input: Any): Any =
    WordPieces.encode(input.asInstanceOf[ArrayData], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("wpModel", new WordPieces.Model(pieces),
      classOf[WordPieces.Model].getName)
    nullSafeCodeGen(ctx, ev, arr => {
      s"${ev.value} = graft.functions.WordPieces.encode($arr, $mRef);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieces =
    copy(child = newChild)
}

object WordPieces {

  /** The vocabulary, shipped once per plan: the set and the max piece
    * length (in code points) derive lazily on first use after
    * deserialization — one build per task, shared by all its rows. */
  final class Model(val pieces: Seq[String]) extends Serializable {
    @transient lazy val set: Set[String] = pieces.toSet
    @transient lazy val maxCps: Int =
      if (pieces.isEmpty) 1
      else pieces.iterator.map(s => s.codePointCount(0, s.length)).max
  }

  /** Shared by eval and codegen. Null/empty words contribute nothing. One
    * scratch offsets buffer per CALL (row), reused across the row's words
    * and cursor positions — no per-position allocation in the hot loop. */
  def encode(arr: ArrayData, model: Model): GenericArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val scratch = new Array[Int](model.maxCps)
    var j = 0
    while (j < arr.numElements()) {
      if (!arr.isNullAt(j)) {
        val w = arr.getUTF8String(j).toString
        if (w.nonEmpty) {
          val ps = Wordpiece.encodeWord(w, model.set, model.maxCps, scratch)
          var k = 0
          while (k < ps.length) { out += UTF8String.fromString(ps(k)); k += 1 }
        }
      }
      j += 1
    }
    new GenericArrayData(out.toArray)
  }
}
