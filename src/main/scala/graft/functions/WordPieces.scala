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
  * training round). */
final case class WordPieces(child: Expression, pieces: Array[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_pieces"

  override protected def nullSafeEval(input: Any): Any =
    WordPieces.encode(input.asInstanceOf[ArrayData], pieces)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("wpPieces", pieces, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, arr => {
      s"${ev.value} = graft.functions.WordPieces.encode($arr, $pRef);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieces =
    copy(child = newChild)
}

object WordPieces {

  // the (vocab set, max piece code points) pair is interned per distinct
  // vocabulary array so a whole stage's rows share one hash set
  private val interned =
    new java.util.concurrent.ConcurrentHashMap[Array[String], (Set[String], Int)]()

  private def model(pieces: Array[String]): (Set[String], Int) =
    interned.computeIfAbsent(pieces, p => {
      val set = p.toSet
      val maxCps = if (p.isEmpty) 1
        else p.iterator.map(s => s.codePointCount(0, s.length)).max
      (set, maxCps)
    })

  /** Shared by eval and codegen. Null/empty words contribute nothing. */
  def encode(arr: ArrayData, pieces: Array[String]): GenericArrayData = {
    val (set, maxCps) = model(pieces)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var j = 0
    while (j < arr.numElements()) {
      if (!arr.isNullAt(j)) {
        val w = arr.getUTF8String(j).toString
        if (w.nonEmpty) {
          val ps = Wordpiece.encodeWord(w, set, maxCps)
          var k = 0
          while (k < ps.length) { out += UTF8String.fromString(ps(k)); k += 1 }
        }
      }
      j += 1
    }
    new GenericArrayData(out.toArray)
  }
}
