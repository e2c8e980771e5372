package graft.functions

import java.nio.ByteBuffer
import java.util.{Comparator, PriorityQueue}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded per-group top-K aggregate: keeps the K best (score DESC, id ASC)
  * pairs per group in O(K) map-side state and returns them rank-ordered as
  * `array<struct<score:double,id:bigint>>`.
  *
  * Why not a rank window: `row_number() OVER (PARTITION BY g ORDER BY score
  * DESC, id)` sorts EVERY group's full row set inside its shuffle partition
  * — at 100 TB "top 5 per category" pays a full parallel sort of the input.
  * This aggregate's partial state is a ≤K binary heap per group per map
  * task, so the shuffle moves `groups × K` entries, map-side combine
  * happens for free, and nothing ever sorts more than K elements (the
  * final rank ordering of each K-heap at eval).
  *
  * The (score DESC, id ASC) order is total whenever ids are unique, so the
  * result is deterministic under any partitioning — the same contract the
  * window form gets from its explicit tiebreak. Null scores/ids are
  * skipped, matching `DESC NULLS LAST` under a `rk <= K` filter when K is
  * smaller than the non-null group size.
  */
final case class TopKByScore(
    left: Expression,  // score: double
    right: Expression, // id: bigint (unique tiebreak + payload)
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PriorityQueue[TopKByScore.Entry]]
  with BinaryLike[Expression] {

  import TopKByScore.Entry

  require(k > 0 && k <= (1 << 20), s"k must be in 1..2^20, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, bigint), got (${s.catalogString}, ${i.catalogString})")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_by"

  override def createAggregationBuffer(): PriorityQueue[Entry] =
    new PriorityQueue[Entry](TopKByScore.worstFirst)

  override def update(buffer: PriorityQueue[Entry], input: InternalRow): PriorityQueue[Entry] = {
    val s = left.eval(input)
    val i = right.eval(input)
    if (s != null && i != null) {
      add(buffer, s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: PriorityQueue[Entry], other: PriorityQueue[Entry]): PriorityQueue[Entry] = {
    val it = other.iterator()
    while (it.hasNext) { val e = it.next(); add(buffer, e.score, e.id) }
    buffer
  }

  // heap head is the WORST survivor; a candidate no better than it is
  // rejected without mutating, so the buffer never exceeds K entries
  private def add(buffer: PriorityQueue[Entry], score: Double, id: Long): Unit = {
    if (buffer.size() < k) { buffer.add(Entry(score, id)); () }
    else {
      val worst = buffer.peek()
      if (TopKByScore.better(score, id, worst.score, worst.id)) {
        buffer.poll()
        buffer.add(Entry(score, id))
        ()
      }
    }
  }

  override def eval(buffer: PriorityQueue[Entry]): Any = {
    val arr = buffer.toArray(new Array[Entry](buffer.size()))
    java.util.Arrays.sort(arr, TopKByScore.bestFirst)
    val out = new Array[Any](arr.length)
    var j = 0
    while (j < arr.length) {
      out(j) = new GenericInternalRow(Array[Any](arr(j).score, arr(j).id))
      j += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: PriorityQueue[Entry]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buffer.size())
    bb.putInt(buffer.size())
    val it = buffer.iterator()
    while (it.hasNext) { val e = it.next(); bb.putDouble(e.score); bb.putLong(e.id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): PriorityQueue[Entry] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) { buf.add(Entry(bb.getDouble, bb.getLong)); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByScore =
    copy(left = newLeft, right = newRight)
}

/** Shared SQL-registration argument handling for the bounded aggregates —
  * ONE copy of the "trailing literal k" extraction that kmin_k and
  * top_k_by need at both registration sites (imperative
  * `GraftExpressions.registerFunctions` and the cluster-wide
  * `GraftSparkExtensions` injector). */
object FunctionArgs {
  import org.apache.spark.sql.catalyst.expressions.Literal

  def literalK(args: Seq[Expression], arity: Int, usage: String): Int = {
    require(args.length == arity, s"$usage — got ${args.length} args")
    args.last match {
      case Literal(v: Int, _)  => v
      case Literal(v: Long, _) => v.toInt
      case other => throw new IllegalArgumentException(
        s"$usage — k must be an integer literal, got $other")
    }
  }
}

object TopKByScore {
  final case class Entry(score: Double, id: Long)

  /** True iff (s1, i1) ranks strictly better than (s2, i2) under
    * (score DESC, id ASC). `Double.compare` gives a total order (NaN sorts
    * last-best-avoided; testless edge — documented, not load-bearing: null
    * scores are skipped before ranking and real scores are finite). */
  private[functions] def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    if (c != 0) c > 0 else i1 < i2
  }

  private[functions] val worstFirst: Comparator[Entry] = new Comparator[Entry] {
    override def compare(a: Entry, b: Entry): Int =
      if (better(a.score, a.id, b.score, b.id)) 1
      else if (better(b.score, b.id, a.score, a.id)) -1
      else 0
  }

  private[functions] val bestFirst: Comparator[Entry] = new Comparator[Entry] {
    override def compare(a: Entry, b: Entry): Int = -worstFirst.compare(a, b)
  }
}
