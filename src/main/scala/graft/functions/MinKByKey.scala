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

/** Bounded per-group k-MIN aggregate over EXACT integer keys: keeps the K
  * smallest (key ASC, id ASC) pairs per group in O(K) map-side state and
  * returns them rank-ordered as `array<struct<key:bigint,id:bigint>>`.
  *
  * The ascending twin of [[TopKByScore]], with LONG keys instead of doubles
  * — hash-order selection (quota capping, deterministic sampling) ranks by
  * 60-bit hashes, and a double score would lose the low bits past 2^53,
  * silently diverging from an exact-integer oracle.
  *
  * Why not a rank window: `row_number() OVER (PARTITION BY stratum ORDER BY
  * hash)` sorts EVERY stratum's full row set inside one shuffle partition —
  * a giant crawl source becomes one reducer's sort. This aggregate's
  * partial state is a ≤K binary heap per group per map task, so the shuffle
  * moves `groups × K` entries and nothing ever sorts more than K elements.
  */
final case class MinKByKey(
    left: Expression,  // key: bigint (ranking value)
    right: Expression, // id: bigint (unique tiebreak + payload)
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PriorityQueue[MinKByKey.Entry]]
  with BinaryLike[Expression] {

  import MinKByKey.Entry

  require(k > 0 && k <= (1 << 20), s"k must be in 1..2^20, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, bigint), got (${s.catalogString}, ${i.catalogString})")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", LongType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "min_k_by"

  override def createAggregationBuffer(): PriorityQueue[Entry] =
    new PriorityQueue[Entry](MinKByKey.worstFirst)

  override def update(buffer: PriorityQueue[Entry], input: InternalRow): PriorityQueue[Entry] = {
    val s = left.eval(input)
    val i = right.eval(input)
    if (s != null && i != null) {
      add(buffer, s.asInstanceOf[Long], i.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: PriorityQueue[Entry], other: PriorityQueue[Entry]): PriorityQueue[Entry] = {
    val it = other.iterator()
    while (it.hasNext) { val e = it.next(); add(buffer, e.key, e.id) }
    buffer
  }

  // heap head is the WORST (largest) survivor; a candidate no better than
  // it is rejected without mutating, so the buffer never exceeds K entries
  private def add(buffer: PriorityQueue[Entry], key: Long, id: Long): Unit = {
    if (buffer.size() < k) { buffer.add(Entry(key, id)); () }
    else {
      val worst = buffer.peek()
      if (MinKByKey.better(key, id, worst.key, worst.id)) {
        buffer.poll()
        buffer.add(Entry(key, id))
        ()
      }
    }
  }

  override def eval(buffer: PriorityQueue[Entry]): Any = {
    val arr = buffer.toArray(new Array[Entry](buffer.size()))
    java.util.Arrays.sort(arr, MinKByKey.bestFirst)
    val out = new Array[Any](arr.length)
    var j = 0
    while (j < arr.length) {
      out(j) = new GenericInternalRow(Array[Any](arr(j).key, arr(j).id))
      j += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: PriorityQueue[Entry]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buffer.size())
    bb.putInt(buffer.size())
    val it = buffer.iterator()
    while (it.hasNext) { val e = it.next(); bb.putLong(e.key); bb.putLong(e.id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): PriorityQueue[Entry] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) { buf.add(Entry(bb.getLong, bb.getLong)); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinKByKey =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinKByKey =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinKByKey =
    copy(left = newLeft, right = newRight)
}

object MinKByKey {
  final case class Entry(key: Long, id: Long)

  /** true when (k1, i1) ranks strictly better (smaller) than (k2, i2). */
  private[functions] def better(k1: Long, i1: Long, k2: Long, i2: Long): Boolean =
    k1 < k2 || (k1 == k2 && i1 < i2)

  /** Heap order: WORST (largest) first, so `peek` is the eviction candidate. */
  private[functions] val worstFirst: Comparator[Entry] = new Comparator[Entry] {
    override def compare(a: Entry, b: Entry): Int =
      if (better(a.key, a.id, b.key, b.id)) 1
      else if (better(b.key, b.id, a.key, a.id)) -1
      else 0
  }

  /** Result order: BEST (smallest) first — the rank order callers explode. */
  private[functions] val bestFirst: Comparator[Entry] = new Comparator[Entry] {
    override def compare(a: Entry, b: Entry): Int = -worstFirst.compare(a, b)
  }
}
