package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bounded K-minimum-values aggregate: keeps the K smallest DISTINCT longs
  * per group with O(K) state, map-side combinable — the native state shape
  * of a KMV sketch (Bar-Yossef et al. 2002). Returns the survivors as an
  * ascending `array<bigint>`.
  *
  * Why a TypedImperativeAggregate and not a rank window: a
  * `row_number() OVER (PARTITION BY shard ORDER BY h)` derivation of the
  * same survivors sorts each shard's ENTIRE distinct-hash set — at 100 TB
  * that is a full parallel sort of the distinct stream. This aggregate's
  * partial state is a ≤K sorted buffer per group per map task, so the
  * shuffle moves `groups × K` longs and nothing ever sorts more than K
  * elements at once.
  *
  * Distinctness is inherent (the buffer is a sorted set), so callers do NOT
  * need a `.distinct()` upstream — dedup happens map-side inside the bound.
  */
final case class KMinK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k > 0 && k <= (1 << 20), s"k must be in 1..2^20, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmin_k"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(
      buffer: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buffer, v.asInstanceOf[Long])
    buffer
  }

  override def merge(
      buffer: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buffer, it.next())
    buffer
  }

  // insert keeping only the K smallest distinct values: a candidate ≥ the
  // current K-th minimum is rejected without mutating; otherwise the largest
  // survivor is evicted — buffer size never exceeds K
  private def add(buffer: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buffer.size() < k) { buffer.add(v); () }
    else if (v < buffer.last()) {
      if (buffer.add(v)) { buffer.remove(buffer.last()); () }
    }
  }

  override def eval(buffer: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Any](buffer.size())
    val it = buffer.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(out) // TreeSet iterates ascending
  }

  override def serialize(buffer: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.size())
    bb.putInt(buffer.size())
    val it = buffer.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var j = 0
    while (j < n) { buf.add(bb.getLong); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KMinK =
    copy(child = newChild)
}
