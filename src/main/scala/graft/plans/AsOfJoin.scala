package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator Catalyst extension for the broadcast as-of join — the
  * (c)-tier custom-operator path: a custom LogicalPlan, planned by a custom
  * SparkStrategy into a custom SparkPlan.
  *
  * Why a physical operator at all: the DataFrame renderings of "latest
  * right row per key at or before left.ts" either SHUFFLE the fact side
  * (union-window form, [[graft.ops.AsOf.join]] — the right default when
  * both sides are big) or nested-loop every right row per left row
  * (broadcast range join — O(|right-per-key|) per probe). When the right
  * side is a broadcastable dimension, the optimal plan is neither: build a
  * per-key TIME INDEX (ts-sorted snapshots) once, broadcast it, and probe
  * by binary search — O(log n) per left row, ZERO exchanges, the fact
  * table's partitioning and ordering preserved (`outputPartitioning =
  * left.outputPartitioning`), which is exactly what no composition of
  * built-in operators expresses.
  *
  * Semantics match [[graft.ops.AsOf.join]] (proven in AsOfSpec) — `<=`
  * visibility, atomic snapshot rows, null-ts left rows and absent keys see
  * nulls; right rows must be unique per (key, ts) — with ONE documented
  * divergence: null keys follow SQL join equality here (no match, see
  * nulls), where the union-window form shares one timeline among null-key
  * rows.
  */
final case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute,
    rightValues: Seq[Attribute], outAttrs: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ outAttrs
  override def producedAttributes: AttributeSet = AttributeSet(outAttrs)
  override lazy val resolved: Boolean = childrenResolved
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] as [[BroadcastAsOfJoinExec]]. Registered
  * cluster-wide via `GraftSparkExtensions` (injectPlannerStrategy) or
  * per-session via [[AsOfJoinStrategy.install]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      BroadcastAsOfJoinExec(planLater(p.left), planLater(p.right),
        p.leftKey, p.leftTs, p.rightKey, p.rightTs, p.rightValues, p.outAttrs) :: Nil
    case _ => Nil
  }

  def install(spark: SparkSession): Unit =
    org.apache.spark.sql.GraftExpressions.addStrategy(spark, this)
}

/** Physical broadcast as-of join: driver-collects the (small by contract)
  * right side into per-key ts-sorted snapshot arrays, broadcasts the index,
  * and probes each left row with a binary search. No exchange on either
  * side; the left child's partitioning/ordering pass through untouched. */
final case class BroadcastAsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute,
    rightValues: Seq[Attribute], outAttrs: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ outAttrs
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val tsType = rightTs.dataType
    // ---- build: per-key ts-sorted snapshot index (driver, then broadcast)
    val keyEval = BindReferences.bindReference(rightKey: Expression, right.output)
    val tsEval = BindReferences.bindReference(rightTs: Expression, right.output)
    val valProj = UnsafeProjection.create(rightValues.map(v => v: Expression), right.output)
    val ord = TypeUtils.getInterpretedOrdering(tsType)
    val grouped = new java.util.HashMap[Any, scala.collection.mutable.ArrayBuffer[(Any, UnsafeRow)]]()
    right.executeCollect().foreach { row =>
      val k = keyEval.eval(row)
      val t = tsEval.eval(row)
      if (k != null && t != null) { // null key/ts rows have no timeline position
        grouped.computeIfAbsent(k,
          _ => scala.collection.mutable.ArrayBuffer.empty[(Any, UnsafeRow)])
          .append((t, valProj(row).copy()))
      }
    }
    val index = new java.util.HashMap[Any, (Array[Any], Array[UnsafeRow])](grouped.size())
    grouped.forEach { (k, buf) =>
      val sorted = buf.sortBy(_._1)(ord)
      index.put(k, (sorted.map(_._1).toArray, sorted.map(_._2).toArray))
    }
    val bc = sparkContext.broadcast(index)

    // ---- probe: binary search per left row, zero shuffles
    val leftOut = left.output
    val allOut = output
    val lKeyExpr = BindReferences.bindReference(leftKey: Expression, leftOut)
    val lTsExpr = BindReferences.bindReference(leftTs: Expression, leftOut)
    val nVals = outAttrs.length
    left.execute().mapPartitions({ iter =>
      val pOrd = TypeUtils.getInterpretedOrdering(tsType)
      val joined = new JoinedRow
      val nulls = new GenericInternalRow(nVals)
      val resultProj = UnsafeProjection.create(allOut.map(a => a: Expression), allOut)
      val idx = bc.value
      iter.map { lrow =>
        val k = lKeyExpr.eval(lrow)
        val t = lTsExpr.eval(lrow)
        var snap: InternalRow = nulls
        if (k != null && t != null) {
          val entry = idx.get(k)
          if (entry != null) {
            val (tsArr, rows) = entry
            // rightmost snapshot with ts <= t (`<=` visibility)
            var lo = 0
            var hi = tsArr.length - 1
            var ans = -1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (pOrd.compare(tsArr(mid), t) <= 0) { ans = mid; lo = mid + 1 }
              else hi = mid - 1
            }
            if (ans >= 0) snap = rows(ans)
          }
        }
        resultProj(joined(lrow, snap))
      }
    }, preservesPartitioning = true)
  }
}
