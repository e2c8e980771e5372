package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) temporal join — the enrichment shape training-data and
  * event pipelines need constantly (each event gets the LATEST dimension
  * snapshot at or before its timestamp) and Spark has no built-in for.
  *
  * The naive rendering is a range join (`l.key = r.key AND r.ts <= l.ts`
  * plus an argmax) — O(|matches|) pair blowup and a join Spark can only
  * nested-loop within key groups. This implementation is the scalable
  * union-window form: tag both sides, union, ONE hash shuffle on the key,
  * sort each key group by (ts, side), and carry the last non-null right
  * value forward. Cost is a single shuffle of |left| + |right| rows — no
  * pair explosion at any skew, which is why it survives 100 TB where the
  * range join dies on hot keys.
  *
  * Right rows must be unique per (key, ts) — pre-aggregate yours if not
  * (e.g. `max_by` the latest update id). Ties: a right row at exactly
  * `left.ts` IS visible to that left row (`<=` semantics, right-before-left
  * at equal ts).
  */
object AsOf {

  /** Enrich `left` with the latest `valueCols` from `right` per `key` at or
    * before `ts`. Output = every left row + `asof_<col>` columns (null when
    * no right row precedes it). */
  def join(left: DataFrame, right: DataFrame, key: String, ts: String,
           valueCols: Seq[String], prefix: String = "asof_"): DataFrame = {
    val rightTypes = valueCols.map(c => c -> right.schema(c).dataType).toMap
    val leftCols = left.columns.toSeq

    val leftTagged = valueCols.foldLeft(left.withColumn("__is_left", lit(1))) {
      (df, c) => df.withColumn(s"$prefix$c", lit(null).cast(rightTypes(c)))
    }
    val rightTagged = leftCols.filterNot(c => c == key || c == ts)
      .foldLeft(right.select(
        (col(key) +: col(ts) +: valueCols.map(c => col(c).as(s"$prefix$c"))): _*)
        .withColumn("__is_left", lit(0))) {
        (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }

    // right rows sort BEFORE left rows at equal ts (<= visibility); within
    // a key group the fill only ever reads right rows, so ordering among
    // equal-ts left rows cannot change any output value
    val w = Window.partitionBy(key)
      .orderBy(col(ts).asc, col("__is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = valueCols.foldLeft(leftTagged.unionByName(rightTagged)) {
      (df, c) => df.withColumn(s"$prefix$c",
        last(col(s"$prefix$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__is_left") === 1)
      .select(leftCols.map(col) ++ valueCols.map(c => col(s"$prefix$c")): _*)
  }

  /** The range-join rendering of the same semantics — kept as the
    * executable spec the window form is tested against, and as the fallback
    * when the right side is tiny enough to broadcast. DO NOT use at scale
    * with a large right side: within-key pair blowup. */
  def joinViaRange(left: DataFrame, right: DataFrame, key: String, ts: String,
                   valueCols: Seq[String], prefix: String = "asof_"): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left.withColumn("__lid", monotonically_increasing_id()).as("l")
    val r = right.as("r")
    val joined = l.join(broadcast(r),
      col(s"l.$key") === col(s"r.$key") && col(s"r.$ts") <= col(s"l.$ts"), "left")
    val w = Window.partitionBy(col("l.__lid")).orderBy(col(s"r.$ts").desc_nulls_last)
    joined.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(leftCols.map(c => col(s"l.$c")) ++
        valueCols.map(c => col(s"r.$c").as(s"$prefix$c")): _*)
  }
}
