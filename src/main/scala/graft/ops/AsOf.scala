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
    * no right row precedes it).
    *
    * The right row is carried forward as ONE struct, not per-column fills:
    * a per-column `last(ignoreNulls)` would skip a NULL field in the latest
    * snapshot and resurrect a stale older value — even tearing a row out of
    * two different snapshots. Atomic struct fill means the output is always
    * exactly the latest preceding right ROW, nulls and all. Right rows with
    * a null `ts` have no position on the timeline and are dropped; a left
    * row with null `ts` sees nothing. */
  def join(left: DataFrame, right: DataFrame, key: String, ts: String,
           valueCols: Seq[String], prefix: String = "asof_"): DataFrame = {
    val leftCols = left.columns.toSeq
    val reserved = leftCols.toSet
      .intersect(Set("__snap", "__is_left") ++ valueCols.map(c => s"$prefix$c"))
    require(reserved.isEmpty,
      s"AsOf.join: left columns collide with internal/output names: $reserved")
    val snapType = org.apache.spark.sql.types.StructType(
      valueCols.map(c => org.apache.spark.sql.types.StructField(
        c, right.schema(c).dataType, nullable = true)))

    val leftTagged = left.withColumn("__is_left", lit(1))
      .withColumn("__snap", lit(null).cast(snapType))
    val rightTagged = leftCols.filterNot(c => c == key || c == ts)
      .foldLeft(right.filter(col(ts).isNotNull)
        .select(col(key), col(ts),
          struct(valueCols.map(col): _*).as("__snap"))
        .withColumn("__is_left", lit(0))) {
        (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }

    // right rows sort BEFORE left rows at equal ts (<= visibility); null-ts
    // left rows sort first and therefore see nothing. Within a key group
    // the fill only ever reads right rows, so ordering among equal-ts left
    // rows cannot change any output value.
    val w = Window.partitionBy(key)
      .orderBy(col(ts).asc_nulls_first, col("__is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    leftTagged.unionByName(rightTagged)
      .withColumn("__snap", last(col("__snap"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .select(leftCols.map(col) ++
        valueCols.map(c => col(s"__snap.$c").as(s"$prefix$c")): _*)
  }

  /** The custom-physical-operator rendering (see
    * [[graft.plans.BroadcastAsOfJoinExec]]): per-key ts-sorted snapshot
    * index broadcast once, O(log n) binary-search probe per left row, ZERO
    * exchanges — the fact side keeps its partitioning AND ordering, which
    * neither [[join]] (shuffles both sides) nor [[joinViaRange]] (linear
    * per-key scan under a nested loop) can offer. Use when the right side
    * is a broadcastable dimension.
    *
    * Semantics match [[join]] except NULL KEYS, where this form follows
    * SQL join equality (null = null is not a match, so null-key left rows
    * see nulls and null-key right rows are dropped) while the union-window
    * form groups null keys into one timeline. Key and ts types must match
    * between the sides exactly — name-resolved attributes get no implicit
    * coercion here (the checks below fail fast instead of silently
    * mismatching boxed types in the broadcast hash index). */
  def joinBroadcast(left: DataFrame, right: DataFrame, key: String, ts: String,
                    valueCols: Seq[String], prefix: String = "asof_"): DataFrame = {
    require(left.schema(key).dataType == right.schema(key).dataType,
      s"AsOf.joinBroadcast: key '$key' types differ — " +
        s"${left.schema(key).dataType.catalogString} vs ${right.schema(key).dataType.catalogString}")
    require(left.schema(ts).dataType == right.schema(ts).dataType,
      s"AsOf.joinBroadcast: ts '$ts' types differ — " +
        s"${left.schema(ts).dataType.catalogString} vs ${right.schema(ts).dataType.catalogString}")
    import org.apache.spark.sql.GraftExpressions
    import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference}
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
    val spark = left.sparkSession
    graft.plans.AsOfJoinStrategy.install(spark)
    val lp = left.queryExecution.analyzed
    // re-alias the right subtree unconditionally: left and right often
    // derive from the same scan (self-as-of), and a manually-built binary
    // node must not carry duplicate attribute ids across children
    val rp0 = right.queryExecution.analyzed
    val rp: LogicalPlan = Project(rp0.output.map(a => Alias(a, a.name)()), rp0)
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"AsOf.joinBroadcast: no column '$n'"))
    val outAttrs = valueCols.map { c =>
      val a = attr(rp, c)
      AttributeReference(s"$prefix$c", a.dataType, nullable = true)()
    }
    GraftExpressions.ofRows(spark, graft.plans.AsOfJoinPlan(
      lp, rp, attr(lp, key), attr(lp, ts), attr(rp, key), attr(rp, ts),
      valueCols.map(attr(rp, _)), outAttrs))
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
