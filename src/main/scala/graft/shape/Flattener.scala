package graft.shape

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON flattening (T1).
  *
  * Reference: implementations/flattener.go:41-151 —
  * `{a:{b:1}} → {a_b:1}`; keys joined with `_` after the name transformer;
  * arrays (and objects marked not-flattening) are stringified to JSON text;
  * a top-level empty key becomes `_unnamed` (flattener.go:48-52).
  *
  * Spark-first rendering: the reference walks every event at runtime; we walk
  * the batch's `StructType` ONCE on the driver and emit a single `select` —
  * the per-row work is pure column references plus `to_json`, all inside
  * whole-stage codegen, no UDFs, no shuffle (a narrow projection at any
  * scale).
  */
object Flattener {

  /** Flattened (name, column) pairs for a schema. `notFlattening` holds
    * flattened paths (e.g. from `__sql_type_` hints, processor.go:34-40)
    * whose subtree is stringified rather than expanded. */
  def flattenedColumns(schema: StructType,
                       transform: String => String = identity,
                       notFlattening: Set[String] = Set.empty): Seq[(String, Column)] = {

    def walk(prefix: String, dt: DataType, c: Column): Seq[(String, Column)] = dt match {
      case _ if notFlattening.contains(prefix) =>
        dt match {
          case _: StructType | _: ArrayType | _: MapType => Seq(prefix -> to_json(c))
          case _                                         => Seq(prefix -> c)
        }
      case st: StructType =>
        st.fields.toSeq.flatMap { f =>
          val seg = transform(f.name)
          val path = if (prefix.isEmpty) seg else s"${prefix}_$seg"
          walk(path, f.dataType, c.getField(f.name))
        }
      case _: ArrayType | _: MapType => Seq(prefix -> to_json(c))
      case _                         => Seq(prefix -> c)
    }

    val flat = schema.fields.toSeq.flatMap { f =>
      walk(transform(f.name), f.dataType, col(s"`${f.name}`"))
    }
    // flattener.go:48-52 — the empty key surfaces as `_unnamed`.
    // Path collisions ({a:{b:1}} vs {a_b:2}): the reference's ordered-map Set
    // overwrites per event, keeping the first-seen position. Columnar form:
    // the column sits at its first occurrence and each row takes the LAST
    // non-null value (with omitNils a nil never overwrites, so
    // coalesce(reverse) is exact).
    val renamed = flat.map { case (n, c) => (if (n.isEmpty) "_unnamed" else n, c) }
    val byName = renamed.groupBy(_._1)
    renamed.map(_._1).distinct.map { n =>
      byName(n) match {
        case Seq((_, only)) => n -> only
        case cols           => n -> coalesce(cols.map(_._2).reverse: _*)
      }
    }
  }

  /** Flatten a DataFrame's nested columns into a flat projection. */
  def flatten(df: DataFrame,
              transform: String => String = identity,
              notFlattening: Set[String] = Set.empty): DataFrame = {
    val cols = flattenedColumns(df.schema, transform, notFlattening)
    df.select(cols.map { case (n, c) => c.as(n) }: _*)
  }
}
