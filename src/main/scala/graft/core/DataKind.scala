package graft.core

import org.apache.spark.sql.types._

/** Canonical engine data kinds.
  *
  * Mirrors the reference's seven-type system
  * (bulkerlib/types/datatype.go:14-33) where declaration order encodes the
  * position in the typecast tree. The tree (types/converter.go:13-34) is:
  *
  * {{{
  *            STRING
  *           /  |   \
  *     FLOAT64 TIMESTAMP JSON
  *        |
  *      INT64
  *        |
  *      BOOL
  * }}}
  *
  * `Unknown` is the identity element of the lattice (nil values /
  * not-yet-typed columns, datatype.go:232).
  */
sealed abstract class DataKind(val name: String, val spark: DataType, val rank: Int)
    extends Serializable

object DataKind {
  case object Unknown   extends DataKind("UNKNOWN", NullType, 0)
  case object Bool      extends DataKind("BOOL", BooleanType, 1)
  case object Int64     extends DataKind("INT64", LongType, 2)
  case object Float64   extends DataKind("FLOAT64", DoubleType, 3)
  case object Str       extends DataKind("STRING", StringType, 4)
  case object Timestamp extends DataKind("TIMESTAMP", TimestampType, 5)
  /** JSON payloads are carried as strings of JSON text, matching the
    * reference's stringification for most warehouses
    * (implementations/sql/sql_adapter_base.go:117). */
  case object Json      extends DataKind("JSON", StringType, 6)

  val all: Seq[DataKind] = Seq(Unknown, Bool, Int64, Float64, Str, Timestamp, Json)

  /** Typecast-tree parent (types/converter.go:13-34). Root (STRING) absent. */
  private val parent: Map[DataKind, DataKind] = Map(
    Bool      -> Int64,
    Int64     -> Float64,
    Float64   -> Str,
    Timestamp -> Str,
    Json      -> Str,
  )

  /** Path from `k` to the root, inclusive: Bool → [Bool, Int64, Float64, Str]. */
  def pathToRoot(k: DataKind): List[DataKind] =
    k :: parent.get(k).map(pathToRoot).getOrElse(Nil)

  /** Lowest common ancestor on the typecast tree — the reference's
    * `GetCommonAncestorType` (types/converter.go:137-166). `Unknown` is the
    * identity: lca(Unknown, x) == x. */
  def lca(a: DataKind, b: DataKind): DataKind = (a, b) match {
    case (Unknown, x) => x
    case (x, Unknown) => x
    case (x, y) if x == y => x
    case (x, y) =>
      val ap = pathToRoot(x)
      pathToRoot(y).find(ap.contains).getOrElse(Str)
  }

  /** Can a value of kind `from` be losslessly represented as kind `to`?
    * True when `to` is an ancestor-or-self of `from`, plus the special
    * string→timestamp sniff path (types/converter.go:45-69). */
  def convertible(from: DataKind, to: DataKind): Boolean =
    from == Unknown || pathToRoot(from).contains(to) ||
      ((from, to) match {
        case (Str, Timestamp)     => true // guarded by sniff at value level
        case (Timestamp, Str)     => true
        case (Json, Str)          => true
        case (Bool, Float64)      => true
        case (Float64, Int64)     => true // only when integral; value-checked
        case _                    => false
      })

  /** Map a Spark type to the closest engine kind (used when adopting an
    * existing table's schema, sql_adapter_base.go:131-145). */
  def fromSpark(dt: DataType): DataKind = dt match {
    case NullType                      => Unknown
    case BooleanType                   => Bool
    case ByteType | ShortType | IntegerType | LongType => Int64
    case FloatType | DoubleType        => Float64
    case _: DecimalType                => Float64
    case StringType                    => Str
    case TimestampType | DateType      => Timestamp
    case _: StructType | _: ArrayType | _: MapType => Json
    case _                             => Str
  }

  /** Timestamp sniffing guards (types/datatype.go:169-215): only strings of
    * length 19..35 whose first char is '1' or '2' are candidates. */
  val TsMinLen = 19
  val TsMaxLen = 35

  /** Kind by user-facing name (the option-surface spellings a hint or a
    * `columnTypes` option may use, types/datatype.go:36-52). */
  def forName(s: String): Option[DataKind] = s.trim.toLowerCase match {
    case "string" | "str" | "text"        => Some(Str)
    case "int" | "int64" | "bigint" | "long" => Some(Int64)
    case "float" | "float64" | "double"   => Some(Float64)
    case "bool" | "boolean"               => Some(Bool)
    case "timestamp" | "datetime"         => Some(Timestamp)
    case "json" | "object"                => Some(Json)
    case "unknown"                        => Some(Unknown)
    case _                                => None
  }
}
