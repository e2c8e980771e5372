package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector kernels for the similarity operators.
  *
  * Spark's higher-order array functions (`zip_with`, `aggregate`) are
  * INTERPRETED: a cosine written as three `aggregate(zip_with(...))` folds
  * costs six lambda-dispatched traversals and three intermediate arrays per
  * pair, and an IVF assignment evaluates that against every centroid. These
  * expressions run the same arithmetic — same accumulation order, so the
  * result is bit-identical to the folded form and to the DuckDB oracle —
  * inside whole-stage codegen: one tight loop, zero allocation.
  */
private[graft] object VecOps {

  /** Element accessor snippet for a float/double array column. */
  def elemJava(elem: DataType, arr: String, k: String): String = elem match {
    case FloatType  => s"(double) $arr.getFloat($k)"
    case DoubleType => s"$arr.getDouble($k)"
    case other      => throw new IllegalStateException(s"unsupported element $other")
  }

  def elemScala(elem: DataType, arr: ArrayData, k: Int): Double = elem match {
    case FloatType  => arr.getFloat(k).toDouble
    case DoubleType => arr.getDouble(k)
    case other      => throw new IllegalStateException(s"unsupported element $other")
  }

  def checkVec(name: String, dt: DataType): TypeCheckResult = dt match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name requires array<float|double>, got ${other.catalogString}")
  }
}

/** `cosine(a, b) = dot(a,b) / sqrt(dot(a,a)) / sqrt(dot(b,b))` in ONE pass.
  *
  * Accumulation order matches the sequential `aggregate` fold (per-product,
  * index order; division left-associated), so results are bit-identical to
  * the interpreted form. Mirroring `zip_with`'s null padding: arrays of
  * unequal length or containing a null element yield NULL.
  */
final case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = VecOps.checkVec(prettyName, left.dataType)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else VecOps.checkVec(prettyName, right.dataType)
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"

  private def elemOf(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val (ea, eb) = (elemOf(left), elemOf(right))
    var xy = 0d; var xx = 0d; var yy = 0d
    var k = 0
    while (k < n) {
      if (a.isNullAt(k) || b.isNullAt(k)) return null
      val x = VecOps.elemScala(ea, a, k)
      val y = VecOps.elemScala(eb, b, k)
      xy += x * y; xx += x * x; yy += y * y
      k += 1
    }
    xy / math.sqrt(xx) / math.sqrt(yy)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xy = ctx.freshName("xy"); val xx = ctx.freshName("xx")
      val yy = ctx.freshName("yy"); val k = ctx.freshName("k")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val bad = ctx.freshName("bad")
      s"""
         |boolean $bad = $a.numElements() != $b.numElements();
         |double $xy = 0d, $xx = 0d, $yy = 0d;
         |if (!$bad) {
         |  for (int $k = 0; $k < $a.numElements(); $k++) {
         |    if ($a.isNullAt($k) || $b.isNullAt($k)) { $bad = true; break; }
         |    double $x = ${VecOps.elemJava(elemOf(left), a, k)};
         |    double $y = ${VecOps.elemJava(elemOf(right), b, k)};
         |    $xy += $x * $y; $xx += $x * $x; $yy += $y * $y;
         |  }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $xy / java.lang.Math.sqrt($xx) / java.lang.Math.sqrt($yy);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** `l2sq(a, b) = Σ (a_k − b_k)²` in ONE pass — the squared-Euclidean kernel
  * product quantization trains and searches with.
  *
  * Accumulation order matches the sequential `aggregate(zip_with(...))` fold
  * (per-element squared difference, index order), so results are
  * bit-identical to the interpreted form; unequal lengths or a null element
  * yield NULL, mirroring `zip_with` padding.
  */
final case class L2Sq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = VecOps.checkVec(prettyName, left.dataType)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else VecOps.checkVec(prettyName, right.dataType)
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "l2_sq"

  private def elemOf(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val (ea, eb) = (elemOf(left), elemOf(right))
    var s = 0d
    var k = 0
    while (k < n) {
      if (a.isNullAt(k) || b.isNullAt(k)) return null
      val d = VecOps.elemScala(ea, a, k) - VecOps.elemScala(eb, b, k)
      s += d * d
      k += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val s = ctx.freshName("s"); val k = ctx.freshName("k")
      val d = ctx.freshName("d"); val bad = ctx.freshName("bad")
      s"""
         |boolean $bad = $a.numElements() != $b.numElements();
         |double $s = 0d;
         |if (!$bad) {
         |  for (int $k = 0; $k < $a.numElements(); $k++) {
         |    if ($a.isNullAt($k) || $b.isNullAt($k)) { $bad = true; break; }
         |    double $d = ${VecOps.elemJava(elemOf(left), a, k)} - ${VecOps.elemJava(elemOf(right), b, k)};
         |    $s += $d * $d;
         |  }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): L2Sq =
    copy(left = newLeft, right = newRight)
}

/** b-bit random-hyperplane LSH bucket: bit j set iff `dot(emb, planes(j)) > 0`,
  * all plane dots accumulated in one traversal of the embedding.
  *
  * Mirrors the folded form exactly (per-plane sums in index order); matching
  * `zip_with` padding + `when(null)`'s otherwise-branch, a length mismatch or
  * null element turns every dot NULL, i.e. bucket 0.
  */
final case class LshBucket(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {

  require(planes.nonEmpty && planes.forall(_.length == planes.head.length),
    "planes must be non-empty and rectangular")

  override def checkInputDataTypes(): TypeCheckResult =
    VecOps.checkVec(prettyName, child.dataType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lsh_bucket"

  private val nPlanes = planes.length
  private val dim = planes.head.length
  @transient private lazy val pArr: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  private def elem: DataType = child.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() != dim) return 0L
    val dots = new Array[Double](nPlanes)
    var k = 0
    while (k < dim) {
      if (arr.isNullAt(k)) return 0L
      val x = VecOps.elemScala(elem, arr, k)
      var j = 0
      while (j < nPlanes) { dots(j) += x * pArr(j)(k); j += 1 }
      k += 1
    }
    var bucket = 0L
    var j = 0
    while (j < nPlanes) { if (dots(j) > 0) bucket |= (1L << j); j += 1 }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("lshPlanes", pArr, "double[][]")
    nullSafeCodeGen(ctx, ev, arr => {
      val dots = ctx.freshName("dots")
      val k = ctx.freshName("k"); val j = ctx.freshName("j")
      val x = ctx.freshName("x"); val bad = ctx.freshName("bad")
      s"""
         |boolean $bad = $arr.numElements() != $dim;
         |double[] $dots = new double[$nPlanes];
         |if (!$bad) {
         |  for (int $k = 0; $k < $dim; $k++) {
         |    if ($arr.isNullAt($k)) { $bad = true; break; }
         |    double $x = ${VecOps.elemJava(elem, arr, k)};
         |    for (int $j = 0; $j < $nPlanes; $j++) $dots[$j] += $x * $pRef[$j][$k];
         |  }
         |}
         |${ev.value} = 0L;
         |if (!$bad) {
         |  for (int $j = 0; $j < $nPlanes; $j++)
         |    if ($dots[$j] > 0) ${ev.value} |= (1L << $j);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}

/** `bits`-wide SimHash from a token-hash array in ONE pass: bit `b` of the
  * result is set when `sum over h of (((h >> b) % 2 == 1) ? +1 : -1) > 0`.
  * Default 32 (the classic fingerprint); up to 60 so the value stays
  * non-negative in a BIGINT on every engine (the input hashes carry 60
  * meaningful bits, so every vote up to bit 59 is informative — the wide
  * form is the scale path for band joins, see LlmOps.simhashNearDupWide).
  *
  * Replicates the folded form bit-for-bit, including its null semantics: a
  * NULL element's vote condition is null, so it counts −1 on every bit; a
  * NULL array makes every per-bit `when` fall to `otherwise(0)`, so the
  * result is 0 (not null). The fold costs `bits` interpreted traversals per
  * row; this is one codegen'd loop.
  */
final case class SimHash32(child: Expression, bits: Int = 32) extends UnaryExpression {
  require(bits >= 1 && bits <= 60, s"simhash width out of range: $bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = s"simhash$bits"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return 0L
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val votes = new Array[Long](bits)
    var k = 0
    while (k < arr.numElements()) {
      if (arr.isNullAt(k)) {
        var b = 0
        while (b < bits) { votes(b) -= 1; b += 1 }
      } else {
        val h = arr.getLong(k)
        var b = 0
        while (b < bits) {
          if ((h >> b) % 2 == 1) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      k += 1
    }
    var sh = 0L
    var b = 0
    while (b < bits) { if (votes(b) > 0) sh |= (1L << b); b += 1 }
    sh
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    val votes = ctx.freshName("votes")
    val k = ctx.freshName("k"); val b = ctx.freshName("b")
    val h = ctx.freshName("h")
    ev.copy(code = code"""
      ${c.code}
      long ${ev.value} = 0L;
      if (!${c.isNull}) {
        long[] $votes = new long[$bits];
        for (int $k = 0; $k < ${c.value}.numElements(); $k++) {
          if (${c.value}.isNullAt($k)) {
            for (int $b = 0; $b < $bits; $b++) $votes[$b] -= 1;
          } else {
            long $h = ${c.value}.getLong($k);
            for (int $b = 0; $b < $bits; $b++) {
              if ((($h >> $b) % 2) == 1) $votes[$b] += 1; else $votes[$b] -= 1;
            }
          }
        }
        for (int $b = 0; $b < $bits; $b++)
          if ($votes[$b] > 0) ${ev.value} |= (1L << $b);
      }""", isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}
