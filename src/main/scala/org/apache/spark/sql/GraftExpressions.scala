package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's native Catalyst expressions.
  * Spark 4 routes Column construction through ColumnNodes and keeps the
  * classic converters `private[sql]`; extension libraries bridge from
  * inside the package — the standard pattern for custom expressions. */
object GraftExpressions {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Build a DataFrame from a custom LogicalPlan (for graft's native
    * operators, e.g. the broadcast as-of join) — `Dataset.ofRows` is
    * `private[sql]`, bridged here like the converters above. */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Append a planner strategy per-session (idempotent) — the runtime twin
    * of `SparkSessionExtensions.injectPlannerStrategy`. */
  def addStrategy(spark: SparkSession,
                  s: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    if (!cs.experimental.extraStrategies.contains(s))
      cs.experimental.extraStrategies = cs.experimental.extraStrategies :+ s
  }

  /** Register graft's native expressions as SQL functions on a session, so
    * `spark.sql("SELECT minhash_sig(hs, 16)")` works alongside the Column
    * API (the FunctionRegistry lives behind sessionState — reachable from
    * this package, which is why registration sits here). Idempotent. */
  def registerFunctions(spark: SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Literal}
    val registry = spark.sessionState.functionRegistry
    val ident = FunctionIdentifier("minhash_sig")
    registry.registerFunction(ident,
      new ExpressionInfo(classOf[graft.functions.MinHashSig].getName, "minhash_sig"),
      { args =>
        val n = args match {
          case Seq(_, Literal(v: Int, _))  => v
          case Seq(_, Literal(v: Long, _)) => v.toInt
          case Seq(_)                      => 16
          case other => throw new IllegalArgumentException(
            s"minhash_sig(array<bigint>[, numHashes]) — got ${other.length} args")
        }
        require(n > 0 && n <= graft.llm.TextOps.MinHashA.length,
          s"numHashes must be in 1..${graft.llm.TextOps.MinHashA.length}")
        graft.functions.MinHashSig(args.head,
          graft.llm.TextOps.MinHashA.take(n).toSeq,
          graft.llm.TextOps.MinHashB.take(n).toSeq,
          graft.llm.TextOps.MinHashP)
      })
    registry.registerFunction(FunctionIdentifier("hash60_array"),
      new ExpressionInfo(classOf[graft.functions.Hash60Array].getName, "hash60_array"),
      { args =>
        require(args.length == 1, "hash60_array(array<string>)")
        graft.functions.Hash60Array(args.head)
      })
    registry.registerFunction(FunctionIdentifier("lang_hits"),
      new ExpressionInfo(classOf[graft.functions.LangHits].getName, "lang_hits"),
      { args =>
        require(args.length == 1, "lang_hits(array<string>)")
        graft.functions.LangHits(args.head)
      })
    registry.registerFunction(FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[graft.functions.CosineSim].getName, "cosine_sim"),
      { args =>
        require(args.length == 2, "cosine_sim(array<float|double>, array<float|double>)")
        graft.functions.CosineSim(args.head, args(1))
      })
    registry.registerFunction(FunctionIdentifier("kmin_k"),
      new ExpressionInfo(classOf[graft.functions.KMinK].getName, "kmin_k"),
      { args =>
        val k = graft.functions.FunctionArgs.literalK(args, 2, "kmin_k(bigint, k)")
        graft.functions.KMinK(args.head, k).toAggregateExpression()
      })
    registry.registerFunction(FunctionIdentifier("top_k_by"),
      new ExpressionInfo(classOf[graft.functions.TopKByScore].getName, "top_k_by"),
      { args =>
        val k = graft.functions.FunctionArgs.literalK(args, 3,
          "top_k_by(score double, id bigint, k)")
        graft.functions.TopKByScore(args.head, args(1), k).toAggregateExpression()
      })
    registry.registerFunction(FunctionIdentifier("bpe_pieces"),
      new ExpressionInfo(classOf[graft.functions.BpePieces].getName, "bpe_pieces"),
      { args =>
        // rules ride as a pair of array<string> literals: lhs[], rhs[]
        def strings(e: Expression): Seq[String] = e match {
          case Literal(arr: org.apache.spark.sql.catalyst.util.ArrayData, _) =>
            arr.toSeq[org.apache.spark.unsafe.types.UTF8String](
              org.apache.spark.sql.types.StringType).map(_.toString)
          case org.apache.spark.sql.catalyst.expressions.CreateArray(children, _) =>
            children.map {
              case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
              case other => throw new IllegalArgumentException(
                s"bpe_pieces rule arrays must be string literals, got $other")
            }
          case other => throw new IllegalArgumentException(
            s"bpe_pieces rule arrays must be literal, got $other")
        }
        args match {
          case Seq(child, l, r) =>
            val (ls, rs) = (strings(l), strings(r))
            require(ls.length == rs.length, "bpe_pieces: lhs/rhs length mismatch")
            graft.functions.BpePieces(child, ls.zip(rs), perWord = true)
          case other => throw new IllegalArgumentException(
            s"bpe_pieces(words, lhs[], rhs[]) — got ${other.length} args")
        }
      })
    registry.registerFunction(FunctionIdentifier("lsh_bucket"),
      new ExpressionInfo(classOf[graft.functions.LshBucket].getName, "lsh_bucket"),
      { args =>
        val (planes, dim) = args match {
          case Seq(_, Literal(p: Int, _), Literal(d: Int, _)) => (p, d)
          case other => throw new IllegalArgumentException(
            s"lsh_bucket(embedding, numPlanes, dim) — got ${other.length} args")
        }
        graft.functions.LshBucket(args.head,
          graft.llm.Similarity.planes(planes, dim).map(_.toSeq).toSeq)
      })
  }
}
