package graft.functions

import org.apache.spark.sql.SparkSessionExtensions

/** Deployment hook: `--conf spark.sql.extensions=graft.functions.GraftSparkExtensions`
  * registers graft's native SQL functions on every session the cluster
  * builds (the same registration `GraftExpressions.registerFunctions` does
  * imperatively on an existing session). */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Literal}
    import graft.llm.TextOps
    extensions.injectOptimizerRule(_ => graft.plans.LevenshteinLengthBound)
    extensions.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    extensions.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      { args =>
        val n = args match {
          case Seq(_, Literal(v: Int, _))  => v
          case Seq(_, Literal(v: Long, _)) => v.toInt
          case Seq(_)                      => 16
          case other => throw new IllegalArgumentException(
            s"minhash_sig(array<bigint>[, numHashes]) — got ${other.length} args")
        }
        MinHashSig(args.head,
          TextOps.MinHashA.take(n).toSeq, TextOps.MinHashB.take(n).toSeq, TextOps.MinHashP)
      }))
    extensions.injectFunction((
      FunctionIdentifier("hash60_array"),
      new ExpressionInfo(classOf[Hash60Array].getName, "hash60_array"),
      { args =>
        require(args.length == 1, "hash60_array(array<string>)")
        Hash60Array(args.head)
      }))
    extensions.injectFunction((
      FunctionIdentifier("lang_hits"),
      new ExpressionInfo(classOf[LangHits].getName, "lang_hits"),
      { args =>
        require(args.length == 1, "lang_hits(array<string>)")
        LangHits(args.head)
      }))
    extensions.injectFunction((
      FunctionIdentifier("top_k_by"),
      new ExpressionInfo(classOf[TopKByScore].getName, "top_k_by"),
      { args =>
        val k = FunctionArgs.literalK(args, 3, "top_k_by(score double, id bigint, k)")
        TopKByScore(args.head, args(1), k).toAggregateExpression()
      }))
    extensions.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      { args =>
        require(args.length == 2, "cosine_sim(array<float|double>, array<float|double>)")
        CosineSim(args.head, args(1))
      }))
    extensions.injectFunction((
      FunctionIdentifier("lsh_bucket"),
      new ExpressionInfo(classOf[LshBucket].getName, "lsh_bucket"),
      { args =>
        val (planes, dim) = args match {
          case Seq(_, Literal(p: Int, _), Literal(d: Int, _)) => (p, d)
          case other => throw new IllegalArgumentException(
            s"lsh_bucket(embedding, numPlanes, dim) — got ${other.length} args")
        }
        LshBucket(args.head,
          graft.llm.Similarity.planes(planes, dim).map(_.toSeq).toSeq)
      }))
  }
}
