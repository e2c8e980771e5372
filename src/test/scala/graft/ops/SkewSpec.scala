package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Salted-join correctness: identical results to the plain join under any
  * salt assignment, with the dimension replicated salt-ways. */
class SkewSpec extends SparkSuite {

  test("salted join result equals the plain join on skewed data") {
    // 90% of the big side shares one hot key
    val big = df("k STRING, v BIGINT",
      (1L to 90L).map(i => Row("hot", i)) ++ Seq(Row("a", 91L), Row("b", 92L)))
    val dim = df("k STRING, name STRING",
      Seq(Row("hot", "H"), Row("a", "A"), Row("b", "B"), Row("unused", "U")))
    val plain = big.join(dim, Seq("k")).select("k", "v", "name")
    val salted = Skew.saltedJoin(big, dim, "k", salt = 8).select("k", "v", "name")
    assert(canon(salted) == canon(plain))
    assert(salted.count() == 92L)
  }

  test("left joins keep unmatched big-side rows") {
    val big = df("k STRING, v BIGINT", Seq(Row("x", 1L), Row("nomatch", 2L)))
    val dim = df("k STRING, name STRING", Seq(Row("x", "X")))
    val out = Skew.saltedJoin(big, dim, "k", salt = 4, joinType = "left")
    assert(out.count() == 2L)
    assert(canon(out.filter(col("k") === "nomatch").select("name")) == Seq(Seq("∅")))
  }
}
