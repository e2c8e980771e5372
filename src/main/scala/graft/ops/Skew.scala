package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution AQE can't fix alone
  * (e.g. one tenant owning half the events joined against a per-tenant
  * dimension).
  *
  * Salting splits each hot key into `salt` sub-keys: the BIG side gets a
  * uniform salt per row, the DIMENSION side replicates once per salt value,
  * and the join runs on (key, salt) — the hot key's rows now spread over
  * `salt` reducers instead of one straggler. Correct for 1:N joins (each
  * big-side row still meets exactly one dim row). The dim-side blowup is
  * `salt`×, so this is for genuinely small dimensions; AQE's skew-join
  * handles the big-big case by splitting partitions instead.
  */
object Skew {

  val SaltCol = "__graft_salt"

  /** Inner-join `big` to a small `dim` on `key` with `salt`-way splitting.
    * The salt is uniform-random per big-side row — join results are
    * IDENTICAL to the unsalted join for any salt assignment, so randomness
    * here never leaks into output values. */
  def saltedJoin(big: DataFrame, dim: DataFrame, key: String, salt: Int,
                 joinType: String = "inner"): DataFrame = {
    require(salt > 1, "salt must split keys at least two ways")
    val saltedBig = big.withColumn(SaltCol, (rand() * salt).cast("int"))
    val saltedDim = dim.withColumn(SaltCol,
      explode(array((0 until salt).map(lit): _*)))
    saltedBig.join(saltedDim, Seq(key, SaltCol), joinType).drop(SaltCol)
  }
}
