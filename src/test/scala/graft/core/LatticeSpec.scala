package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Algebraic laws of the typecast lattice (types/converter.go:13-34,137-166).
  * The domain has 7 elements, so every law is checked EXHAUSTIVELY over all
  * pairs/triples — stronger than sampled property testing. */
class LatticeSpec extends AnyFunSuite {
  import DataKind._
  private val ks = DataKind.all

  test("lca is commutative (all 49 pairs)") {
    for (a <- ks; b <- ks) assert(lca(a, b) == lca(b, a), s"lca($a,$b)")
  }

  test("lca is associative (all 343 triples)") {
    for (a <- ks; b <- ks; c <- ks)
      assert(lca(lca(a, b), c) == lca(a, lca(b, c)), s"lca($a,$b,$c)")
  }

  test("lca is idempotent") {
    for (a <- ks) assert(lca(a, a) == a)
  }

  test("Unknown is the identity element") {
    for (a <- ks) { assert(lca(Unknown, a) == a); assert(lca(a, Unknown) == a) }
  }

  test("lca is an upper bound: both sides convert to it") {
    for (a <- ks; b <- ks) {
      val m = lca(a, b)
      assert(convertible(a, m), s"$a !-> lca($a,$b)=$m")
      assert(convertible(b, m), s"$b !-> lca($a,$b)=$m")
    }
  }

  test("every kind converts to itself and to STRING (tree root)") {
    for (a <- ks) { assert(convertible(a, a)); assert(convertible(a, Str)) }
  }

  test("tree shape matches the reference typecast tree") {
    // BOOL < INT64 < FLOAT64 < STRING; TIMESTAMP < STRING; JSON < STRING
    assert(lca(Bool, Int64) == Int64)
    assert(lca(Bool, Float64) == Float64)
    assert(lca(Int64, Float64) == Float64)
    assert(lca(Int64, Str) == Str)
    assert(lca(Timestamp, Float64) == Str) // only meet at the root
    assert(lca(Json, Timestamp) == Str)
    assert(lca(Bool, Timestamp) == Str)
  }

  test("special value-checked conversion edges exist") {
    assert(convertible(Str, Timestamp)) // sniff path
    assert(convertible(Float64, Int64)) // integral-only, value-checked
    assert(convertible(Bool, Float64))
  }

  test("fromSpark round-trips the canonical Spark types") {
    for (k <- ks if k != Unknown && k != Json)
      assert(DataKind.fromSpark(k.spark) == k)
    // JSON is carried as StringType → maps back to Str by design
    assert(DataKind.fromSpark(Json.spark) == Str)
  }
}
