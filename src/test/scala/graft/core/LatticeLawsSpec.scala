package graft.core

import org.scalacheck.{Gen, Prop, Properties}

/** Algebraic laws of the typecast lattice (types/converter.go:13-34 tree).
  * These are what make DISTRIBUTED schema inference deterministic: executors
  * fold `lca` over whatever slice of rows they see in whatever order the
  * shuffle delivers them, so widening must be a commutative, associative,
  * idempotent monoid with `Unknown` as identity — or two runs of the same
  * ingest could produce different DDL. Property-based so every pair/triple/
  * permutation is exercised, not just the hand-picked cases in LatticeSpec. */
object LatticeLawsSpec extends Properties("DataKindLattice") {
  import DataKind._

  private val kinds: Gen[DataKind] = Gen.oneOf(all)

  property("lca commutative") =
    Prop.forAll(kinds, kinds)((a, b) => lca(a, b) == lca(b, a))

  property("lca idempotent") =
    Prop.forAll(kinds)(a => lca(a, a) == a)

  property("lca associative") =
    Prop.forAll(kinds, kinds, kinds)((a, b, c) =>
      lca(lca(a, b), c) == lca(a, lca(b, c)))

  property("Unknown is the identity") =
    Prop.forAll(kinds)(a => lca(Unknown, a) == a && lca(a, Unknown) == a)

  property("lca is an upper bound both operands convert to") =
    Prop.forAll(kinds, kinds)((a, b) =>
      convertible(a, lca(a, b)) && convertible(b, lca(a, b)))

  property("widening a column is fold-order independent") =
    Prop.forAll(Gen.listOf(kinds)) { ks =>
      val folded = ks.foldLeft(Unknown: DataKind)(lca)
      // bounded sample of permutations — the monoid laws above imply all of
      // them, this is the direct end-to-end restatement
      ks.permutations.take(24).forall(
        _.foldLeft(Unknown: DataKind)(lca) == folded)
    }

  property("convertible is reflexive") =
    Prop.forAll(kinds)(k => convertible(k, k))

  property("option-surface name roundtrips (Unknown has no spelling)") =
    Prop.forAll(kinds)(k =>
      k == Unknown || forName(k.name.toLowerCase).contains(k))

  property("fromSpark inverts .spark (Json collapses to Str by design)") =
    Prop.forAll(kinds)(k => k == Json || fromSpark(k.spark) == k)
}
