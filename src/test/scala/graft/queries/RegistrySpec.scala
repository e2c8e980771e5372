package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Registry invariants. `Registry.all` is a Map ++ of per-family maps — a
  * duplicated key would SILENTLY drop one family's query from the driver
  * contract, so uniqueness is load-bearing, not cosmetic. */
class RegistrySpec extends AnyFunSuite {

  private val families: Seq[(String, Map[String, Q])] = Seq(
    "Relational" -> Relational.qs, "EltOps" -> EltOps.qs, "LlmOps" -> LlmOps.qs,
    "SketchOps" -> SketchOps.qs, "SinkOps" -> SinkOps.qs,
    "StreamOps" -> StreamOps.qs, "EventOps" -> EventOps.qs, "BpeOps" -> BpeOps.qs,
    "FilterOps" -> FilterOps.qs, "PqOps" -> PqOps.qs, "GraphOps" -> GraphOps.qs,
    "AirbyteOps" -> AirbyteOps.qs, "ReprocessOps" -> ReprocessOps.qs,
    "SyncOps" -> SyncOps.qs)

  test("no query name collides across families (Map ++ would silently override)") {
    val all = families.flatMap { case (f, qs) => qs.keys.map(_ -> f) }
    val dups = all.groupBy(_._1).filter(_._2.size > 1)
    assert(dups.isEmpty, s"duplicated registry keys: $dups")
    assert(all.size == Registry.all.size)
  }

  test("every registered query carries a DuckDB oracle (the strong driver check)") {
    val missing = Registry.all.collect { case (k, q) if q.oracle.isEmpty => k }
    assert(missing.isEmpty, s"queries with rows-only checks: $missing")
  }

  test("query names follow the family prefix conventions") {
    val ok = Registry.all.keys.forall(k =>
      k.matches("[a-z][a-z0-9]*(_[a-z0-9]+)+"))
    assert(ok, Registry.all.keys.filterNot(_.matches("[a-z][a-z0-9]*(_[a-z0-9]+)+")))
  }
}
