package graft.sink

import org.apache.spark.sql.Row
import graft.core.DataKind
import graft.sql.{ColumnSpec, DerbyDialect, TableSpec}
import graft.SparkSuite

/** Schema cache + autocommit retry (B6, table_helper.go:285-353,
  * autocommit_stream.go:42-93). */
class TableCacheSpec extends SparkSuite {

  private def sink(db: String) =
    JdbcSink(s"jdbc:derby:memory:cache_$db;create=true", DerbyDialect)

  test("cache hit skips the catalog round-trip; new columns bust it") {
    TableCache.clear()
    val s = sink("hits")
    val spec = TableSpec("CT1", Seq(ColumnSpec("ID", DataKind.Int64)))
    s.ensureTableCached(spec)
    val after1 = TableCache.missCount.get()
    s.ensureTableCached(spec) // covered by cache → no metadata read
    s.ensureTableCached(spec)
    assert(TableCache.missCount.get() == after1)
    // a batch with a NEW column must go back to the catalog
    s.ensureTableCached(TableSpec("CT1",
      spec.columns :+ ColumnSpec("V", DataKind.Str)))
    assert(TableCache.missCount.get() == after1 + 1)
  }

  test("invalidate forces a re-read on the next ensure") {
    TableCache.clear()
    val s = sink("inv")
    val spec = TableSpec("CT2", Seq(ColumnSpec("ID", DataKind.Int64)))
    s.ensureTableCached(spec)
    val n = TableCache.missCount.get()
    s.invalidate("CT2")
    s.ensureTableCached(spec)
    assert(TableCache.missCount.get() == n + 1)
  }

  test("streamUpsertWithRetry recovers from a dropped table (cache was stale)") {
    TableCache.clear()
    val s = sink("retry")
    val data = df("id BIGINT, v STRING", Seq(Row(1L, "a")))
    val spec = s.specFor(data, "ct3", pk = Seq("id"))
    s.ensureTableCached(spec)
    // someone else drops the table behind our back — the cache is now a lie
    s.withConnection(s.exec(_, """DROP TABLE "CT3""""))
    s.streamUpsertWithRetry(data, spec)
    val back = spark.read.jdbc(s.url, "\"CT3\"", new java.util.Properties())
    assert(canon(back) == Seq(Seq("1", "a")))
  }

  test("loadMerge sub-batch staging commits the same result (B2)") {
    val s = sink("b2")
    val base = df("id BIGINT, v STRING", Seq(Row(1L, "old")))
    val spec = s.specFor(base, "b2t", pk = Seq("id"))
    s.ensureTable(spec); s.append(base, spec.name)
    val delta = df("id BIGINT, v STRING",
      (1L to 20L).map(i => Row(i, s"new$i")))
    s.loadMerge(delta, spec, subBatches = 4)
    val back = spark.read.jdbc(s.url, "\"B2T\"", new java.util.Properties())
    assert(back.count() == 20)
    assert(canon(back.filter("ID = 1").select("V")) == Seq(Seq("new1")))
  }
}
