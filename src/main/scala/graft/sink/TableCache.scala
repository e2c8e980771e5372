package graft.sink

import scala.collection.concurrent.TrieMap
import graft.sql.TableSpec

/** Schema cache + DDL serialization (B6, table_helper.go:285-353).
  *
  * Per-(url, table) cached live spec so the hot path skips the JDBC
  * metadata round-trip on every batch; a lock object per table serializes
  * DDL from concurrent streams in the same driver, and [[DdlLock]] extends
  * that across ENGINES — a lock row in the warehouse itself (INSERT-must-
  * succeed on a primary key, stale takeover, timeout), matching the
  * reference's coordination-service locks (table_helper.go:285-304).
  * Entries are invalidated on any load error so the next attempt re-reads
  * reality (autocommit_stream.go:42-48,73-93).
  */
object TableCache {
  private val specs = TrieMap.empty[(String, String), TableSpec]
  private val locks = TrieMap.empty[(String, String), Object]

  /** Observability for tests: metadata reads actually performed. */
  val missCount = new java.util.concurrent.atomic.AtomicLong(0)

  def lockFor(url: String, table: String): Object =
    locks.getOrElseUpdate((url, table), new Object)

  def get(url: String, table: String): Option[TableSpec] = specs.get((url, table))

  def put(url: String, table: String, spec: TableSpec): Unit =
    specs.put((url, table), spec)

  def invalidate(url: String, table: String): Unit = specs.remove((url, table))

  def clear(): Unit = { specs.clear(); locks.clear() }
}
