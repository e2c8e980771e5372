package graft.http

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder

/** Connections metrics (`ConnectionsMetricsHandler`,
  * bulkerapp/app/router.go:344-369): the reference proxies a PromQL query —
  * `bulkerapp_consumer_queue_size` by (destinationId, mode, tableName) OR
  * `connection_message_statuses` by (destinationId, tableName, status) over
  * the workspace's destinations — to an external Prometheus. There is no
  * Prometheus in this environment, so the engine keeps the SAME two metric
  * families itself (the edge increments statuses as it admits/sheds/fails
  * events; queue sizes register as gauge callbacks, e.g. a spool backlog),
  * and the endpoint renders the exact Prometheus `query` response shape the
  * reference relays — `{"status":"success","data":{"resultType":"vector",
  * "result":[{"metric":{...},"value":[ts,"v"]},...]}}` — so a UI written
  * against the reference parses it unchanged.
  *
  * Scale: a bounded in-JVM counter map (destinations × tables × statuses),
  * written with striped LongAdders on the request path — never the data
  * plane. */
final class EdgeMetrics {

  private val statuses =
    new ConcurrentHashMap[(String, String, String), LongAdder]()
  // exact admission counter for the series cap: CHM.size is a full
  // traversal and racy under concurrent first-touches — a monotonic
  // admission count makes the bound exact and O(1) to check
  private val statusSeries = new java.util.concurrent.atomic.AtomicInteger(0)
  private val gauges =
    new ConcurrentHashMap[(String, String, String), () => Long]()

  /** Label-cardinality cap: destinationId/tableName are CALLER-controlled
    * (an unauthenticated `/post/:anything` names a destination), so an
    * unbounded label set would be a slow memory leak on a long-lived edge.
    * Past the cap, new series fold into one `__other__` bucket — the
    * standard Prometheus high-cardinality defense; established series keep
    * counting exactly. */
  private val MaxSeries = 10000

  /** Count one message outcome for (destinationId, tableName):
    * `success` | `skipped` | `error` — the reference's message statuses. */
  def incStatus(destinationId: String, tableName: String, status: String): Unit = {
    val k = (destinationId, tableName, status)
    val existing = statuses.get(k)
    val adder =
      if (existing != null) existing
      else {
        // reserve a slot first; give it back if we lost the insert race or
        // blew the cap — the map can never exceed MaxSeries (+ the
        // __other__ overflow buckets)
        val slot = statusSeries.incrementAndGet()
        if (slot > MaxSeries) {
          statusSeries.decrementAndGet()
          statuses.computeIfAbsent(("__other__", "__other__", status), _ => new LongAdder)
        } else {
          var inserted = false
          val a = statuses.computeIfAbsent(k, _ => { inserted = true; new LongAdder })
          if (!inserted) statusSeries.decrementAndGet()
          a
        }
      }
    adder.increment()
  }

  /** Register a live queue-size gauge for (destinationId, mode, tableName)
    * — the consumer-queue twin (a spool backlog, a retry queue depth). */
  def gauge(destinationId: String, mode: String, tableName: String)
           (f: () => Long): Unit = {
    gauges.put((destinationId, mode, tableName), f); ()
  }

  def statusCount(destinationId: String, tableName: String, status: String): Long =
    Option(statuses.get((destinationId, tableName, status)))
      .map(_.sum()).getOrElse(0L)

  /** The Prometheus instant-vector response for one workspace's
    * destinations (ids prefixed `workspaceId-`), deterministic order. */
  def promJson(workspaceId: String,
               nowSec: Double = System.currentTimeMillis() / 1000.0): String = {
    import scala.jdk.CollectionConverters._
    val prefix = workspaceId + "-"
    def js(s: String) = graft.Verify.jsonStr(s)
    val ts = if (nowSec == nowSec.toLong.toDouble) nowSec.toLong.toString
             else nowSec.toString
    val queueRows = gauges.asScala.toSeq
      .filter(_._1._1.startsWith(prefix)).sortBy(_._1)
      .map { case ((d, m, t), f) =>
        s"""{"metric":{"__name__":"bulkerapp_consumer_queue_size","destinationId":${js(d)},"mode":${js(m)},"tableName":${js(t)}},"value":[$ts,"${f()}"]}"""
      }
    val statusRows = statuses.asScala.toSeq
      .filter(_._1._1.startsWith(prefix)).sortBy(_._1)
      .map { case ((d, t, st), n) =>
        s"""{"metric":{"__name__":"connection_message_statuses","destinationId":${js(d)},"tableName":${js(t)},"status":${js(st)}},"value":[$ts,"${n.sum()}"]}"""
      }
    s"""{"status":"success","data":{"resultType":"vector","result":[${
      (queueRows ++ statusRows).mkString(",")}]}}"""
  }
}
