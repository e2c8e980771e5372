package graft.sink

import java.io.ByteArrayOutputStream
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mixpanel api_based destination — the reference's only non-generic HTTP
  * adapter (implementations/api_based/mixpanel.go):
  *
  *   - events ship as GZIP NDJSON to
  *     `https://api[-eu].mixpanel.com/import?strict=1&project_id=P`
  *     (mixpanel.go:103-112), Basic-authed with the service account;
  *   - the retry ladder is the fixed [100,200,200,500,0] ms sequence, taken
  *     on network errors, every 5xx, and 429 rate limits
  *     (mixpanel.go:25,113-174);
  *   - a 400 "failed validation" response is SOFT when some records
  *     imported: the failure report is extracted, not thrown
  *     (mixpanel.go:134-165);
  *   - `/import` requires `event`, `properties.time`, `properties.$insert_id`
  *     and `properties.distinct_id` — [[shape]] maps flat rows into that
  *     envelope on the executors (distributed `to_json`, like [[Webhook]]).
  *
  * The HTTP layer is testable against any endpoint via `apiBase`; the real
  * hosts are the documented default. Like the reference, only Batch mode
  * exists — there is no row-wise stream path.
  */
final case class Mixpanel(projectId: String, serviceAccount: String,
                          dataResidency: String = "US",
                          apiBase: Option[String] = None,
                          chunkRows: Int = 1000) {

  def importUrl: String = {
    val host = if (dataResidency == "EU") "api-eu.mixpanel.com" else "api.mixpanel.com"
    apiBase.getOrElse(s"https://$host") + s"/import?strict=1&project_id=$projectId"
  }

  /** Map flat event rows to Mixpanel's /import envelope:
    * `{"event": <name>, "properties": {"time": ms, "$insert_id": id,
    * "distinct_id": user, ...rest}}`. */
  def shape(df: DataFrame, eventCol: String = "event_type",
            timeMsCol: String = "ts_ms", insertIdCol: String = "event_id",
            distinctIdCol: String = "user_id"): DataFrame = {
    val reserved = Set(eventCol, timeMsCol, insertIdCol, distinctIdCol)
    // properties = fixed keys + remaining columns, one struct, no parsing
    val props = struct(
      (Seq(col(s"`$timeMsCol`").as("time"),
        col(s"`$insertIdCol`").cast("string").as("$insert_id"),
        col(s"`$distinctIdCol`").cast("string").as("distinct_id")) ++
        df.columns.filterNot(reserved).map(c => col(s"`$c`").as(c))): _*)
    df.select(to_json(struct(
      col(s"`$eventCol`").as("event"), props.as("properties"))).as("j"))
  }

  /** POST shaped rows (a 1-column `j` frame from [[shape]]) as gzip NDJSON
    * chunks from the executors. Throws after the ladder is exhausted. */
  def post(shaped: DataFrame): Unit = {
    val (u, auth, chunk) = (importUrl, serviceAccount, chunkRows)
    shaped.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      rows.grouped(chunk).foreach { group =>
        Mixpanel.postChunk(u, auth, group.map(_.getString(0)).mkString("\n"))
      }
    }
  }
}

object Mixpanel {

  /** mixpanel.go:25 — the fixed retry delays; the final 0 means the last
    * attempt reports immediately. */
  val RetryDelaysMs: Seq[Int] = Seq(100, 200, 200, 500, 0)

  final case class Result(status: Int, body: String, softFailure: Boolean)

  /** One gzip NDJSON chunk through the retry ladder — executor-side. */
  private[sink] def postChunk(url: String, serviceAccount: String,
                              ndjson: String): Result = {
    var last: Result = null
    var lastErr: Throwable = null
    val gz = gzipBytes(ndjson)
    for (delayMs <- RetryDelaysMs) {
      if (last == null) {
        try {
          val r = postOnce(url, serviceAccount, gz)
          r.status match {
            case 200 => last = r
            case 400 if r.body.contains("some data points in the request failed validation") =>
              // soft when records imported; the report is the caller's to log
              last = r.copy(softFailure = true)
            case s if (s >= 500 && s <= 599) || s == 429 =>
              // every 5xx (504 gateway timeouts included) plus the 429
              // rate limit is transient — the ladder exists for exactly these
              lastErr = new RuntimeException(s"mixpanel HTTP $s")
              Thread.sleep(delayMs.toLong)
            case s =>
              throw new RuntimeException(s"mixpanel HTTP $s: ${r.body.take(200)}")
          }
        } catch {
          case e: java.io.IOException =>
            lastErr = e
            Thread.sleep(delayMs.toLong)
        }
      }
    }
    if (last == null) throw new RuntimeException(
      s"mixpanel import failed after ${RetryDelaysMs.length} attempts: ${lastErr.getMessage}",
      lastErr)
    last
  }

  private def postOnce(url: String, serviceAccount: String,
                       gz: Array[Byte]): Result = {
    val conn = new URI(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.setRequestProperty("Content-Type", "application/x-ndjson")
    conn.setRequestProperty("Accept", "application/json")
    conn.setRequestProperty("Content-Encoding", "gzip")
    conn.setRequestProperty("Authorization",
      "Basic " + Base64.getEncoder.encodeToString(serviceAccount.getBytes(UTF_8)))
    conn.setFixedLengthStreamingMode(gz.length)
    val out = conn.getOutputStream
    try out.write(gz) finally out.close()
    val code = conn.getResponseCode
    val is = if (code < 400) conn.getInputStream else conn.getErrorStream
    val body = if (is == null) "" else new String(is.readAllBytes(), UTF_8)
    conn.disconnect()
    Result(code, body, softFailure = false)
  }

  private[sink] def gzipBytes(s: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(bos)
    try g.write(s.getBytes(UTF_8)) finally g.close()
    bos.toByteArray
  }
}
