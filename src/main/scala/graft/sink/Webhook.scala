package graft.sink

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.to_json
import org.apache.spark.sql.functions.struct

/** Webhook / api_based destination (K9): POST the batch as NDJSON chunks to
  * an HTTP endpoint with bounded retries
  * (implementations/api_based/webhook.go:92-230).
  *
  * Rows marshal to JSON on the EXECUTORS (distributed `to_json`); only the
  * HTTP fan-out runs per partition, each partition posting its own chunks —
  * no driver collect, no single-socket bottleneck at scale.
  */
final case class Webhook(url: String, chunkRows: Int = 500,
                         maxAttempts: Int = 3, backoffMs: Long = 200) {

  /** POST `df` as NDJSON chunks. Throws after `maxAttempts` failures of any
    * chunk (the caller's retry/DLQ machinery takes over, B4). */
  def post(df: DataFrame): Unit = {
    val (u, chunk, attempts, backoff) = (url, chunkRows, maxAttempts, backoffMs)
    df.select(to_json(struct(df.columns.map(c =>
        org.apache.spark.sql.functions.col(s"`$c`")): _*)).as("j"))
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        rows.grouped(chunk).foreach { group =>
          val body = group.map(_.getString(0)).mkString("\n")
          Webhook.postChunk(u, body, attempts, backoff)
        }
      }
  }
}

object Webhook {
  /** One chunk with retry — executor-side, plain JDK HTTP. */
  private[sink] def postChunk(url: String, body: String,
                              maxAttempts: Int, backoffMs: Long): Unit = {
    var attempt = 0
    var done = false
    var lastErr: Throwable = null
    while (!done && attempt < maxAttempts) {
      attempt += 1
      try {
        val conn = new URI(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
        conn.setRequestMethod("POST")
        conn.setDoOutput(true)
        conn.setRequestProperty("Content-Type", "application/x-ndjson")
        val bytes = body.getBytes(UTF_8)
        conn.setFixedLengthStreamingMode(bytes.length)
        val out = conn.getOutputStream
        try out.write(bytes) finally out.close()
        val code = conn.getResponseCode
        conn.getInputStream.readAllBytes()
        conn.disconnect()
        if (code >= 200 && code < 300) done = true
        else throw new RuntimeException(s"webhook HTTP $code")
      } catch {
        case e: Throwable =>
          lastErr = e
          if (attempt < maxAttempts) Thread.sleep(backoffMs * attempt)
      }
    }
    if (!done) throw new RuntimeException(
      s"webhook failed after $maxAttempts attempts: ${lastErr.getMessage}", lastErr)
  }
}
