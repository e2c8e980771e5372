package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata; decode / feature-extraction runs as
  * an imperative per-partition pass over the typed Dataset (the Scala
  * equivalent of `mapInPandas`: batch-shaped, off the codegen path, the slot
  * where a real decoder library would sit).
  *
  * The decode step itself is STUBBED (no media libs in this container) with a
  * deterministic fake keyed on the payload bytes; everything around it —
  * schema, encoders, partition batching, feature schema — is real and
  * oracle-checked.
  */
object Multimodal {

  /** One media payload: bytes + typed metadata. */
  final case class MediaRow(doc_id: Long, media: Array[Byte], mime: String)

  /** Extracted features. With a real decoder, width/height/frames come from
    * the codec; the stub derives them deterministically from the byte length
    * so the pipeline stays verifiable end to end. */
  final case class MediaFeatures(doc_id: Long, n_bytes: Long, width: Long,
                                 height: Long, n_frames: Long, checksum: String)

  /** STUB decoder — replace with a real codec call. Deterministic in the
    * payload so the DuckDB oracle can mirror it. */
  private def decodeStub(r: MediaRow): MediaFeatures = {
    val n = r.media.length.toLong
    val md = java.security.MessageDigest.getInstance("MD5")
    val sum = md.digest(r.media).map("%02x".format(_)).mkString
    MediaFeatures(r.doc_id, n, n % 640, n % 480, 1 + n % 10, sum)
  }

  /** Feature extraction over a typed media Dataset: per-partition iteration
    * (one decoder init per partition, streaming through rows — the batch
    * shape a Pandas-UDF equivalent needs). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: initialize the decoder once per partition here
      rows.map(decodeStub)
    }
  }

  /** Wrap a text table as binary media payloads (the ingest shape a real
    * pipeline gets from reading raw bytes + a mime column). */
  def fromText(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("doc_id"),
        col(textCol).cast("binary").as("media"),
        lit("text/plain").as("mime"))
      .as[MediaRow]
  }
}
