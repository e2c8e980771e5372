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

  /** One sampled frame: parent doc, frame index, frame payload bytes. */
  final case class FrameRow(doc_id: Long, frame_idx: Long, frame: Array[Byte])

  /** Frame sampling: explode each video payload into every `stride`-th
    * frame. The STUB "codec" treats the payload as fixed-size frame records
    * (`frameBytes` each); a real decoder seeks by timestamp instead. The
    * Spark shape is what matters at 100 TB: one narrow pass, output rows
    * fan out ~n_frames/stride per input, downstream operators see plain
    * (doc_id, frame_idx, bytes) rows they can batch-decode per partition. */
  def sampleFrames(media: Dataset[MediaRow], stride: Int,
                   frameBytes: Int = 64): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    require(stride > 0 && frameBytes > 0)
    media.flatMap { r =>
      val nFrames = math.max(1L, r.media.length.toLong / frameBytes)
      (0L until nFrames by stride.toLong).map { i =>
        val from = (i * frameBytes).toInt
        val until = math.min(r.media.length.toLong, (i + 1) * frameBytes).toInt
        FrameRow(r.doc_id, i, java.util.Arrays.copyOfRange(r.media, from, until))
      }
    }
  }

  /** Perceptual fingerprint row: doc, 8-bit blockhash, payload size. */
  final case class BlockHashRow(doc_id: Long, blockhash: Long, n_bytes: Long)

  /** Blockhash-style perceptual fingerprint (Yang et al.'s blockhash shape,
    * byte-domain): the payload splits into `blocks` equal spans; bit k is
    * set when span k's byte mass is ABOVE the payload's overall mean —
    * integer cross-multiplied (`sum_k · N > S · n_k`) so no division and no
    * float anywhere, which is what lets the oracle mirror it exactly. Near-
    * identical payloads (a re-encode, a few changed bytes) keep their hash
    * Hamming-close, so downstream dedup is the SAME band+Hamming shape the
    * SimHash pipeline runs. A real image phash replaces the byte spans with
    * DCT coefficients; the Spark shape — one narrow per-partition pass,
    * 8 bytes of output per payload — does not change. */
  def blockHash(media: Dataset[MediaRow], blocks: Int = 8): Dataset[BlockHashRow] = {
    import media.sparkSession.implicits._
    require(blocks > 0 && blocks <= 62)
    media.mapPartitions { rows =>
      rows.map { r =>
        // defensive: a null/empty payload fingerprints to 0 rather than NPE
        if (r.media == null || r.media.isEmpty) BlockHashRow(r.doc_id, 0L, 0L)
        else blockHashOne(r, blocks)
      }
    }
  }

  private def blockHashOne(r: MediaRow, blocks: Int): BlockHashRow = {
    val n = r.media.length
    val sums = new Array[Long](blocks)
    val cnts = new Array[Long](blocks)
    var j = 0
    while (j < n) {
      // j*blocks can exceed Int for payloads >= ~268 MB: index in Long space
      val k = (j.toLong * blocks / n).toInt // 0-based byte j → block (equal spans)
      sums(k) += r.media(j) & 0xffL
      cnts(k) += 1
      j += 1
    }
    val total = sums.sum
    var hash = 0L
    var k = 0
    while (k < blocks) {
      // cross-multiply in BigInt: sums(k)·n reaches ~2^70 for multi-GB spans
      // (per-block, not per-byte, so the cost is 8 BigInt ops per payload)
      if (cnts(k) > 0 && BigInt(sums(k)) * n > BigInt(total) * cnts(k)) hash |= 1L << k
      k += 1
    }
    BlockHashRow(r.doc_id, hash, n.toLong)
  }

  /** Resized media record: same payload identity, new declared geometry. */
  final case class ResizedRow(doc_id: Long, width: Long, height: Long,
                              resized: Array[Byte])

  /** Resize: per-partition batch pass with one "codec" init per partition.
    * The STUB maps bytes deterministically (truncate/pad to the target
    * byte budget) so the oracle can verify the plumbing; a real impl calls
    * the image library here and nothing else changes. */
  def resize(media: Dataset[MediaRow], width: Int, height: Int): Dataset[ResizedRow] = {
    import media.sparkSession.implicits._
    val budget = width * height / 256 + 16 // stub: bytes-per-geometry budget
    media.mapPartitions { rows =>
      // real impl: initialize the scaler once per partition here
      rows.map { r =>
        val out = java.util.Arrays.copyOf(r.media, budget)
        ResizedRow(r.doc_id, width.toLong, height.toLong, out)
      }
    }
  }
}
