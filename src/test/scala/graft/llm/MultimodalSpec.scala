package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Multimodal binary-column plumbing: the decode stays a documented stub,
  * but the Dataset shapes, byte arithmetic, and fingerprint properties are
  * real and pinned here. */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private def media(rows: (Long, String)*) =
    Multimodal.fromText(rows.toDF("doc_id", "text"), "doc_id", "text")

  /** Driver-side twin of the blockhash arithmetic. */
  private def refBlockHash(bytes: Array[Byte], blocks: Int = 8): Long = {
    val sums = new Array[Long](blocks); val cnts = new Array[Long](blocks)
    bytes.indices.foreach { j =>
      val k = j * blocks / bytes.length
      sums(k) += bytes(j) & 0xffL; cnts(k) += 1
    }
    val total = sums.sum
    (0 until blocks).map { k =>
      if (cnts(k) > 0 && sums(k) * bytes.length > total * cnts(k)) 1L << k else 0L
    }.sum
  }

  test("blockHash equals the integer reference, including payloads shorter than the block count") {
    val texts = Seq(1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "aAbBcC", 3L -> "zz", 4L -> ("x" * 500 + "Z" * 100))
    val got = Multimodal.blockHash(media(texts: _*)).collect()
      .map(r => r.doc_id -> ((r.blockhash, r.n_bytes))).toMap
    texts.foreach { case (id, t) =>
      val b = t.getBytes("UTF-8")
      assert(got(id) == ((refBlockHash(b), b.length.toLong)), s"doc $id")
    }
  }

  test("blockHash: near-identical payloads stay Hamming-close; a structured payload hits its derivable hash") {
    val base = ("lorem ipsum dolor sit amet " * 20).trim
    val tweaked = base.updated(10, 'X').updated(200, 'Y') // a few changed bytes
    // low bytes then high bytes: blocks 0-3 below the mean, 4-7 above → 0xF0
    val ramp = "a" * 200 + "z" * 200
    val out = Multimodal.blockHash(media(1L -> base, 2L -> tweaked, 3L -> ramp))
      .collect().map(r => r.doc_id -> r.blockhash).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(out(1L), out(2L)) <= 1, s"${out(1L)} vs ${out(2L)}")
    assert(out(3L) == 0xF0L)
  }

  test("phash: one-byte edits stay Hamming-close; a reversed profile flips the odd-frequency bits") {
    val ramp = (0 until 256).map(i => ('a' + (i * 25 / 255)).toChar).mkString
    val rampTweak = ramp.updated(100, 'z')
    val rev = ramp.reverse
    val got = Multimodal.phash(
        media(1L -> ramp, 2L -> rampTweak, 3L -> rev, 4L -> ramp))
      .collect().map(r => r.doc_id -> r.phash).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // identical payloads hash identically (the dedup contract)
    assert(got(1L) == got(4L))
    // the STRONG coefficient is robust where near-zero ones are not: a
    // ramp's C1 (half-cosine) is large and negative; reversal negates every
    // odd coefficient, so bit 0 MUST flip — while the one-byte edit cannot
    // touch it
    assert((got(1L) & 1L) == (got(2L) & 1L), "edit flipped the dominant DCT bit")
    assert((got(1L) & 1L) != (got(3L) & 1L), "reversal kept the dominant DCT bit")
    // and overall a local edit moves fewer sign bits than structural change
    assert(ham(got(1L), got(2L)) < ham(got(1L), got(3L)),
      s"edit=${ham(got(1L), got(2L))} !< reverse=${ham(got(1L), got(3L))}")
  }

  test("blockHash: empty and null payloads fingerprint to 0 instead of diverging or throwing") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, Array[Byte](), "text/plain"),
      Multimodal.MediaRow(2L, null, "text/plain"),
      Multimodal.MediaRow(3L, "abcz".getBytes("UTF-8"), "text/plain"))
    val out = Multimodal.blockHash(rows.toDS()).collect()
      .map(r => r.doc_id -> ((r.blockhash, r.n_bytes))).toMap
    assert(out(1L) == ((0L, 0L)) && out(2L) == ((0L, 0L)))
    assert(out(3L)._2 == 4L)
  }

  test("SyntheticCodec: encode→decode round-trips geometry and raster checksum") {
    import Multimodal.SyntheticCodec
    val frames = Seq.tabulate(3)(f => Array.tabulate(6 * 4)(i => (f * 40 + i).toByte))
    val payload = SyntheticCodec.encode(6, 4, frames, comment = "v1".getBytes)
    val feat = SyntheticCodec.decode(9L, payload, SyntheticCodec.Mime)
    assert(feat.width == 6L && feat.height == 4L && feat.n_frames == 3L)
    assert(feat.n_bytes == payload.length.toLong)
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = md.digest(frames.flatten.toArray).map("%02x".format(_)).mkString
    assert(feat.checksum == expected)
    assert(SyntheticCodec.pixels(payload).toSeq == frames.flatten)
    // malformed payloads fail loudly, like a real codec
    intercept[IllegalArgumentException](
      SyntheticCodec.decode(1L, "not a gpm payload".getBytes, ""))
    intercept[IllegalArgumentException](
      SyntheticCodec.decode(1L, payload.dropRight(1), "")) // truncated
  }

  test("decode→features→dedup executes for real: re-encodes collapse, edits stay distinct") {
    import spark.implicits._
    import Multimodal.SyntheticCodec
    def raster(seed: Int) = Seq(Array.tabulate(64)(i => ((seed * 31 + i * 7) % 251).toByte))
    val edited = { val p = raster(1).head.clone(); p(10) = (p(10) + 96).toByte; Seq(p) }
    val rows = Seq(
      // doc 1 and 2: the SAME raster under different container comments
      Multimodal.MediaRow(1L, SyntheticCodec.encode(8, 8, raster(1), "enc-a".getBytes), SyntheticCodec.Mime),
      Multimodal.MediaRow(2L, SyntheticCodec.encode(8, 8, raster(1), "longer-encoder-tag".getBytes), SyntheticCodec.Mime),
      Multimodal.MediaRow(3L, SyntheticCodec.encode(8, 8, edited), SyntheticCodec.Mime),
      Multimodal.MediaRow(4L, SyntheticCodec.encode(8, 8, raster(9)), SyntheticCodec.Mime))
    val ds = rows.toDS()
    // exact content dedup via decoded-raster checksum: 1 and 2 group together
    val groups = Multimodal.extractFeatures(ds, SyntheticCodec)
      .groupBy(col("checksum")).agg(collect_set(col("doc_id")).as("ids"))
      .collect().map(_.getSeq[Long](1).toSet).toSet
    assert(groups.contains(Set(1L, 2L)))
    assert(groups.size == 3) // {1,2}, {3}, {4}
    // perceptual path: raster blockhash identical for re-encodes despite
    // different container bytes (the StubDecoder would NOT collapse them)
    val bh = Multimodal.blockHash(ds, decoder = SyntheticCodec)
      .collect().map(r => r.doc_id -> r.blockhash).toMap
    assert(bh(1L) == bh(2L))
    // ...whereas the container-level StubDecoder sees different bytes for
    // the two re-encodes (an 8-bit blockhash may collide by chance, so the
    // contrast is pinned on the md5 checksum)
    val stub = Multimodal.extractFeatures(ds)
      .collect().map(r => r.doc_id -> r.checksum).toMap
    assert(stub(1L) != stub(2L), "container checksums must differ across re-encodes")
  }

  test("ImageIO: gray PNG encode→decode round-trips the raster bit-exactly") {
    val px = Array.tabulate(16 * 16)(i => ((i * 37 + 11) % 256).toByte)
    val png = Multimodal.encodeImage(16, 16, px)
    // a real PNG container: magic bytes present, parsed by a real reader
    assert(png.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    assert(Multimodal.ImageIoDecoder.pixels(png).toSeq == px.toSeq)
    val f = Multimodal.ImageIoDecoder.decode(1L, png, "image/png")
    assert(f.width == 16 && f.height == 16 && f.n_frames == 1)
  }

  test("ImageIO: re-encodes of the same raster collapse (PNG vs BMP), container bytes differ") {
    val px = Array.tabulate(16 * 16)(i => ((i * 13 + 5) % 128).toByte)
    val png = Multimodal.encodeImage(16, 16, px, "png")
    val bmp = Multimodal.encodeImage(16, 16, px, "bmp")
    assert(!java.util.Arrays.equals(png, bmp), "containers must differ")
    // content identity: decoded rasters — and so checksum, blockhash, and
    // phash — are identical across the two containers
    assert(Multimodal.ImageIoDecoder.pixels(png).toSeq ==
      Multimodal.ImageIoDecoder.pixels(bmp).toSeq)
    val ds = Seq(
      Multimodal.MediaRow(1L, png, "image/png"),
      Multimodal.MediaRow(2L, bmp, "image/bmp")).toDS()
    val feats = Multimodal.extractFeatures(ds, Multimodal.ImageIoDecoder)
      .collect().map(r => r.doc_id -> r.checksum).toMap
    assert(feats(1L) == feats(2L), "raster checksums must collapse")
    val ph = Multimodal.phash(ds, Multimodal.ImageIoDecoder)
      .collect().map(r => r.doc_id -> r.phash).toMap
    assert(ph(1L) == ph(2L), "perceptual hashes must collapse")
    // the near-dup pipeline pairs them: identical hash → Hamming 0
    val bh = Multimodal.blockHash(ds, blocks = 48, decoder = Multimodal.ImageIoDecoder)
      .collect().map(r => r.doc_id -> r.blockhash).toMap
    assert(bh(1L) == bh(2L))
  }

  test("ImageIO: RGB decodes through the integer luma path deterministically") {
    // hand-build an RGB image, encode as PNG, expect 601 luma truncation
    val img = new java.awt.image.BufferedImage(2, 1,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000) // pure red → 299*255/1000 = 76
    img.setRGB(1, 0, 0x00ff00) // pure green → 587*255/1000 = 149
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val px = Multimodal.ImageIoDecoder.pixels(bos.toByteArray)
    assert(px.map(_ & 0xff).toSeq == Seq(299 * 255 / 1000, 587 * 255 / 1000))
  }

  test("ImageIO: an undecodable payload fails loudly, like a real codec") {
    intercept[IllegalArgumentException] {
      Multimodal.ImageIoDecoder.pixels("not an image".getBytes)
    }
  }

  test("sampleFramesReal seeks: a corrupt SKIPPED frame is never parsed; sampled frames decode") {
    val mk = (seed: Int) => Multimodal.encodeImage(4, 4,
      Array.tabulate(16)(i => ((i * seed + 7) % 96).toByte))
    val frames = Seq(mk(3), mk(5), mk(11))
    val payload = Multimodal.FrameContainer.encode(frames)
    // corrupt frame 1's PNG bytes IN PLACE (length prefix intact): any
    // parse of it throws, so stride-2 sampling passing proves the seek
    // math skips its bytes entirely
    val idx = Multimodal.FrameContainer.index(payload)
    val (off1, len1) = idx(1)
    java.util.Arrays.fill(payload, off1, off1 + len1, 0x5a.toByte)
    val ds = Seq(Multimodal.MediaRow(1L, payload, "video/x-gfr")).toDS()
    val sampled = Multimodal.sampleFramesReal(ds, stride = 2,
      Multimodal.ImageIoDecoder).collect().sortBy(_.frame_idx)
    assert(sampled.map(_.frame_idx).toSeq == Seq(0L, 2L))
    assert(sampled(0).raster.toSeq == Multimodal.ImageIoDecoder.pixels(frames(0)).toSeq)
    assert(sampled(1).raster.toSeq == Multimodal.ImageIoDecoder.pixels(frames(2)).toSeq)
    // stride 1 must hit the corrupt frame and fail loudly
    intercept[org.apache.spark.SparkException] {
      Multimodal.sampleFramesReal(ds, stride = 1, Multimodal.ImageIoDecoder).collect()
    }
  }

  test("AviMjpeg: container round-trips frame BYTES bit-exactly; structure is real RIFF/AVI") {
    val mk = (seed: Int) => Multimodal.encodeJpeg(8, 8,
      Array.tabulate(64)(i => ((i * seed + 11) % 96 + 32).toByte))
    val frames = Seq(mk(3), mk(5), mk(11))
    val avi = Multimodal.AviMjpeg.encode(frames, 8, 8)
    // a standard RIFF AVI other tools would accept: magic + hdrl + idx1
    assert(new String(avi.take(4), "US-ASCII") == "RIFF")
    assert(new String(avi.slice(8, 12), "US-ASCII") == "AVI ")
    assert(new String(avi.slice(20, 24), "US-ASCII") == "hdrl")
    val idx = Multimodal.AviMjpeg.index(avi)
    assert(idx.size == 3)
    // the container is LOSSLESS on frame bytes (only the codec inside is
    // lossy): every idx1-resolved slice equals the muxed JPEG exactly
    idx.zipWithIndex.foreach { case ((off, len), i) =>
      assert(java.util.Arrays.equals(
        Multimodal.AviMjpeg.frame(avi, off, len), frames(i)), s"frame $i")
      // each JPEG is genuinely decodable through ImageIO
      assert(Multimodal.ImageIoDecoder.pixels(frames(i)).length == 64)
    }
  }

  test("AviMjpeg: malformed containers fail loudly (magic, truncation, missing idx1)") {
    val avi = Multimodal.AviMjpeg.encode(
      Seq(Multimodal.encodeJpeg(4, 4, Array.tabulate(16)(_.toByte))), 4, 4)
    intercept[IllegalArgumentException] {
      Multimodal.AviMjpeg.index("RIFFxxxxWAVE".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] {
      Multimodal.AviMjpeg.index(java.util.Arrays.copyOf(avi, avi.length - 20))
    }
    // blank out the idx1 fourcc: a demuxer that required no index would
    // have to scan movi — ours refuses instead (AVIF_HASINDEX contract)
    val noIdx = avi.clone()
    val p = noIdx.length - 24 // 'idx1' + size + one 16-byte entry
    assert(new String(noIdx, p, 4, "US-ASCII") == "idx1")
    noIdx(p) = 'J'.toByte
    intercept[IllegalArgumentException] { Multimodal.AviMjpeg.index(noIdx) }
  }

  test("sampleFramesAvi seeks via idx1: a corrupt SKIPPED frame is never parsed") {
    val mk = (seed: Int) => Multimodal.encodeJpeg(8, 8,
      Array.tabulate(64)(i => ((i * seed + 7) % 96 + 32).toByte))
    val frames = Seq(mk(3), mk(5), mk(11))
    val payload = Multimodal.AviMjpeg.encode(frames, 8, 8)
    val idx = Multimodal.AviMjpeg.index(payload)
    val (off1, len1) = idx(1)
    java.util.Arrays.fill(payload, off1, off1 + len1, 0x5a.toByte)
    val ds = Seq(Multimodal.MediaRow(1L, payload, "video/avi")).toDS()
    val sampled = Multimodal.sampleFramesAvi(ds, stride = 2,
      Multimodal.ImageIoDecoder).collect().sortBy(_.frame_idx)
    assert(sampled.map(_.frame_idx).toSeq == Seq(0L, 2L))
    assert(sampled(0).raster.toSeq == Multimodal.ImageIoDecoder.pixels(frames(0)).toSeq)
    assert(sampled(1).raster.toSeq == Multimodal.ImageIoDecoder.pixels(frames(2)).toSeq)
    // stride 1 must hit the corrupt frame and fail loudly
    intercept[org.apache.spark.SparkException] {
      Multimodal.sampleFramesAvi(ds, stride = 1, Multimodal.ImageIoDecoder).collect()
    }
  }

  test("AviMjpeg raw stream: odd-width DIB round-trips pixels bit-exactly (stride pad + bottom-up)") {
    // width 6 → stride 8: two pad bytes per row, rows stored bottom-up
    val (w, h) = (6, 3)
    assert(Multimodal.AviMjpeg.rawStride(w) == 8)
    val rasters = (0 until 3).map(f =>
      Array.tabulate(w * h)(i => ((i * 7 + f * 31 + 40) % 200).toByte))
    val avi = Multimodal.AviMjpeg.encodeRawGray(rasters, w, h)
    // geometry comes from the real strf read: 8 bpp, BI_RGB
    val (gw, gh, bits, comp) = Multimodal.AviMjpeg.geometry(avi)
    assert((gw, gh, bits) == (w, h, 8) && comp == "\u0000\u0000\u0000\u0000")
    val idx = Multimodal.AviMjpeg.index(avi)
    assert(idx.size == 3)
    idx.zipWithIndex.foreach { case ((off, len), i) =>
      val back = Multimodal.AviMjpeg.rawGrayFrame(
        Multimodal.AviMjpeg.frame(avi, off, len), w, h)
      assert(back.toSeq == rasters(i).toSeq, s"frame $i pixels diverged")
    }
    // the MJPEG variant's geometry reads 24bpp/MJPG through the same path
    val jpgAvi = Multimodal.AviMjpeg.encode(
      Seq(Multimodal.encodeJpeg(8, 8, Array.tabulate(64)(_.toByte))), 8, 8)
    val (_, _, jb, jc) = Multimodal.AviMjpeg.geometry(jpgAvi)
    assert(jb == 24 && jc == "MJPG")
  }

  test("sampleFramesAviRaw: idx1 seek honesty + exact pixels; MJPEG payload refused") {
    val (w, h) = (8, 8)
    val rasters = (0 until 3).map(f =>
      Array.tabulate(w * h)(i => ((i * 11 + f * 53 + 32) % 96).toByte))
    val payload = Multimodal.AviMjpeg.encodeRawGray(rasters, w, h)
    val idx = Multimodal.AviMjpeg.index(payload)
    val (off1, len1) = idx(1)
    java.util.Arrays.fill(payload, off1, off1 + len1, 0x5a.toByte) // corrupt skipped frame
    val ds = Seq(Multimodal.MediaRow(1L, payload, "video/avi")).toDS()
    val sampled = Multimodal.sampleFramesAviRaw(ds, stride = 2)
      .collect().sortBy(_.frame_idx)
    assert(sampled.map(_.frame_idx).toSeq == Seq(0L, 2L))
    assert(sampled(0).raster.toSeq == rasters(0).toSeq)
    assert(sampled(2 / 2).raster.toSeq == rasters(2).toSeq)
    // raw frames carry no self-describing header, so a corrupt SAMPLED frame
    // surfaces as wrong pixels, not a parse error — the hash-exact oracle is
    // what catches it; a WRONG STREAM TYPE (MJPEG) fails loudly here
    val jpgAvi = Multimodal.AviMjpeg.encode(
      Seq(Multimodal.encodeJpeg(w, h, rasters(0))), w, h)
    intercept[org.apache.spark.SparkException] {
      Multimodal.sampleFramesAviRaw(
        Seq(Multimodal.MediaRow(2L, jpgAvi, "video/avi")).toDS(), stride = 1).collect()
    }
  }

  test("encodeJpeg at q=1.0: gray round-trip error ≤ 1 on noisy ASCII-range rasters") {
    // anchors LlmOps.AviTol = 2: the measured bound is 1, the gate keeps
    // margin without admitting a wrong frame (whole ASCII bytes apart)
    val maxErr = (0 until 50).map { s =>
      val gray = Array.tabulate(64)(i => ((s * 1103515245 + i * 12345) % 95 + 32).toByte)
      val dec = Multimodal.ImageIoDecoder.pixels(Multimodal.encodeJpeg(8, 8, gray))
      gray.zip(dec).map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }.max
    }.max
    assert(maxErr <= 1, s"q=1.0 JPEG error grew: $maxErr")
  }

  test("WavCodec: 8-bit PCM WAV encode→decode round-trips samples bit-exactly") {
    val pcm = Array.tabulate(200)(i => ((i * 31 + 3) % 256).toByte)
    val wav = Multimodal.WavCodec.encode(pcm)
    // a real RIFF container
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val (rate, ch, back) = Multimodal.WavCodec.decode(wav)
    assert(rate == 8000f && ch == 1)
    assert(back.toSeq == pcm.toSeq)
    // malformed payloads fail loudly, like a real codec
    intercept[IllegalArgumentException] {
      Multimodal.WavCodec.decode("not a wav".getBytes)
    }
  }

  test("audioFeatures: integer window energy over DECODED samples") {
    val pcm = Array.tabulate(64)(i => (if (i < 32) 128 else 130).toByte)
    val ds = Seq(Multimodal.MediaRow(5L,
      Multimodal.WavCodec.encode(pcm), "audio/wav")).toDS()
    val f = Multimodal.audioFeatures(ds, windows = 2).collect()(0)
    assert(f.n_samples == 64 && f.sample_rate == 8000L)
    assert(f.win_energy == Seq(0L, 64L)) // |130-128| * 32
  }

  test("resampleLinear: identity, boundary clamp, toward-zero truncation") {
    val pcm = Array[Byte](10, 20, 30, 40)
    // identity ratio reproduces the input exactly
    assert(Multimodal.resampleLinear(pcm, 1, 1).toSeq == Seq(10, 20, 30, 40))
    // upsample ×2: m=8, out[j] brackets position j·4/8 = j/2
    // j=1: k=0,r=4,m=8 → 10 + (20-10)*4/8 = 15; j=7: k=3 → clamp k1=3 → 40
    assert(Multimodal.resampleLinear(pcm, 2, 1).toSeq ==
      Seq(10, 15, 20, 25, 30, 35, 40, 40))
    // DECREASING pair pins toward-zero truncation (floor would differ):
    // pcm=(130,129), up ×2 → j=1: 130 + (-1)*1/2 = 130 − trunc(0.5) = 130
    assert(Multimodal.resampleLinear(Array(130.toByte, 129.toByte), 2, 1).toSeq ==
      Seq(130, 130, 129, 129))
    // downsample ×1/2 keeps every other position: j·4/2 → k = 2j exactly
    assert(Multimodal.resampleLinear(pcm, 1, 2).toSeq == Seq(10, 30))
  }

  test("audioResample: per-window signatures over DECODED samples") {
    // 4 samples, up ×3/2 → m=6: j·4/6 → (k,r): (0,0)(0,4)(1,2)(2,0)(2,4)(3,2)
    // pcm=(128,134,128,134): out = 128, 128+6*4/6=132, 134+(-6)*2/6=132,
    //                              128, 128+6*4/6=132, 134
    val pcm = Array[Byte](128.toByte, 134.toByte, 128.toByte, 134.toByte)
    val ds = Seq(Multimodal.MediaRow(9L,
      Multimodal.WavCodec.encode(pcm), "audio/wav")).toDS()
    val rows = Multimodal.audioResample(ds, Seq(("up", 3, 2)), windows = 2)
      .collect().sortBy(_.w)
    assert(rows.length == 2 && rows.forall(r => r.leg == "up" && r.n_out == 6L))
    // windows: j 0..2 → w 0, j 3..5 → w 1
    assert(rows(0).energy == 0L + 4L + 4L)
    assert(rows(0).wsum == 128L * 1 + 132L * 2 + 132L * 3)
    assert(rows(1).energy == 0L + 4L + 6L)
    assert(rows(1).wsum == 128L * 4 + 132L * 5 + 134L * 6)
  }

  test("spectral: integer DFT energies match a naive reference; table pins") {
    import Multimodal.SpectralTable._
    // table pins: bin 0 row is the all-32768 DC correlator, sin row 0 is 0
    assert(cosQ(0).forall(_ == Scale) && sinQ(0).forall(_ == 0L))
    assert(cosQ(1)(0) == Scale && sinQ(2)(8) == 0L) // sin(π) quantizes to 0
    // one window of a pure bin-2 cosine: energy concentrates in bin 2
    val pcm = Array.tabulate(N)(n =>
      (128 + math.round(100 * StrictMath.cos(2 * math.Pi * 2 * n / N))).toByte)
    val ds = Seq(Multimodal.MediaRow(3L,
      Multimodal.WavCodec.encode(pcm), "audio/wav")).toDS()
    val rows = Multimodal.spectral(ds).collect().sortBy(_.bin)
    assert(rows.length == K && rows.forall(_.w == 0L))
    // naive reference with the same table
    val expect = (0 until K).map { k =>
      val re = (0 until N).map(n => ((pcm(n) & 0xff) - 128L) * cosQ(k)(n)).sum
      val im = (0 until N).map(n => ((pcm(n) & 0xff) - 128L) * sinQ(k)(n)).sum
      re * re + im * im
    }
    assert(rows.map(_.energy).toSeq == expect)
    assert(expect(2) == expect.max && expect(2) > 100L * expect(5))
  }

  test("audioFingerprint: sign-of-second-difference bits pack per (w,k)") {
    import Multimodal.SpectralTable._
    // two windows: silence then a bin-1 tone — exactly the (1,1)..(1,7)
    // bits of window 1 can fire; recompute them from spectral()
    val pcm = Array.tabulate(2 * N)(n =>
      if (n < N) 128.toByte
      else (128 + math.round(80 * StrictMath.cos(2 * math.Pi * (n - N) / N))).toByte)
    val ds = Seq(Multimodal.MediaRow(9L,
      Multimodal.WavCodec.encode(pcm), "audio/wav")).toDS()
    val fp = Multimodal.audioFingerprint(ds).collect()(0).fp
    val e = Multimodal.spectral(ds).collect()
      .map(r => (r.w.toInt, r.bin.toInt) -> r.energy).toMap
    var expect = 0L
    for (k <- 1 until K) {
      val d = (e((1, k)) - e((1, k - 1))) - (e((0, k)) - e((0, k - 1)))
      if (d > 0) expect |= 1L << (0 * (K - 1) + (k - 1))
    }
    assert(fp == expect && fp != 0L)
  }

  test("sampleFrames covers every stride-th frame with exact byte slices") {
    val t = (0 until 300).map(i => ('a' + i % 26).toChar).mkString
    val frames = Multimodal.sampleFrames(media(7L -> t), stride = 2, frameBytes = 64)
      .collect().sortBy(_.frame_idx)
    // 300 bytes / 64 = 4 full-ish frames → indices 0 and 2 at stride 2
    assert(frames.map(_.frame_idx).toSeq == Seq(0L, 2L))
    assert(new String(frames(0).frame, "UTF-8") == t.substring(0, 64))
    assert(new String(frames(1).frame, "UTF-8") == t.substring(128, 192))
  }

  test("keyframes MJPEG leg: real lossy decode, decisions inside the margins") {
    val (w, h) = (8, 8)
    val base = Array.tabulate(w * h)(i => ((i * 37 + 11) % 64 + 32).toByte)
    // scenes of 2: bright scene 1 (+96), jitter +2 on odd frames
    val frames = (0 until 6).map { f =>
      val bit = if ((f / 2) % 3 == 1) 96 else 0
      val jit = if (f % 2 == 1) 2 else 0
      base.map(b => ((b & 0xff) + bit + jit).toByte)
    }
    val avi = Multimodal.AviMjpeg.encode(
      frames.map(Multimodal.encodeJpeg(w, h, _)), w, h)
    val rows = Multimodal.keyframes(Seq(Multimodal.MediaRow(4L, avi, "video/avi")).toDS(),
      threshold = 48L * w * h).collect().sortBy(_.frame_idx)
    assert(rows.map(_.is_key).toSeq ==
      Seq(true, false, true, false, true, false))
    // the bounded-error claim itself: in-scene decoded MADs sit far below
    // the threshold, cut MADs far above (margin ≥ 23 intensities/pixel)
    val mads = rows.map(_.mad)
    assert(mads(1) < 25L * w * h && mads(3) < 25L * w * h && mads(5) < 25L * w * h)
    assert(mads(2) > 71L * w * h && mads(4) > 71L * w * h)
  }

  test("keyframes: MAD shot-boundary flags through the real raw-AVI demux") {
    val (w, h) = (8, 8)
    // two scenes of two frames: within a scene +1 brightness (MAD = 64),
    // the cut re-bases the raster (MAD = 64*10 = 640)
    val base = Array.tabulate(w * h)(i => (32 + i % 64).toByte)
    val rasters = Seq(
      base,
      base.map(b => (b + 1).toByte),
      base.map(b => (b + 11).toByte), // cut: +10 vs previous frame
      base.map(b => (b + 12).toByte))
    val payload = Multimodal.AviMjpeg.encodeRawGray(rasters, w, h)
    val ds = Seq(Multimodal.MediaRow(9L, payload, "video/avi")).toDS()
    val rows = Multimodal.keyframes(ds, threshold = 320L)
      .collect().sortBy(_.frame_idx)
    assert(rows.map(_.frame_idx).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(rows.map(_.mad).toSeq == Seq(0L, 64L, 640L, 64L))
    assert(rows.map(_.is_key).toSeq == Seq(true, false, true, false))
  }

  test("videoFrameHashes: per-frame blockhash through the raw-AVI demux") {
    val (w, h) = (8, 8)
    val f0 = Array.tabulate(w * h)(i => (i % 97).toByte)
    val f1 = Array.tabulate(w * h)(i => ((i * 7) % 131).toByte)
    val payload = Multimodal.AviMjpeg.encodeRawGray(Seq(f0, f1), w, h)
    val ds = Seq(Multimodal.MediaRow(3L, payload, "video/avi")).toDS()
    val rows = Multimodal.videoFrameHashes(ds, blocks = 48)
      .collect().sortBy(_.frame_idx)

    // plain-Scala reference: mean-threshold bit per equal byte span
    def ref(px: Array[Byte]): Long = {
      val n = px.length
      val sums = new Array[Long](48); val cnts = new Array[Long](48)
      px.indices.foreach { j =>
        val k = j * 48 / n; sums(k) += px(j) & 0xffL; cnts(k) += 1
      }
      val total = sums.sum
      (0 until 48).foldLeft(0L) { (acc, k) =>
        if (cnts(k) > 0 && BigInt(sums(k)) * n > BigInt(total) * cnts(k))
          acc | (1L << k) else acc
      }
    }
    assert(rows.map(_.frame_idx).toSeq == Seq(0L, 1L))
    assert(rows.map(_.fhash).toSeq == Seq(ref(f0), ref(f1)))
    assert(ref(f0) != ref(f1)) // non-vacuous: distinct content hashes apart

    // near-dup stability: a few-byte perturbation stays Hamming-close
    val f0b = f0.clone(); f0b(5) = (f0b(5) + 3).toByte
    assert(java.lang.Long.bitCount(ref(f0) ^ ref(f0b)) <= 2)

    // the MJPEG leg must refuse: its pixels are decoder arithmetic, not
    // oracle-replayable
    val jpeg = Multimodal.AviMjpeg.encode(
      Seq(Multimodal.encodeJpeg(w, h, f0)), w, h)
    val ex = intercept[org.apache.spark.SparkException] {
      Multimodal.videoFrameHashes(
        Seq(Multimodal.MediaRow(4L, jpeg, "video/avi")).toDS(), 48).collect()
    }
    assert(ex.getMessage.contains("uncompressed") ||
      Option(ex.getCause).exists(_.getMessage.contains("uncompressed")))
  }
}
