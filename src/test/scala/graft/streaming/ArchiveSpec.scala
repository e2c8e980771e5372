package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** [[RawArchive]] — the raw-event spool + reprocessing replay loop: the
  * rolling edge writer's layout must be exactly what Spark reads back
  * (gzip NDJSON under hive `dt=` dirs), a date-range replay must prune at
  * the file level, and the edge wiring (IngestServer spool → archive) must
  * capture events byte-for-byte before any parsing. */
class ArchiveSpec extends SparkSuite {

  private def tmp() = java.nio.file.Files.createTempDirectory("graft_arch_").toString

  private val Day1 = 1704067200000L // 2024-01-01T00:00:00Z
  private val Day2 = Day1 + 86400000L

  test("rolling writer: segments roll at maxBytes; gzip content is the exact line stream") {
    val dir = tmp()
    val w = new RawArchive.Writer(dir, maxBytes = 64)
    val lines = (0 until 20).map(i => s"""{"i":$i,"pad":"xxxxxxxxxx"}""")
    lines.foreach(l => w.log("d1", Day1, l))
    w.close()
    val files = new java.io.File(s"$dir/d1/dt=2024-01-01").listFiles().sortBy(_.getName)
    assert(files.length > 1, "expected the 64-byte budget to roll segments")
    assert(files.forall(_.getName.matches("events-\\d{5}\\.ndjson\\.gz")))
    // decompressed concatenation = the logged lines, in order
    val back = files.flatMap { f =>
      val in = new java.util.zip.GZIPInputStream(new java.io.FileInputStream(f))
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    }
    assert(back.toSeq == lines)
  }

  test("a restarted writer resumes AFTER existing segments — sealed archive bytes are never truncated") {
    val dir = tmp()
    val w1 = new RawArchive.Writer(dir, maxBytes = 32)
    (0 until 4).foreach(i => w1.log("d1", Day1, s"""{"gen":1,"i":$i,"pad":"xxxxxxxx"}"""))
    w1.close()
    val sealedFiles = new java.io.File(s"$dir/d1/dt=2024-01-01").listFiles().map(f =>
      f.getName -> f.length()).toMap
    assert(sealedFiles.size > 1)
    // the crash/restart path: a NEW writer over the same spool dir
    val w2 = new RawArchive.Writer(dir, maxBytes = 32)
    w2.log("d1", Day1, """{"gen":2,"i":0}""")
    w2.close()
    val after = new java.io.File(s"$dir/d1/dt=2024-01-01").listFiles().map(f =>
      f.getName -> f.length()).toMap
    // every pre-restart segment survives byte-identical; gen-2 got a NEW file
    sealedFiles.foreach { case (n, len) => assert(after(n) == len, s"$n truncated") }
    assert(after.size == sealedFiles.size + 1)
    val back = RawArchive.readRange(spark, s"$dir/d1", "2024-01-01")
      .count()
    assert(back == 5)
  }

  test("writer output reads back through Spark with partition discovery; range replay prunes files") {
    val dir = tmp()
    val w = new RawArchive.Writer(dir)
    (0 until 5).foreach(i => w.log("d1", Day1, s"""{"day":1,"i":$i}"""))
    (0 until 7).foreach(i => w.log("d1", Day2, s"""{"day":2,"i":$i}"""))
    w.close()
    val all = RawArchive.readRange(spark, s"$dir/d1", "2024-01-01")
    assert(all.count() == 12)
    assert(all.filter(col("dt") === "2024-01-02").count() == 7)
    // pruning: a range starting at day 2 must OPEN only day-2 files
    val pruned = RawArchive.readRange(spark, s"$dir/d1", "2024-01-02")
    val opened = pruned.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(opened.nonEmpty && opened.forall(_.contains("dt=2024-01-02")),
      s"day-1 files opened: ${opened.mkString(",")}")
    assert(pruned.count() == 7)
  }

  test("distributed archive() and the edge writer produce interchangeable layouts") {
    import spark.implicits._
    val dir = tmp()
    val df = Seq(("""{"a":1}""", "2024-01-01"), ("""{"a":2}""", "2024-01-02"))
      .toDF("raw", "dt")
    RawArchive.archive(df, s"$dir/d1")
    val w = new RawArchive.Writer(dir)
    w.log("d1", Day1, """{"a":3}""")
    w.close()
    val back = RawArchive.readRange(spark, s"$dir/d1", "2024-01-01")
      .select("value", "dt").as[(String, String)].collect().toSet
    assert(back == Set(("""{"a":1}""", "2024-01-01"), ("""{"a":2}""", "2024-01-02"),
      ("""{"a":3}""", "2024-01-01")))
  }

  test("vacuum expires whole partitions strictly older than the TTL; newer days untouched") {
    val dir = tmp()
    val w = new RawArchive.Writer(dir)
    w.log("d1", Day1, """{"d":1}""")          // 2024-01-01
    w.log("d1", Day2, """{"d":2}""")          // 2024-01-02
    w.log("d1", Day2 + 86400000L, """{"d":3}""") // 2024-01-03
    w.close()
    // "today" = 2024-01-05; TTL 3 days → cutoff 2024-01-02: only day 1 goes
    val expired = RawArchive.vacuum(dir, "d1", ttlDays = 3,
      todayMs = () => Day1 + 4 * 86400000L)
    assert(expired == Seq("2024-01-01"))
    assert(!new java.io.File(s"$dir/d1/dt=2024-01-01").exists())
    val left = RawArchive.readRange(spark, s"$dir/d1", "2024-01-01")
      .select("dt").collect().map(_.getString(0)).toSet
    assert(left == Set("2024-01-02", "2024-01-03"))
    // idempotent: nothing else crosses the cutoff on a re-run
    assert(RawArchive.vacuum(dir, "d1", 3, () => Day1 + 4 * 86400000L).isEmpty)
  }

  test("ingest edge wiring: events spooled through IngestServer land in the archive pre-parse") {
    val dir = tmp()
    val w = new RawArchive.Writer(dir)
    val spooled = scala.collection.mutable.ArrayBuffer[String]()
    val srv = new graft.http.IngestServer(
      spool = (dest, _, raw) => { w.log(dest, Day1, raw); spooled += raw; () },
      bulkLoad = (_, _, _, _, _) => 0L).start()
    try {
      val url = new java.net.URI(s"http://127.0.0.1:${srv.port}/post/d1?tableName=events").toURL
      Seq("""{"id":1,"v":"x"}""", """{"id":2,"v":"y"}""").foreach { body =>
        val c = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
        c.setRequestMethod("POST"); c.setDoOutput(true)
        c.getOutputStream.write(body.getBytes("UTF-8"))
        assert(c.getResponseCode == 200)
        c.getInputStream.readAllBytes(); c.disconnect()
      }
    } finally srv.stop()
    w.close()
    val back = RawArchive.readRange(spark, s"$dir/d1", "2024-01-01")
      .select("value").collect().map(_.getString(0)).toSet
    // the archive holds the RAW bytes — byte-identical to what was POSTed
    assert(back == spooled.toSet && back == Set("""{"id":1,"v":"x"}""", """{"id":2,"v":"y"}"""))
  }
}
