package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** In-batch pk dedup semantics (abstract_transactional.go:439-496) and the
  * collision-free exact-content hash. Mirrors the reference's
  * repeated_ids / dedup_with_discr fixtures. */
class DedupSpec extends SparkSuite {

  private def events = df("id BIGINT, pk STRING, discr BIGINT, v STRING", Seq(
    Row(1L, "a", 10L, "first"),
    Row(2L, "a", 30L, "winner-by-discr"),
    Row(3L, "a", 20L, "middle"),
    Row(4L, "b", 5L, "tie1"),
    Row(5L, "b", 5L, "tie2-newest-wins"),
    Row(6L, "c", null, "only")))

  test("no discriminator: later arrival wins per pk") {
    val out = Dedup.inBatch(events, Seq("pk"), arrival = Some(col("id")))
    assert(canon(out.select("pk", "v")) == Seq(
      Seq("a", "middle"), Seq("b", "tie2-newest-wins"), Seq("c", "only")))
  }

  test("discriminator: highest discriminator wins, ties to newest arrival") {
    val out = Dedup.inBatch(events, Seq("pk"),
      discriminators = Seq("discr"), arrival = Some(col("id")))
    assert(canon(out.select("pk", "v")) == Seq(
      Seq("a", "winner-by-discr"), Seq("b", "tie2-newest-wins"), Seq("c", "only")))
  }

  test("null discriminator sorts last, row still survives") {
    val out = Dedup.inBatch(events, Seq("pk"), discriminators = Seq("discr"),
      arrival = Some(col("id")))
    assert(out.filter(col("pk") === "c").count() == 1)
  }

  test("default arrival (no explicit column): later source row wins") {
    // single input partition → monotonically_increasing_id follows source
    // order deterministically, reproducing Kafka/file arrival semantics
    val in = df("pk STRING, v STRING", Seq(
      Row("a", "first"), Row("a", "second"), Row("a", "last"))).coalesce(1)
    val out = Dedup.inBatch(in, Seq("pk"))
    assert(canon(out.select("v")) == Seq(Seq("last")))
  }

  test("composite pk dedups on the full key") {
    val in = df("a STRING, b STRING, id BIGINT", Seq(
      Row("x", "1", 1L), Row("x", "2", 2L), Row("x", "1", 3L)))
    val out = Dedup.inBatch(in, Seq("a", "b"), arrival = Some(col("id")))
    assert(out.count() == 2)
    assert(canon(out.filter(col("b") === "1").select("id")) == Seq(Seq("3")))
  }

  test("exact content hash: boundary shifts and nulls do NOT collide") {
    val in = df("x STRING, y STRING, id BIGINT", Seq(
      Row("ab", "c", 1L), Row("a", "bc", 2L), Row("abc", null, 3L), Row("abc", "", 4L)))
    val out = Dedup.exact(in, Seq("x", "y"), "id")
    assert(out.count() == 4) // all distinct under the JSON-struct hash
  }

  test("exact dedup keeps smallest keepBy and counts the group") {
    val in = df("x STRING, id BIGINT", Seq(
      Row("same", 5L), Row("same", 2L), Row("same", 9L), Row("other", 1L)))
    val out = Dedup.exact(in, Seq("x"), "id")
    assert(canon(out.select("x", "id", "dup_count")) == Seq(
      Seq("other", "1", "1"), Seq("same", "2", "3")))
  }

  test("exact dedup: NULL keepBy ranks first and an all-NULL group keeps a real row") {
    // min_by skips null ordering keys — the null-safe (isNotNull, keepBy)
    // key must preserve the window form's asc_nulls_first election and
    // never emit an all-NULL phantom survivor
    val in = df("x STRING, id BIGINT", Seq(
      Row("same", null), Row("same", null),
      Row("mix", null), Row("mix", 5L), Row("other", 7L)))
    val out = Dedup.exact(in, Seq("x"), "id").collect()
      .map(r => r.getString(0) -> ((if (r.isNullAt(1)) None else Some(r.getLong(1))), r.getLong(2)))
      .toMap
    assert(out("same") == ((None, 2L)), s"all-NULL group broke: ${out("same")}")
    assert(out("mix") == ((None, 2L)), s"nulls-first election broke: ${out("mix")}")
    assert(out("other") == ((Some(7L), 1L)))
  }

  test("multiple discriminators: lexicographic desc_nulls_last across BOTH, then arrival") {
    // the max_by struct key replays `d1 DESC NULLS LAST, d2 DESC NULLS
    // LAST, arrival DESC` — a null in d1 loses to ANY non-null d1 even
    // when its d2 is the global max, and a d1 tie falls through to d2
    val in = df("id BIGINT, pk STRING, d1 BIGINT, d2 BIGINT, v STRING", Seq(
      Row(1L, "a", null, 99L, "null-d1-big-d2"),
      Row(2L, "a", 1L, null, "d1-one-null-d2"),
      Row(3L, "a", 1L, 7L, "d1-tie-wins-on-d2"),
      Row(4L, "b", 5L, 1L, "older"),
      Row(5L, "b", 5L, 1L, "full-tie-newest-wins")))
    val out = Dedup.inBatch(in, Seq("pk"),
      discriminators = Seq("d1", "d2"), arrival = Some(col("id")))
    assert(canon(out.select("pk", "v")) == Seq(
      Seq("a", "d1-tie-wins-on-d2"), Seq("b", "full-tie-newest-wins")))
  }
}
