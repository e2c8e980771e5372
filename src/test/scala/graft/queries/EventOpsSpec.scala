package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** `ts` is epoch-NANOS int64 — the physical type the driver testdata uses. */
private[queries] case class Ev(event_id: Long, ts: Long, user_id: Long,
                               event_type: String, value: Double, props: String)

/** Event-analytics operators (CUBE/pivot/funnel/retention/gap-fill/SCD2/
  * Z-order), each checked against an exact Scala reference computed with the
  * same arithmetic, plus plan-shape assertions (no global sort, no
  * unbounded pair joins). */
class EventOpsSpec extends SparkSuite {
  import spark.implicits._

  private val Types = Vector("view", "click", "purchase", "signup", "error")
  private val DayMs = 86400000L
  private val WeekMs = 7L * DayMs
  private val T0 = 1704067200000L // 2024-01-01T00:00:00Z

  /** Synthetic gappy event stream (Tables.events contract). */
  private lazy val fixture: (String, Seq[Ev]) = {
    val rnd = new scala.util.Random(42L)
    val rows = (0 until 600).map { i =>
      val tsMs = T0 + rnd.nextInt(25) * DayMs + rnd.nextInt(DayMs.toInt)
      Ev(i.toLong, tsMs * 1000000L, rnd.nextInt(8).toLong,
        Types(rnd.nextInt(Types.length)),
        math.floor(rnd.nextDouble() * 5000) / 100.0, "{}")
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_events_").toString
    rows.toDF().write.mode("overwrite").parquet(s"$dir/events.parquet")
    (dir, rows)
  }

  test("q_anomaly: planted spike flags; quiet days don't; equals the integer reference") {
    // type "view": 5 events/day for 9 days + a 50-event spike day;
    // type "click": flat 4/day — must never flag
    val rows =
      (for (day <- 0 until 9; i <- 0 until 5) yield
        Ev((day * 100 + i).toLong, (T0 + day * DayMs + i * 1000L) * 1000000L,
          i.toLong, "view", 1.0, "{}")) ++
      (for (i <- 0 until 50) yield
        Ev((5000 + i).toLong, (T0 + 9 * DayMs + i * 1000L) * 1000000L,
          i.toLong, "view", 1.0, "{}")) ++
      (for (day <- 0 until 10; i <- 0 until 4) yield
        Ev((9000 + day * 10 + i).toLong, (T0 + day * DayMs + i * 1000L) * 1000000L,
          i.toLong, "click", 1.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("graft_anom_").toString
    rows.toDF().write.mode("overwrite").parquet(s"$dir/events.parquet")

    def dayStr(ms: Long): String =
      java.time.Instant.ofEpochMilli(ms).atZone(java.time.ZoneOffset.UTC)
        .toLocalDate.toString
    val daily = rows.groupBy(e => (e.event_type, dayStr(e.ts / 1000000L)))
      .map { case ((t, day), es) => (t, day, es.size.toLong) }.toSeq
    val exp = (for {
      (t, ds) <- daily.groupBy(_._1).toSeq
      n = ds.size.toLong; s = ds.map(_._3).sum; ss = ds.map(x => x._3 * x._3).sum
      (_, day, cnt) <- ds
      if (n * cnt - s) * (n * cnt - s) > 4L * (n * ss - s * s)
    } yield (t, day, cnt)).toSet

    val got = Registry.all("q_anomaly").fn(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == exp, s"got=$got exp=$exp")
    assert(got.contains(("view", "2024-01-10", 50L)), s"spike not flagged: $got")
    assert(!got.exists(_._1 == "click"), s"flat series flagged: $got")
  }

  test("bloomSemiReduce: keeps every true match, prunes the disjoint bulk") {
    val dim = Seq(1L, 2L, 3L).toDF("k")
    val fact = (1L to 1000L).toDF("fk")
    val red = Relational.bloomSemiReduce(fact, "fk", dim)
      .collect().map(_.getLong(0)).toSet
    assert(Set(1L, 2L, 3L).subsetOf(red), s"true matches dropped: $red")
    assert(red.size < 100, s"no pruning happened: ${red.size} of 1000 kept")
  }

  test("q_skyline: 300 random points equal the brute-force Pareto frontier; duplicates co-survive") {
    val rnd = new scala.util.Random(11L)
    val base = java.time.LocalDate.of(1995, 1, 1)
    val pts = (1L to 298L).map(i =>
      (i, math.floor(rnd.nextDouble() * 10000) / 100.0, rnd.nextInt(1000))) ++
      Seq((900L, 20000.0, 500), (901L, 20000.0, 500)) // duplicate extreme point
    val dir = java.nio.file.Files.createTempDirectory("graft_sky_").toString
    pts.map { case (id, price, day) =>
      (id, price, java.sql.Timestamp.valueOf(base.plusDays(day).atStartOfDay)) }
      .toDF("o_orderkey", "o_totalprice", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")

    val dayOf = pts.map { case (id, p, dd) =>
      id -> base.plusDays(dd).toEpochDay }.toMap
    val brute = pts.filter { case (id, x, _) =>
      val y = dayOf(id)
      !pts.exists { case (id2, x2, _) =>
        val y2 = dayOf(id2)
        id2 != id && x2 >= x && y2 >= y && (x2 > x || y2 > y) }
    }.map(_._1).toSet

    val got = Registry.all("q_skyline").fn(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(got == brute, s"got=$got\nexp=$brute")
    assert(got.contains(900L) && got.contains(901L), "duplicate frontier points must co-survive")
  }

  test("fkRelation: planted orphans and null keys count exactly") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(9L), None, Some(3L), Some(9L)).toDF("fk")
    val row = Relational.fkRelation("c.fk->p", child, "fk", parent, "pk").collect().head
    assert((row.getString(0), row.getLong(1), row.getLong(2), row.getLong(3)) ==
      (("c.fk->p", 6L, 1L, 2L)))
  }

  private def tsMs(e: Ev): Long = e.ts / 1000000L
  /** DECIMAL(18,2) HALF_UP sum → double — the dec() aggregate twin. */
  private def decSum(vs: Seq[Double]): Double =
    vs.map(v => BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble

  // ---- SCD2 -------------------------------------------------------------

  test("qScd2 equals a per-user fold over (ts, event_id)-ordered runs") {
    val (dir, rows) = fixture
    val expected = rows.groupBy(_.user_id).toSeq.flatMap { case (u, evs) =>
      val sorted = evs.sortBy(e => (tsMs(e), e.event_id))
      // fold into runs of equal consecutive event_type
      val runs = sorted.foldLeft(Vector.empty[(String, Long, Long)]) { (acc, e) =>
        acc.lastOption match {
          case Some((st, from, n)) if st == e.event_type =>
            acc.init :+ ((st, from, n + 1))
          case _ => acc :+ ((e.event_type, tsMs(e), 1L))
        }
      }
      runs.zipWithIndex.map { case ((st, from, n), i) =>
        val validTo = if (i + 1 < runs.length) Some(runs(i + 1)._2) else None
        (u, (i + 1).toLong, st, from, validTo, n)
      }
    }
    val got = EventOps.qScd2(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getLong(5))).toSeq
    assert(got.sorted == expected.sorted)
    val plan = EventOps.qScd2(spark, dir).queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning"), plan)
  }

  // ---- funnel -----------------------------------------------------------

  test("qFunnel equals the staged min-timestamp reference") {
    val (dir, rows) = fixture
    val expected = rows.groupBy(_.user_id).toSeq.map { case (u, evs) =>
      def minAfter(t: String, lo: Option[Long]): Option[Long] = lo.flatMap { b =>
        val c = evs.filter(e => e.event_type == t && tsMs(e) >= b)
        if (c.isEmpty) None else Some(c.map(tsMs).min)
      }
      val tv = { val v = evs.filter(_.event_type == "view"); if (v.isEmpty) None else Some(v.map(tsMs).min) }
      val tc = minAfter("click", tv)
      val tp = minAfter("purchase", tc)
      (u, tv, tc, tp)
    }
    val got = EventOps.qFunnel(spark, dir).collect().map(r =>
      (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq
    assert(got.sorted == expected.sorted)
  }

  // ---- retention --------------------------------------------------------

  test("qRetention equals the cohort-set reference") {
    val (dir, rows) = fixture
    val active = rows.map(e => (e.user_id, tsMs(e) / WeekMs)).distinct
    val cohort = active.groupBy(_._1).map { case (u, ws) => u -> ws.map(_._2).min }
    val expected = active.groupBy { case (u, w) => (cohort(u), w - cohort(u)) }
      .map { case (k, us) => (k._1, k._2, us.map(_._1).distinct.size.toLong) }.toSeq
    val got = EventOps.qRetention(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.sorted == expected.sorted)
  }

  // ---- gap fill ---------------------------------------------------------

  test("qGapFill materializes every day in each user's span and carries totals forward") {
    val (dir, rows) = fixture
    val daily = rows.groupBy(e => (e.user_id, tsMs(e) / DayMs))
      .map { case (k, es) => k -> ((es.size.toLong, decSum(es.map(_.value)))) }
    val expected = rows.groupBy(_.user_id).toSeq.flatMap { case (u, evs) =>
      val days = evs.map(e => tsMs(e) / DayMs)
      (days.min to days.max).map { day =>
        val lastTotal = (days.min to day).reverse
          .collectFirst { case d0 if daily.contains((u, d0)) => daily((u, d0))._2 }
        (u, day, daily.get((u, day)).map(_._1).getOrElse(0L), lastTotal.get)
      }
    }
    val got = EventOps.qGapFill(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got.sorted == expected.sorted)
    val plan = EventOps.qGapFill(spark, dir).queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning"), plan)
  }

  // ---- CUBE / pivot -----------------------------------------------------

  test("qCube grand total, per-type and per-day slices match direct aggregation") {
    val (dir, rows) = fixture
    val out = EventOps.qCube(spark, dir).collect()
      .map(r => (Option(r.getString(0)),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        r.getLong(2), r.getLong(3), r.getDouble(4)))
    val grand = out.filter(_._3 == 3L)
    assert(grand.length == 1 && grand.head._4 == rows.length.toLong)
    assert(grand.head._5 == decSum(rows.map(_.value)))
    // gid=1: per-type subtotals (day nulled out)
    val perType = out.filter(o => o._3 == 1L).map(o => o._1.get -> o._4).toMap
    assert(perType == rows.groupBy(_.event_type).map { case (t, es) => t -> es.size.toLong })
    // gid=0: finest level row count = distinct (type, day) combos
    assert(out.count(_._3 == 0L) ==
      rows.map(e => (e.event_type, tsMs(e) / DayMs)).distinct.size)
  }

  test("qPivot cells equal filtered decimal sums (null when absent)") {
    val (dir, rows) = fixture
    val pivoted = EventOps.qPivot(spark, dir)
    val typeCols = pivoted.columns.drop(1).toSeq
    val got = pivoted.collect()
      .map(r => r.getLong(0) -> typeCols.zipWithIndex.map { case (t, i) =>
        t -> (if (r.isNullAt(i + 1)) None else Some(r.getDouble(i + 1)))
      }.toMap).toMap
    rows.groupBy(_.user_id).foreach { case (u, evs) =>
      Types.foreach { t =>
        val vs = evs.filter(_.event_type == t).map(_.value)
        val exp = if (vs.isEmpty) None else Some(decSum(vs))
        assert(got(u)(t) == exp, s"user $u type $t")
      }
    }
    // the pivot values are DECLARED (alphabetical), not discovered: all five
    // types appear as columns in the declared order
    assert(typeCols == Types.sorted)
  }

  // ---- Z-order ----------------------------------------------------------

  private def spread(x: Long): Long = {
    var v = x & 0xFFFFL
    v = (v | (v << 8)) & 0x00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0FL
    v = (v | (v << 2)) & 0x33333333L
    v = (v | (v << 1)) & 0x55555555L
    v
  }

  test("tZorder equals the Morton-interleave reference on wide-range keys") {
    // wide user/value ranges so the interleave exercises the high bits
    val rnd = new scala.util.Random(7L)
    val rows = (0 until 300).map { i =>
      Ev(i.toLong, (T0 + i * 1000L) * 1000000L, rnd.nextInt(60000).toLong,
        Types(i % Types.length), math.floor(rnd.nextDouble() * 65000) / 100.0, "{}")
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_zev_").toString
    rows.toDF().write.mode("overwrite").parquet(s"$dir/events.parquet")

    val expected = rows.map { e =>
      val vb = math.min(math.max(math.floor(e.value * 100.0).toLong, 0L), 65535L)
      val z = spread(e.user_id) | (spread(vb) << 1)
      (z >> 24, e.user_id, vb)
    }.groupBy(_._1).map { case (b, es) =>
      (b, es.size.toLong, es.map(_._2).min, es.map(_._2).max,
        es.map(_._3).min, es.map(_._3).max)
    }.toSeq
    val got = EventOps.tZorder(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got.sorted == expected.sorted)
    // a z-bucket pins the top 4 bits of BOTH 16-bit dims: every bucket's
    // bounding rectangle is at most 2^12 wide per dimension — the property
    // that makes file-level min/max stats prune on either column
    got.foreach { case (b, _, uMin, uMax, vMin, vMax) =>
      assert(uMax - uMin < 4096, s"bucket $b user span")
      assert(vMax - vMin < 4096, s"bucket $b value span")
    }
  }

  // ---- CDC apply --------------------------------------------------------

  test("qAttribution credits first/last preceding touch; untouched purchases go direct") {
    val (dir, rows) = fixture
    val out = EventOps.qAttribution(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    // independent replay over the fixture
    val byUser = rows.groupBy(_.user_id)
    val credits = byUser.values.flatMap { evs =>
      val ordered = evs.sortBy(e => (e.ts / 1000000L, e.event_id))
      ordered.zipWithIndex.collect {
        case (e, i) if e.event_type == "purchase" =>
          val touches = ordered.take(i).filter(_.event_type != "purchase")
          Seq(("first_touch", touches.headOption.map(_.event_type).getOrElse("direct"), e.value),
            ("last_touch", touches.lastOption.map(_.event_type).getOrElse("direct"), e.value))
      }.flatten
    }.toSeq
    val exp = credits.groupBy(c => (c._1, c._2)).map { case (k, cs) =>
      k -> ((cs.length.toLong,
        cs.map(c => BigDecimal(c._3).setScale(2, BigDecimal.RoundingMode.HALF_UP))
          .sum.toDouble))
    }
    assert(out == exp, s"$out vs $exp")
    assert(out.keys.map(_._1).toSet == Set("first_touch", "last_touch"))
  }

  test("d6CdcApply keeps only the latest non-delete change per entity, no window sort") {
    val (dir, rows) = fixture
    val expected = rows.groupBy(_.event_id / 3).toSeq.flatMap { case (ent, evs) =>
      val last = evs.maxBy(_.event_id)
      if (last.event_type == "error") None
      else Some((ent, last.event_id, last.value, tsMs(last)))
    }
    val got = EltOps.d6CdcApply(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(got.sorted == expected.sorted)
    // one max_by aggregate — no window, no sort, partials combine map-side
    val plan = EltOps.d6CdcApply(spark, dir).queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("rangepartitioning"), plan)
  }

  // ---- incremental aggregate maintenance --------------------------------

  test("d7IncrementalAgg: merged history partials + increment equals full recompute") {
    val (dir, rows) = fixture
    val expected = rows.groupBy(e => (e.user_id, e.event_type)).map { case ((u, t), es) =>
      (u, t, es.size.toLong, decSum(es.map(_.value)))
    }.toSeq
    val got = EventOps.d7IncrementalAgg(spark, dir).collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got.sorted == expected.sorted)
  }

  // ---- data-quality rules ----------------------------------------------

  test("tDqRules: one scan evaluates every rule; null predicates are not violations") {
    val rows = Seq(
      Ev(0L, (T0 + 1000) * 1000000L, 1L, "click", 5.0, """{"k":1}"""),
      Ev(1L, (T0 + 2000) * 1000000L, 1L, "weird", -3.0, """{"k":2}"""),   // type + range
      Ev(2L, (T0 + 3000) * 1000000L, 2L, "view", 2000.0, """{"nope":1}""")) // range + props
    val dir = java.nio.file.Files.createTempDirectory("graft_dq_").toString
    rows.toDF().write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventOps.tDqRules(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("value_not_null") == ((0L, 3L)))
    assert(got("value_in_range") == ((2L, 3L)))
    assert(got("known_type") == ((1L, 3L)))
    assert(got("ts_in_window") == ((0L, 3L)))
    assert(got("props_has_int_k") == ((1L, 3L)))
    // ONE scan: a single aggregate, no join, no shuffle beyond the partial
    val plan = EventOps.tDqRules(spark, dir).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
  }

  // ---- plan shapes ------------------------------------------------------

  test("tHistQuantile lands within one bin width of the exact quantile") {
    val (dir, rows) = fixture
    val got = EventOps.tHistQuantile(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    rows.groupBy(_.event_type).foreach { case (tp, evs) =>
      val vs = evs.map(_.value).sorted
      val width = (vs.last - vs.head) / 100.0
      Seq(50, 95).foreach { p =>
        val exact = vs(math.min(math.ceil(vs.size * p / 100.0).toInt - 1, vs.size - 1))
        val est = got((tp, p))
        assert(math.abs(est - exact) <= width + 1e-9,
          s"$tp p$p: est $est vs exact $exact (bin width $width)")
      }
    }
    // the stream is never sorted: windows order only the <=100-bin histogram
    val plan = EventOps.tHistQuantile(spark, dir).queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("qMovingAgg equals an exact trailing-range replay (RANGE frame, decimal sum)") {
    val (dir, rows) = fixture
    val got = EventOps.qMovingAgg(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(3), r.getDouble(4)))).toMap
    rows.foreach { ev =>
      val t = ev.ts / 1000000L
      val peers = rows.filter(o => o.user_id == ev.user_id &&
        o.ts / 1000000L >= t - WeekMs && o.ts / 1000000L <= t)
      val cnt = peers.size.toLong
      val sumD = peers.map(o => BigDecimal(o.value).setScale(2, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
      val expected = (cnt, math.floor(sumD * 1e4 + 0.5) / 1e4)
      assert(got(ev.event_id) == expected,
        s"event ${ev.event_id}: ${got(ev.event_id)} vs $expected")
    }
    val plan = EventOps.qMovingAgg(spark, dir).queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning"), plan) // user-hash window only
  }

  test("new event operators: no cartesian, no nested-loop, no global sort") {
    val (dir, _) = fixture
    Seq("q_cube" -> EventOps.qCube _, "q_pivot" -> EventOps.qPivot _,
      "q_funnel" -> EventOps.qFunnel _, "q_retention" -> EventOps.qRetention _,
      "q_gap_fill" -> EventOps.qGapFill _, "q_scd2" -> EventOps.qScd2 _,
      "t_zorder" -> EventOps.tZorder _).foreach { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name: $plan")
      assert(!plan.contains("BroadcastNestedLoop"), s"$name: $plan")
      assert(!plan.contains("rangepartitioning"), s"$name: $plan")
    }
  }
}
