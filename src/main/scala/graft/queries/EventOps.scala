package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables
import LlmOps.qSql

/** Event-analytics operators over the append stream a warehouse load feeds:
  * multidimensional aggregation (CUBE / pivot), behavioral analytics
  * (funnel, cohort retention, gap-fill), dimension versioning (SCD2), and a
  * Z-order layout key for multi-column data skipping.
  *
  * Shared discipline: time arithmetic is integer epoch-ms bucketing (no
  * engine-dependent calendar math in hash-compared output), money/value
  * aggregates run in DECIMAL and cast to DOUBLE at the end, and no
  * operator's plan contains a global sort — windows are keyed per user /
  * per bucket, which is what keeps them hash-partitioned at 100 TB.
  */
object EventOps {

  private val DayMs = 86400000L
  private val WeekMs = 7L * DayMs

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  // ---- CUBE ------------------------------------------------------------

  /** CUBE over (event_type, day): all four aggregation levels in ONE hash
    * aggregate — Spark expands the grouping sets inside a single operator
    * with map-side partials, so the fact table is scanned and shuffled once,
    * not once per level. `grouping_id` disambiguates subtotal rows from
    * genuine NULL keys. */
  def qCube(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("day_idx", expr(s"ts_ms div $DayMs"))
      .cube("event_type", "day_idx")
      .agg(grouping_id().as("gid"),
        count(lit(1)).as("n"),
        sum(dec(col("value"))).cast(DoubleType).as("total"))

  private val cubeOracle = s"""
    SELECT event_type, day_idx,
      CAST(GROUPING(event_type, day_idx) AS BIGINT) AS gid,
      COUNT(*) AS n,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM (SELECT event_type, epoch_ms(ts) // $DayMs AS day_idx, value FROM events) t
    GROUP BY CUBE(event_type, day_idx)"""

  // ---- pivot -----------------------------------------------------------

  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Per-user pivot of event-type value totals into columns. The pivot
    * values are DECLARED (not discovered), so there is no extra distinct
    * scan and the plan is one hash aggregate — the pivot is a projection
    * shape, not a shuffle shape. */
  def qPivot(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("user_id")
      .pivot("event_type", EventTypes)
      .agg(sum(dec(col("value"))).cast(DoubleType))

  private val pivotOracle = {
    val cols = EventTypes.map(t =>
      s"""CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = '$t') AS DOUBLE) AS "$t"""")
      .mkString(",\n      ")
    s"""
    SELECT user_id,
      $cols
    FROM events GROUP BY user_id"""
  }

  // ---- funnel ----------------------------------------------------------

  /** Ordered conversion funnel: first view → first click at-or-after it →
    * first purchase at-or-after that, per user. Each stage is a keyed
    * aggregate joined on user_id (stage frames are |users|-sized, so the
    * joins broadcast at any corpus scale); no window over the raw stream. */
  def qFunnel(s: SparkSession, d: String): DataFrame = {
    // ev feeds four stage branches and broadcast sides don't reuse
    // exchanges — persist it (and each multi-consumer stage frame) so the
    // raw stream is scanned once, not once per stage
    val ev = Tables.events(s, d).select("user_id", "event_type", "ts_ms").persist()
    val users = ev.select("user_id").distinct()
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts_ms").as("t_view"))
      .persist() // consumers: the click stage + the final join
    val c = ev.filter(col("event_type") === "click").join(v, "user_id")
      .filter(col("ts_ms") >= col("t_view"))
      .groupBy("user_id").agg(min("ts_ms").as("t_click"))
      .persist() // consumers: the purchase stage + the final join
    val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
      .filter(col("ts_ms") >= col("t_click"))
      .groupBy("user_id").agg(min("ts_ms").as("t_purchase"))
    users.join(v, Seq("user_id"), "left")
      .join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
  }

  private val funnelOracle = """
    WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
    u AS (SELECT DISTINCT user_id FROM e),
    v AS (SELECT user_id, min(ts_ms) AS t_view FROM e
          WHERE event_type = 'view' GROUP BY 1),
    c AS (SELECT e.user_id, min(ts_ms) AS t_click FROM e JOIN v USING (user_id)
          WHERE event_type = 'click' AND ts_ms >= t_view GROUP BY 1),
    p AS (SELECT e.user_id, min(ts_ms) AS t_purchase FROM e JOIN c USING (user_id)
          WHERE event_type = 'purchase' AND ts_ms >= t_click GROUP BY 1)
    SELECT u.user_id, t_view, t_click, t_purchase
    FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
           LEFT JOIN p USING (user_id)"""

  // ---- cohort retention ------------------------------------------------

  /** Weekly cohort retention: users grouped by first-seen week, distinct
    * actives counted per (cohort, week offset). Two keyed aggregates + one
    * user-keyed join; the |users|-sized cohort frame broadcasts. Weeks are
    * integer epoch-week buckets — no calendar arithmetic to disagree on. */
  def qRetention(s: SparkSession, d: String): DataFrame = {
    val wk = Tables.events(s, d)
      .select(col("user_id"), expr(s"ts_ms div $WeekMs").as("week_idx"))
    // two consumers (cohort aggregate + the join): persist so the distinct
    // over the full stream runs once
    val active = wk.distinct().persist()
    val cohort = active.groupBy("user_id").agg(min("week_idx").as("cohort_week"))
    active.join(cohort, "user_id")
      .groupBy(col("cohort_week"), (col("week_idx") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct("user_id").as("n_users"))
  }

  private val retentionOracle = s"""
    WITH wk AS (SELECT DISTINCT user_id, epoch_ms(ts) // $WeekMs AS week_idx FROM events),
    cohort AS (SELECT user_id, min(week_idx) AS cohort_week FROM wk GROUP BY 1)
    SELECT cohort_week, week_idx - cohort_week AS week_offset,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM wk JOIN cohort USING (user_id)
    GROUP BY 1, 2"""

  // ---- gap fill + forward fill -----------------------------------------

  /** Per-user daily time series with gaps materialized and totals carried
    * forward: the feature-engineering shape ("value as of day D") that a
    * training pipeline derives from an event stream. The day grid comes
    * from `sequence()` per user (bounded by each user's own span — never a
    * driver-side calendar), and the fill window is keyed per user, so the
    * whole operator stays hash-partitioned. */
  def qGapFill(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .withColumn("day_idx", expr(s"ts_ms div $DayMs"))
      .groupBy("user_id", "day_idx")
      .agg(count(lit(1)).as("n_events"),
        sum(dec(col("value"))).cast(DoubleType).as("total"))
    val span = daily.groupBy("user_id")
      .agg(min("day_idx").as("d0"), max("day_idx").as("d1"))
    val grid = span.select(col("user_id"),
      explode(sequence(col("d0"), col("d1"))).as("day_idx"))
    val w = Window.partitionBy("user_id").orderBy("day_idx")
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.join(daily, Seq("user_id", "day_idx"), "left")
      .select(col("user_id"), col("day_idx"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("total"), ignoreNulls = true).over(w).as("total_filled"))
  }

  private val gapFillOracle = s"""
    WITH daily AS (
      SELECT user_id, epoch_ms(ts) // $DayMs AS day_idx, count(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM events GROUP BY 1, 2),
    span AS (SELECT user_id, min(day_idx) AS d0, max(day_idx) AS d1
             FROM daily GROUP BY 1),
    grid AS (SELECT user_id, unnest(generate_series(d0, d1)) AS day_idx FROM span)
    SELECT g.user_id, g.day_idx,
           COALESCE(n_events, 0) AS n_events,
           last_value(total IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.day_idx
             ROWS UNBOUNDED PRECEDING) AS total_filled
    FROM grid g LEFT JOIN daily USING (user_id, day_idx)"""

  // ---- SCD2 dimension versioning ---------------------------------------

  /** Slowly-changing-dimension type 2 history: collapse each user's event
    * stream into versioned state runs (state = event_type) with
    * [valid_from, valid_to) bounds — the dimension-table shape a warehouse
    * keeps for "what was this row at time T" joins. Gaps-and-islands with
    * per-user windows: one hash shuffle on user_id, every window shares it. */
  def qScd2(s: SparkSession, d: String): DataFrame =
    scd2Of(Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts_ms")))

  /** SCD2 history of any (event_id, user_id, event_type, ts_ms) frame —
    * split out so the incremental maintainer can build its stored dim. */
  private def scd2Of(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_ms").asc, col("event_id").asc)
    val runs = events
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(w).isNull ||
          lag(col("event_type"), 1).over(w) =!= col("event_type"), 1L).otherwise(0L))
      .withColumn("version", sum(col("chg")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "version")
      .agg(max(col("event_type")).as("state"), // constant within a run
        min(col("ts_ms")).as("valid_from"),
        count(lit(1)).as("n_events"))
    runs.withColumn("valid_to",
      lead(col("valid_from"), 1).over(Window.partitionBy("user_id").orderBy("version")))
      .select("user_id", "version", "state", "valid_from", "valid_to", "n_events")
  }

  /** INCREMENTAL SCD2 maintenance (the D-family's dimension member, beside
    * [[d7IncrementalAgg]]'s aggregates and [[d8IncrementalTopk]]'s
    * selections): the stored dimension — a parquet round-trip, like a real
    * warehouse table — absorbs a new event slice WITHOUT replaying
    * history. Only users PRESENT in the increment rebuild, and their
    * rebuild reads stored VERSIONS (runs), not historical events: a
    * version is a maximal same-state run, so interleaving version rows
    * with the (strictly later) new events and re-running gaps-and-islands
    * reproduces the full recompute exactly — a continuing state extends
    * its run (counts add), a changed state opens a new version. Untouched
    * users pass through byte-identical. Oracle = the FULL recompute
    * (shared with q_scd2): incremental must be indistinguishable. */
  def d9Scd2Merge(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts_ms"))
      .persist()
    val cut = ev.agg((min("ts_ms") +
      ((max("ts_ms") - min("ts_ms")) * 2) / 3).cast(LongType)).first().getLong(0)
    // per-SF fixed dir: overwrite (never accrete), and two processes
    // running different scale factors cannot clobber each other's state
    val storeDir = s"/tmp/graft_d9_${Tables.pathTag(d)}/store"
    scd2Of(ev.filter(col("ts_ms") < cut)).write.mode("overwrite").parquet(storeDir)
    val stored = s.read.parquet(storeDir) // the persisted dimension
    val inc = ev.filter(col("ts_ms") >= cut).persist()
    val affected = inc.select("user_id").distinct()
    val untouched = stored.join(affected, Seq("user_id"), "left_anti")
    // pseudo-rows: stored versions (ordered by version within their user —
    // all strictly before the cut) then increment events (by ts, event_id)
    val pseudo = stored.join(affected, Seq("user_id"), "left_semi")
      .select(col("user_id"), col("state"), col("valid_from"),
        col("version").as("ord2"), col("n_events"))
      .unionByName(inc.select(col("user_id"), col("event_type").as("state"),
        col("ts_ms").as("valid_from"), col("event_id").as("ord2"),
        lit(1L).as("n_events")))
    val w = Window.partitionBy("user_id").orderBy(col("valid_from").asc, col("ord2").asc)
    val rebuilt = pseudo
      .withColumn("chg",
        when(lag(col("state"), 1).over(w).isNull ||
          lag(col("state"), 1).over(w) =!= col("state"), 1L).otherwise(0L))
      .withColumn("version", sum(col("chg")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "version")
      .agg(max(col("state")).as("state"), min(col("valid_from")).as("valid_from"),
        sum(col("n_events")).as("n_events"))
      .withColumn("valid_to",
        lead(col("valid_from"), 1).over(Window.partitionBy("user_id").orderBy("version")))
      .select("user_id", "version", "state", "valid_from", "valid_to", "n_events")
    untouched.select("user_id", "version", "state", "valid_from", "valid_to", "n_events")
      .unionByName(rebuilt)
  }

  private val scd2Oracle = """
    WITH e AS (SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
    m AS (
      SELECT user_id, event_type, ts_ms, event_id,
        CASE WHEN lag(event_type) OVER w IS NULL
               OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms ASC, event_id ASC)),
    v AS (
      SELECT user_id, event_type, ts_ms,
        sum(chg) OVER (PARTITION BY user_id ORDER BY ts_ms ASC, event_id ASC
          ROWS UNBOUNDED PRECEDING) AS version
      FROM m),
    g AS (
      SELECT user_id, CAST(version AS BIGINT) AS version,
             max(event_type) AS state, min(ts_ms) AS valid_from,
             count(*) AS n_events
      FROM v GROUP BY 1, 2)
    SELECT user_id, version, state, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY version) AS valid_to,
           n_events
    FROM g"""

  /** Temporal enrichment against the SCD2 dimension: every purchase picks
    * up the state row that was CURRENT at its event time — [[qScd2]]'s
    * history joined through the custom broadcast as-of physical operator
    * ([[graft.plans.BroadcastAsOfJoinExec]]: per-user time index broadcast,
    * binary-search probe, ZERO exchanges on the fact side). This is the
    * standard composition a warehouse runs as `dim.valid_from <= f.ts <
    * dim.valid_to` — expressed as an as-of join so the fact side never
    * range-joins. Version boundaries inside one millisecond dedupe to the
    * LATEST version per (user, ts) first — the uniqueness contract the
    * as-of index requires, and the semantics "at t, the newest state
    * wins". */
  def qScd2Join(s: SparkSession, d: String): DataFrame = {
    val dim = qScd2(s, d)
      .groupBy(col("user_id"), col("valid_from").as("ts_ms"))
      .agg(max(col("version")).as("dim_version"),
        max_by(col("state"), col("version")).as("dim_state"))
    val purchases = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts_ms")
    graft.ops.AsOf.joinBroadcast(purchases, dim,
        key = "user_id", ts = "ts_ms", valueCols = Seq("dim_version", "dim_state"))
      .select(col("event_id"), col("user_id"), col("ts_ms"),
        col("asof_dim_version").as("version"), col("asof_dim_state").as("state"))
  }

  private val scd2JoinOracle = """
    WITH e AS (SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
    m AS (
      SELECT user_id, event_type, ts_ms, event_id,
        CASE WHEN lag(event_type) OVER w IS NULL
               OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms ASC, event_id ASC)),
    v AS (
      SELECT user_id, event_type, ts_ms,
        sum(chg) OVER (PARTITION BY user_id ORDER BY ts_ms ASC, event_id ASC
          ROWS UNBOUNDED PRECEDING) AS version
      FROM m),
    g AS (
      SELECT user_id, CAST(version AS BIGINT) AS version,
             max(event_type) AS state, min(ts_ms) AS valid_from
      FROM v GROUP BY 1, 2),
    dim AS (
      SELECT user_id, valid_from AS ts_ms, max(version) AS version,
             max_by(state, version) AS state
      FROM g GROUP BY 1, 2),
    p AS (SELECT event_id, user_id, ts_ms FROM e WHERE event_type = 'purchase')
    SELECT event_id, user_id, ts_ms, version, state FROM (
      SELECT p.event_id, p.user_id, p.ts_ms, d.version, d.state,
        row_number() OVER (PARTITION BY p.event_id ORDER BY d.ts_ms DESC) AS rn
      FROM p JOIN dim d ON d.user_id = p.user_id AND d.ts_ms <= p.ts_ms) t
    WHERE rn = 1"""

  // ---- Z-order layout key ----------------------------------------------

  /** Interleave the low 16 bits of `x` (Morton/Z-order spread): after the
    * fold, bit i of the input sits at bit 2i of the output. */
  private def spreadBits(x: Column): Column =
    Seq((8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L), (1, 0x55555555L))
      .foldLeft(x.bitwiseAND(lit(0xFFFFL))) { case (v, (sh, m)) =>
        (v.bitwiseOR(shiftleft(v, sh))).bitwiseAND(lit(m))
      }

  private def spreadSql(e: String): String =
    Seq((8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L), (1, 0x55555555L))
      .foldLeft(s"($e & 65535)") { case (v, (sh, m)) => s"(($v | ($v << $sh)) & $m)" }

  /** Z-order clustering stats: every event keyed by the Morton interleave of
    * (user_id, value-centile), bucketed by the top 8 z-bits, with per-bucket
    * min/max of BOTH dimensions. This is the layout operator for multi-column
    * data skipping at 100 TB: rows written in z-bucket order give every file
    * a tight bounding rectangle in (user, value) space, so a predicate on
    * EITHER column prunes files — a single-column sort only prunes one. The
    * per-bucket min/max spans in the output are exactly the file-skipping
    * statistics a scan would consult. */
  def tZorder(s: SparkSession, d: String): DataFrame = {
    val vb = least(greatest(floor(col("value") * 100.0).cast(LongType), lit(0L)), lit(65535L))
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), vb.as("vb"))
      .withColumn("zval", spreadBits(col("user_id")).bitwiseOR(shiftleft(spreadBits(col("vb")), 1)))
      .withColumn("zbucket", shiftright(col("zval"), 24))
      .groupBy("zbucket")
      .agg(count(lit(1)).as("n"),
        min("user_id").as("u_min"), max("user_id").as("u_max"),
        min("vb").as("v_min"), max("vb").as("v_max"))
  }

  private val zorderOracle = {
    val u = spreadSql("user_id")
    val v = spreadSql("vb")
    s"""
    WITH b AS (
      SELECT event_id, user_id,
        least(greatest(CAST(floor(value * 100.0) AS BIGINT), 0), 65535) AS vb
      FROM events),
    z AS (SELECT user_id, vb, ($u | ($v << 1)) AS zval FROM b)
    SELECT zval >> 24 AS zbucket, count(*) AS n,
           min(user_id) AS u_min, max(user_id) AS u_max,
           min(vb) AS v_min, max(vb) AS v_max
    FROM z GROUP BY 1"""
  }

  // ---- incremental aggregate maintenance --------------------------------

  /** Incrementally-maintained aggregate table: history's per-key partials
    * are STORED (genuinely written to and read back from parquet) and a new
    * increment only aggregates its own rows — history is never rescanned,
    * the merge is `sum` over partials, exact because the per-key state
    * (count, DECIMAL sum) is a commutative monoid. This is how a 100 TB
    * rollup stays cheap: the daily job touches the day's data plus a
    * |keys|-sized state table, and the result equals the full recompute
    * (which is exactly what the oracle runs). */
  def d7IncrementalAgg(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("value"), col("event_id"))
    val hist = ev.filter(col("event_id") % 4 =!= 3)
    val fresh = ev.filter(col("event_id") % 4 === 3)
    def partial(df: DataFrame): DataFrame =
      df.groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n"), sum(dec(col("value"))).as("total"))
    val stateDir = newIncAggStateDir()
    partial(hist).write.mode("overwrite").parquet(stateDir)
    s.read.parquet(stateDir).unionByName(partial(fresh))
      .groupBy("user_id", "event_type")
      .agg(sum(col("n")).as("n"), sum(col("total")).cast(DoubleType).as("total"))
  }

  // fresh scratch dir per invocation (a shared per-JVM path would race
  // concurrent builds of this query: overwrite-vs-read corruption); the
  // returned frame reads it lazily, so cleanup is deferred to JVM exit —
  // through ONE hook sweeping a registry, not one hook thread per call
  private val incAggDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  private lazy val incAggHookOnce: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      incAggDirs.forEach { p =>
        try Files.walk(p).sorted(Comparator.reverseOrder[Path]())
          .forEach(f => Files.deleteIfExists(f))
        catch { case _: Exception => () }
      }
    }))
  private def newIncAggStateDir(): String = {
    incAggHookOnce
    val p = java.nio.file.Files.createTempDirectory("graft_incagg_")
    incAggDirs.add(p)
    p.toString
  }

  private val incAggOracle = """
    SELECT user_id, event_type, COUNT(*) AS n,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM events GROUP BY 1, 2"""

  // ---- session path mining ---------------------------------------------

  private val PathGapMs = 30L * 60 * 1000
  private val PathTopK = 10

  /** Top-K session paths (the "what do users actually do" query): sessions
    * are 30-minute-inactivity islands per user, a session's path is its
    * event types in (ts, event_id) order joined with `>`, and the output is
    * the K most frequent paths.
    *
    * Scale shape: one user-keyed window pass assigns sessions (gaps-and-
    * islands, same as SCD2), the per-session path is an in-group sorted
    * collect (bounded by a session's own length — inactivity caps it), the
    * path count is map-side-combined, and the final K is TakeOrdered with a
    * deterministic (count DESC, path ASC) tie-break — never a global sort. */
  def qPathTopK(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_ms").asc, col("event_id").asc)
    val sessions = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts_ms"))
      .withColumn("new_s",
        when(lag(col("ts_ms"), 1).over(w).isNull ||
          col("ts_ms") - lag(col("ts_ms"), 1).over(w) > PathGapMs, 1L).otherwise(0L))
      .withColumn("session",
        sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    sessions
      .groupBy("user_id", "session")
      .agg(concat_ws(">", transform(
        array_sort(collect_list(struct(col("ts_ms"), col("event_id"), col("event_type")))),
        e => e.getField("event_type"))).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path").asc).limit(PathTopK)
  }

  private val pathOracle = s"""
    WITH e AS (SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
    m AS (
      SELECT *, CASE WHEN lag(ts_ms) OVER w IS NULL
                       OR ts_ms - lag(ts_ms) OVER w > $PathGapMs THEN 1 ELSE 0 END AS new_s
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms ASC, event_id ASC)),
    sess AS (
      SELECT *, SUM(new_s) OVER (PARTITION BY user_id
        ORDER BY ts_ms ASC, event_id ASC
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session
      FROM m),
    paths AS (
      SELECT user_id, session,
        string_agg(event_type, '>' ORDER BY ts_ms, event_id) AS path
      FROM sess GROUP BY 1, 2)
    SELECT path, count(*) AS n_sessions FROM paths
    GROUP BY 1 ORDER BY n_sessions DESC, path ASC LIMIT $PathTopK"""

  // ---- marketing attribution -------------------------------------------

  /** First/last-touch conversion attribution: every purchase credits (a)
    * the user's FIRST preceding non-purchase touch and (b) the LAST one;
    * purchases with no preceding touch credit `direct`. Both models emit
    * from ONE pass: a user-keyed window carries the running first/last touch
    * (ignore-nulls over the preceding frame — purchases are transparent to
    * it), the purchase rows explode into their two model rows, and a
    * map-side-combined aggregate folds (model, touch) credit. One shuffle
    * on `user_id`, windows bounded by a user's own history — the exact
    * shape a 100 TB clickstream needs (no self-join of events to events).
    * Ties at the same millisecond break on event id, both engines. */
  def qAttribution(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_ms").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col("event_type") =!= "purchase", col("event_type"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("value"), col("event_id"), col("ts_ms"))
      .withColumn("first_touch", first(touch, ignoreNulls = true).over(w))
      .withColumn("last_touch", last(touch, ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("value"), explode(array(
        struct(lit("first_touch").as("model"),
          coalesce(col("first_touch"), lit("direct")).as("touch")),
        struct(lit("last_touch").as("model"),
          coalesce(col("last_touch"), lit("direct")).as("touch")))).as("m"))
      .groupBy(col("m.model").as("model"), col("m.touch").as("touch"))
      .agg(count(lit(1)).as("n_conversions"),
        sum(dec(col("value"))).cast(DoubleType).as("value_sum"))
  }

  private val attributionOracle = """
    WITH e AS (
      SELECT user_id, event_type, value, event_id, epoch_ms(ts) AS ts_ms,
        CASE WHEN event_type <> 'purchase' THEN event_type END AS touch0
      FROM events),
    t AS (
      SELECT *,
        first_value(touch0 IGNORE NULLS) OVER (PARTITION BY user_id
          ORDER BY ts_ms, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_touch,
        last_value(touch0 IGNORE NULLS) OVER (PARTITION BY user_id
          ORDER BY ts_ms, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch
      FROM e),
    x AS (
      SELECT value, 'first_touch' AS model, COALESCE(first_touch, 'direct') AS touch
      FROM t WHERE event_type = 'purchase'
      UNION ALL
      SELECT value, 'last_touch', COALESCE(last_touch, 'direct')
      FROM t WHERE event_type = 'purchase')
    SELECT model, touch, count(*) AS n_conversions,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM x GROUP BY 1, 2"""

  // ---- data-quality rules ----------------------------------------------

  /** Declarative load-time data-quality screen (Deequ/dbt-test-style): every
    * rule is a boolean Column, ALL rules evaluate in ONE scan — one
    * map-side-combined aggregate producing a violation count per rule, then
    * a narrow unpivot of the single stats row. Adding a rule adds a column
    * to the aggregate, never a pass over the data — the only shape that
    * holds when the table is 100 TB and the rule list is long. */
  def tDqRules(s: SparkSession, d: String): DataFrame = {
    val rules: Seq[(String, Column)] = Seq(
      "value_not_null"  -> col("value").isNull,
      "value_in_range"  -> !col("value").between(0d, 1000d),
      "known_type"      -> !col("event_type").isin(EventTypes.map(_.asInstanceOf[Any]): _*),
      "ts_in_window"    -> !col("ts_ms").between(1704067200000L, 1735689600000L),
      // strict integer grammar on BOTH engines: Spark's lenient cast and
      // DuckDB's TRY_CAST accept different lexical forms ('1e3', ' 42', '3.0')
      // — ≤18 digits also guarantees the cast itself can never overflow-diverge
      "props_has_int_k" -> !coalesce(
        get_json_object(col("props"), "$.k").rlike("^-?\\d{1,18}$"), lit(false)))
    val stats = Tables.events(s, d).agg(
      count(lit(1)).as("n"),
      rules.map { case (name, bad) =>
        sum(when(bad, 1L).otherwise(0L)).as(s"v_$name")
      }: _*)
    stats.select(explode(array(rules.map { case (name, _) =>
        struct(lit(name).as("rule"), col(s"v_$name").as("n_violations"), col("n").as("n_checked"))
      }: _*)).as("r"))
      .select(col("r.rule"), col("r.n_violations"), col("r.n_checked"),
        graft.llm.TextOps.quant(lit(1d) - col("r.n_violations") / col("r.n_checked"), 6)
          .as("pass_rate"))
  }

  private val dqOracle = {
    val types = EventTypes.map(t => s"'$t'").mkString(", ")
    val ruleSql = Seq(
      "value_not_null"  -> "value IS NULL",
      "value_in_range"  -> "NOT (value BETWEEN 0 AND 1000)",
      "known_type"      -> s"event_type NOT IN ($types)",
      "ts_in_window"    -> "NOT (epoch_ms(ts) BETWEEN 1704067200000 AND 1735689600000)",
      "props_has_int_k" -> "NOT COALESCE(regexp_matches(json_extract_string(props::JSON, '$.k'), '^-?\\d{1,18}$'), FALSE)")
    ruleSql.map { case (name, cond) =>
      s"""SELECT '$name' AS rule,
        CAST(SUM(CASE WHEN COALESCE($cond, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
        COUNT(*) AS n_checked,
        floor((1 - SUM(CASE WHEN COALESCE($cond, FALSE) THEN 1 ELSE 0 END) * 1.0 / COUNT(*)) * 1e6 + 0.5) / 1e6 AS pass_rate
      FROM events"""
    }.mkString("\nUNION ALL\n")
  }

  // ---- histogram quantile sketch ---------------------------------------

  private val HqBins = 100L

  /** Mergeable histogram quantiles — the sketch twin of `t_profile`'s exact
    * percentiles: per event type, fold `value` into a [[HqBins]]-cell
    * equi-width histogram (bounded, map-side-combinable, and mergeable by
    * cell-wise SUM — the property exact sort-based percentiles lack), then
    * read p50/p95 off the cumulative histogram with linear interpolation
    * inside the landing bin. The count target is exact integer
    * ceil(n·p/100); only the final interpolation divides as float (one
    * deterministic op, quantized).
    *
    * Scale shape: one bounds pass collapsing to a |types|-row broadcast,
    * one narrow binning scan into a ≤ types·bins aggregate, and windows
    * that only ever order ≤ [[HqBins]] rows per type. The raw stream is
    * never sorted — at 100 TB that is the whole point. */
  private val IncTopK = 5

  /** Incremental top-K materialized-view maintenance (the selection twin of
    * [[d7IncrementalAgg]]): the stored state is each type's top-K rows from
    * the history slice — bounded at K·|types| no matter how much history
    * accrued — and the refresh merges it with ONLY the increment through
    * the same bounded-heap aggregate. Exactness is the selection property:
    * top-K BY ROW SCORE is a mergeable operation (any row outside a slice's
    * top-K can't be in the union's top-K), unlike top-K by aggregated count
    * — which is why the view stores scored ROWS, not counters. The stored
    * state genuinely round-trips through parquet. */
  def d8IncrementalTopk(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("event_type"), col("value"), col("ts_ms"))
      .persist() // bounds probe + history/increment split
    val cut = ev.agg((min("ts_ms") +
      ((max("ts_ms") - min("ts_ms")) * 2) / 3).cast(LongType)).first().getLong(0)
    def topk(rows: DataFrame): DataFrame = rows
      .groupBy(col("event_type"))
      .agg(graft.llm.TextOps.topKBy(col("value"), col("event_id"), IncTopK).as("tk"))
      .select(col("event_type"), explode(col("tk")).as("e"))
      .select(col("event_type"), col("e.id").as("event_id"), col("e.score").as("value"))
    val stateDir = s"/tmp/graft_d8_topk_${Tables.pathTag(d)}/state" // per-SF fixed dir
    topk(ev.filter(col("ts_ms") < cut)).write.mode("overwrite").parquet(stateDir)
    val stored = s.read.parquet(stateDir) // the persisted view state
    topk(stored.unionByName(
        ev.filter(col("ts_ms") >= cut).select("event_type", "event_id", "value")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("k_rows"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("topk_sum"),
        min(col("value")).as("kth_value"))
  }

  /** Oracle = FULL recompute: the merged incremental state must be
    * indistinguishable from running top-K over all history at once. */
  private val d8Oracle = s"""
    WITH ranked AS (
      SELECT event_type, value,
        ROW_NUMBER() OVER (PARTITION BY event_type
          ORDER BY value DESC, event_id ASC) AS rk
      FROM events WHERE value IS NOT NULL AND event_id IS NOT NULL)
    SELECT event_type, CAST(count(*) AS BIGINT) AS k_rows,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS topk_sum,
           min(value) AS kth_value
    FROM ranked WHERE rk <= $IncTopK GROUP BY 1"""

  /** EWMA smoothing of per-type daily volumes (α = 1/4) — the classic ops
    * baseline ("is today off-trend?") as a DETERMINISTIC fold: the daily
    * series materializes per type (|days|-bounded), and each step of
    * `s' = s + (x − s)/4` is quantized to 6dp before the next, so the fold
    * is a pure function of the series — the same recurrence `list_reduce`
    * replays in the oracle, with no float-order or libm surface at all
    * (α = 1/4 divides exactly in binary). Nothing past the daily rollup
    * touches event rows. */
  def qEwma(s: SparkSession, d: String): DataFrame =
    ewmaTail(Tables.events(s, d)
      .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).cast(DoubleType).as("cnt")))

  /** The fold tail of [[qEwma]] over an already-built (event_type, day,
    * cnt) frame — shared with the streaming twin. */
  private[queries] def ewmaTail(daily: DataFrame): DataFrame =
    daily.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sort_array(collect_list(struct(col("day"), col("cnt")))).as("xs"))
      .select(col("event_type"), col("n_days"),
        aggregate(
          slice(col("xs"), lit(2), greatest(size(col("xs")) - 1, lit(0))),
          element_at(col("xs"), 1).getField("cnt"),
          (acc, e) => graft.llm.TextOps.quant(
            acc + (e.getField("cnt") - acc) / lit(4.0), 6)).as("ewma"))

  private[queries] val ewmaOracle = s"""
    WITH daily AS (
      SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             CAST(count(*) AS DOUBLE) AS cnt
      FROM events GROUP BY 1, 2)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
      list_reduce(list(cnt ORDER BY day),
        (acc, x) -> floor((acc + (x - acc) / 4.0) * 1e6 + 0.5) / 1e6) AS ewma
    FROM daily GROUP BY 1"""

  /** Mutual information between event type and weekday — the categorical-
    * dependence profiler (is traffic composition day-of-week-dependent?).
    * MI decomposes into pure count-entropy sums: `Σc_xy·ln c_xy − Σc_x·ln
    * c_x − Σc_y·ln c_y` over the (|types|·7)-cell contingency table, then
    * `s/N + ln N`. Each term is quantized to 6dp and summed as EXACT
    * decimals (the entropy-family discipline: partition order cannot move
    * the answer), the three term families union into ONE aggregate — no
    * 1-row cross joins — and nothing after the first count touches event
    * rows. */
  def tMutualInfo(s: SparkSession, d: String): DataFrame = {
    val dec = (c: Column) =>
      graft.llm.TextOps.quant(c * log(c), 6).cast(DecimalType(28, 8))
    val cells = Tables.events(s, d)
      .select(col("event_type").as("x"), dayofweek(col("ts")).as("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("c"))
      .persist() // feeds both marginals + the cell terms
    val cx = cells.groupBy("x").agg(sum("c").as("c"))
    val cy = cells.groupBy("y").agg(sum("c").as("c"))
    cells.select(dec(col("c")).as("t"), col("c").as("nc"))
      .unionAll(cx.select((-dec(col("c"))).as("t"), lit(0L).as("nc")))
      .unionAll(cy.select((-dec(col("c"))).as("t"), lit(0L).as("nc")))
      .agg(sum("nc").as("n_events"), sum("t").as("s"))
      .select(col("n_events"),
        graft.llm.TextOps.quant(
          col("s").cast(DoubleType) / col("n_events") + log(col("n_events")), 4)
          .as("mi_nats"))
  }

  private val mutualInfoOracle = s"""
    WITH e AS (SELECT event_type AS x, dayofweek(ts) + 1 AS y FROM events),
    cells AS (SELECT x, y, count(*) AS c FROM e GROUP BY 1, 2),
    cx AS (SELECT x, sum(c) AS c FROM cells GROUP BY 1),
    cy AS (SELECT y, sum(c) AS c FROM cells GROUP BY 1),
    u AS (
      SELECT CAST(${LlmOps.qSql("c * ln(c)", 6)} AS DECIMAL(28,8)) AS t, c AS nc FROM cells
      UNION ALL
      SELECT -CAST(${LlmOps.qSql("c * ln(c)", 6)} AS DECIMAL(28,8)), 0 FROM cx
      UNION ALL
      SELECT -CAST(${LlmOps.qSql("c * ln(c)", 6)} AS DECIMAL(28,8)), 0 FROM cy)
    SELECT CAST(sum(nc) AS BIGINT) AS n_events,
      ${LlmOps.qSql("CAST(sum(t) AS DOUBLE) / sum(nc) + ln(sum(nc))", 4)} AS mi_nats
    FROM u"""

  private val AnomalyZ = 2L // flag beyond z standard deviations

  /** Volume-anomaly detection: per event type, flag days whose event count
    * sits more than [[AnomalyZ]]σ from that type's daily mean — the ops
    * monitor for ingest spikes/drops. The z-test is evaluated WITHOUT
    * floats or sqrt: `(cnt − s/n)² > z²·(ss/n − (s/n)²)` is multiplied out
    * to the integer-exact `(n·cnt − s)² > z²·(n·ss − s²)`, so Spark and the
    * oracle agree bit-for-bit (a float σ would diverge in libm). Shape: one
    * map-side-combinable daily rollup, a |types|-row broadcast of the
    * moment table, a narrow filter — nothing scales with raw events past
    * the first aggregate. */
  def qAnomaly(s: SparkSession, d: String): DataFrame =
    anomalyTail(Tables.events(s, d)
      .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("cnt"))
      .persist()) // feeds the moment rollup AND the flag filter

  /** The z-test tail of [[qAnomaly]] over an already-built (event_type,
    * day, cnt) frame — shared with the streaming twin, whose daily counts
    * come out of complete-mode aggregation state instead of a batch scan. */
  private[queries] def anomalyTail(daily: DataFrame): DataFrame = {
    val stats = daily.groupBy("event_type").agg(
      count(lit(1)).as("n"), sum("cnt").as("s"),
      sum(col("cnt") * col("cnt")).as("ss"))
    val z2 = AnomalyZ * AnomalyZ
    daily.join(broadcast(stats), "event_type")
      .filter((col("n") * col("cnt") - col("s")) * (col("n") * col("cnt") - col("s"))
        > lit(z2) * (col("n") * col("ss") - col("s") * col("s")))
      .select(col("event_type"), col("day"), col("cnt"))
  }

  private[queries] val anomalyOracle = s"""
    WITH daily AS (
      SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2),
    st AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cnt) AS BIGINT) AS s, CAST(sum(cnt*cnt) AS BIGINT) AS ss
      FROM daily GROUP BY 1)
    SELECT event_type, day, cnt FROM daily JOIN st USING (event_type)
    WHERE (n*cnt - s)*(n*cnt - s) > ${AnomalyZ * AnomalyZ}*(n*ss - s*s)"""

  def tHistQuantile(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("event_type"), col("value"))
    val bounds = ev.groupBy("event_type")
      .agg(min("value").as("lo"), max("value").as("hi"))
    histQuantileTail(
      histCells(ev, bounds).persist(), // cumulative pass + totals pass
      bounds)
  }

  /** The mergeable half of [[tHistQuantile]]: fold values into per-type
    * equi-width bin counts under FIXED per-type bounds. Cell counts are
    * order-independent sums — a streaming aggregation can maintain them
    * across micro-batches and snapshot identically ([[StreamOps
    * .qStreamQuantile]] does). */
  private[queries] def histCells(ev: DataFrame, bounds: DataFrame): DataFrame =
    ev.join(broadcast(bounds), "event_type")
      .withColumn("bin", least(
        floor(when(col("hi") === col("lo"), lit(0.0))
          .otherwise((col("value") - col("lo")) / (col("hi") - col("lo")) * HqBins))
          .cast(LongType),
        lit(HqBins - 1)))
      .groupBy("event_type", "bin").agg(count(lit(1)).as("c"))

  /** The read-off half of [[tHistQuantile]]: p50/p95 from a (type, bin, c)
    * cell frame — windows only ever order ≤ [[HqBins]] rows per type. */
  private[queries] def histQuantileTail(hist: DataFrame,
                                        bounds: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(col("bin").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum", sum(col("c")).over(w))
    val n = hist.groupBy("event_type").agg(sum(col("c")).as("n"))
    cum.join(broadcast(n), "event_type")
      .withColumn("p", explode(array(lit(50), lit(95))))
      .withColumn("t", expr(s"(n * p + 99) div 100"))
      .filter(col("cum") >= col("t"))
      .groupBy("event_type", "p", "t")
      .agg(min(col("bin")).as("bin"),
        min_by(col("c"), col("bin")).as("c"),
        min_by(col("cum"), col("bin")).as("cum"))
      .join(broadcast(bounds), "event_type")
      .select(col("event_type"), col("p"),
        graft.llm.TextOps.quant(
          col("lo") + (col("hi") - col("lo")) / HqBins *
            (col("bin") + (col("t") - (col("cum") - col("c"))) * 1.0 / col("c")),
          4).as("est_q"))
  }

  private[queries] val histQuantileOracle = s"""
    WITH b AS (SELECT event_type, min(value) AS lo, max(value) AS hi
               FROM events GROUP BY 1),
    hist AS (
      SELECT e.event_type,
        least(CAST(floor(CASE WHEN hi = lo THEN 0.0
                   ELSE (value - lo) / (hi - lo) * $HqBins END) AS BIGINT),
              ${HqBins - 1}) AS bin,
        CAST(count(*) AS BIGINT) AS c
      FROM events e JOIN b USING (event_type) GROUP BY 1, 2),
    cum AS (SELECT event_type, bin, c,
              CAST(sum(c) OVER (PARTITION BY event_type ORDER BY bin ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
            FROM hist),
    n AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n FROM hist GROUP BY 1),
    tgt AS (SELECT event_type, n, p, (n * p + 99) // 100 AS t
            FROM n, unnest([50, 95]) AS u(p)),
    sel AS (
      SELECT t.event_type, t.p, t.t, min(bin) AS bin,
             min_by(c, bin) AS c, min_by(cum, bin) AS cum
      FROM tgt t JOIN cum ON cum.event_type = t.event_type AND cum.cum >= t.t
      GROUP BY 1, 2, 3)
    SELECT s.event_type, s.p,
      ${qSql(s"lo + (hi - lo) / $HqBins * (bin + (t - (cum - c)) * 1.0 / c)", 4)} AS est_q
    FROM sel s JOIN b ON b.event_type = s.event_type"""

  // ---- RANGE-frame moving aggregates -----------------------------------

  private val MovingRangeMs = 7L * 24 * 3600 * 1000 // trailing 7 days

  /** Per-user trailing-7-day moving aggregates evaluated AT each event — a
    * time-RANGE window frame (peers by timestamp, not row position), the
    * frame kind [[Relational.qWindow]]'s running total doesn't exercise.
    * The frame sum is DECIMAL so its value is independent of the order the
    * engine folds the frame in (Spark slides, DuckDB segment-trees — a
    * double sum would diverge).
    *
    * Scale shape: one hash shuffle on user_id; each frame is bounded by a
    * user's own 7-day history, and no global sort exists anywhere. */
  def qMovingAgg(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_ms").asc)
      .rangeBetween(-MovingRangeMs, Window.currentRow)
    Tables.events(s, d)
      .withColumn("w_cnt", count(lit(1)).over(w))
      .withColumn("w_sum",
        graft.llm.TextOps.quant(sum(dec(col("value"))).over(w).cast(DoubleType), 4))
      .select("event_id", "user_id", "ts_ms", "w_cnt", "w_sum")
  }

  private val movingAggOracle = s"""
    SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
      count(*) OVER w AS w_cnt,
      floor(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) * 1e4 + 0.5) / 1e4 AS w_sum
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts) ASC
      RANGE BETWEEN $MovingRangeMs PRECEDING AND CURRENT ROW)"""

  // ---- salted skew join -------------------------------------------------

  private val SkewSalt = 8

  /** Skew-mitigated dimension join: HALF the event stream collapses onto one
    * synthetic hot key (the one-tenant-owns-half-the-traffic shape AQE's
    * skew-join can't fix when the hot side must still meet a dimension row),
    * and the join runs through [[graft.ops.Skew.saltedJoin]] — the hot key's
    * rows spread over `salt` reducers, the dimension replicates `salt`×.
    * The salt is random per row, but the RESULT is salt-invariant by
    * construction, which is exactly what the oracle (a plain unsalted join)
    * certifies. SkewSpec proves the distributional claim; this query gates
    * the correctness claim through the driver. */
  def qSkewJoin(s: SparkSession, d: String): DataFrame = {
    val k = when(col("user_id") % 2 === 0, lit(0L)).otherwise(col("user_id"))
    val big = Tables.events(s, d).select(k.as("k"), col("value"))
    val dim = Tables.events(s, d).select(k.as("k")).distinct()
      .withColumn("grp", col("k") % 7)
    graft.ops.Skew.saltedJoin(big, dim, "k", SkewSalt)
      .groupBy("grp")
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast(DoubleType).as("total"))
  }

  private val skewJoinOracle = """
    WITH big AS (
      SELECT CASE WHEN user_id % 2 = 0 THEN 0 ELSE user_id END AS k, value
      FROM events),
    dim AS (SELECT DISTINCT k, k % 7 AS grp FROM big)
    SELECT grp, count(*) AS n,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM big JOIN dim USING (k)
    GROUP BY grp"""

  def qs: Map[String, Q] = Map(
    "q_skew_join"        -> Q(qSkewJoin, Some(skewJoinOracle)),
    "t_hist_quantile"    -> Q(tHistQuantile, Some(histQuantileOracle)),
    "q_anomaly"          -> Q(qAnomaly, Some(anomalyOracle)),
    "q_scd2_join"        -> Q(qScd2Join, Some(scd2JoinOracle)),
    "d8_incremental_topk" -> Q(d8IncrementalTopk, Some(d8Oracle)),
    "t_mutual_info"      -> Q(tMutualInfo, Some(mutualInfoOracle)),
    "q_ewma"             -> Q(qEwma, Some(ewmaOracle)),
    "d9_scd2_merge"      -> Q(d9Scd2Merge, Some(scd2Oracle)),
    "q_moving_agg"       -> Q(qMovingAgg, Some(movingAggOracle)),
    "q_attribution"      -> Q(qAttribution, Some(attributionOracle)),
    "q_path_topk"        -> Q(qPathTopK, Some(pathOracle)),
    "t_dq_rules"         -> Q(tDqRules, Some(dqOracle)),
    "d7_incremental_agg" -> Q(d7IncrementalAgg, Some(incAggOracle)),
    "q_cube"      -> Q(qCube, Some(cubeOracle)),
    "q_pivot"     -> Q(qPivot, Some(pivotOracle)),
    "q_funnel"    -> Q(qFunnel, Some(funnelOracle)),
    "q_retention" -> Q(qRetention, Some(retentionOracle)),
    "q_gap_fill"  -> Q(qGapFill, Some(gapFillOracle)),
    "q_scd2"      -> Q(qScd2, Some(scd2Oracle)),
    "t_zorder"    -> Q(tZorder, Some(zorderOracle)))
}
