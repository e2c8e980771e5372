package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{coalesce, col, lit, lower, trim}

/** Event routing (B5): the reference maintains one Kafka topic per
  * (destination, mode, table) — `in.id.<dest>.m.<mode>.t.<table>` — and a
  * consumer per topic (bulkerapp/app/topic_manager.go:726-787,167-423).
  *
  * The Spark-native inversion: ONE stream carries all events; each
  * micro-batch fans out by the routing column inside `foreachBatch`. The
  * distinct-table probe is control-plane (bounded by the table universe, not
  * the row count); each per-table slice flows through the distributed load
  * path. At 100 TB the slice filters all read one shuffle-free scan of the
  * cached batch.
  */
object Router {

  /** Fan one batch out by `tableCol`: `load(table, slice)` per distinct
    * routing value. Rows with a NULL table route to `defaultTable`. */
  def routeBatch(df: DataFrame, tableCol: String, defaultTable: String)
                (load: (String, DataFrame) => Unit): Unit = {
    val batch = df.persist()
    try {
      val tables = batch.select(tableCol).distinct().collect()
        .map(r => Option(r.getString(0)).getOrElse(defaultTable)).distinct.sorted
      tables.foreach { t =>
        val slice =
          if (t == defaultTable)
            batch.filter(col(tableCol).isNull || col(tableCol) === t)
          else batch.filter(col(tableCol) === t)
        load(t, slice.drop(tableCol))
      }
    } finally { batch.unpersist(); () }
  }

  /** Fan one batch out to destination LINKS, each gated by its own ingest
    * filter ([[IngestFilters]]): `load(dest, slice)` per link, slice =
    * batch rows its filter admits. Every link's filter is a Column
    * predicate over the SAME persisted batch — one scan feeds all links,
    * no row-wise dispatch, codegen end to end. */
  def routeLinks(df: DataFrame, links: Seq[(String, IngestFilters.Opts)],
                 typeCol: String, eventCol: String, hostCol: String)
                (load: (String, DataFrame) => Unit): Unit = {
    val batch = df.persist()
    try links.foreach { case (dest, opts) =>
      load(dest, batch.filter(IngestFilters.predicate(opts,
        col(typeCol), col(eventCol), col(hostCol))))
    } finally { batch.unpersist(); () }
  }
}

/** Per-connection ingest filters (`ingest/filters.go:9–50`): each
  * destination link may carry an `events` filter (newline-separated names,
  * matched case-insensitively after trimming against the event's `type` OR
  * its `event` name) and a `hosts` filter (`*`, exact host, or
  * `*.domain.com` suffix rules against `context.page.host`). A missing
  * option means `"*"` (everything); an event passes a link when ANY host
  * rule matches AND ANY event rule matches either subject.
  *
  * Spark-native: the rules are connection config — plan-time literals — so
  * every rule compiles to a Column predicate (no UDF, whole-stage codegen);
  * missing subjects coalesce to "" exactly like the reference's `GetS`. */
object IngestFilters {

  /** A link's filter options; `None` = option absent = match-all
    * (`parseFilter` nil arm, filters.go:32–33). */
  final case class Opts(events: Option[String] = None, hosts: Option[String] = None)

  /** Newline-split rule list (filters.go:26–37 string arm). */
  def parse(v: Option[String]): Seq[String] = v.fold(Seq("*"))(_.split("\n").toSeq)

  /** `SatisfyFilter` (filters.go:9–11): literal `*`, else trimmed
    * case-folded equality. */
  private def satisfy(f: String, subject: Column): Column =
    if (f == "*") lit(true)
    // Locale.ROOT: Spark's lower() is locale-independent; a default-locale
    // fold would mangle 'I' under tr/az locales and silently drop events
    else lower(trim(subject)) === f.trim.toLowerCase(java.util.Locale.ROOT)

  /** `SatisfyDomainFilter` non-eager (filters.go:15–24): literal `*`,
    * `*.domain.com` = suffix `.domain.com` (the bare apex does NOT match),
    * else exact. */
  private def satisfyDomain(f: String, subject: Column): Column =
    if (f == "*") lit(true)
    else if (f.startsWith("*.")) subject.endsWith(f.substring(1))
    else subject === f

  private def anyOf(fs: Seq[String], p: String => Column): Column =
    if (fs.isEmpty) lit(false) else fs.map(p).reduce(_ || _)

  /** `ApplyFilters` (filters.go:39–50): hosts AND (type OR event). */
  def predicate(opts: Opts, typeCol: Column, eventCol: Column,
                hostCol: Column): Column = {
    val evs = parse(opts.events)
    val hs = parse(opts.hosts)
    val (t, e, h) = (coalesce(typeCol, lit("")), coalesce(eventCol, lit("")),
      coalesce(hostCol, lit("")))
    anyOf(hs, satisfyDomain(_, h)) &&
      (anyOf(evs, satisfy(_, t)) || anyOf(evs, satisfy(_, e)))
  }

  // ---- authorized-JavaScript-domains origin check (edge auth) -----------
  // Per-REQUEST control plane (an Origin header against a config string),
  // so these are plain driver-side functions, not Columns.

  /** Rule sanitizer (filters.go:59–67): trim, strip one URL scheme, strip a
    * trailing slash. */
  private def sanitizeJsDomain(d0: String): String = {
    val d1 = d0.trim
    val d2 = if (d1.startsWith("https://")) d1.stripPrefix("https://")
             else d1.stripPrefix("http://")
    d2.stripSuffix("/")
  }

  /** `SatisfyDomainFilter` EAGER form (filters.go:15–24): `*.domain.com`
    * matches subdomains AND the bare apex — the CORS-ish authorization
    * semantics, unlike the ingest-filter host rule's non-eager form. */
  private def satisfyDomainEager(f: String, subject: String): Boolean =
    if (f == "*") true
    else if (f.startsWith("*.")) subject.endsWith(f.substring(1)) || subject == f.substring(2)
    else f == subject

  /** `ApplyAuthorizedJavaScriptDomainsFilter` (filters.go:52–57):
    * comma-separated rules, ANY sanitized rule admitting the origin. */
  def authorizedJsDomains(domains: String, origin: String): Boolean =
    domains.split(",").exists(r => satisfyDomainEager(sanitizeJsDomain(r), origin))

  /** `checkOrigin` (ingest/router.go:607–625), for BROWSER ingest only:
    * empty or `*` config admits everything; a MISSING Origin header is
    * allowed (the reference lets non-CORS clients through — the writeKey is
    * the credential, the origin check is defense in depth); otherwise the
    * header is stripped of its scheme and port and must satisfy a rule. */
  def checkOrigin(authorizedDomains: String, originHeader: Option[String]): Boolean = {
    val ds = authorizedDomains.trim
    if (ds.isEmpty || ds == "*") true
    else originHeader.map(_.trim).filter(_.nonEmpty).forall { o =>
      val noScheme = if (o.startsWith("https://")) o.stripPrefix("https://")
                     else o.stripPrefix("http://")
      authorizedJsDomains(ds, noScheme.split(":")(0))
    }
  }
}
