package graft.http

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

/** Connection-test endpoint semantics (`TestConnectionHandler`,
  * bulkerapp/app/router.go:434-483) — the UI's "test connection" button:
  * POST a destination config, parse it, instantiate the destination, report
  * ok or the failure. Outcomes mirror the reference's:
  *
  *   - unparseable body → 422 `parse failed`;
  *   - an unusable destination (unknown type, unreachable warehouse) →
  *     422 `error creating bulker: ...`;
  *   - a destination that constructs (and, for a live JDBC config,
  *     connects) → 200 `{"ok":true}`.
  *
  * The probe is the engine twin of `bulker.CreateBulker`: the
  * `destinationType` must name a known [[graft.sql.Dialect]], and a config
  * carrying a JDBC `url` is probed with a REAL connection attempt (Derby is
  * the live stand-in; the network warehouses validate dialect-only, same
  * treatment as K1–K6). Pure driver-side control plane. */
object ConnectionTest {

  private val mapper = new ObjectMapper()

  /** Probe threads: daemon, named, unbounded count but each probe is
    * bounded by `timeoutMs` — a stuck TCP connect costs one parked thread,
    * never a blocked caller. */
  private val probePool = java.util.concurrent.Executors.newCachedThreadPool(
    (r: Runnable) => {
      val t = new Thread(r, "graft-conn-test"); t.setDaemon(true); t
    })

  /** Run the test: Left(error message) → 422, Right(destinationId) → 200.
    * The live connect runs on [[probePool]] under `timeoutMs` — a caller-
    * supplied URL pointing at an unreachable host must not hold the HTTP
    * handler for the OS connect timeout. */
  def test(body: String,
           connect: String => Unit = defaultConnect,
           timeoutMs: Long = 5000L): Either[String, String] = {
    val cfg =
      try mapper.readTree(body) match {
        case o: ObjectNode => o
        case _ => return Left("parse failed: config must be a JSON object")
      } catch { case e: Exception =>
        return Left(s"parse failed: ${Option(e.getMessage).getOrElse("bad JSON")}") }
    def str(f: String): String =
      Option(cfg.get(f)).filter(_.isTextual).map(_.asText).getOrElse("")
    val id = str("id")
    val destType = str("destinationType")
    if (destType.isEmpty)
      return Left("error creating bulker: no destinationType specified")
    if (!graft.sql.Dialect.all.contains(destType))
      return Left(s"error creating bulker: unknown bulker implementation: $destType")
    val url = str("url")
    if (url.nonEmpty) {
      val probe = probePool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = connect(url)
      })
      try probe.get(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)
      catch {
        case _: java.util.concurrent.TimeoutException =>
          probe.cancel(true)
          return Left(s"error creating bulker: connection test timed out after ${timeoutMs}ms")
        case e: java.util.concurrent.ExecutionException =>
          val cause = Option(e.getCause).getOrElse(e)
          return Left(s"error creating bulker: ${Option(cause.getMessage).getOrElse("connect failed")}")
        case e: Exception =>
          return Left(s"error creating bulker: ${Option(e.getMessage).getOrElse("connect failed")}")
      }
    }
    Right(id)
  }

  /** Live probe: open-and-close one JDBC connection (CreateBulker's ping). */
  private def defaultConnect(url: String): Unit =
    java.sql.DriverManager.getConnection(url).close()
}
