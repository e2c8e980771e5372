package graft.streaming

import java.util.concurrent.atomic.AtomicReference

/** Hot-reloadable configuration — the reference's repository family
  * (`jitsubase/appbase/abstract_repository.go`, served over HTTP by
  * `bulkerapp/app/http_configuration_source.go` and consumed by
  * `ingest/repository.go`): a background ticker refreshes the config from
  * its source, a TAG (Last-Modified/etag) short-circuits unmodified polls,
  * the new snapshot swaps in ATOMICALLY (readers always see a complete
  * config, never a half-applied one), a change notification drives consumer
  * lifecycle (topic_manager reacts to added/removed connections), and a
  * failed refresh keeps serving the last good snapshot.
  *
  * Spark-native use: `foreachBatch` bodies read [[current]] at each
  * micro-batch boundary, so a link added or removed mid-stream takes effect
  * on the NEXT batch with no event lost — exactly the reference's
  * change-driven consumer restart, minus the restart.
  *
  * `loader(tag)` returns `Some((data, newTag))` on a modified load, `None`
  * when unmodified; it THROWS on a real failure (kept stale + counted).
  * All clock/ticker machinery is optional — [[refresh]] can be driven
  * manually (per micro-batch) or by [[start]]'s daemon ticker.
  */
final class ConfigRepository[T](
    initial: T,
    loader: Option[AnyRef] => Option[(T, AnyRef)],
    refreshMs: Long = 5000L) {

  private val ref = new AtomicReference[T](initial)
  private val tagRef = new AtomicReference[Option[AnyRef]](None)
  private val listeners =
    new java.util.concurrent.ConcurrentLinkedQueue[T => Unit]()
  @volatile private var failures = 0L
  @volatile private var ticker: Option[java.util.concurrent.ScheduledFuture[_]] = None

  /** The live snapshot — always complete, never torn. */
  def current: T = ref.get()

  /** Consecutive refresh failures since the last good load. */
  def failureCount: Long = failures

  /** Change-driven lifecycle hook (the reference's ChangesChannel,
    * abstract_repository.go:170-177): fired with the NEW snapshot after
    * each modified refresh, on the refreshing thread. */
  def onChange(f: T => Unit): Unit = { listeners.add(f); () }

  /** One poll: load with the current tag; an unmodified answer is a no-op,
    * a modified one swaps atomically and notifies, a THROWN failure keeps
    * the stale snapshot (abstract_repository.go:116-168). Returns whether
    * the snapshot changed. Serialized — the ticker and a manual
    * per-micro-batch refresh may race, and an interleaved pair of polls
    * could otherwise publish a mismatched (data, tag) pair or fire
    * onChange listeners out of order (readers of [[current]] are lock-free
    * either way). */
  def refresh(): Boolean = refreshLock.synchronized {
    // the load/swap and the notifications are separate phases: once the
    // snapshot swapped, the refresh HAS succeeded — a throwing listener must
    // not be miscounted as a load failure, mask the swap from the caller, or
    // starve the remaining listeners of the change they're owed
    val swapped: Option[T] =
      try loader(tagRef.get()) match {
        case None => failures = 0; None
        case Some((data, newTag)) =>
          ref.set(data)
          tagRef.set(Some(newTag))
          failures = 0
          Some(data)
      } catch {
        case _: Exception => failures += 1; None // keep serving stale config
      }
    swapped.foreach { data =>
      listeners.forEach(f => try f(data) catch { case _: Exception => () })
    }
    swapped.isDefined
  }

  private val refreshLock = new Object

  /** Start the background ticker (abstract_repository.go:181-205). */
  def start(): ConfigRepository[T] = synchronized {
    if (ticker.isEmpty)
      ticker = Some(ConfigRepository.scheduler.scheduleAtFixedRate(
        () => { refresh(); () },
        refreshMs, refreshMs, java.util.concurrent.TimeUnit.MILLISECONDS))
    this
  }

  def close(): Unit = synchronized {
    ticker.foreach(_.cancel(false)); ticker = None
  }
}

object ConfigRepository {
  private lazy val scheduler = {
    val t = new java.util.concurrent.ScheduledThreadPoolExecutor(1, (r: Runnable) => {
      val th = new Thread(r, "graft-config-refresh"); th.setDaemon(true); th
    })
    t.setRemoveOnCancelPolicy(true)
    t
  }
}
