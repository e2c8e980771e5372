package graft.sources

import java.sql.{Connection, Timestamp}

import graft.sink.JdbcSink

/** The sync task-plane warehouse bookkeeping — `sync-sidecar/db/db.go` +
  * the `sync-controller/db_schema.go` tables, on the live JDBC sink
  * (Derby here; the reference targets Postgres via pgx).
  *
  * Postgres `INSERT .. ON CONFLICT DO UPDATE [WHERE ..]` has no Derby
  * equivalent, so each helper re-expresses its exact conditional-upsert
  * semantics as UPDATE-first-then-INSERT inside one connection:
  * the UPDATE carries the reference's conflict-row guard verbatim
  * (e.g. `source_spec` only overwrites while `specs IS NULL`,
  * db.go:10-14; `source_task`'s RUNNING-guarded upsert, db.go:34-35) and
  * a zero-row UPDATE falls through to INSERT only when the key row is
  * truly absent — a guarded-out row must stay untouched, not duplicate.
  * Writes are single-row control-plane rows (task/spec/check/state
  * bookkeeping), never the data path.
  */
object SyncDb {

  val SpecTable = "SOURCE_SPEC"
  val CatalogTable = "SOURCE_CATALOG"
  val CheckTable = "SOURCE_CHECK"
  val StateTable = "SOURCE_STATE"
  val TaskTable = "SOURCE_TASK"

  /** db_schema.go:7-48 (the prisma-managed DDL the db.go statements
    * assume), Derby dialect: `json` → VARCHAR(32672), `timestamp with
    * time zone` → TIMESTAMP (sessions pin UTC). `source_task` carries the
    * columns db.go actually binds (error/metrics/started_by — the
    * commented schema lags the queries). */
  def init(sink: JdbcSink): Unit = sink.withConnection { c =>
    def ensure(ddl: String): Unit =
      try sink.exec(c, ddl)
      catch { case e: java.sql.SQLException if e.getSQLState == "X0Y32" => () }
    ensure(s"""CREATE TABLE "$SpecTable" (
      package VARCHAR(256) NOT NULL, version VARCHAR(64) NOT NULL,
      specs VARCHAR(32672), "timestamp" TIMESTAMP, error VARCHAR(4096),
      PRIMARY KEY (package, version))""")
    ensure(s"""CREATE TABLE "$CatalogTable" (
      package VARCHAR(256) NOT NULL, version VARCHAR(64) NOT NULL,
      "key" VARCHAR(256) NOT NULL, "catalog" VARCHAR(32672),
      "timestamp" TIMESTAMP, status VARCHAR(32), description VARCHAR(4096),
      PRIMARY KEY (package, version, "key"))""")
    ensure(s"""CREATE TABLE "$CheckTable" (
      package VARCHAR(256) NOT NULL, version VARCHAR(64) NOT NULL,
      "key" VARCHAR(256) NOT NULL PRIMARY KEY, status VARCHAR(32),
      description VARCHAR(4096), "timestamp" TIMESTAMP)""")
    ensure(s"""CREATE TABLE "$StateTable" (
      sync_id VARCHAR(64) NOT NULL, stream VARCHAR(256) NOT NULL,
      state VARCHAR(32672), "timestamp" TIMESTAMP,
      PRIMARY KEY (sync_id, stream))""")
    ensure(s"""CREATE TABLE "$TaskTable" (
      sync_id VARCHAR(64) NOT NULL, task_id VARCHAR(64) NOT NULL PRIMARY KEY,
      package VARCHAR(256), version VARCHAR(64),
      started_at TIMESTAMP, updated_at TIMESTAMP, status VARCHAR(32),
      description VARCHAR(32672), error VARCHAR(32672),
      metrics VARCHAR(4096), started_by VARCHAR(4096))""")
    ensure(s"""CREATE INDEX source_task_sync_id_index ON "$TaskTable" (sync_id)""")
    ensure(s"""CREATE INDEX source_task_started_at_index ON "$TaskTable" (started_at DESC)""")
  }

  private def ts(ms: Long): Timestamp = new Timestamp(ms)

  private def update(c: Connection, sql: String)(bind: java.sql.PreparedStatement => Unit): Int = {
    val ps = c.prepareStatement(sql)
    try { bind(ps); ps.executeUpdate() } finally ps.close()
  }

  private def exists(c: Connection, sql: String)(bind: java.sql.PreparedStatement => Unit): Boolean = {
    val ps = c.prepareStatement(sql)
    try { bind(ps); val rs = ps.executeQuery(); try rs.next() finally rs.close() }
    finally ps.close()
  }

  /** The INSERT leg of an UPDATE-then-INSERT upsert. Postgres's ON
    * CONFLICT is atomic; this re-expression can lose an insert race under
    * concurrent tasks, so a duplicate-key (Derby 23505) falls back to the
    * caller's conflict action — the same guarded update, which may
    * rightfully match zero rows. */
  private def insertRacing(ins: => Unit)(onConflict: => Unit): Unit =
    try ins
    catch { case e: java.sql.SQLException if e.getSQLState == "23505" => onConflict }

  // ------------------------------------------------------------ source_spec

  /** db.go:10-11 upsertSpecSQL: overwrite only while the landed row has no
    * specs yet (a successful spec is immutable). */
  def upsertSpec(sink: JdbcSink, pkg: String, version: String, specs: String,
                 tsMs: Long, error: String): Unit = sink.withConnection { c =>
    def upd() = update(c, s"""UPDATE "$SpecTable" SET specs = ?, "timestamp" = ?,
        error = ? WHERE package = ? AND version = ? AND specs IS NULL""") { ps =>
      ps.setString(1, specs); ps.setTimestamp(2, ts(tsMs)); ps.setString(3, error)
      ps.setString(4, pkg); ps.setString(5, version)
    }
    if (upd() == 0 && !exists(c, s"""SELECT 1 FROM "$SpecTable"
        WHERE package = ? AND version = ?""") { ps =>
      ps.setString(1, pkg); ps.setString(2, version)
    }) insertRacing {
      update(c, s"""INSERT INTO "$SpecTable" (package, version, specs, "timestamp", error)
          VALUES (?, ?, ?, ?, ?)""") { ps =>
        ps.setString(1, pkg); ps.setString(2, version); ps.setString(3, specs)
        ps.setTimestamp(4, ts(tsMs)); ps.setString(5, error)
      }
      ()
    } { upd(); () }
  }

  /** db.go:13-14 insertSpecErrorSQL — same specs-IS-NULL guard, no specs
    * column bound. */
  def insertSpecError(sink: JdbcSink, pkg: String, version: String,
                      tsMs: Long, error: String): Unit = sink.withConnection { c =>
    def upd() = update(c, s"""UPDATE "$SpecTable" SET "timestamp" = ?, error = ?
        WHERE package = ? AND version = ? AND specs IS NULL""") { ps =>
      ps.setTimestamp(1, ts(tsMs)); ps.setString(2, error)
      ps.setString(3, pkg); ps.setString(4, version)
    }
    if (upd() == 0 && !exists(c, s"""SELECT 1 FROM "$SpecTable"
        WHERE package = ? AND version = ?""") { ps =>
      ps.setString(1, pkg); ps.setString(2, version)
    }) insertRacing {
      update(c, s"""INSERT INTO "$SpecTable" (package, version, "timestamp", error)
          VALUES (?, ?, ?, ?)""") { ps =>
        ps.setString(1, pkg); ps.setString(2, version)
        ps.setTimestamp(3, ts(tsMs)); ps.setString(4, error)
      }
      ()
    } { upd(); () }
  }

  // --------------------------------------------------------- source_catalog

  private def catalogUpsert(sink: JdbcSink, pkg: String, version: String,
                            key: String, tsMs: Long, status: String,
                            description: String, guard: String): Unit =
    sink.withConnection { c =>
      def upd() = update(c, s"""UPDATE "$CatalogTable" SET "timestamp" = ?,
          status = ?, description = ?
          WHERE package = ? AND version = ? AND "key" = ?$guard""") { ps =>
        ps.setTimestamp(1, ts(tsMs)); ps.setString(2, status); ps.setString(3, description)
        ps.setString(4, pkg); ps.setString(5, version); ps.setString(6, key)
      }
      if (upd() == 0 && !exists(c, s"""SELECT 1 FROM "$CatalogTable"
          WHERE package = ? AND version = ? AND "key" = ?""") { ps =>
        ps.setString(1, pkg); ps.setString(2, version); ps.setString(3, key)
      }) insertRacing {
        update(c, s"""INSERT INTO "$CatalogTable"
            (package, version, "key", "timestamp", status, description)
            VALUES (?, ?, ?, ?, ?, ?)""") { ps =>
          ps.setString(1, pkg); ps.setString(2, version); ps.setString(3, key)
          ps.setTimestamp(4, ts(tsMs)); ps.setString(5, status); ps.setString(6, description)
        }
        ()
      } { upd(); () }
    }

  /** db.go:16-17 — unconditional status upsert. */
  def upsertCatalogStatus(sink: JdbcSink, pkg: String, version: String, key: String,
                          tsMs: Long, status: String, description: String): Unit =
    catalogUpsert(sink, pkg, version, key, tsMs, status, description, guard = "")

  /** db.go:19-20 — only overwrites a row still marked RUNNING (a landed
    * SUCCESS catalog must not be downgraded by a late failure rollup). */
  def upsertRunningCatalogStatus(sink: JdbcSink, pkg: String, version: String,
                                 key: String, tsMs: Long, status: String,
                                 description: String): Unit =
    catalogUpsert(sink, pkg, version, key, tsMs, status, description,
      guard = " AND status = 'RUNNING'")

  /** db.go:22-23 — success overwrite including the catalog JSON. */
  def upsertCatalogSuccess(sink: JdbcSink, pkg: String, version: String,
                           key: String, catalog: String, tsMs: Long,
                           status: String, description: String): Unit =
    sink.withConnection { c =>
      def upd() = update(c, s"""UPDATE "$CatalogTable" SET "catalog" = ?,
          "timestamp" = ?, status = ?, description = ?
          WHERE package = ? AND version = ? AND "key" = ?""") { ps =>
        ps.setString(1, catalog); ps.setTimestamp(2, ts(tsMs))
        ps.setString(3, status); ps.setString(4, description)
        ps.setString(5, pkg); ps.setString(6, version); ps.setString(7, key)
      }
      if (upd() == 0) insertRacing {
        update(c, s"""INSERT INTO "$CatalogTable"
            (package, version, "key", "catalog", "timestamp", status, description)
            VALUES (?, ?, ?, ?, ?, ?, ?)""") { ps =>
          ps.setString(1, pkg); ps.setString(2, version); ps.setString(3, key)
          ps.setString(4, catalog); ps.setTimestamp(5, ts(tsMs))
          ps.setString(6, status); ps.setString(7, description)
        }
        ()
      } { upd(); () }
    }

  // ----------------------------------------------------------- source_state

  /** db.go:25-26 upsertStateSQL. */
  def upsertState(sink: JdbcSink, syncId: String, stream: String, state: String,
                  tsMs: Long): Unit = sink.withConnection { c =>
    def upd() = update(c, s"""UPDATE "$StateTable" SET state = ?, "timestamp" = ?
        WHERE sync_id = ? AND stream = ?""") { ps =>
      ps.setString(1, state); ps.setTimestamp(2, ts(tsMs))
      ps.setString(3, syncId); ps.setString(4, stream)
    }
    if (upd() == 0) insertRacing {
      update(c, s"""INSERT INTO "$StateTable" (sync_id, stream, state, "timestamp")
          VALUES (?, ?, ?, ?)""") { ps =>
        ps.setString(1, syncId); ps.setString(2, stream)
        ps.setString(3, state); ps.setTimestamp(4, ts(tsMs))
      }
      ()
    } { upd(); () }
  }

  // ------------------------------------------------------------ source_task

  /** db.go:28-29 upsertTaskDescriptionAndErrorSQL — the sidecar's final
    * (unguarded) status write. */
  def upsertTaskDescriptionAndError(sink: JdbcSink, syncId: String, taskId: String,
                                    pkg: String, version: String, startedAtMs: Long,
                                    status: String, description: String,
                                    error: String, nowMs: Long): Unit =
    sink.withConnection { c =>
      def upd() = update(c, s"""UPDATE "$TaskTable" SET updated_at = ?, status = ?,
          description = ?, error = ? WHERE task_id = ?""") { ps =>
        ps.setTimestamp(1, ts(nowMs)); ps.setString(2, status)
        ps.setString(3, description); ps.setString(4, error); ps.setString(5, taskId)
      }
      if (upd() == 0) insertRacing {
        update(c, s"""INSERT INTO "$TaskTable" (sync_id, task_id, package, version,
            started_at, updated_at, status, description, error)
            VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?)""") { ps =>
          ps.setString(1, syncId); ps.setString(2, taskId); ps.setString(3, pkg)
          ps.setString(4, version); ps.setTimestamp(5, ts(startedAtMs))
          ps.setTimestamp(6, ts(nowMs)); ps.setString(7, status)
          ps.setString(8, description); ps.setString(9, error)
        }
        ()
      } { upd(); () }
    }

  /** db.go:31-32 upsertTaskErrorSQL. */
  def upsertTaskError(sink: JdbcSink, syncId: String, taskId: String, pkg: String,
                      version: String, startedAtMs: Long, status: String,
                      error: String, nowMs: Long): Unit = sink.withConnection { c =>
    def upd() = update(c, s"""UPDATE "$TaskTable" SET updated_at = ?, status = ?,
        error = ? WHERE task_id = ?""") { ps =>
      ps.setTimestamp(1, ts(nowMs)); ps.setString(2, status)
      ps.setString(3, error); ps.setString(4, taskId)
    }
    if (upd() == 0) insertRacing {
      update(c, s"""INSERT INTO "$TaskTable" (sync_id, task_id, package, version,
          started_at, updated_at, status, error)
          VALUES (?, ?, ?, ?, ?, ?, ?, ?)""") { ps =>
        ps.setString(1, syncId); ps.setString(2, taskId); ps.setString(3, pkg)
        ps.setString(4, version); ps.setTimestamp(5, ts(startedAtMs))
        ps.setTimestamp(6, ts(nowMs)); ps.setString(7, status); ps.setString(8, error)
      }
      ()
    } { upd(); () }
  }

  /** db.go:34-35 upsertRunningTaskSQL — a finished (SUCCESS / CANCELLED /
    * FAILED) row is never flipped back by the controller's RUNNING
    * bookkeeping: the conflict update only applies while status='RUNNING'. */
  def upsertRunningTask(sink: JdbcSink, syncId: String, taskId: String, pkg: String,
                        version: String, startedAtMs: Long, status: String,
                        error: String, startedBy: String, nowMs: Long): Unit =
    sink.withConnection { c =>
      def upd() = update(c, s"""UPDATE "$TaskTable" SET updated_at = ?, status = ?,
          error = ?, started_by = ? WHERE task_id = ? AND status = 'RUNNING'""") { ps =>
        ps.setTimestamp(1, ts(nowMs)); ps.setString(2, status); ps.setString(3, error)
        ps.setString(4, startedBy); ps.setString(5, taskId)
      }
      if (upd() == 0 && !exists(c,
          s"""SELECT 1 FROM "$TaskTable" WHERE task_id = ?""")(_.setString(1, taskId))) {
        insertRacing {
          update(c, s"""INSERT INTO "$TaskTable" (sync_id, task_id, package, version,
              started_at, updated_at, status, error, started_by)
              VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?)""") { ps =>
            ps.setString(1, syncId); ps.setString(2, taskId); ps.setString(3, pkg)
            ps.setString(4, version); ps.setTimestamp(5, ts(startedAtMs))
            ps.setTimestamp(6, ts(nowMs)); ps.setString(7, status)
            ps.setString(8, error); ps.setString(9, startedBy)
          }
          ()
        } { upd(); () }
      }
    }

  /** db.go:37 updateRunningTaskDateSQL. */
  def updateRunningTaskDate(sink: JdbcSink, taskId: String, nowMs: Long): Unit =
    sink.withConnection { c =>
      update(c, s"""UPDATE "$TaskTable" SET updated_at = ?
          WHERE task_id = ? AND status = 'RUNNING'""") { ps =>
        ps.setTimestamp(1, ts(nowMs)); ps.setString(2, taskId)
      }
      ()
    }

  /** db.go:39 updateRunningTaskMetricsSQL. */
  def updateRunningTaskMetrics(sink: JdbcSink, taskId: String, metricsJson: String,
                               nowMs: Long): Unit = sink.withConnection { c =>
    update(c, s"""UPDATE "$TaskTable" SET updated_at = ?, metrics = ?
        WHERE task_id = ? AND status = 'RUNNING'""") { ps =>
      ps.setTimestamp(1, ts(nowMs)); ps.setString(2, metricsJson); ps.setString(3, taskId)
    }
    ()
  }

  /** db.go:41 updateRunningTaskStatusSQL — the cancel handler's write
    * (task_manager.go:111): flips RUNNING → CANCELLED and nothing else. */
  def updateRunningTaskStatus(sink: JdbcSink, taskId: String, status: String): Unit =
    sink.withConnection { c =>
      update(c, s"""UPDATE "$TaskTable" SET status = ?
          WHERE task_id = ? AND status = 'RUNNING'""") { ps =>
        ps.setString(1, status); ps.setString(2, taskId)
      }
      ()
    }

  // ----------------------------------------------------------- source_check

  /** db.go:43-44 upsertCheckSQL. */
  def upsertCheck(sink: JdbcSink, pkg: String, version: String, key: String,
                  status: String, description: String, tsMs: Long): Unit =
    sink.withConnection { c =>
      // conflict update touches ONLY status/description/timestamp (db.go:44)
      def upd() = update(c, s"""UPDATE "$CheckTable" SET status = ?, description = ?,
          "timestamp" = ? WHERE "key" = ?""") { ps =>
        ps.setString(1, status); ps.setString(2, description); ps.setTimestamp(3, ts(tsMs))
        ps.setString(4, key)
      }
      if (upd() == 0) insertRacing {
        update(c, s"""INSERT INTO "$CheckTable"
            (package, version, "key", status, description, "timestamp")
            VALUES (?, ?, ?, ?, ?, ?)""") { ps =>
          ps.setString(1, pkg); ps.setString(2, version); ps.setString(3, key)
          ps.setString(4, status); ps.setString(5, description); ps.setTimestamp(6, ts(tsMs))
        }
        ()
      } { upd(); () }
    }

  /** db.go:46-47 insertCheckErrorSQL — DO NOTHING on conflict: a landed
    * check result (good or bad) wins over the late error rollup. */
  def insertCheckError(sink: JdbcSink, pkg: String, version: String, key: String,
                       status: String, description: String, tsMs: Long): Unit =
    sink.withConnection { c =>
      if (!exists(c, s"""SELECT 1 FROM "$CheckTable" WHERE "key" = ?""")(_.setString(1, key))) {
        insertRacing {
          update(c, s"""INSERT INTO "$CheckTable"
              (package, version, "key", status, description, "timestamp")
              VALUES (?, ?, ?, ?, ?, ?)""") { ps =>
            ps.setString(1, pkg); ps.setString(2, version); ps.setString(3, key)
            ps.setString(4, status); ps.setString(5, description); ps.setTimestamp(6, ts(tsMs))
          }
          ()
        } { () } // DO NOTHING on conflict (db.go:47)
      }
    }

  /** db.go:51 closeStaleTasksSQL — the 15-minute janitor
    * (task_manager.go:216-226): RUNNING rows whose heartbeat stalled past
    * the cutoff flip to FAILED with the reference's support message. */
  val StaleTaskError =
    "The sync task was interrupted unexpectedly. Please contact support@jitsu.com"

  def closeStaleTasks(sink: JdbcSink, olderThanMs: Long): Int =
    sink.withConnection { c =>
      update(c, s"""UPDATE "$TaskTable" SET status = 'FAILED', error = ?
          WHERE status = 'RUNNING' AND updated_at < ?""") { ps =>
        ps.setString(1, StaleTaskError); ps.setTimestamp(2, ts(olderThanMs))
      }
    }
}
