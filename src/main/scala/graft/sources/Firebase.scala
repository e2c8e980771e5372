package graft.sources

/** Firebase (Firestore + Auth users) source connector — the data-plane twin
  * of the reference's `connectors/firebase/firebase.go`, emitting the same
  * Airbyte-protocol lines its CDK writes (`connectors/airbytecdk/
  * protocol.go`, `sourceRunner.go`) so the existing [[AirbyteRunner]]
  * consumes them unchanged. The Firestore/Auth CLIENT is env-bound (no
  * network, no Google SDK in this sandbox), so the client surface is the
  * [[Firebase.Store]] trait: the connector's own logic — collection
  * pagination with the batch-restart quirk, LatLng flattening, subcollection
  * JSON-array embedding, the auth-user field mapping with its
  * millis-as-"nanoseconds" timestamp quirk, and the final LEGACY state —
  * is all real and replicated line-for-line against firebase.go.
  *
  * Reference behaviors carried over exactly:
  *  - Spec/Check/Discover/Read subcommand outputs (sourceRunner.go:43-128):
  *    SPEC / CONNECTION_STATUS (`SUCCEEDED`|`FAILED`) / CATALOG / the read
  *    stream of LOG + RECORD + one final STATE.
  *  - Discover (firebase.go:111-171): one full-refresh stream per top-level
  *    Firestore collection (namespace `firestore`, pk `id`, EMPTY
  *    json_schema — types are inferred downstream), plus the `users` stream
  *    (namespace `auth`, pk `uid`) appended last.
  *  - Read (firebase.go:183-236): streams in CONFIGURED-CATALOG order;
  *    `auth.users` routes to [[readUsers]], everything else to
  *    [[readCollection]]; after all streams ONE legacy state
  *    `{"data":{"timestamp":<now ms>}}` (protocol.go:270-279 wraps
  *    `tracker.State` payloads under `data` with no state `type` — the
  *    LEGACY shape in [[AirbyteRunner.processState]]).
  *  - Pagination (firebase.go:277-356): pages of `batchSize` docs in
  *    document-ID order; a FULL page restarts the iterator with
  *    `OrderBy(DocumentID).StartAfter(lastDoc.Ref.ID)` — so a collection
  *    whose size is an exact multiple of `batchSize` issues one extra empty
  *    page; a doc with nil data is SKIPPED but still advances both the
  *    page cursor and the loaded count (lastDoc/loaded are set before the
  *    nil check, firebase.go:297-298,320-322).
  *  - Value mapping (firebase.go:383-399 `convertSpecificTypes`): a LatLng
  *    value is replaced by two top-level-of-its-map keys with a LITERAL DOT
  *    (`name+".latitude"`, `name+".longitude"`); nested maps recurse;
  *    arrays do NOT (the Go switch has no slice case). `data["id"]` is set
  *    AFTER conversion (firebase.go:325) and each subcollection is embedded
  *    as a JSON-ARRAY STRING under its collection id (firebase.go:326-339,
  *    `json.Marshal` of `[]map[string]any` — Go marshals map keys in SORTED
  *    order, replicated by [[jsonObj]]).
  *  - Auth users (firebase.go:238-272): the exact field mapping, `nil`
  *    provider slice marshalling to JSON `null`, and
  *    `unixTimestampToISOString` (firebase.go:378-381): the parameter is
  *    NAMED nanoseconds but Firebase UserMetadata feeds MILLIS; `/1000`
  *    (toward zero, like Go) yields seconds, formatted with layout
  *    `2006-01-02T15:04:05.000000Z` — six literal zero fraction digits and
  *    a literal `Z` (a bare `Z` is not a Go zone token), seconds precision.
  */
object Firebase {

  /** firebase.go:19 — Firestore "doesn't respect big requests". */
  val BatchSize = 10000

  // ---------------------------------------------------------------- model

  /** The two coordinates of `google.golang.org/genproto/.../latlng.LatLng`. */
  final case class LatLng(latitude: Double, longitude: Double)

  /** One Firestore document: `data == null` models a snapshot whose
    * `doc.Data()` returns nil (skipped, firebase.go:320-322); subcollections
    * carry (collectionId, docs) in collection-ID order, each sub-doc's data
    * already flat. */
  final case class Doc(
      id: String,
      data: Map[String, Any],
      subcollections: Seq[(String, Seq[Map[String, Any]])] = Nil)

  /** `auth.UserRecord` slice the connector reads (firebase.go:250-264).
    * Timestamps are epoch MILLIS, as Firebase's UserMetadata delivers. */
  final case class AuthUser(
      uid: String,
      email: String,
      displayName: String,
      phoneNumber: String,
      photoUrl: String,
      providerIds: Seq[String],
      disabled: Boolean,
      creationTimestampMs: Long,
      lastLogInTimestampMs: Long,
      lastRefreshTimestampMs: Long)

  /** The Firestore/Auth client surface the connector drives. Implementations
    * must serve [[page]] in document-ID order (Firestore's default and its
    * `OrderBy(DocumentID)` are both the key order). */
  trait Store {
    /** top-level collection IDs in ID order (`firestoreClient.Collections`) */
    def collectionIds: Seq[String]
    def hasCollection(id: String): Boolean
    /** up to `limit` docs with id strictly after `startAfter` (None = from
      * the start), in document-ID order. */
    def page(collection: String, startAfter: Option[String], limit: Int): Seq[Doc]
    def users: Seq[AuthUser]
  }

  /** In-memory store. Documents are sorted by CODE POINTS (= UTF-8 byte
    * order, Firestore's document-ID order) — `String.compareTo` is UTF-16
    * and would misplace supplementary characters. */
  final class FixtureStore(
      collections: Seq[(String, Seq[Doc])],
      val users: Seq[AuthUser]) extends Store {
    private val sorted: Map[String, Vector[Doc]] =
      collections.map { case (id, docs) =>
        id -> docs.sortWith((a, b) => cpCompare(a.id, b.id) < 0).toVector
      }.toMap
    val collectionIds: Seq[String] =
      collections.map(_._1).sortWith(cpCompare(_, _) < 0)
    def hasCollection(id: String): Boolean = sorted.contains(id)
    def page(collection: String, startAfter: Option[String], limit: Int): Seq[Doc] = {
      val docs = sorted.getOrElse(collection, Vector.empty)
      val from = startAfter match {
        case None => docs
        case Some(id) => docs.dropWhile(d => cpCompare(d.id, id) <= 0)
      }
      from.take(limit)
    }
  }

  /** the house code-point comparator (UTF-8 order, see CLAUDE.md) */
  private def cpCompare(a: String, b: String): Int = graft.llm.Bpe.cpCompare(a, b)

  // ------------------------------------------------------- JSON rendering

  private def jstr(s: String): String = graft.Verify.jsonStr(s)

  /** Render a connector value the way Go's `json.Marshal` does: map keys
    * sorted byte-wise, compact separators, nil slices/maps as `null`. */
  private[sources] def jsonValue(v: Any): String = v match {
    case null => "null"
    case s: String => jstr(s)
    case b: Boolean => b.toString
    case i: Int => i.toString
    case l: Long => l.toString
    case d: Double =>
      // Go renders float64 shortest-roundtrip; the fixture discipline is to
      // only feed exactly-representable values, where Double.toString and
      // strconv agree (e.g. -89.75)
      if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString
      else d.toString
    case m: Map[_, _] => jsonObj(m.asInstanceOf[Map[String, Any]])
    case xs: Seq[_] => xs.map(jsonValue).mkString("[", ",", "]")
    case other => // fail loudly at the source: a silent stringification
      // would surface much later as a confusing landed-column-type diff
      throw new IllegalArgumentException(
        s"unsupported connector value type: ${other.getClass.getName}")
  }

  /** Go `json.Marshal(map[string]any)`: keys in sorted order. */
  private[sources] def jsonObj(m: Map[String, Any]): String =
    m.toSeq.sortWith((a, b) => cpCompare(a._1, b._1) < 0)
      .map { case (k, v) => s"${jstr(k)}:${jsonValue(v)}" }
      .mkString("{", ",", "}")

  // --------------------------------------------------------- line shapes

  private def logLine(level: String, message: String): String =
    s"""{"type":"LOG","log":{"level":"$level","message":${jstr(message)}}}"""

  /** protocol.go:83-88 field order: emitted_at, namespace, data, stream. */
  private def recordLine(nowMs: Long, namespace: String, dataJson: String,
                         stream: String): String =
    s"""{"type":"RECORD","record":{"emitted_at":$nowMs,"namespace":${jstr(namespace)},""" +
      s""""data":$dataJson,"stream":${jstr(stream)}}}"""

  /** protocol.go:270-279 — `tracker.State` wraps the payload under `data`
    * with no state `type`: the LEGACY shape. */
  private def stateLine(dataJson: String): String =
    s"""{"type":"STATE","state":{"data":$dataJson}}"""

  // ------------------------------------------------ spec / check / discover

  /** firebase.go:37-69 — the SPEC message (line form, sourceRunner.go:54-57). */
  def spec(): String =
    """{"type":"SPEC","spec":{"documentationUrl":"","changelogUrl":"","connectionSpecification":{""" +
      """"$schema":"","title":"Firebase","description":"Firebase (Firestore and User) Source connector",""" +
      """"type":"object","required":["projectId","serviceAccountKey"],"properties":{""" +
      """"projectId":{"description":"Firebase Project ID from the Project Settings page","type":"string"},""" +
      """"serviceAccountKey":{"description":"Auth (Service account key JSON)","type":"string","airbyte_secret":true}}},""" +
      """"supported_destination_sync_modes":["overwrite"]}}"""

  /** firebase.go:71-109 + sourceRunner.go:59-81: probe the auth users
    * iterator; any failure maps to CONNECTION_STATUS `FAILED`, success to
    * `SUCCEEDED` (which the sidecar normalizes to SUCCESS). */
  def check(store: Store): String = {
    val status =
      try { store.users.iterator.hasNext; "SUCCEEDED" }
      catch { case _: Exception => "FAILED" }
    s"""{"type":"CONNECTION_STATUS","connectionStatus":{"status":"$status"}}"""
  }

  private def streamMeta(name: String, namespace: String, pk: String): String =
    s"""{"name":${jstr(name)},"namespace":${jstr(namespace)},""" +
      s""""source_defined_primary_key":[[${jstr(pk)}]],"json_schema":{},""" +
      """"supported_sync_modes":["full_refresh"],"source_defined_cursor":false}"""

  /** firebase.go:111-171: a stream per collection + `auth.users` last.
    * json_schema stays EMPTY (airbyte.Properties{}) — the engine infers. */
  def discover(store: Store): String = {
    val streams =
      store.collectionIds.map(c => streamMeta(c, "firestore", "id")) :+
        streamMeta("users", "auth", "uid")
    s"""{"type":"CATALOG","catalog":{"streams":[${streams.mkString(",")}]}}"""
  }

  /** The configured catalog the orchestrator would hand the sidecar: every
    * discovered stream selected in full_refresh mode (the only mode the
    * connector supports, firebase.go:151-154). */
  def configuredCatalogJson(store: Store): String = {
    val entries =
      (store.collectionIds.map(c => streamMeta(c, "firestore", "id")) :+
        streamMeta("users", "auth", "uid"))
        .map(meta => s"""{"stream":$meta,"sync_mode":"full_refresh","cursor_field":[]}""")
    s"""{"streams":[${entries.mkString(",")}]}"""
  }

  // ----------------------------------------------------------------- read

  /** firebase.go:18,378-381: `time.Unix(ms/1000, 0).Format(Layout)` — the
    * "nanoseconds" parameter actually receives millis; `/1000` truncates
    * toward zero (pre-epoch values would round the wrong way — faithful to
    * the reference, which only ever sees post-epoch Firebase metadata);
    * the layout's fraction is six LITERAL zeros at seconds precision and
    * the trailing `Z` is a literal (not a Go zone token). NOTE: Go's
    * `time.Unix(...).Format` renders in the PROCESS-LOCAL timezone; this
    * pins UTC, which is faithful exactly when the reference connector runs
    * with TZ=UTC (the containerized deployment does; Verify/Bench pin
    * `spark.sql.session.timeZone=UTC` to match). */
  private[sources] def unixTimestampToIsoString(ms: Long): String = {
    val t = java.time.LocalDateTime.ofEpochSecond(ms / 1000, 0, java.time.ZoneOffset.UTC)
    t.format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss")) +
      ".000000Z"
  }

  /** firebase.go:383-399 — LatLng → `key.latitude`/`key.longitude` (literal
    * dots, flattened in place of the original key), recursion into nested
    * maps only. Preserves everything else untouched. */
  private[sources] def convertSpecificTypes(data: Map[String, Any]): Map[String, Any] =
    data.flatMap {
      case (k, LatLng(lat, lng)) =>
        Seq(s"$k.latitude" -> lat, s"$k.longitude" -> lng)
      case (k, m: Map[_, _]) =>
        Seq(k -> convertSpecificTypes(m.asInstanceOf[Map[String, Any]]))
      case kv => Seq(kv)
    }

  /** The `read` subcommand's line stream (firebase.go:183-236): streams in
    * configured-catalog order, then ONE legacy state stamped `nowMs`. The
    * previous-state timestamp is parsed (and floored to -1) exactly like
    * the reference, and exactly as unused — every stream is full-refresh.
    * A missing collection aborts the read mid-stream (firebase.go:279-281
    * returns an error, so the connector process dies before the final
    * state) — modeled by the iterator throwing, which [[AirbyteRunner.run]]
    * catches as the reference's recover() path does a dead pipe. */
  def read(store: Store, catalog: Seq[Airbyte.Stream], nowMs: Long,
           prevStateJson: String = "", batchSize: Int = BatchSize): Iterator[String] = {
    var prevTs = -1L // LastSyncTime floor (firebase.go:196-200)
    if (prevStateJson.nonEmpty) {
      try {
        val n = Airbyte.mapper.readTree(prevStateJson).get("timestamp")
        if (n != null && n.asLong(0L) > 0) prevTs = n.asLong()
      } catch { case _: Exception => () }
    }
    locally(prevTs) // parsed for fidelity; full-refresh reads never consult it

    val head = Iterator.single(logLine("INFO", "Running read"))
    val streams = catalog.iterator.flatMap { stream =>
      if (stream.namespace == "auth" && stream.name == "users")
        readUsers(store, stream, nowMs)
      else readCollection(store, stream, nowMs, batchSize)
    }
    val tail = Iterator.single(stateLine(s"""{"timestamp":$nowMs}"""))
    head ++ streams ++ tail
  }

  /** firebase.go:238-272 — the exact field mapping; a nil provider slice
    * marshals to JSON null; the three metadata timestamps go through
    * [[unixTimestampToIsoString]]. */
  private def readUsers(store: Store, stream: Airbyte.Stream,
                        nowMs: Long): Iterator[String] =
    store.users.iterator.map { u =>
      val data: Map[String, Any] = Map(
        "email" -> u.email,
        "name" -> u.displayName,
        "uid" -> u.uid,
        "phone" -> u.phoneNumber,
        "photo_url" -> u.photoUrl,
        // firebase.go:255-259 builds signInMethods by appending to a nil
        // slice — ZERO providers leaves it nil and json.Marshal emits null,
        // so an empty Seq must land as null too, not "[]"
        "sign_in_methods" -> (if (u.providerIds == null || u.providerIds.isEmpty) null
                              else u.providerIds),
        "disabled" -> u.disabled,
        "created_at" -> unixTimestampToIsoString(u.creationTimestampMs),
        "last_login" -> unixTimestampToIsoString(u.lastLogInTimestampMs),
        "last_refresh" -> unixTimestampToIsoString(u.lastRefreshTimestampMs))
      recordLine(nowMs, stream.namespace, jsonObj(data), stream.name)
    }

  /** firebase.go:277-356 — ID-ordered pages; a full page restarts the
    * iterator AFTER the page's last doc id (even if that doc's data was
    * nil); per doc: convertSpecificTypes, `id` set after conversion,
    * subcollections embedded as sorted-key JSON-array strings. */
  private def readCollection(store: Store, stream: Airbyte.Stream, nowMs: Long,
                             batchSize: Int): Iterator[String] = {
    if (!store.hasCollection(stream.name))
      throw new IllegalStateException(
        s"collection [${stream.name}] doesn't exist in Firestore")
    val pages: Iterator[Seq[Doc]] = new Iterator[Seq[Doc]] {
      private var startAfter: Option[String] = None
      private var lastLoaded = batchSize // primed: first page always fetches
      def hasNext: Boolean = lastLoaded == batchSize
      def next(): Seq[Doc] = {
        val docs = store.page(stream.name, startAfter, batchSize)
        lastLoaded = docs.size
        if (docs.nonEmpty) startAfter = Some(docs.last.id)
        docs
      }
    }
    pages.flatten.flatMap { doc =>
      if (doc.data == null) Iterator.empty // doc.Data() nil: skip, still paged
      else {
        val converted = convertSpecificTypes(doc.data) + ("id" -> doc.id)
        // a subcollection embeds as a JSON STRING whose content is a JSON
        // array (firebase.go:335,358-376): collToJSONArray marshals the
        // sub-docs and the TEXT becomes an ordinary string field
        val withSubs = doc.subcollections.foldLeft(converted) {
          case (acc, (colId, docs)) =>
            acc + (colId -> docs.map(jsonObj).mkString("[", ",", "]"))
        }
        Iterator.single(
          recordLine(nowMs, stream.namespace, jsonObj(withSubs), stream.name))
      }
    }
  }
}
