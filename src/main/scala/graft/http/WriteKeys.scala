package graft.http

import java.nio.charset.StandardCharsets.UTF_8

/** writeKey authentication for the ingest edge — the reference's key model
  * (ingest/router.go:369-397 credential extraction, 540-561 hashing,
  * 628-655 stream resolution) re-expressed:
  *
  *   - a writeKey is either PLAIN (`abc123`, looked up directly — browser
  *     keys for non-strict streams) or `keyId:secret`, where only
  *     `sha512(secret + salt + globalSecret)` is stored as `salt.hexdigest`;
  *   - credentials arrive via `Authorization: Basic base64(key[:])`,
  *     `X-Write-Key`, or the `writekey` query parameter — in that priority
  *     order;
  *   - a resolved key yields the stream (here: destination) it is bound to,
  *     with its declared key type (`s2s` or `browser`); s2s endpoints
  *     reject browser keys.
  */
object WriteKeys {

  final case class Binding(keyId: String, hash: String, streamId: String,
                           keyType: String) // "s2s" | "browser"

  /** Key registry + the deployment's global hash secrets. Plain keys map
    * key → (streamId, keyType) directly. `jsDomains` is each stream's
    * `authorizedJavaScriptDomains` config (ingest/repository.go:178) —
    * comma-separated rules checked against browser requests' Origin. */
  final case class Registry(bindings: Map[String, Binding],
                            plain: Map[String, (String, String)],
                            globalSecrets: Seq[String],
                            jsDomains: Map[String, String] = Map.empty,
                            streams: Seq[Stream] = Nil) {

    /** Resolve a writeKey to (streamId, ingestType); None = unauthorized.
      *
      * `WriteKeyStreamLocator` (router.go:629-656) semantics:
      *   - a PLAIN key resolves through the endpoint-typed map — public
      *     (browser) plaintexts are only in the browser map, private (s2s)
      *     plaintexts only in the s2s map (repository.go:88-111) — and the
      *     event is stamped with the ENDPOINT's type;
      *   - a hashed `keyId:secret` key resolves to its binding's stream.
      *     Under the `writeKeyDefined` ingest type (the `/api/s` handlers)
      *     the binding's keyType is NOT checked against the endpoint — a
      *     browser key presented on `/api/s/s2s/:tp` still resolves, and
      *     the event is stamped with the KEY's type (router.go:641-648).
      *     Under a CLASSIC ingest type the keyType must equal it. */
    def resolve(writeKey: String, s2sEndpoint: Boolean,
                writeKeyDefined: Boolean = false): Option[(String, String)] = {
      val endpointType = if (s2sEndpoint) "s2s" else "browser"
      val parts = writeKey.split(":", 2)
      if (parts.length == 1)
        plain.get(writeKey).filter(_._2 == endpointType)
          .map { case (sid, _) => (sid, endpointType) }
          // every stream's ID is in BOTH plain maps (repository.go:78-79:
          // streamsByPlainKeyOrIds[id] AND s2sStreamsByPlainKeyOrIds[id]) —
          // a bare stream id presented as the writeKey resolves to it
          .orElse(streams.find(_.id == writeKey).map(s => (s.id, endpointType)))
      else bindings.get(parts(0))
        .filter(b => writeKeyDefined || b.keyType == endpointType)
        .filter(b => checkHash(b.hash, parts(1)))
        .map(b => (b.streamId, b.keyType))
    }

    /** Per-stream edge config (throttle, dedup window) for a resolved id. */
    def streamConfig(id: String): Option[Stream] = streams.find(_.id == id)

    def checkHash(hash: String, secret: String): Boolean = {
      hash.split("\\.", 2) match {
        case Array(salt, hex) =>
          // constant-time digest compare — String == short-circuits on the
          // first differing byte, a timing side channel on secret verification
          globalSecrets.exists { gs =>
            java.security.MessageDigest.isEqual(
              hex.getBytes(UTF_8), hashApiKey(secret, salt, gs).getBytes(UTF_8))
          }
        case _ => false
      }
    }
  }

  /** `sha512(token + salt + secret)` hex — router.go:540-545. */
  def hashApiKey(token: String, salt: String, secret: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-512")
    md.digest((token + salt + secret).getBytes(UTF_8))
      .map("%02x".format(_)).mkString
  }

  /** Build the stored form of a secret: `salt.sha512hex`. */
  def storedHash(secret: String, salt: String, globalSecret: String): String =
    s"$salt.${hashApiKey(secret, salt, globalSecret)}"

  /** Extract the writeKey from request headers/query — priority order and
    * Basic-auth trailing-`:` trim per router.go:371-387. */
  def extract(authorization: Option[String], xWriteKey: Option[String],
              queryKey: Option[String]): Option[String] =
    authorization.map { a =>
      val b64 = a.stripPrefix("Basic ").trim
      try new String(java.util.Base64.getDecoder.decode(b64), UTF_8)
        .stripSuffix(":")
      catch { case _: IllegalArgumentException => a } // not base64: raw token
    }.orElse(xWriteKey).orElse(queryKey)

  /** Stream config entry for writeKey-LESS location
    * (ingest/router.go:78-79,658-715): `strict` streams only ever resolve
    * through a writeKey; `domains` back the Host-based locator.
    * `throttle` is the percentage of events shed for the stream
    * (ingest/repository.go:215 `Throttle`, applied router.go:258-261);
    * `deduplicateWindowMs` enables in-batch gap dedup on the batch
    * endpoint (router_batch_handler.go:178-182 `DeduplicateWindowMs`). */
  final case class Stream(id: String, strict: Boolean = false,
                          domains: Seq[String] = Nil,
                          throttle: Int = 0,
                          deduplicateWindowMs: Int = 0)

  /** The reference's stream-locator chains (router.go:587-605), selected by
    * the handler's INGEST TYPE, not the endpoint:
    *   writeKeyDefined (the `/api/s/:tp` AND `/api/s/s2s/:tp` handler,
    *                    router_ingest_handler.go:30):
    *                    writeKey → slug → ambiguous-domain → sole
    *   s2s (classic):   writeKey → slug → ambiguous-domain
    *   browser (classic): slug → domain → writeKey → sole
    * Every non-writeKey locator refuses `strict` streams (their credential
    * IS the key) and assigns the ENDPOINT's ingest type; the slug locator
    * matches a stream id OR a plain public key bound to it
    * (GetStreamByPlainKeyOrId, repository.go:88-90). The classic browser
    * domain locator takes a unique match, or — only when no key was sent —
    * the first non-strict stream on a shared domain (router.go:669-688);
    * the ambiguous form takes any non-strict match. A sole-stream
    * workspace resolves keylessly (router.go:705-715). Returns
    * (streamId, ingestType). */
  def locate(reg: Registry,
             slug: Option[String], domain: Option[String],
             writeKey: Option[String], s2sEndpoint: Boolean,
             ingestType: String = "writeKeyDefined"): Option[(String, String)] = {
    val streams = reg.streams
    val endpointType = if (s2sEndpoint) "s2s" else "browser"
    def ok(s: Stream) = !s.strict
    def streamOf(idOrPlainKey: String): Option[Stream] =
      streams.find(_.id == idOrPlainKey).orElse(
        reg.plain.get(idOrPlainKey).flatMap { case (sid, _) => streams.find(_.id == sid) })
    val byKey = () => writeKey.flatMap(k =>
      reg.resolve(k, s2sEndpoint, ingestType == "writeKeyDefined"))
    val bySlug = () => slug.filter(_.nonEmpty).flatMap(streamOf).filter(ok)
      .map(s => (s.id, endpointType))
    val byDomain = () => domain.filter(_.nonEmpty).flatMap { d =>
      val ms = streams.filter(_.domains.contains(d))
      if (ms.size == 1) ms.headOption.filter(ok)
      else if (writeKey.isEmpty && ms.size > 1) ms.find(ok)
      else None
    }.map(s => (s.id, endpointType))
    val byAmbiguousDomain = () => domain.filter(_.nonEmpty)
      .flatMap(d => streams.filter(_.domains.contains(d)).find(ok))
      .map(s => (s.id, endpointType))
    val bySole = () => streams match {
      case Seq(only) if ok(only) => Some((only.id, endpointType))
      case _ => None
    }
    val chain = ingestType match {
      case "writeKeyDefined" => Seq(byKey, bySlug, byAmbiguousDomain, bySole)
      case "s2s"             => Seq(byKey, bySlug, byAmbiguousDomain)
      case "browser"         => Seq(bySlug, byDomain, byKey, bySole)
      case other => throw new IllegalArgumentException(s"unknown ingest type $other")
    }
    chain.view.flatMap(f => f()).headOption
  }

  /** Log-safe masking — router.go:717-727. */
  def mask(writeKey: String): String =
    if (writeKey.isEmpty) writeKey
    else {
      val parts = writeKey.split(":", 2)
      if (parts.length > 1) parts(0) + ":***"
      else writeKey.take(1) + "***" + writeKey.takeRight(1)
    }
}
