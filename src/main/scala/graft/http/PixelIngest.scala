package graft.http

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

/** Tracking-pixel ingest (`ingest/router_pixel_handler.go`): a GET whose
  * event rides in the query string — either base64-JSON in `data=` or flat
  * `key=value` parameters — answered with a 1×1 GIF so it embeds in email
  * opens and no-JS pages. With `process_headers` truthy the missing identity
  * fields are recovered from the classic cookies (`__eventn_id`,
  * `__eventn_uid`, traits/group) and the Referer header fills
  * `context.page`. Driver-side edge parsing only; admitted events flow
  * through the same spool → micro-batch path as POST ingest.
  */
object PixelIngest {

  private val mapper = new ObjectMapper()

  /** 1×1 transparent GIF89a (`appbase.EmptyGif`) — the canonical 43-byte
    * pixel response. */
  val EmptyGif: Array[Byte] = Array[Int](
    0x47, 0x49, 0x46, 0x38, 0x39, 0x61, // GIF89a
    0x01, 0x00, 0x01, 0x00, 0x80, 0x00, 0x00, // 1x1, GCT of 2
    0x00, 0x00, 0x00, 0xff, 0xff, 0xff, // palette: black, white
    0x21, 0xf9, 0x04, 0x01, 0x00, 0x00, 0x00, 0x00, // GCE: transparent idx 0
    0x2c, 0x00, 0x00, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00, // image desc
    0x02, 0x02, 0x44, 0x01, 0x00, // 2-bit LZW, one clear+stop
    0x3b // trailer
  ).map(_.toByte)

  /** Query params that configure the pixel rather than describe the event
    * (router_pixel_handler.go:24-28), plus this edge's transport params
    * (`writekey`/`slug` stand in for the reference's header credentials
    * and dataHosts subdomain, `tableName` for topic routing — none of them
    * are event payload). */
  private val Reserved = Set("data", "cookie_domain", "process_headers",
    "destination_url", "writekey", "slug", "tableName")

  /** `parsePixelEvent` (router_pixel_handler.go:205-236): decode `data=`
    * base64 JSON as the base event, then lay every non-reserved query
    * parameter over it (repeated params become arrays). Dots in parameter
    * names address nested paths (`context.page.url=` lands under the
    * context object) per the reference's `SetPath`. A malformed `data=`
    * (bad base64 or non-object JSON) THROWS — the reference rejects the
    * whole event ("error parsing message", router_pixel_handler.go:117);
    * swallowing it would silently ingest a partial event. */
  def parseEvent(params: Seq[(String, String)]): ObjectNode = {
    val event: ObjectNode =
      params.collectFirst { case ("data", v) if v.nonEmpty => v }.map { b64 =>
        val bytes =
          try java.util.Base64.getDecoder.decode(b64)
          catch { case e: IllegalArgumentException =>
            throw new IllegalArgumentException(
              s"Error decoding event from 'data' field in tracking pixel: ${e.getMessage}") }
        mapper.readTree(bytes) match {
          case o: ObjectNode => o
          case _ => throw new IllegalArgumentException(
            "Error unmarshalling event from 'data': not a JSON object")
        }
      }.getOrElse(mapper.createObjectNode())
    params.filterNot { case (k, _) => Reserved.contains(k) }
      .groupBy(_._1).toSeq.sortBy(_._1).foreach { case (k, vs) =>
        val node: JsonNode =
          if (vs.lengthCompare(1) == 0) mapper.getNodeFactory.textNode(vs.head._2)
          else {
            val a = mapper.createArrayNode()
            vs.foreach { case (_, v) => a.add(v) }
            a
          }
        setPath(event, k, node)
      }
    event
  }

  /** Dotted-path set: intermediate objects are created (or replaced when a
    * non-object occupies the segment). */
  private def setPath(root: ObjectNode, path: String, value: JsonNode): Unit = {
    val segs = path.split("\\.")
    var cur = root
    segs.dropRight(1).foreach { s =>
      cur = cur.get(s) match {
        case o: ObjectNode => o
        case _ =>
          val o = mapper.createObjectNode()
          cur.set[JsonNode](s, o)
          o
      }
    }
    cur.set[JsonNode](segs.last, value)
    ()
  }

  private def textOf(ev: ObjectNode, f: String): String =
    Option(ev.get(f)).filter(_.isTextual).map(_.asText).getOrElse("")

  private def objOf(parent: ObjectNode, f: String): ObjectNode =
    parent.get(f) match {
      case o: ObjectNode => o
      case _ =>
        val o = mapper.createObjectNode()
        parent.set[JsonNode](f, o)
        o
    }

  /** `processHeadersData` (router_pixel_handler.go:199-307), applied when
    * `process_headers` is truthy: identity falls back to the classic
    * cookies; a generated anonymousId is reported back via `Set-Cookie`
    * (returned as Some(newAnonymousId)); the Referer URL fills
    * `context.page` (and `properties` for page events). `newId` is
    * injectable so specs and oracle replays stay deterministic. */
  def processHeaders(ev: ObjectNode, cookies: Map[String, String],
                     referer: Option[String], tp: String,
                     newId: () => String): Option[String] = {
    var setCookie: Option[String] = None
    if (textOf(ev, "anonymousId").isEmpty) {
      val anon = cookies.get("__eventn_id").filter(_.nonEmpty).getOrElse {
        val id = newId(); setCookie = Some(id); id
      }
      ev.put("anonymousId", anon)
      ()
    }
    if (textOf(ev, "userId").isEmpty)
      cookies.get("__eventn_uid").filter(_.nonEmpty)
        .foreach(u => { ev.put("userId", u); () })
    val ctx = objOf(ev, "context")
    if (Option(ctx.get("groupId")).forall(!_.isTextual))
      cookies.get("__group_id").filter(_.nonEmpty)
        .foreach(g => { ctx.put("groupId", g); () })
    // traits: group cookie under user cookie under explicit context traits
    val traitsNew = mapper.createObjectNode()
    Seq("__group_traits", "__eventn_id_usr").foreach { c =>
      cookies.get(c).filter(_.nonEmpty).foreach { raw =>
        try mapper.readTree(raw) match {
          case o: ObjectNode => traitsNew.setAll(o); ()
          case _ => ()
        } catch { case _: Exception => () }
      }
    }
    Option(ctx.get("traits")).collect { case o: ObjectNode => o }
      .foreach(own => { traitsNew.setAll(own); () })
    if (traitsNew.size > 0) ctx.set[JsonNode]("traits", traitsNew)
    referer.filter(_.nonEmpty).foreach { ref =>
      try {
        val u = new java.net.URI(ref)
        val page = objOf(ctx, "page")
        def absent(f: String) = !page.hasNonNull(f)
        if (absent("url")) page.put("url", ref)
        if (absent("path")) page.put("path", Option(u.getPath).getOrElse(""))
        if (absent("search")) page.put("search", Option(u.getQuery).getOrElse(""))
        if (absent("host")) page.put("host", Option(u.getAuthority).getOrElse(""))
        if (tp == "page" || tp == "p") {
          // DELIBERATE divergence from processHeadersData's page branch
          // (router_pixel_handler.go:287-300): the reference reads
          // `properties` out of the CONTEXT object (`ctx.Get("properties")`)
          // and then unconditionally overwrites the event's top-level
          // properties with that referer-filled object — so a pixel event
          // that already carried its own properties loses them whenever
          // context.properties is absent. That reads as a context/event mixup
          // (properties is a top-level Segment field, never a context one);
          // this edge SetIfAbsent-merges into the event's OWN properties,
          // which preserves caller data and matches the reference's handling
          // of every other identity field in this function.
          val props = objOf(ev, "properties")
          if (!props.hasNonNull("url")) props.put("url", ref)
          if (!props.hasNonNull("path")) props.put("path", Option(u.getPath).getOrElse(""))
          if (!props.hasNonNull("search")) props.put("search", Option(u.getQuery).getOrElse(""))
        }
      } catch { case _: Exception => () }
    }
    setCookie
  }

  /** Cookie-header parse (name=value pairs; values may be URL-encoded). */
  def parseCookies(header: Option[String]): Map[String, String] =
    header.getOrElse("").split(";").toSeq.map(_.trim).filter(_.contains("="))
      .map { kv =>
        val Array(k, v) = kv.split("=", 2)
        k -> (try java.net.URLDecoder.decode(v, "UTF-8") catch { case _: Exception => v })
      }.toMap
}
