package graft.shape

import java.security.MessageDigest

/** Identifier sanitization (T2) and case normalization (T3).
  *
  * Reference: table_helper.go:414-448 `adaptSqlIdentifier` — identifiers may
  * only contain letters, digits, `_`, `$`, space and `-`; everything else is
  * replaced by `_`; an identifier that sanitizes to nothing becomes
  * `<kind>_<md5hex>`; the result is truncated to the dialect's max length.
  * Quoting is required when the identifier isn't plain `[letters digits _]`.
  * Case normalization (abstract.go:69-78): lowercase everywhere, uppercase
  * for Snowflake, or keep as-is.
  *
  * Pure driver-side string functions — column names are metadata, never data,
  * so none of this touches the executor hot path.
  */
object Names {

  sealed trait CaseMode
  case object LowerCase extends CaseMode
  case object UpperCase extends CaseMode
  case object KeepCase  extends CaseMode

  def normalizeCase(name: String, mode: CaseMode): String = mode match {
    case LowerCase => name.toLowerCase
    case UpperCase => name.toUpperCase
    case KeepCase  => name
  }

  /** `[^\p{L}_\d $-]+` — the reference's unsupported-character class
    * (table_helper.go:27). */
  private val Unsupported = "[^\\p{L}_\\d $-]+".r

  /** Plain identifier: letters, digits, `_` only (utils/strings.go:88-95). */
  def isAlphanumeric(s: String): Boolean =
    s.nonEmpty && s.forall(c => c.isLetterOrDigit || c == '_')

  def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Sanitized identifier + whether SQL references must quote it.
    * `kind` feeds the hash fallback name (`column_<md5>`), matching
    * adaptSqlIdentifier's `kind` parameter. */
  def sanitize(identifier: String, kind: String = "column",
               maxLength: Int = 63): (String, Boolean) = {
    if (identifier.isEmpty) ("_unnamed", false)
    else {
      var result = identifier
      if (!isAlphanumeric(identifier)) {
        result = Unsupported.replaceAllIn(identifier, "_")
        if (result.isEmpty || result == "_")
          return (s"${kind}_${md5hex(identifier)}".take(maxLength), false)
      }
      result = result.take(maxLength)
      (result, !isAlphanumeric(result))
    }
  }

  /** Column-name form: sanitize then case-normalize. */
  def column(name: String, mode: CaseMode = KeepCase, maxLength: Int = 63): String =
    sanitize(normalizeCase(name, mode), "column", maxLength)._1
}
