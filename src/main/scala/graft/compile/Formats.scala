package graft.compile

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** `format` keyword validators as Column predicates (reference registry:
  * `pkg/format/format.go:18-36`). Pure built-in expressions (regexp_like /
  * to_date / to_timestamp null-probes) so everything stays codegen'd; each
  * predicate returns true for non-string inputs upstream (format only applies
  * to strings, `internal/validator/validator.go:1252-1255`).
  *
  * Fidelity notes (pinned by FormatsSpec fixtures):
  *  - uuid: exact parity with the hand-rolled checker (`pkg/format/uuid.go:14-82`).
  *  - date/time/date-time: RFC3339 incl. leap-second `:60` acceptance
  *    (`pkg/format/time.go:162,193-204`) via regex + semantic range checks.
  *  - email/hostname/uri: the reference defers to Go stdlib parsers tuned to
  *    the official test suite (`pkg/format/email.go`, `hostname.go`, `uri.go`);
  *    we implement the documented grammar subset as regexes.
  */
object Formats {

  private val dateRe = "(\\d{4})-(\\d{2})-(\\d{2})"
  // time: HH:MM:SS(.frac)? + (Z | ±HH:MM); seconds may be 60 (leap second)
  private val timeRe = "(\\d{2}):(\\d{2}):(\\d{2})(\\.\\d+)?([Zz]|[+-]\\d{2}:\\d{2})"

  /** Calendar-valid date (leap years included) — `try_to_timestamp` returns
    * null on invalid combinations (ANSI-safe), giving exact day-in-month
    * semantics. */
  private def validDate(c: Column): Column =
    c.rlike(s"^$dateRe$$") && try_to_timestamp(c, lit("yyyy-MM-dd")).isNotNull

  private def validTime(c: Column): Column = {
    val h = substring(c, 1, 2).cast("int")
    val m = substring(c, 4, 2).cast("int")
    val s = substring(c, 7, 2).cast("int")
    // offset hours/min appear at the tail; bound-check them via regex capture
    val offOk = c.rlike("([Zz]|[+-](0\\d|1[0-9]|2[0-3]):[0-5]\\d)$")
    c.rlike(s"^$timeRe$$") && h <= 23 && m <= 59 && s <= 60 && offOk &&
      // leap second only valid at 23:59:60 UTC-equivalent (time.go:193-204):
      // reference checks (hh*60+mm + offset) ≡ 23:59 UTC when ss==60.
      (s < 60 || leapSecondOk(c, h, m))
  }

  /** ss==60 requires the local time minus offset to equal 23:59 (time.go:193-204). */
  private def leapSecondOk(c: Column, h: Column, m: Column): Column = {
    val z = upper(c).endsWith("Z")
    val sign = when(c.rlike("[+]\\d{2}:\\d{2}$"), lit(1)).otherwise(lit(-1))
    val offH = when(z, lit(0)).otherwise(regexp_extract(c, "[+-](\\d{2}):\\d{2}$", 1).cast("int") * sign)
    val offM = when(z, lit(0)).otherwise(regexp_extract(c, "[+-]\\d{2}:(\\d{2})$", 1).cast("int") * sign)
    val utcMin = (h * 60 + m) - (offH * 60 + offM)
    // normalize into [0, 1440)
    pmod(utcMin, lit(1440)) === lit(23 * 60 + 59)
  }

  /** RFC3339 duration grammar (time.go:210-359): P…(date parts)…(T time parts),
    * weeks exclusive, at least one component, fraction only allowed? The
    * reference allows integer components only (no fractions). */
  private val durationRe =
    "^P(\\d+W|(\\d+Y)?(\\d+M)?(\\d+D)?(T(\\d+H)?(\\d+M)?(\\d+S)?)?)$"
  private def validDuration(c: Column): Column =
    c.rlike(durationRe) &&
      // must contain at least one component: bare "P" or trailing bare "T" invalid
      !c.rlike("^P$") && !c.rlike("T$")

  private val uuidRe = "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"

  private val ipv4Re =
    "^((25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)\\.){3}(25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)$"

  // IPv6: full/compressed groups, optional trailing IPv4; zone (%x) rejected
  // like netip.ParseAddr+zone check (pkg/format/ip.go:26-29).
  private val ipv6Re = {
    val h = "[0-9A-Fa-f]{1,4}"
    val v4 = "((25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)\\.){3}(25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)"
    s"^(($h:){7}$h|($h:){1,7}:|:(:$h){1,7}|($h:){1,6}:$h|($h:){1,5}(:$h){1,2}|($h:){1,4}(:$h){1,3}|($h:){1,3}(:$h){1,4}|($h:){1,2}(:$h){1,5}|$h:(:$h){1,6}|::|($h:){1,4}:$v4|($h:){6}$v4|::($h:){0,5}$v4)$$"
  }

  // hostname: labels 1-63 chars, alnum + hyphen, no leading/trailing hyphen,
  // total <= 253, optional trailing dot (pkg/format/hostname.go non-IDN path).
  private val hostnameLabel = "[A-Za-z0-9]([A-Za-z0-9-]{0,61}[A-Za-z0-9])?"
  private val hostnameRe = s"^$hostnameLabel(\\.$hostnameLabel)*\\.?$$"

  // email: local@domain; local = dot-atom (no quoted strings — reference
  // accepts more via net/mail, we pin the dot-atom subset), domain = hostname.
  private val atext = "[A-Za-z0-9!#$%&'*+/=?^_`{|}~-]+"
  private val emailRe = s"^$atext(\\.$atext)*@$hostnameLabel(\\.$hostnameLabel)*$$"

  // json-pointer: "" or (/ (unescaped | ~0 | ~1)*)* (pkg/format/jsonpointer.go:15-49)
  private val jsonPointerRe = "^(/([^~]|~[01])*)*$"
  // relative-json-pointer: non-negative-int ('#' | json-pointer) (jsonpointer.go:52-85)
  private val relJsonPointerRe = "^(0|[1-9][0-9]*)(#|(/([^~]|~[01])*)*)$"

  // uri / uri-reference: RFC3986 shape. scheme:... with no spaces/control;
  // extra checks from uri.go:94-120 (no backslash, no bare spaces).
  private val schemeRe = "[A-Za-z][A-Za-z0-9+.-]*"
  private val uriTailRe = "[^\\s\\\\]*"
  private val uriRe = s"^$schemeRe:$uriTailRe$$"
  private val uriRefRe = s"^$uriTailRe$$"

  /** User-registered format validators — the extension point mirroring
    * `RegisterFormatValidator` (`internal/validator/validator.go:1237-1244`,
    * `pkg/format/format.go:43-45`). Thread-safe; custom registrations shadow
    * built-ins, like the reference's registry overwrite semantics. Predicates
    * must be pure Column expressions (broadcast-safe, codegen-friendly). */
  private val custom =
    new java.util.concurrent.ConcurrentHashMap[String, Column => Column]()

  def register(name: String, predicate: Column => Column): Unit =
    custom.put(name, predicate)

  /** Built-in registry: format name → predicate builder. Unknown formats are
    * always-valid, matching the unregistered-format behavior
    * (`validator.go:1252-1257`). */
  val registry: Map[String, Column => Column] = Map(
    "uuid" -> (c => c.rlike(uuidRe)),
    "ipv4" -> (c => c.rlike(ipv4Re)),
    "ipv6" -> (c => c.rlike(ipv6Re) && !c.contains("%")),
    "date" -> validDate,
    "time" -> (c => c.rlike(s"^$timeRe$$") && validTime(c)),
    "date-time" -> { c =>
      val datePart = substring(c, 1, 10)
      val timePart = substring(c, 12, 1000)
      c.rlike(s"^${dateRe}[Tt ]$timeRe$$") && validDate(datePart) && validTime(timePart)
    },
    "duration" -> validDuration,
    "email" -> (c => c.rlike(emailRe) && length(c) <= 254),
    "idn-email" -> (c => c.rlike(emailRe) && length(c) <= 254),
    "hostname" -> (c => c.rlike(hostnameRe) && length(c) <= 253),
    "idn-hostname" -> (c => c.rlike(hostnameRe) && length(c) <= 253),
    "json-pointer" -> (c => c.rlike(jsonPointerRe)),
    "relative-json-pointer" -> (c => c.rlike(relJsonPointerRe)),
    "uri" -> (c => c.rlike(uriRe)),
    "uri-reference" -> (c => c.rlike(uriRefRe)),
    "iri" -> (c => c.rlike(uriRe)),
    "iri-reference" -> (c => c.rlike(uriRefRe)),
    // format:regex — validity of the *value* as a regex is data-dependent;
    // approximate with a balanced-ish check (full parity needs a UDF; the
    // compile-time case — pattern args — is checked exactly in the compiler).
    "regex" -> (c => !c.rlike("[\\[\\(\\{]$"))
  )

  def predicate(format: String): Option[Column => Column] =
    Option(custom.get(format)).orElse(registry.get(format))
}
