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
    * semantics. `dateOk` assumes the shape already matched (date-time reuses
    * it on the regex-validated date substring without a second shape rlike);
    * `validDate` is the standalone shape+semantics form. */
  private def dateOk(c: Column): Column =
    try_to_timestamp(c, lit("yyyy-MM-dd")).isNotNull
  private def validDate(c: Column): Column =
    c.rlike(s"^$dateRe$$") && dateOk(c)

  /** Field semantics for a string whose SHAPE already matched `timeRe` —
    * split out so callers that have run the shape regex (the registry's
    * date-time composite, `validTime` itself) evaluate it exactly once. */
  private def timeFieldsOk(c: Column): Column = {
    val h = substring(c, 1, 2).cast("int")
    val m = substring(c, 4, 2).cast("int")
    val s = substring(c, 7, 2).cast("int")
    // offset hours/min appear at the tail; bound-check them via regex capture
    val offOk = c.rlike("([Zz]|[+-](0\\d|1[0-9]|2[0-3]):[0-5]\\d)$")
    h <= 23 && m <= 59 && s <= 60 && offOk &&
      // leap second only valid at 23:59:60 UTC-equivalent (time.go:193-204):
      // reference checks (hh*60+mm + offset) ≡ 23:59 UTC when ss==60.
      (s < 60 || leapSecondOk(c, h, m))
  }
  private def validTime(c: Column): Column =
    c.rlike(s"^$timeRe$$") && timeFieldsOk(c)

  /** ss==60 leap-second rule — EXACT transcription of the reference's check
    * (time.go:157-204), which is NOT a mod-1440 UTC test: for `Z` the local
    * time must be literally 23:59; for a numeric offset the adjusted sums
    * must satisfy `h±offH ∈ {23, 0}` AND `m±offM ∈ {59, -1}` independently
    * (offsets negated for '+', kept for '-'). Consequences pinned by the
    * conformance corpus: `00:59:60+01:00` is REJECTED (hour sum -1) even
    * though its UTC instant is 23:59, while `23:00:60+00:01` (hour sum 23,
    * minute sum -1 — UTC 22:59) is ACCEPTED. */
  private def leapSecondOk(c: Column, h: Column, m: Column): Column = {
    val z = upper(c).endsWith("Z")
    val neg = c.rlike("[-]\\d{2}:\\d{2}$")
    val offH = regexp_extract(c, "[+-](\\d{2}):\\d{2}$", 1).cast("int")
    val offM = regexp_extract(c, "[+-]\\d{2}:(\\d{2})$", 1).cast("int")
    val aH = h + when(neg, offH).otherwise(-offH)
    val aM = m + when(neg, offM).otherwise(-offM)
    when(z, h === 23 && m === 59)
      .otherwise((aH === 23 || aH === 0) && (aM === 59 || aM === -1))
  }

  /** Duration — an EXACT transcription of the reference's hand-rolled
    * automaton (time.go:210-359), quirks included, rather than the RFC3339
    * ABNF it documents:
    *  - case-insensitive designators (`isChar(s, 'P', 'p')` etc.);
    *  - a week component may be followed by a time part (`P4WT1H` valid,
    *    time.go:305-310) even though RFC3339 makes dur-week exclusive;
    *  - inside the time part, H with more content REQUIRES M next
    *    (`PT1H2S` invalid, time.go:269-281);
    *  - the final S check is first-char-only — trailing garbage after S is
    *    accepted (`PT1S1M` valid, time.go:293);
    *  - no fractional components (skipDigits stops at '.'). */
  private val durationRe = {
    val dt = "[Tt]\\d+([Hh](\\d+[Mm](\\d+[Ss][\\s\\S]*)?)?|[Mm](\\d+[Ss][\\s\\S]*)?|[Ss][\\s\\S]*)"
    s"^[Pp]($dt|\\d+([Ww]($dt)?|[Yy]($dt|\\d+[Mm]($dt|\\d+[Dd]($dt)?)?)?|[Mm]($dt|\\d+[Dd]($dt)?)?|[Dd]($dt)?))$$"
  }
  private def validDuration(c: Column): Column = c.rlike(durationRe)

  private val uuidRe = "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"

  private val ipv4Re =
    "^((25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)\\.){3}(25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)$"

  // IPv6: full/compressed groups, optional trailing IPv4; zone (%x) rejected
  // by the ipv6 FORMAT like netip.ParseAddr+zone check (pkg/format/ip.go:26-29)
  // — but hostname/idn-hostname accept zoned addresses (ParseAddr succeeds,
  // hostname.go:61-64), so the zone-less core is kept separately.
  private val ipv6Core = {
    val h = "[0-9A-Fa-f]{1,4}"
    val v4 = "((25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)\\.){3}(25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)"
    s"(($h:){7}$h|($h:){1,7}:|:(:$h){1,7}|($h:){1,6}:$h|($h:){1,5}(:$h){1,2}|($h:){1,4}(:$h){1,3}|($h:){1,3}(:$h){1,4}|($h:){1,2}(:$h){1,5}|$h:(:$h){1,6}|::|($h:){1,4}:$v4|($h:){6}$v4|::($h:){0,5}$v4)"
  }
  private val ipv6Re = s"^$ipv6Core$$"

  // hostname: labels 1-63 chars, alnum + hyphen, no leading/trailing hyphen,
  // total <= 253, optional trailing dot (pkg/format/hostname.go non-IDN path).
  private val hostnameLabel = "[A-Za-z0-9]([A-Za-z0-9-]{0,61}[A-Za-z0-9])?"
  private val hostnameRe = s"^$hostnameLabel(\\.$hostnameLabel)*\\.?$$"
  // any parseable IP address — INCLUDING a zoned IPv6 — is a valid hostname
  // (hostname.go:61-64 returns true straight off netip.ParseAddr; dotted-quad
  // IPv4 also reaches here but already matches the all-digit-label regex)
  private def ipAsHostname(c: Column): Column =
    c.rlike(s"^$ipv6Core(%[^%\\s]+)?$$")

  // email: local@domain (RFC5321 grammar, the one the reference's net/mail
  // call accepts, pkg/format/email.go:42-99):
  //   local  = dot-atom | quoted-string ("..." with qtextSMTP / quoted-pair)
  //   domain = hostname | [IPv4-literal] | [IPv6:IPv6-literal]
  private val atext = "[A-Za-z0-9!#$%&'*+/=?^_`{|}~-]+"
  private val quotedLocal = "\"([\\x20-\\x21\\x23-\\x5B\\x5D-\\x7E]|\\\\[\\x20-\\x7E])*\""
  private val snum = "(25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)"
  private val addrLiteral =
    s"\\[($snum(\\.$snum){3}|[Ii][Pp][Vv]6:[0-9A-Fa-f:.]+)\\]"
  private val emailLocalRe = s"($atext(\\.$atext)*|$quotedLocal)"
  // domain = net/mail dot-atom (atext labels, NO hostname shape rules — a
  // trailing hyphen like "b-.com" parses) intersected with the ASCII charset
  // check isNonIDNDomain [A-Za-z0-9.-] (email.go:102-139); hence hyphens
  // anywhere but '_'/'!' etc rejected, empty labels rejected by the dot-atom
  private val emailDomainRe = s"([A-Za-z0-9-]+(\\.[A-Za-z0-9-]+)*|$addrLiteral)"
  private val emailRe = s"^$emailLocalRe@$emailDomainRe$$"

  // json-pointer: "" or (/ (unescaped | ~0 | ~1)*)* (pkg/format/jsonpointer.go:15-49)
  private val jsonPointerRe = "^(/([^~]|~[01])*)*$"
  // relative-json-pointer: non-negative-int ('#' | json-pointer) (jsonpointer.go:52-85)
  private val relJsonPointerRe = "^(0|[1-9][0-9]*)(#|(/([^~]|~[01])*)*)$"

  // uri / uri-reference: RFC3986 shape. scheme:... with no spaces/control;
  // extra checks mirroring the reference's checkURI (uri.go:94-120):
  //  - percent signs must start a valid %XX escape (url.Parse rejects bad ones)
  //  - a host containing a bare (unbracketed) IPv6 address is rejected
  //  - no backslash anywhere (testsuite; uriIriReferenceFormat rejects \\)
  private val schemeRe = "[A-Za-z][A-Za-z0-9+.-]*"
  private val uriTailRe = "[^\\s\\\\]*"
  private val uriRe = s"^$schemeRe:$uriTailRe$$"
  private val uriRefRe = s"^$uriTailRe$$"
  private def uriExtraChecks(c: Column): Column =
    !c.rlike("%(?![0-9A-Fa-f]{2})") &&           // malformed percent-escape
    // a %5C escape in the fragment decodes to '\' — checkURI rejects
    // backslashes in the DECODED fragment (uri.go:101-103); raw backslashes
    // are already excluded by uriTailRe
    !c.rlike("#.*%5[Cc]") &&
    // bare IPv6 host = TWO+ colons in the HOST portion. Userinfo (which
    // legally contains colons, RFC3986) is consumed first; the lookahead
    // forces the optional group to actually take a present userinfo@ (an
    // empty-group backtrack would let the host class eat "user:p").
    !c.rlike("^[A-Za-z][A-Za-z0-9+.-]*://([^/?#@]*@)?(?![^/?#]*@)[^/?#\\[\\]@]*:[^/?#\\[\\]@]*:")

  // --- URI path discipline (uri/uri-reference ONLY — checkURI returns early
  // for IRIs before the RawPath loop, uri.go:105-108). Transcribes the
  // composition of net/url's setPath canonicalization with checkURI's
  // RawPath character loop (uri.go:110-120):
  //  - Go re-encodes the decoded path; RawPath is retained only when it
  //    differs from that canonical form. checkURI then rejects any RawPath
  //    character outside alnum + "-_.~@&=+$/;,()#".
  //  - Net effect: a path is valid iff every raw character is one Go leaves
  //    unescaped (alnum + "-._~$&+,/:;=@") and every escape is CANONICAL
  //    (uppercase hex, decoding to a character Go would escape) — OR the
  //    path triggered RawPath retention solely via '('/')' (allowed by the
  //    loop) with no escapes and no ':' (in the loop's list neither).
  private val pathE = "A-Za-z0-9\\-._~$&+,/:;=@"
  // uppercase hex codes of the characters Go does NOT escape in a path — an
  // escape decoding to one of them is non-canonical and poisons RawPath
  private val pathEHexAlt: String =
    ("-._~$&+,/:;=@".map(_.toInt) ++
      (('0' to '9') ++ ('A' to 'Z') ++ ('a' to 'z')).map(_.toInt))
      .map(i => f"$i%02X").mkString("|")
  private def uriPathOk(c: Column): Column = {
    val path = regexp_extract(c,
      "^(?:[A-Za-z][A-Za-z0-9+.-]*:)?(?://[^/?#]*)?([^?#]*)", 1)
    val badChar = path.rlike(s"[^$pathE()%]")
    val badEscape = path.rlike("%(?:[0-9A-Fa-f][a-f]|[a-f][0-9A-Fa-f])") ||
      path.rlike(s"%(?:$pathEHexAlt)")
    val parenClash = path.rlike("[()]") && path.rlike("[:%]")
    !badChar && !badEscape && !parenClash
  }

  // idn-email: the reference is net/mail's RFC6531-tolerant parse and NOTHING
  // else — when idn=true there is no domain charset or shape check at all
  // (email.go:102-116 runs only for !idn). net/mail's atom chars are exactly
  // RFC5321 atext plus any non-ASCII rune, in LOCAL and DOMAIN alike, so a
  // leading/trailing hyphen or a '!' in an idn domain parses ("a@-実例",
  // "a@b!c.com" are valid idn-emails while plain email rejects both).
  private val idnAtext = "[\\p{L}\\p{M}\\p{N}!#$%&'*+/=?^_`{|}~-]+"
  private val idnEmailRe =
    s"^($idnAtext(\\.$idnAtext)*|$quotedLocal)@($idnAtext(\\.$idnAtext)*|$addrLiteral)$$"

  // idn-hostname: Unicode labels with the RFC5892 contextual rules the
  // reference hand-checks (hostname.go:83-135): disallowed runes; U+00B7 only
  // between 'l's; Greek numeral sign before Greek; Hebrew geresh/gershayim
  // after Hebrew; katakana middle dot only with Japanese/Han present; no
  // underscores. RFC3490 alternative stops count as label separators.
  private val idnStops = "\\.\u3002\uFF0E\uFF61"
  private val idnChar = "[\\p{L}\\p{M}\\p{N}\u00B7\u0375\u05F3\u05F4\u30FB-]"
  private val idnLabel = s"(?![-\\p{M}])$idnChar{1,63}(?<!-)"
  private val idnHostnameRe = s"^$idnLabel([$idnStops]$idnLabel)*[$idnStops]?$$"
  private def validIdnHostname(c: Column): Column =
    c.rlike(idnHostnameRe) &&
    !c.rlike("[\u0640\u07FA\u302E\u302F\u3031-\u3035\u303B_]") &&
    !c.rlike("(?<!l)\u00B7") && !c.rlike("\u00B7(?!l)") &&
    !c.rlike("\u0375(?!\\p{IsGreek})") &&
    !c.rlike("(?<!\\p{IsHebrew})[\u05F3\u05F4]") &&
    (!c.contains("\u30FB") || c.rlike("[\\p{IsHiragana}\\p{IsKatakana}\\p{IsHan}]")) &&
    length(c) <= 253

  /** format:regex — a REAL parse (reference: `regexp/syntax` Perl parse,
    * pkg/format/regex.go:15-24) via a deterministic UDF over Java's Pattern.
    * Data-dependent regex validity cannot be a static Column expression; the
    * UDF sits off the whole-stage-codegen path, so a schema applying
    * format:regex to a data column trades codegen for fidelity. (The
    * compile-time `pattern`-argument check stays static and exact.)
    * Dialect note: Java's Pattern accepts a superset of Go's RE2, so the
    * parse is paired with the RegexDialect scanner — instance strings using
    * Java-only constructs (backreferences, lookaround, atomic groups,
    * possessive quantifiers, \h/\H/\V/\R/\X classes, Java-only inline flags,
    * repeat counts above RE2's 1000 cap) are REJECTED like Go's
    * `regexp/syntax.Parse(s, syntax.Perl)` rejects them, and divergent-
    * meaning constructs are translated (\v → the VT literal) or flagged
    * ((?U): ungreedy in RE2, UNICODE_CASE in Java). Residual gap: an exotic
    * Java-only escape outside the scanner's list would still pass. */
  private lazy val regexValid =
    udf { s: String =>
      // translate RE2-only syntax first so patterns Go accepts but Java
      // rejects ((?P<name>, POSIX [[:class:]]) judge VALID here too
      s == null || ((try {
        java.util.regex.Pattern.compile(graft.compile.RegexDialect.toJava(s)); true
      } catch { case _: Exception => false }) &&
                    // validity-only context: (?U) is a legal RE2 flag here
                    graft.compile.RegexDialect.isRe2Compatible(s, forMatching = false))
    }

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
    "time" -> validTime,
    "date-time" -> { c =>
      val datePart = substring(c, 1, 10)
      val timePart = substring(c, 12, 1000)
      // separator is strictly T/t (time.go:37) — RFC3339's space-separator
      // note does not apply; the reference rejects "date time". The combined
      // shape regex already anchors both substrings, so only the semantic
      // halves (calendar validity, field bounds) run on them — one shape
      // regex per row, not three.
      c.rlike(s"^${dateRe}[Tt]$timeRe$$") && dateOk(datePart) && timeFieldsOk(timePart)
    },
    "duration" -> validDuration,
    // no overall-length cap: the reference defers entirely to net/mail,
    // which does not enforce RFC5321's 254-octet limit (email.go:102-106)
    "email" -> (c => c.rlike(emailRe)),
    "idn-email" -> (c => c.rlike(idnEmailRe)),
    "hostname" -> (c => (c.rlike(hostnameRe) && length(c) <= 253) || ipAsHostname(c)),
    "idn-hostname" -> (c => validIdnHostname(c) || ipAsHostname(c)),
    "json-pointer" -> (c => c.rlike(jsonPointerRe)),
    "relative-json-pointer" -> (c => c.rlike(relJsonPointerRe)),
    // URIs are ASCII by RFC3986 — the IRI forms admit non-ASCII
    "uri" -> (c => c.rlike(uriRe) && uriExtraChecks(c) && uriPathOk(c) &&
      !c.rlike("[^\\x00-\\x7F]")),
    "uri-reference" -> (c => c.rlike(uriRefRe) && uriExtraChecks(c) && uriPathOk(c) &&
      !c.rlike("[^\\x00-\\x7F]")),
    "iri" -> (c => c.rlike(uriRe) && uriExtraChecks(c)),
    "iri-reference" -> (c => c.rlike(uriRefRe) && uriExtraChecks(c)),
    "regex" -> (c => regexValid(c))
  )

  def predicate(format: String): Option[Column => Column] =
    Option(custom.get(format)).orElse(registry.get(format))
}
