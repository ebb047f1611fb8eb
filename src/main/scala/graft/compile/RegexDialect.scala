package graft.compile

/** RE2-dialect guard (SURVEY §7.4.3). The reference compiles every schema
  * regex with Go's RE2 engine (`regexp.Compile`,
  * `/root/reference/internal/validator/validator.go:1008`; `format: regex`
  * parses with `regexp/syntax.Parse(s, syntax.Perl)`,
  * `/root/reference/pkg/format/regex.go:15-24`). Java's `Pattern` accepts a
  * strict SUPERSET — backreferences, lookaround, atomic groups, possessive
  * quantifiers, conditionals — so a schema using them would compile here but
  * be rejected by the reference: silent row-for-row divergence. This scanner
  * detects those constructs so the compiler can reject them (default,
  * reference parity) or a caller can opt into the Java superset explicitly.
  *
  * The scan is a little lexer tracking escape state and character-class
  * nesting — NOT a full RE2 parser: it flags the known Java-only constructs
  * rather than proving RE2-validity. Plain syntax errors are still caught by
  * the Java `Pattern.compile` that always runs alongside. */
object RegexDialect {

  /** Human-readable list of RE2-incompatible constructs found in `pattern`
    * (empty = no known Java-only construct).
    *
    * `forMatching` distinguishes the two uses of the guard: when the pattern
    * will be MATCHED by Java's engine (`pattern` / `patternProperties`),
    * constructs that parse on both engines but mean different things are
    * divergences and get flagged — today that is `(?U)` (ungreedy in RE2,
    * UNICODE_CHARACTER_CLASS in Java). When only RE2 VALIDITY is judged
    * (`format: regex` — the reference runs `regexp/syntax.Parse`, never a
    * match), `(?U)` is a perfectly legal RE2 flag and must NOT be flagged,
    * or valid-per-reference instance strings would be rejected. */
  def re2Incompatibilities(pattern: String,
                           forMatching: Boolean = true): List[String] = {
    val found = scala.collection.mutable.LinkedHashSet.empty[String]
    var i = 0
    var inClass = false
    // was the previous significant char an unescaped quantifier (* + ? })?
    var prevQuant = false
    val n = pattern.length
    while (i < n) {
      val c = pattern.charAt(i)
      var quantNow = false
      if (c == '\\') {
        if (!inClass && i + 1 < n && pattern.charAt(i + 1) == 'Q') {
          // Top-level \Q...\E literal quoting is supported by BOTH engines
          // with the same meaning: nothing inside the quoted region is a
          // construct (a literal "(?x)" or "{2000}" in there is legal
          // everywhere), so the scan skips to the terminating \E — or the
          // end of the pattern, where everything remaining is literal.
          // INSIDE a character class the engines diverge (handled below):
          // Java still honors quoting there; Go's parseClassChar has no \Q
          // and errors.
          val qe = pattern.indexOf("\\E", i + 2)
          i = if (qe < 0) n else qe + 2
        } else if (inClass && i + 1 < n && pattern.charAt(i + 1) == 'Q') {
          found += "\\Q...\\E inside a character class (Java-only; RE2 rejects)"
          i += 2
        } else {
          if (i + 1 < n) {
            val e = pattern.charAt(i + 1)
            if (!inClass && e >= '1' && e <= '9')
              found += s"backreference \\$e"
            else if (!inClass && e == 'k' && i + 2 < n && pattern.charAt(i + 2) == '<')
              found += "named backreference \\k<...>"
            else if (e == 'Z') found += "\\Z anchor (RE2 has only \\z)"
            else if (e == 'G') found += "\\G anchor"
            // Java-only whitespace/grapheme classes: RE2 (Go regexp/syntax)
            // rejects these escapes outright ("invalid escape sequence")
            else if (e == 'h' || e == 'H' || e == 'V')
              found += s"\\$e horizontal/vertical-whitespace class (Java-only)"
            else if (e == 'R') found += "\\R linebreak matcher (Java-only)"
            else if (e == 'X') found += "\\X grapheme cluster (Java-only)"
            // Perl control escape: Go's parser has no \c at all
            else if (e == 'c')
              found += "\\cX control-char escape (Java-only; RE2 rejects)"
            else if ((e == 'p' || e == 'P') && i + 2 < n &&
                     pattern.charAt(i + 2) == '{') {
              // \p{Name}: RE2 knows Unicode GENERAL CATEGORIES (L, Lu, …)
              // and BARE script names (Greek, Inherited, …). Java's extras
              // — java-prefixed methods (\p{javaLowerCase}), Is-prefixed
              // script/binary aliases (\p{IsGreek}, \p{IsAlphabetic}),
              // In-prefixed blocks (\p{InGreek}), and POSIX-style names
              // (\p{Alpha}) — are all "invalid character class range" to
              // Go. The In/Is checks require an uppercase third letter so
              // real RE2 scripts like Inherited never false-flag.
              val close = pattern.indexOf('}', i + 3)
              if (close > 0) {
                val name = pattern.substring(i + 3, close)
                def up3 = name.length > 2 && name.charAt(2).isUpper
                if (name.startsWith("java"))
                  found += s"\\$e{$name} java-prefixed property (Java-only; RE2 rejects)"
                else if (name.startsWith("Is") && up3)
                  found += s"\\$e{$name} Is-prefixed alias (Java-only; RE2 uses bare script names)"
                else if (name.startsWith("In") && up3)
                  found += s"\\$e{$name} Unicode block (Java-only; RE2 has no block classes)"
                else if (posixClasses.values.exists(_ == name))
                  found += s"\\$e{$name} POSIX-style name (Java-only; RE2 knows categories/scripts)"
              }
            }
          }
          i += 2 // skip the escaped char entirely
        }
      } else if (inClass) {
        if (c == '[' && i + 1 < n && pattern.charAt(i + 1) == ':') {
          // POSIX class [[:alpha:]]: its closing "]" belongs to the ":]"
          // token, not the enclosing class — skipping to ":]" keeps
          // inClass accurate (otherwise literal chars after the POSIX
          // class would be scanned as top-level syntax and false-flag)
          val ce = pattern.indexOf(":]", i + 2)
          i = if (ce < 0) i + 1 else ce + 2
        } else {
          if (c == ']') inClass = false
          i += 1
        }
      } else c match {
        case '[' =>
          inClass = true
          // a leading ']' right after '[' or '[^' is a literal in Java; RE2
          // treats it the same way — no flag needed, just skip it
          if (i + 1 < n && pattern.charAt(i + 1) == '^' &&
              i + 2 < n && pattern.charAt(i + 2) == ']') i += 2
          else if (i + 1 < n && pattern.charAt(i + 1) == ']') i += 1
          i += 1
        case '(' if i + 1 < n && pattern.charAt(i + 1) == '?' =>
          if (i + 2 < n) pattern.charAt(i + 2) match {
            case '=' => found += "lookahead (?=...)"
            case '!' => found += "negative lookahead (?!...)"
            case '>' => found += "atomic group (?>...)"
            case '(' => found += "conditional (?(...)...)"
            case '<' if i + 3 < n && (pattern.charAt(i + 3) == '=' ||
                                      pattern.charAt(i + 3) == '!') =>
              found += "lookbehind (?<=...) / (?<!...)"
            case _ =>
              // (?:, (?<name>, (?P<name> are RE2-valid. Inline FLAG groups
              // need a char-by-char check: RE2 knows i m s U (U = ungreedy),
              // Java knows i m s x d u U (U = UNICODE_CHARACTER_CLASS).
              // Java-only flags are rejected by Go's parser; 'U' parses on
              // BOTH but MEANS different things — a silent divergence when
              // the pattern is matched by Java, legal RE2 when only
              // validity is judged (see the forMatching doc above).
              var j = i + 2
              while (j < n && (pattern.charAt(j).isLetter || pattern.charAt(j) == '-')) j += 1
              if (j < n && (pattern.charAt(j) == ')' || pattern.charAt(j) == ':')) {
                pattern.substring(i + 2, j).foreach {
                  case 'x' => found += "(?x) extended mode flag (Java-only; RE2 rejects)"
                  case 'd' => found += "(?d) UNIX-lines flag (Java-only; RE2 rejects)"
                  case 'u' => found += "(?u) unicode-case flag (Java-only; RE2 rejects)"
                  case 'U' if forMatching =>
                    found += "(?U) flag diverges (ungreedy in RE2, UNICODE_CHARACTER_CLASS in Java)"
                  case 'U' => // validity-only context: legal RE2 flag
                  case c2 if "ims-".indexOf(c2) >= 0 => // shared, same meaning
                  case c2 => found += s"(?$c2) unknown inline flag"
                }
              }
          }
          i += 2 // consume "(?"; the discriminator is re-scanned harmlessly
        case '*' | '?' =>
          quantNow = true; i += 1
        case '+' =>
          if (prevQuant) found += "possessive quantifier (*+ / ++ / ?+ / {m,n}+)"
          quantNow = true; i += 1
        case '{' =>
          // only a real {m} / {m,} / {m,n} counts as a quantifier; a literal
          // '{' (or '}') must not trigger the possessive detector
          val end = braceQuantEnd(pattern, i)
          if (end > 0) {
            // Go's regexp/syntax caps repeat counts at 1000 ("invalid
            // repeat count"); Java allows up to Int.MaxValue — a schema
            // with {m,n} beyond 1000 would compile here and be rejected
            // by the reference
            val body = pattern.substring(i + 1, end - 1)
            val bounds = body.split(",", -1).filter(_.nonEmpty)
              .map(s => if (s.length > 9) Long.MaxValue else s.toLong)
            if (bounds.exists(_ > 1000L))
              found += s"repeat count {$body} above RE2's 1000 limit"
            i = end; quantNow = true
          } else i += 1
        case _ =>
          i += 1
      }
      prevQuant = quantNow
    }
    found.toList
  }

  /** `\p{name}` body translated to the form Java's `Pattern` accepts:
    * names Java already knows (general categories `L`/`Lu`, POSIX-style
    * `Alpha`, `IsGreek`, …) pass through; a name Java rejects but accepts
    * Is-prefixed (RE2's bare script names — `Greek` → `IsGreek`) is mapped;
    * anything else passes through so the caller's `Pattern.compile` reports
    * the real error. Probe results are memoized — script tables are static. */
  private val propNameCache =
    new scala.collection.concurrent.TrieMap[String, String]()
  private def javaPropertyName(name: String): String =
    propNameCache.getOrElseUpdate(name, {
      def compiles(nm: String): Boolean =
        try { java.util.regex.Pattern.compile(s"\\p{$nm}"); true }
        catch { case _: Exception => false }
      if (compiles(name)) name
      else if (compiles("Is" + name)) "Is" + name
      else name
    })

  /** Index just past the '}' if pattern(i)='{' starts a {m}/{m,}/{m,n}
    * quantifier, else -1. */
  private def braceQuantEnd(pattern: String, i: Int): Int = {
    var j = i + 1
    val n = pattern.length
    var digits = 0
    while (j < n && pattern.charAt(j).isDigit) { digits += 1; j += 1 }
    if (digits == 0) return -1
    if (j < n && pattern.charAt(j) == ',') {
      j += 1
      while (j < n && pattern.charAt(j).isDigit) j += 1
    }
    if (j < n && pattern.charAt(j) == '}') j + 1 else -1
  }

  def isRe2Compatible(pattern: String, forMatching: Boolean = true): Boolean =
    re2Incompatibilities(pattern, forMatching).isEmpty

  /** RE2 POSIX class name → Java `\p{...}` name (both are US-ASCII-only
    * definitions, so the translation is semantics-preserving). `word` has no
    * Java `\p` name and maps to `\w`/`\W` instead. */
  private val posixClasses = Map(
    "alnum" -> "Alnum", "alpha" -> "Alpha", "ascii" -> "ASCII",
    "blank" -> "Blank", "cntrl" -> "Cntrl", "digit" -> "Digit",
    "graph" -> "Graph", "lower" -> "Lower", "print" -> "Print",
    "punct" -> "Punct", "space" -> "Space", "upper" -> "Upper",
    "xdigit" -> "XDigit")

  /** Rewrites RE2-only syntax that Java's `Pattern` rejects or silently
    * MISPARSES into the Java equivalent, so reference-legal schemas compile
    * and match identically here:
    *   - `(?P<name>...)` (RE2/Python named group, `regexp/syntax` Perl
    *     flavor) → `(?:...)`. Validation only ever MATCHES — group names are
    *     never read back — and Java's stricter group-name charset
    *     (`[a-zA-Z][a-zA-Z0-9]*`) would reject names RE2 allows, so the
    *     non-capturing form is the faithful translation.
    *   - POSIX classes inside brackets: `[[:alpha:]]` → `[\p{Alpha}]`,
    *     `[[:^digit:]]` → `[\P{Digit}]`. Java has no POSIX bracket syntax
    *     and would misparse the characters literally (no error — silently
    *     wrong matches).
    * Everything else passes through untouched. */
  def toJava(pattern: String): String = {
    val sb = new StringBuilder(pattern.length + 8)
    var i = 0
    var inClass = false
    val n = pattern.length
    while (i < n) {
      val c = pattern.charAt(i)
      if (c == '\\' && i + 1 < n && pattern.charAt(i + 1) == 'Q') {
        // \Q...\E: same literal-quoting semantics on both engines — copy the
        // whole region verbatim (translating \v etc. INSIDE it would corrupt
        // literal text)
        val qe = pattern.indexOf("\\E", i + 2)
        val stop = if (qe < 0) n else qe + 2
        sb.append(pattern.substring(i, stop)); i = stop
      }
      else if (c == '\\' && i + 2 < n &&
               (pattern.charAt(i + 1) == 'p' || pattern.charAt(i + 1) == 'P') &&
               pattern.charAt(i + 2) == '{') {
        // Two RE2↔Java \p{...} gaps, handled together:
        //   - RE2's in-brace negation \p{^Name} (regexp/syntax Perl flavor)
        //     is a parse error in Java; \P{Name} / \p{Name} is the exact
        //     equivalent — flip the case of p.
        //   - RE2 names Unicode SCRIPTS bare (\p{Greek}); Java requires the
        //     Is prefix (\p{IsGreek}) and rejects the bare form — map names
        //     Java doesn't know but accepts Is-prefixed.
        val close = pattern.indexOf('}', i + 3)
        if (close < 0) { sb.append(c); i += 1 }
        else {
          var pc = pattern.charAt(i + 1)
          var name = pattern.substring(i + 3, close)
          if (name.startsWith("^")) {
            pc = if (pc == 'p') 'P' else 'p'
            name = name.substring(1)
          }
          sb.append('\\').append(pc).append('{')
            .append(javaPropertyName(name)).append('}')
          i = close + 1
        }
      }
      else if (c == '\\' && i + 1 < n && pattern.charAt(i + 1) == 'v') {
        // RE2's \v is the literal VERTICAL TAB; Java's \v is the
        // vertical-whitespace CLASS — silently different matches. \x0B is
        // the VT literal in both engines (valid inside and outside classes),
        // so the translation preserves RE2 semantics. (JavaSuperset callers
        // inherit the RE2 meaning of \v — documented on RegexPolicy.)
        sb.append("\\x0B"); i += 2
      }
      else if (c == '\\' && i + 1 < n) { sb.append(c).append(pattern.charAt(i + 1)); i += 2 }
      else if (!inClass && c == '[') {
        inClass = true
        sb.append(c); i += 1
        // leading '^' and a literal ']' immediately after stay verbatim
        if (i < n && pattern.charAt(i) == '^') { sb.append('^'); i += 1 }
        if (i < n && pattern.charAt(i) == ']') { sb.append(']'); i += 1 }
      }
      else if (inClass && c == '[' && i + 1 < n && pattern.charAt(i + 1) == ':') {
        val end = pattern.indexOf(":]", i + 2)
        val name0 = if (end < 0) "" else pattern.substring(i + 2, end)
        val neg = name0.startsWith("^")
        val name = if (neg) name0.substring(1) else name0
        if (end < 0) { sb.append(c); i += 1 }
        else if (name == "word") { sb.append(if (neg) "\\W" else "\\w"); i = end + 2 }
        else posixClasses.get(name) match {
          case Some(j) =>
            sb.append(if (neg) "\\P{" else "\\p{").append(j).append('}'); i = end + 2
          case None => sb.append(pattern.substring(i, end + 2)); i = end + 2
        }
      }
      else if (inClass && c == ']') { inClass = false; sb.append(c); i += 1 }
      else if (!inClass && c == '(' && pattern.regionMatches(i, "(?P<", 0, 4)) {
        // find the closing '>' of the name; emit a non-capturing group
        val gt = pattern.indexOf('>', i + 4)
        if (gt < 0) { sb.append(c); i += 1 }
        else { sb.append("(?:"); i = gt + 1 }
      }
      else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Compile-time gate: throws (Re2Strict, the default — matching the
    * reference's Go `regexp.Compile` rejection) or passes silently
    * (JavaSuperset opt-in). `where` names the keyword site for the error. */
  def check(pattern: String, where: String, policy: RegexPolicy): Unit =
    policy match {
      case RegexPolicy.JavaSuperset => ()
      case RegexPolicy.Re2Strict =>
        val bad = re2Incompatibilities(pattern)
        if (bad.nonEmpty) throw new IllegalArgumentException(
          s"$where pattern '$pattern' uses Java-only regex constructs the " +
            s"reference's RE2 engine rejects: ${bad.mkString("; ")}. " +
            "Use CompileOpts(regexPolicy = RegexPolicy.JavaSuperset) to " +
            "accept the Java dialect (diverges from the reference).")
    }
}

/** Which regex dialect schema-supplied patterns may use. */
sealed abstract class RegexPolicy
object RegexPolicy {
  /** Reject Java-only constructs at compile time (reference parity). */
  case object Re2Strict extends RegexPolicy
  /** Accept the full Java dialect — documented divergence from the
    * reference, for callers that control their schemas. One caveat carries
    * over from the parity translation: `\v` keeps its RE2 meaning (the
    * literal vertical tab, translated to `\x0B`), not Java's
    * vertical-whitespace class. */
  case object JavaSuperset extends RegexPolicy
}
