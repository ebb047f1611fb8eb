package graft

import graft.compile.{CompileOpts, RegexDialect, RegexPolicy}
import graft.model.SchemaParser
import graft.row.RowValidator
import org.scalatest.funsuite.AnyFunSuite

/** RE2-dialect guard (SURVEY §7.4.3): patterns the reference's Go RE2 engine
  * rejects (`regexp.Compile`, validator.go:1008) must be flagged here, not
  * silently accepted into a Java-dialect divergence. */
class RegexDialectScanSpec extends AnyFunSuite {
  import RegexDialect.re2Incompatibilities

  test("backreferences are flagged; escaped backslash-digit is not") {
    assert(re2Incompatibilities("""(a)\1""").exists(_.contains("backreference")))
    assert(re2Incompatibilities("""(a)\\1""").isEmpty) // literal backslash then '1'
    assert(re2Incompatibilities("""\k<name>x""").exists(_.contains("named backreference")))
  }

  test("lookaround and atomic groups are flagged; named groups are not") {
    assert(re2Incompatibilities("a(?=b)").exists(_.contains("lookahead")))
    assert(re2Incompatibilities("a(?!b)").exists(_.contains("negative lookahead")))
    assert(re2Incompatibilities("(?<=a)b").exists(_.contains("lookbehind")))
    assert(re2Incompatibilities("(?<!a)b").exists(_.contains("lookbehind")))
    assert(re2Incompatibilities("(?>ab)").exists(_.contains("atomic")))
    assert(re2Incompatibilities("(?<name>ab)").isEmpty) // RE2-valid named group
    assert(re2Incompatibilities("(?:ab)(?i)x").isEmpty) // non-capture + flags
  }

  test("possessive quantifiers are flagged; lazy and literal forms are not") {
    assert(re2Incompatibilities("a*+").nonEmpty)
    assert(re2Incompatibilities("a++").nonEmpty)
    assert(re2Incompatibilities("a{2,3}+").nonEmpty)
    assert(re2Incompatibilities("a+?b*?").isEmpty)  // lazy — RE2-valid
    assert(re2Incompatibilities("a}+").isEmpty)     // literal '}' then quantifier
    assert(re2Incompatibilities("[+]+x[*]*").isEmpty) // class literals
    assert(re2Incompatibilities("""\+\+""").isEmpty)  // escaped plus signs
  }

  test("Java-only anchors \\Z and \\G are flagged; \\z \\A \\b are not") {
    assert(re2Incompatibilities("""abc\Z""").nonEmpty)
    assert(re2Incompatibilities("""\Gabc""").nonEmpty)
    assert(re2Incompatibilities("""\Aabc\z\b""").isEmpty)
  }

  test("constructs inside character classes do not false-positive") {
    assert(re2Incompatibilities("[(?=]a").isEmpty)
    assert(re2Incompatibilities("[]]?").isEmpty)  // leading ] is a literal
    assert(re2Incompatibilities("[^]]*").isEmpty)
  }

  test("typical real-world RE2 patterns pass clean") {
    for (p <- Seq("^[0-9]+$", "^(red|green|blue)$", """^\d{3}-\d{4}$""",
                  """^\p{L}[\p{L}\p{N}_-]{0,63}$""", "b.t", "^a", "https?://[^ ]+"))
      assert(re2Incompatibilities(p).isEmpty, p)
  }

  test("repeat counts above RE2's 1000 limit are flagged (Go 'invalid repeat count')") {
    assert(re2Incompatibilities("a{1001}").exists(_.contains("1000 limit")))
    assert(re2Incompatibilities("a{2,5000}").exists(_.contains("1000 limit")))
    assert(re2Incompatibilities("a{999999999999}").exists(_.contains("1000 limit")))
    assert(re2Incompatibilities("a{1000}").isEmpty)
    assert(re2Incompatibilities("a{0,1000}").isEmpty)
    assert(re2Incompatibilities("a{1001").isEmpty) // literal braces, not a quantifier
  }

  test("Java-only escapes \\h \\H \\V \\R \\X are flagged; \\s \\S \\w \\d are not") {
    for (e <- Seq("""\h""", """\H""", """\V""", """\R""", """\X"""))
      assert(re2Incompatibilities(s"a${e}b").nonEmpty, e)
    assert(re2Incompatibilities("""\s\S\w\W\d\D""").isEmpty)
  }

  test("inline flags: Java-only x/d/u and the divergent U are flagged; i m s are not") {
    assert(re2Incompatibilities("(?x)a b").exists(_.contains("(?x)")))
    assert(re2Incompatibilities("(?d)a$").exists(_.contains("(?d)")))
    assert(re2Incompatibilities("(?u)A").exists(_.contains("(?u)")))
    assert(re2Incompatibilities("(?U)a+").exists(_.contains("diverges")))
    assert(re2Incompatibilities("(?ims)a(?-i)b").isEmpty)
    assert(re2Incompatibilities("(?i:abc)").isEmpty)
    assert(re2Incompatibilities("(?P<name>a)(?<other>b)").isEmpty) // named groups, not flags
  }

  test("(?U) is flagged only for MATCHING contexts — validity-only (format:regex) accepts it") {
    // Go's regexp/syntax.Parse accepts (?U) (ungreedy): the reference judges
    // "(?U)a*" a VALID regex, so the validity-only guard must agree
    assert(re2Incompatibilities("(?U)a+", forMatching = false).isEmpty)
    // Java-only flags stay rejected in both contexts (RE2 cannot parse them)
    assert(re2Incompatibilities("(?x)a b", forMatching = false).nonEmpty)
  }

  test("toJava translates \\v to the VT literal (RE2 meaning), POSIX classes, (?P<>)") {
    assert(RegexDialect.toJava("""a\vb""") === """a\x0Bb""")
    assert(RegexDialect.toJava("""[\v]""") === """[\x0B]""")
    assert(RegexDialect.toJava("""a\\vb""") === """a\\vb""") // escaped backslash + v
    // Java must now see VT as a literal: the class matches VT, not newline
    val p = java.util.regex.Pattern.compile(RegexDialect.toJava("""^\v$"""))
    assert(p.matcher("\u000B").matches())
    assert(!p.matcher("\n").matches())
  }
}

/** Compile-time policy: Re2Strict (default) rejects, JavaSuperset accepts. */
class RegexDialectCompileSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  private val backrefSchema =
    """{"properties": {"s": {"type": "string", "pattern": "(a)\\1"}}}"""

  test("a backreference pattern is rejected at compile (Go regexp.Compile parity)") {
    val df = Seq(("x", "aa")).toDF("id", "s")
    val e = intercept[IllegalArgumentException] {
      RowValidator.violations(df, SchemaParser.parse(backrefSchema), "id").collect()
    }
    assert(e.getMessage.contains("backreference"))
    assert(e.getMessage.contains("RE2"))
  }

  test("JavaSuperset policy opts into the Java dialect explicitly") {
    val df = Seq(("x", "aa"), ("y", "ab")).toDF("id", "s")
    val opts = CompileOpts(regexPolicy = RegexPolicy.JavaSuperset)
    val bad = RowValidator.violations(df, SchemaParser.parse(backrefSchema), "id", opts)
      .select("id").as[String].collect().toSet
    assert(bad === Set("y")) // "ab" fails (a)\1; "aa" matches
  }

  test("patternProperties patterns go through the same gate") {
    val schema =
      """{"patternProperties": {"^x(?=y)": {"type": "string"}}}"""
    val df = spark.sql("SELECT map('xy', 'v') AS m")
      .select(col("m").as("value"))
    val e = intercept[IllegalArgumentException] {
      graft.compile.ConstraintCompiler.compile(
        SchemaParser.parse(schema), col("value"), df.schema("value").dataType,
        CompileOpts()).valid
      df.count()
    }
    assert(e.getMessage.contains("lookahead"))
  }

  test("format:regex rejects RE2-incompatible instance strings like Go") {
    val schema = """{"type": "string", "format": "regex"}"""
    val df = Seq("^[a-z]+$", "(a)\\1", "a(?=b)", "((broken").toDF("value")
    val ok = df.filter(RowValidator.validColumn(df, schema)).as[String].collect().toSet
    assert(ok === Set("^[a-z]+$"))
  }

  test("toJava translates RE2-only syntax Java rejects or misparses") {
    import RegexDialect.toJava
    // (?P<name>...) named groups -> non-capturing (match-only semantics)
    assert(toJava("(?P<word>[a-z]+)-(?P<num>\\d+)") === "(?:[a-z]+)-(?:\\d+)")
    // Java-style named groups and everything else pass through
    assert(toJava("(?<name>ab)+x") === "(?<name>ab)+x")
    // POSIX classes inside brackets -> \p{...}; negation -> \P{...}
    assert(toJava("[[:alpha:]]+") === "[\\p{Alpha}]+")
    assert(toJava("[[:^digit:]_]") === "[\\P{Digit}_]")
    assert(toJava("[a[:space:]z]") === "[a\\p{Space}z]")
    assert(toJava("[[:word:]]") === "[\\w]")
    // escapes and literal brackets survive untouched
    assert(toJava("\\[\\(?P<x>") === "\\[\\(?P<x>")
    assert(toJava("[][:alpha:]]") === "[]\\p{Alpha}]")
    // the translated POSIX form compiles and matches in Java
    val re = java.util.regex.Pattern.compile(toJava("^[[:alpha:][:digit:]]+$"))
    assert(re.matcher("abc123").matches() && !re.matcher("a b").matches())
  }

  test("\\Q...\\E quoted regions suppress construct detection (RE2 supports quoting)") {
    import RegexDialect.{re2Incompatibilities, toJava}
    // a literal "(?x)" / "{2000}" / "a+" inside \Q...\E is plain text to
    // BOTH engines — must not be flagged
    assert(re2Incompatibilities("""\Q(?x){2000}a++\E$""").isEmpty)
    assert(re2Incompatibilities("""x\Q\h\X(a)\1\E""").isEmpty)
    // unterminated \Q quotes to end-of-pattern in both engines
    assert(re2Incompatibilities("""a\Q(?u)""").isEmpty)
    // constructs OUTSIDE the quoted region are still caught
    assert(re2Incompatibilities("""\Qsafe\E(?=x)""").exists(_.contains("lookahead")))
    // INSIDE a character class the engines diverge: Java honors quoting
    // there, Go's parseClassChar has no \Q and errors — flagged
    assert(re2Incompatibilities("""[\Qab\E]""").exists(_.contains("character class")))
    // toJava must not rewrite literal text inside \Q...\E (\v, [[:alpha:]])
    assert(toJava("""\Q\v[[:alpha:]](?P<x>\E""") === """\Q\v[[:alpha:]](?P<x>\E""")
    val re = java.util.regex.Pattern.compile(toJava("""^\Q{2000}\E$"""))
    assert(re.matcher("{2000}").matches())
  }

  test("Java-only \\p property names and \\cX are flagged; RE2 names are not") {
    import RegexDialect.re2Incompatibilities
    // java-prefixed, Is-alias, In-block, POSIX-style: Go rejects all four
    assert(re2Incompatibilities("""\p{javaLowerCase}+""").exists(_.contains("java-prefixed")))
    assert(re2Incompatibilities("""\p{IsGreek}""").exists(_.contains("Is-prefixed")))
    assert(re2Incompatibilities("""\p{IsAlphabetic}""").exists(_.contains("Is-prefixed")))
    assert(re2Incompatibilities("""\P{InGreek}""").exists(_.contains("block")))
    assert(re2Incompatibilities("""\p{Alpha}""").exists(_.contains("POSIX-style")))
    // ...including inside character classes
    assert(re2Incompatibilities("""[\p{javaWhitespace}]""").exists(_.contains("java-prefixed")))
    // RE2-legal: general categories, bare script names (Inherited starts
    // with "In" + lowercase — must not false-flag), negated property
    assert(re2Incompatibilities("""\p{L}\p{Lu}\pN""").isEmpty)
    assert(re2Incompatibilities("""\p{Greek}\p{Inherited}""").isEmpty)
    assert(re2Incompatibilities("""\p{^Greek}""").isEmpty)
    // Go's parser has no \c escape at all
    assert(re2Incompatibilities("""\cA""").exists(_.contains("control-char")))
  }

  test("toJava maps RE2 \\p forms Java rejects: \\p{^Name} negation, bare script names") {
    import RegexDialect.toJava
    // in-brace negation (RE2-only) -> case-flipped p/P
    assert(toJava("""\P{^L}""") === """\p{L}""")
    // bare script names (RE2-only) -> Java's Is-prefixed form
    assert(toJava("""\p{Greek}""") === """\p{IsGreek}""")
    assert(toJava("""\p{^Greek}""") === """\P{IsGreek}""")
    // names Java already knows pass through untouched
    assert(toJava("""\p{L}\p{Lu}\p{Alpha}\p{IsGreek}""") ===
      """\p{L}\p{Lu}\p{Alpha}\p{IsGreek}""")
    val re = java.util.regex.Pattern.compile(toJava("""^\p{^Greek}+$"""))
    assert(re.matcher("abc").matches() && !re.matcher("αβγ").matches())
    val re2 = java.util.regex.Pattern.compile(toJava("""^\p{Greek}+$"""))
    assert(re2.matcher("αβγ").matches() && !re2.matcher("abc").matches())
  }

  test("reference-legal RE2 patterns validate identically after translation") {
    // the reference compiles these with regexp.Compile (validator.go:1008);
    // Java would throw on (?P< and silently misparse [[:digit:]]
    val df2 = Seq("abc-123", "abc-x", "ABC-123").toDF("value")
    val schemaCol = """{"type": "string", "pattern": "^(?P<word>[a-z]+)-[[:digit:]]+$"}"""
    val ok2 = df2.filter(RowValidator.validColumn(df2, schemaCol)).as[String].collect().toSet
    assert(ok2 === Set("abc-123"))
    // format:regex judges RE2-only syntax VALID (Go parses it)
    val fmt = """{"type": "string", "format": "regex"}"""
    val df3 = Seq("(?P<x>a)", "[[:alpha:]]", "(a)\\1").toDF("value")
    val ok3 = df3.filter(RowValidator.validColumn(df3, fmt)).as[String].collect().toSet
    assert(ok3 === Set("(?P<x>a)", "[[:alpha:]]"))
  }
}
