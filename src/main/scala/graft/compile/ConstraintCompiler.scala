package graft.compile

import graft.model._
import graft.expr.NumericExprs
import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.expressions.{Cast, EvalMode}
import org.json4s._

/** Compilation options.
  *
  * @param nullIsAbsent table-validation semantics: a null column value means
  *   "property absent" — subschemas skip it, `required` catches it (the useful
  *   semantics over fixed-schema tables). When false (conformance mode for
  *   JSON-Schema-Test-Suite cases), null is JSON `null`: `type`/`enum`/`const`
  *   see it, everything else skips it — matching the reference, where scalar
  *   keywords ignore wrong-typed instances (validator.go:976,991,1003).
  * @param validateFormat mirror of `ValidateOpts.ValidateFormat`
  *   (schema.go:727-737): format is annotation-only unless enabled.
  */
final case class CompileOpts(nullIsAbsent: Boolean = true,
                             validateFormat: Boolean = true,
                             regexPolicy: RegexPolicy = RegexPolicy.Re2Strict)

/** A compiled (sub)schema: a boolean validity predicate plus a column of
  * violation records — `array<struct<keyword,keywordLocation,instanceLocation,
  * message>>`, empty when valid. Violations mirror
  * `ValidationError{Message,KeywordLocation,InstanceLocation}`
  * (pkg/errors/errors.go:15-22); accumulation-not-fail-fast mirrors the
  * keyword loop (schema.go:804-817). */
final case class Compiled(valid: Column, violations: Column)

/** Compiles a parsed schema against a concrete Spark DataType into Catalyst
  * Column expressions. The reference's recursive interpreter
  * (`ValidateSubSchema`, schema.go:796-819) unrolls here at compile time into
  * one wide expression DAG evaluated per row inside whole-stage codegen —
  * control never returns to the driver during validation. */
object ConstraintCompiler {

  val violationStructType: StructType = StructType(Seq(
    StructField("keyword", StringType, nullable = false),
    StructField("keywordLocation", StringType, nullable = false),
    StructField("instanceLocation", StringType, nullable = true),
    StructField("message", StringType, nullable = true)))
  val violationsType: ArrayType = ArrayType(violationStructType, containsNull = false)

  def emptyViolations: Column = GraftSql.toColumn(
    org.apache.spark.sql.catalyst.expressions.Literal.create(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any]),
      violationsType))

  private def mkViolation(keyword: String, kwLoc: String, instLoc: Column, msg: Column): Column =
    array(struct(lit(keyword).as("keyword"), lit(kwLoc).as("keywordLocation"),
      instLoc.as("instanceLocation"), msg.as("message")))

  /** Wrap a plain predicate into a Compiled with a single violation record. */
  private def simple(pred: Column, keyword: String, kwLoc: String,
                     instLoc: Column, msg: Column): Compiled =
    Compiled(pred, when(pred, emptyViolations)
      .otherwise(mkViolation(keyword, kwLoc, instLoc, msg)))

  /** @param dynScope the stack of (owning document, resource base URI)
    *        entered so far — compile-time inlining follows the same traversal
    *        as runtime validation, so this IS the spec's dynamic scope for
    *        `\$dynamicRef` (outermost-first resolution). Data descent keeps
    *        the scope but clears `refStack`: recursion through `\$ref` is
    *        legal (and terminates) whenever the finite DataType descends. */
  private case class Ctx(doc: SchemaDoc, opts: CompileOpts, refStack: Set[String],
                         dynScope: Vector[(SchemaDoc, String)],
                         unroll: Map[String, Int] = Map.empty) {
    def conformance: Boolean = !opts.nullIsAbsent
    def descend: Ctx =
      if (refStack.isEmpty && unroll.isEmpty) this
      else copy(refStack = Set.empty, unroll = Map.empty)
  }

  /** How many times a `\$ref`/`\$dynamicRef` cycle with NO intervening data
    * descent is unrolled before the occurrence is replaced by the
    * least-fixpoint bottom (invalid + a depth-guard violation row). Two
    * Kleene iterations settle single-variable cycles and mutually recursive
    * pairs. Documented deviation: the reference evaluates EVERY applicator
    * branch (no short-circuit — `internal/validator/validator.go:88-120`
    * "Continue to check all subschemas"), so any same-instance cycle
    * recurses to the depth guard (`pkg/types/schema/schema.go:1088`, 1000)
    * and the whole validation ERRORS. Graft instead closes the cycle with
    * the least fixpoint and returns a verdict. For MONOTONE (negation-free)
    * cycles that verdict is exact: valid exactly when some finite unfolding
    * validates the instance — strictly more schemas get row verdicts, and
    * rows the reference would error on surface the depth-guard violation
    * below instead of aborting the job (at 10^12 rows a per-row abort is
    * not an option). A no-descent cycle routed through `not` (or an `if`
    * condition used negatively) is NOT monotone: with lit(false) as bottom
    * the closed-form verdict depends on the parity of the unroll budget,
    * not on any finite unfolding — the reference errors on every such
    * cycle, so behavior there remains a documented deviation with an
    * arbitrary (but deterministic) verdict plus the depth-guard violation
    * row. Recursion THROUGH data never hits this path: `descend` resets
    * the budget because the finite DataType terminates it (the
    * strict-tree / meta-schema shapes). */
  private val MaxNoDescentUnroll = 2

  private def pushScope(scope: Vector[(SchemaDoc, String)], owner: SchemaDoc,
                        base: String): Vector[(SchemaDoc, String)] =
    if (scope.nonEmpty && (scope.last._1 eq owner) && scope.last._2 == base) scope
    else scope :+ ((owner, base))

  /** Entry point: compile `doc` to run against a column of type `dt`. */
  def compile(doc: SchemaDoc, target: Column, dt: DataType,
              opts: CompileOpts = CompileOpts()): Compiled =
    compileNode(doc.root, Ctx(doc, opts, Set.empty, Vector((doc, doc.baseUri))),
      target, dt, "#", lit("#"))

  // ------------------------------------------------------------------
  private def compileNode(node: SchemaNode, ctx: Ctx, target: Column,
                          dt: DataType, kwLoc: String, instLoc: Column): Compiled =
    node match {
      case BoolSchema(true) => Compiled(lit(true), emptyViolations)
      case BoolSchema(false) =>
        val raw = simple(lit(false), "$bool", kwLoc, instLoc, lit("schema is false"))
        // table semantics: an absent (null) instance satisfies even `false`
        // — the keyword only constrains PRESENT values, same skip the
        // ObjSchema branch below applies (a banned optional property
        // {"legacy": false} must not fail rows that lack it)
        if (ctx.opts.nullIsAbsent)
          Compiled(target.isNull || raw.valid,
            when(target.isNull, emptyViolations).otherwise(raw.violations))
        else raw
      case s: ObjSchema =>
        // a nested `$id` opens a new resource in the dynamic scope even when
        // entered by direct nesting rather than by reference
        val ctx1 = s.keywords.collectFirst {
          case AnnotationK("$id", JString(id)) => id.takeWhile(_ != '#')
        } match {
          case Some(id) if ctx.dynScope.nonEmpty =>
            val base = SchemaParser.resolveUri(ctx.dynScope.last._2, id)
            if (base.nonEmpty)
              ctx.copy(dynScope = pushScope(ctx.dynScope, ctx.dynScope.last._1, base))
            else ctx
          case _ => ctx
        }
        val raw = compileObj(s, ctx1, target, dt, kwLoc, instLoc)
        if (ctx.opts.nullIsAbsent) {
          // table semantics: null target = absent → every keyword valid
          Compiled(target.isNull || raw.valid,
            when(target.isNull, emptyViolations).otherwise(raw.violations))
        } else raw
    }

  private def and(cs: Seq[Compiled]): Compiled =
    if (cs.isEmpty) Compiled(lit(true), emptyViolations)
    else Compiled(cs.map(_.valid).reduce(_ && _),
      if (cs.size == 1) cs.head.violations else concat(cs.map(_.violations): _*))

  // ------------------------------------------------------------------
  private def compileObj(s: ObjSchema, ctx: Ctx, target: Column, dt: DataType,
                         kwLoc: String, instLoc: Column): Compiled = {
    val kws = s.keywords

    // RE2-dialect gate (SURVEY §7.4.3): every schema-supplied pattern is
    // checked ONCE at compile time against the policy — the reference's Go
    // RE2 engine rejects Java-only constructs (validator.go:1008), so
    // accepting them silently would diverge row-for-row on such schemas
    kws.foreach {
      case PatternK(p) =>
        RegexDialect.check(p, s"$kwLoc/pattern", ctx.opts.regexPolicy)
      case PatternPropertiesK(pats) => pats.foreach { case (p, _) =>
        RegexDialect.check(p, s"$kwLoc/patternProperties", ctx.opts.regexPolicy) }
      case _ => ()
    }

    // --- keyword groups that share compile-time state (the reference's
    //     Notes channel, resolved statically per SURVEY §2 mapping) ---
    val ifS   = kws.collectFirst { case IfK(x) => x }
    val thenS = kws.collectFirst { case ThenK(x) => x }
    val elseS = kws.collectFirst { case ElseK(x) => x }
    val containsS = kws.collectFirst { case ContainsK(x) => x }
    val minContains = kws.collectFirst { case MinContainsK(n) => n }
    val maxContains = kws.collectFirst { case MaxContainsK(n) => n }
    val prefixItems = kws.collectFirst { case PrefixItemsK(ss) => ss }
    val itemsS = kws.collectFirst { case ItemsK(x) => x }
    val propsK = kws.collectFirst { case p: PropertiesK => p }
    val patPropsK = kws.collectFirst { case p: PatternPropertiesK => p }
    val addPropsK = kws.collectFirst { case p: AdditionalPropertiesK => p }
    val unevalPropsK = kws.collectFirst { case UnevaluatedPropertiesK(x) => x }
    val unevalItemsK = kws.collectFirst { case UnevaluatedItemsK(x) => x }

    val grouped: Seq[Compiled] =
      compileConditional(ifS, thenS, elseS, ctx, target, dt, kwLoc, instLoc).toSeq ++
      compileContains(containsS, minContains, maxContains, ctx, target, dt, kwLoc, instLoc).toSeq ++
      compileItems(prefixItems, itemsS, ctx, target, dt, kwLoc, instLoc).toSeq ++
      compileObjectApplicators(propsK, patPropsK, addPropsK, ctx, target, dt, kwLoc, instLoc) ++
      unevalPropsK.toSeq.map(sub =>
        compileUnevaluatedProps(s, sub, ctx, target, dt, kwLoc, instLoc)) ++
      unevalItemsK.toSeq.map(sub =>
        compileUnevaluatedItems(s, sub, ctx, target, dt, kwLoc, instLoc))

    val singles: Seq[Compiled] = kws.flatMap {
      case _: IfK | _: ThenK | _: ElseK | _: ContainsK | _: MinContainsK |
           _: MaxContainsK | _: PrefixItemsK | _: ItemsK | _: PropertiesK |
           _: PatternPropertiesK | _: AdditionalPropertiesK |
           _: UnevaluatedPropertiesK | _: UnevaluatedItemsK => None
      case k => compileKeyword(k, ctx, target, dt, kwLoc, instLoc)
    }
    and(grouped ++ singles)
  }

  // ------------------------------------------------------------------
  // unevaluatedProperties / unevaluatedItems — the reference's runtime
  // annotation flow (Notes across in-place applicators, validator.go:647-750)
  // resolved at compile time into per-row conditional coverage (SURVEY §7.4.1).

  /** Whether a field is evaluated by `node` or any of its in-place
    * applicators: `None` = statically always, `Some(cond)` = when `cond`. */
  private type Coverage = Map[String, Option[Column]]

  private def mergeCov(a: Coverage, b: Coverage): Coverage =
    (a.keySet ++ b.keySet).iterator.map { k =>
      k -> ((a.get(k), b.get(k)) match {
        case (Some(None), _) | (_, Some(None)) => None
        case (Some(Some(x)), Some(Some(y))) => Some(x || y)
        case (Some(v), None) => v
        case (None, Some(v)) => v
        case (None, None) => Some(lit(false))
      })
    }.toMap

  private def condCov(c: Coverage, cond: Column): Coverage =
    c.map { case (k, v) => k -> Some(v.map(_ && cond).getOrElse(cond)) }

  /** Field-evaluation coverage of `node` against StructType fields. Branch
    * contributions are conditioned on branch validity (annotations flow only
    * from passing schemas, validator.go:62-121). */
  private def propCoverage(node: SchemaNode, ctx: Ctx, target: Column,
                           st: StructType): Coverage = node match {
    case BoolSchema(_) => Map.empty
    case ObjSchema(kws) =>
      val names = st.fieldNames.toSeq
      def always(ns: Seq[String]): Coverage = ns.map(_ -> (None: Option[Column])).toMap
      kws.foldLeft(Map.empty: Coverage) { (cov, k) =>
        val add: Coverage = k match {
          case PropertiesK(props) => always(props.map(_._1).filter(names.contains))
          case PatternPropertiesK(pats) =>
            always(pats.flatMap { case (p, _) =>
              val re = java.util.regex.Pattern.compile(RegexDialect.toJava(p))
              names.filter(n => re.matcher(n).find())
            })
          case _: AdditionalPropertiesK | _: UnevaluatedPropertiesK => always(names)
          case AllOfK(ss) => ss.map(branchCov(_, ctx, target, st)).reduceOption(mergeCov)
            .getOrElse(Map.empty)
          case AnyOfK(ss) => ss.map(branchCov(_, ctx, target, st)).reduceOption(mergeCov)
            .getOrElse(Map.empty)
          case OneOfK(ss) => ss.map(branchCov(_, ctx, target, st)).reduceOption(mergeCov)
            .getOrElse(Map.empty)
          case IfK(sub) =>
            val cond = quietValid(sub, ctx, target, st)
            condCov(propCoverage(sub, ctx, target, st), cond)
          case ThenK(sub) =>
            val ifCond = kws.collectFirst { case IfK(i) => quietValid(i, ctx, target, st) }
            ifCond.map(c => condCov(branchCov(sub, ctx, target, st), c)).getOrElse(Map.empty)
          case ElseK(sub) =>
            val ifCond = kws.collectFirst { case IfK(i) => quietValid(i, ctx, target, st) }
            ifCond.map(c => condCov(branchCov(sub, ctx, target, st), !c)).getOrElse(Map.empty)
          case DependentSchemasK(deps) =>
            deps.filter(d => st.fieldNames.contains(d._1)).map { case (key, sub) =>
              // presence gate matches the keyword's own compile: conformance
              // structs carry exactly the instance's keys, so a null-valued
              // trigger key is PRESENT and its schema's annotations count
              val present =
                if (ctx.conformance) lit(true)
                else target.getField(key).isNotNull
              condCov(branchCov(sub, ctx, target, st), present)
            }.reduceOption(mergeCov).getOrElse(Map.empty)
          case RefK(ref) if !ctx.refStack.contains(ref) =>
            propCoverage(ctx.doc.resolveRefNode(ref),
              ctx.copy(refStack = ctx.refStack + ref), target, st)
          case DynamicRefK(ref) if !ctx.refStack.contains(ref) =>
            propCoverage(ctx.doc.resolveDynamicRefNode(ref),
              ctx.copy(refStack = ctx.refStack + ref), target, st)
          case _ => Map.empty
        }
        mergeCov(cov, add)
      }
  }

  /** Coverage of an applicator branch: its own coverage gated on its verdict. */
  private def branchCov(sub: SchemaNode, ctx: Ctx, target: Column,
                        st: StructType): Coverage =
    condCov(propCoverage(sub, ctx, target, st), quietValid(sub, ctx, target, st))

  /** Validity predicate of a subschema with throwaway locations. */
  private def quietValid(sub: SchemaNode, ctx: Ctx, target: Column, dt: DataType): Column =
    compileNode(sub, ctx, target, dt, "#", lit("#")).valid

  private def compileUnevaluatedProps(s: ObjSchema, sub: SchemaNode, ctx: Ctx,
      target: Column, dt: DataType, kwLoc: String, instLoc: Column): Compiled = dt match {
    case st: StructType =>
      // coverage from siblings + in-place applicators, excluding this keyword
      val selfless = ObjSchema(s.keywords.filterNot(_.isInstanceOf[UnevaluatedPropertiesK]))
      val cov = propCoverage(selfless, ctx, target, st)
      val checks = st.fields.toSeq.flatMap { f =>
        cov.get(f.name) match {
          case Some(None) => None // statically always evaluated
          case covOpt =>
            val covered = covOpt.flatten.getOrElse(lit(false))
            val child = target.getField(f.name)
            val inner = compileNode(sub, ctx.descend, child, f.dataType,
              s"$kwLoc/unevaluatedProperties",
              concat(instLoc, lit(s"/${escapePtr(f.name)}")))
            val viol =
              if (isFalseSchema(sub))
                mkViolation("unevaluatedProperties", s"$kwLoc/unevaluatedProperties",
                  concat(instLoc, lit(s"/${escapePtr(f.name)}")),
                  lit(s"unevaluated property \"${f.name}\""))
              else inner.violations
            // table mode: null field = absent (skip); conformance: a struct
            // field is a PRESENT property whose JSON-null value the
            // unevaluated subschema must judge
            val absent = if (ctx.conformance) lit(false) else child.isNull
            Some(Compiled(absent || covered || inner.valid,
              when(absent || covered || inner.valid, emptyViolations).otherwise(viol)))
        }
      }
      and(checks)
    case MapType(StringType, vt, _) =>
      // dynamic keys: a key is covered when evaluated by this schema's own
      // properties / patternProperties / additionalProperties OR by any
      // in-place applicator branch that PASSES (annotations only flow from
      // passing schemas — same rule as the struct path's propCoverage)
      val selfless = ObjSchema(s.keywords.filterNot(_.isInstanceOf[UnevaluatedPropertiesK]))
      val covFn = mapKeyCoverage(selfless, ctx, target, dt)
      val uncov = filter(map_keys(target), k => !covFn(k))
      val bad = filter(uncov, k =>
        !compileNode(sub, ctx.descend, element_at(target, k), vt,
          s"$kwLoc/unevaluatedProperties", instLoc).valid)
      simple(target.isNull || size(bad) === 0, "unevaluatedProperties",
        s"$kwLoc/unevaluatedProperties", instLoc,
        concat(lit("unevaluated properties: "), array_join(bad, ",")))
    case _ => Compiled(lit(true), emptyViolations)
  }

  /** Key-coverage predicate builder for MapType targets: given a key column,
    * is that key evaluated by `node` or any passing in-place applicator? */
  private def mapKeyCoverage(node: SchemaNode, ctx: Ctx, target: Column,
                             dt: DataType): Column => Column = node match {
    case BoolSchema(_) => _ => lit(false)
    case ObjSchema(kws) =>
      def gated(sub: SchemaNode, cond: Column): Column => Column = {
        val f = mapKeyCoverage(sub, ctx, target, dt)
        k => f(k) && cond
      }
      def branch(sub: SchemaNode): Column => Column =
        gated(sub, quietValid(sub, ctx, target, dt))
      val parts: Seq[Column => Column] = kws.flatMap {
        case PropertiesK(props) if props.nonEmpty =>
          Seq((k: Column) => k.isin(props.map(_._1): _*))
        case PatternPropertiesK(pats) if pats.nonEmpty =>
          Seq((k: Column) =>
            pats.map(_._1).foldLeft(lit(false))((acc, p) =>
              acc || k.rlike(RegexDialect.toJava(p))))
        case _: AdditionalPropertiesK | _: UnevaluatedPropertiesK =>
          Seq((_: Column) => lit(true))
        case AllOfK(ss) => ss.map(branch)
        case AnyOfK(ss) => ss.map(branch)
        case OneOfK(ss) => ss.map(branch)
        case IfK(sub) => Seq(gated(sub, quietValid(sub, ctx, target, dt)))
        case ThenK(sub) =>
          kws.collectFirst { case IfK(i) => quietValid(i, ctx, target, dt) }
            .map(c => gated(sub, c)).toSeq
        case ElseK(sub) =>
          kws.collectFirst { case IfK(i) => quietValid(i, ctx, target, dt) }
            .map(c => gated(sub, !c)).toSeq
        case DependentSchemasK(deps) =>
          deps.map { case (key, sub) => gated(sub, map_contains_key(target, lit(key))) }
        case RefK(ref) if !ctx.refStack.contains(ref) =>
          Seq(mapKeyCoverage(ctx.doc.resolveRefNode(ref),
            ctx.copy(refStack = ctx.refStack + ref), target, dt))
        case DynamicRefK(ref) if !ctx.refStack.contains(ref) =>
          Seq(mapKeyCoverage(ctx.doc.resolveDynamicRefNode(ref),
            ctx.copy(refStack = ctx.refStack + ref), target, dt))
        case _ => Nil
      }
      k => parts.foldLeft(lit(false))((acc, f) => acc || f(k))
  }

  /** Item-index coverage: covered prefix length, items-covers-all flag, and
    * contains predicates whose matched elements count as evaluated
    * (validator.go:647-710; contains note recording :436). */
  private case class ItemCov(prefixLen: Column, all: Column,
                             containsPreds: Vector[(Column, SchemaNode)])

  private def itemCoverage(node: SchemaNode, ctx: Ctx, target: Column,
                           dt: ArrayType): ItemCov = node match {
    case BoolSchema(_) => ItemCov(lit(0), lit(false), Vector.empty)
    case ObjSchema(kws) =>
      kws.foldLeft(ItemCov(lit(0), lit(false), Vector.empty)) { (cov, k) =>
        k match {
          case PrefixItemsK(ss) => cov.copy(prefixLen = greatest(cov.prefixLen, lit(ss.size)))
          case _: ItemsK | _: UnevaluatedItemsK => cov.copy(all = lit(true))
          case ContainsK(sub) => cov.copy(containsPreds = cov.containsPreds :+ (lit(true), sub))
          case AllOfK(ss) => ss.foldLeft(cov)((c, s) => mergeItemCov(c,
            condItemCov(itemCoverage(s, ctx, target, dt), quietValid(s, ctx, target, dt))))
          case AnyOfK(ss) => ss.foldLeft(cov)((c, s) => mergeItemCov(c,
            condItemCov(itemCoverage(s, ctx, target, dt), quietValid(s, ctx, target, dt))))
          case OneOfK(ss) => ss.foldLeft(cov)((c, s) => mergeItemCov(c,
            condItemCov(itemCoverage(s, ctx, target, dt), quietValid(s, ctx, target, dt))))
          case IfK(sub) => mergeItemCov(cov,
            condItemCov(itemCoverage(sub, ctx, target, dt), quietValid(sub, ctx, target, dt)))
          case ThenK(sub) =>
            val ifCond = kws.collectFirst { case IfK(i) => quietValid(i, ctx, target, dt) }
            ifCond.map(c => mergeItemCov(cov, condItemCov(condItemCov(
              itemCoverage(sub, ctx, target, dt), quietValid(sub, ctx, target, dt)), c)))
              .getOrElse(cov)
          case ElseK(sub) =>
            val ifCond = kws.collectFirst { case IfK(i) => quietValid(i, ctx, target, dt) }
            ifCond.map(c => mergeItemCov(cov, condItemCov(condItemCov(
              itemCoverage(sub, ctx, target, dt), quietValid(sub, ctx, target, dt)), !c)))
              .getOrElse(cov)
          case RefK(ref) if !ctx.refStack.contains(ref) =>
            mergeItemCov(cov, itemCoverage(ctx.doc.resolveRefNode(ref),
              ctx.copy(refStack = ctx.refStack + ref), target, dt))
          case DynamicRefK(ref) if !ctx.refStack.contains(ref) =>
            // same in-place-applicator treatment as RefK (mirrors
            // propCoverage/mapKeyCoverage): prefixItems/contains coverage
            // contributed through a $dynamicRef counts for unevaluatedItems
            mergeItemCov(cov, itemCoverage(ctx.doc.resolveDynamicRefNode(ref),
              ctx.copy(refStack = ctx.refStack + ref), target, dt))
          case _ => cov
        }
      }
  }

  private def mergeItemCov(a: ItemCov, b: ItemCov): ItemCov =
    ItemCov(greatest(a.prefixLen, b.prefixLen), a.all || b.all,
      a.containsPreds ++ b.containsPreds)

  private def condItemCov(c: ItemCov, cond: Column): ItemCov =
    ItemCov(when(cond, c.prefixLen).otherwise(lit(0)), c.all && cond,
      c.containsPreds.map { case (cc, s) => (cc && cond, s) })

  private def compileUnevaluatedItems(s: ObjSchema, sub: SchemaNode, ctx: Ctx,
      target: Column, dt: DataType, kwLoc: String, instLoc: Column): Compiled = dt match {
    case at @ ArrayType(et, _) =>
      val selfless = ObjSchema(s.keywords.filterNot(_.isInstanceOf[UnevaluatedItemsK]))
      val cov = itemCoverage(selfless, ctx, target, at)
      def elemCovered(x: Column, i: Column): Column =
        cov.all || i < cov.prefixLen ||
          cov.containsPreds.map { case (cond, cs) =>
            cond && quietValid(cs, ctx, x, et)
          }.foldLeft(lit(false))(_ || _)
      val badCount = size(filter(target, (x, i) =>
        !elemCovered(x, i) && !quietValid(sub, ctx, x, et)))
      simple(target.isNull || badCount === 0, "unevaluatedItems",
        s"$kwLoc/unevaluatedItems", instLoc,
        concat(badCount.cast(StringType), lit(" array items were not evaluated")))
    case _ => Compiled(lit(true), emptyViolations)
  }

  // ------------------------------------------------------------------
  private def compileConditional(ifS: Option[SchemaNode], thenS: Option[SchemaNode],
      elseS: Option[SchemaNode], ctx: Ctx, target: Column, dt: DataType,
      kwLoc: String, instLoc: Column): Option[Compiled] =
    ifS.map { cond =>
      // `if` itself is always-valid; then/else are gated on its verdict
      // (validator.go:178-233). The shared `cond` predicate is the static
      // resolution of the "if" note.
      val condValid = compileNode(cond, ctx, target, dt, s"$kwLoc/if", instLoc).valid
      val thenC = thenS.map(t => compileNode(t, ctx, target, dt, s"$kwLoc/then", instLoc))
        .getOrElse(Compiled(lit(true), emptyViolations))
      val elseC = elseS.map(e => compileNode(e, ctx, target, dt, s"$kwLoc/else", instLoc))
        .getOrElse(Compiled(lit(true), emptyViolations))
      Compiled(when(condValid, thenC.valid).otherwise(elseC.valid),
        when(condValid, thenC.violations).otherwise(elseC.violations))
    }.orElse {
      // then/else with no sibling if: no-op (notes absent → skip, :203,:222)
      if (thenS.isDefined || elseS.isDefined) Some(Compiled(lit(true), emptyViolations)) else None
    }

  // ------------------------------------------------------------------
  private def compileContains(containsS: Option[SchemaNode], minC: Option[Long],
      maxC: Option[Long], ctx: Ctx, target: Column, dt: DataType,
      kwLoc: String, instLoc: Column): Option[Compiled] =
    containsS.map { sub =>
      dt match {
        case ArrayType(et, _) =>
          // shared subexpression: count of matching elements — feeds
          // contains/minContains/maxContains (the Notes channel, statically)
          val matchCount = size(filter(target,
            x => compileNode(sub, ctx.descend, x, et, s"$kwLoc/contains", instLoc).valid))
          // peephole: sibling minContains:0 makes bare `contains` always-valid
          // (validator.go:389-400)
          val needOne = !minC.contains(0L)
          val checks = Seq.newBuilder[Compiled]
          // null instance → keyword ignored (wrong-typed instances skipped)
          val absent = target.isNull
          if (needOne) checks += simple(absent || matchCount >= 1, "contains",
            s"$kwLoc/contains", instLoc, lit("no array items match contains schema"))
          minC.foreach(n => checks += simple(absent || matchCount >= n, "minContains",
            s"$kwLoc/minContains", instLoc, lit(s"fewer than $n items match contains schema")))
          maxC.foreach(n => checks += simple(absent || matchCount <= n, "maxContains",
            s"$kwLoc/maxContains", instLoc, lit(s"more than $n items match contains schema")))
          and(checks.result())
        case _ => Compiled(lit(true), emptyViolations) // non-array: keyword ignored
      }
    }.orElse {
      // minContains/maxContains with no contains sibling: no-op (:1115,:1128)
      if (minC.isDefined || maxC.isDefined) Some(Compiled(lit(true), emptyViolations)) else None
    }

  // ------------------------------------------------------------------
  private def compileItems(prefix: Option[Vector[SchemaNode]], itemsS: Option[SchemaNode],
      ctx: Ctx, target: Column, dt: DataType, kwLoc: String,
      instLoc: Column): Option[Compiled] = {
    if (prefix.isEmpty && itemsS.isEmpty) return None
    dt match {
      case ArrayType(et, _) =>
        val k = prefix.map(_.size).getOrElse(0)
        val prefixChecks: Seq[Compiled] = prefix.toSeq.flatten.zipWithIndex.map {
          case (sub, i) =>
            val el = element_at(target, i + 1)
            val c = compileNode(sub, ctx.descend, el, et, s"$kwLoc/prefixItems/$i",
              concat(instLoc, lit(s"/$i")))
            // element i only constrained when it exists (validator.go:283-302);
            // null instance → keyword ignored
            Compiled(target.isNull || size(target) <= i || c.valid,
              when(target.isNull || size(target) <= i, emptyViolations)
                .otherwise(c.violations))
        }
        val itemsCheck: Option[Compiled] = itemsS.map { sub =>
          // items applies to elements at index >= k (validator.go:339-383).
          // Per-element violations carry the element index in instanceLocation
          // (mirrors InstancePointer composition, schema.go:1120-1144).
          //
          // PERFORMANCE: Spark higher-order functions (transform/forall/
          // filter) are CodegenFallback — they knock the whole projection out
          // of whole-stage codegen. Two countermeasures keep the 99%-valid
          // hot path fully codegen'd:
          //  (a) when the element subschema is pure bounds over a numeric
          //      element type, the validity predicate compiles to native
          //      array_min/array_max comparisons (no lambdas at all);
          //  (b) the per-element violation-record construction (string
          //      concat + struct per element) only evaluates in the
          //      `otherwise` branch of `when(valid, …)` — i.e. on the rare
          //      invalid rows.
          // null instance → array keywords ignored (wrong-typed instances are
          // skipped, validator.go:342); guards also stop HOF null-propagation
          val valid = (if (k == 0) nativeItemsPred(sub, et, ctx, target) else None)
            .getOrElse(target.isNull || coalesce(forall(transform(target,
              (x, i) => i < k || compileNode(sub, ctx.descend, x, et, s"$kwLoc/items", instLoc).valid),
              b => b), lit(true)))
          val viols = flatten(filter(
            transform(target, (x, i) =>
              when(i >= k,
                compileNode(sub, ctx.descend, x, et, s"$kwLoc/items",
                  concat(instLoc, lit("/"), i.cast(StringType))).violations)
              .otherwise(emptyViolations)),
            a => size(a) > 0))
          Compiled(valid,
            when(valid, emptyViolations).otherwise(coalesce(viols, emptyViolations)))
        }
        Some(and(prefixChecks ++ itemsCheck.toSeq))
      case _ => Some(Compiled(lit(true), emptyViolations))
    }
  }

  /** Lambda-free `items` validity for bounds-only subschemas over numeric
    * elements: `forall(a, x => lo ≤ x ≤ hi)` ≡ `array_min(a) ≥ lo ∧
    * array_max(a) ≤ hi` (array_min/max skip nulls, matching nullIsAbsent
    * element semantics; empty arrays are vacuously valid via coalesce).
    * Returns None — falling back to the general HOF path — for anything
    * beyond static-type + bounds, and always in conformance mode (where
    * null elements are JSON nulls, not absences). */
  private def nativeItemsPred(sub: SchemaNode, et: DataType, ctx: Ctx,
                              target: Column): Option[Column] = {
    if (ctx.conformance) return None
    val integral = et match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    val numeric = et.isInstanceOf[NumericType]
    sub match {
      case BoolSchema(true) => Some(lit(true))
      case ObjSchema(kws) =>
        val preds: Vector[Option[Column]] = kws.map {
          case TypeK(ts) =>
            if (integral && (ts.contains("integer") || ts.contains("number"))) Some(lit(true))
            else if (numeric && !integral && ts.contains("number")) Some(lit(true))
            else if (et == StringType && ts.contains("string")) Some(lit(true))
            else if (et == BooleanType && ts.contains("boolean")) Some(lit(true))
            else None // e.g. `integer` over doubles needs per-element residue
          // bounds via array_min/max only for INTEGRAL elements: float/double
          // arrays can carry NaN, which Spark orders above every double
          // (array_max([NaN]) <= hi is false) while the general path's
          // nanPasses guard deliberately passes NaN for bound keywords — the
          // fast path must not flip that verdict, so floats take the HOF path
          case MinimumK(v) if integral => Some(coalesce(array_min(target) >= lit(v), lit(true)))
          case MaximumK(v) if integral => Some(coalesce(array_max(target) <= lit(v), lit(true)))
          case ExclusiveMinimumK(v) if integral =>
            Some(coalesce(array_min(target) > lit(v), lit(true)))
          case ExclusiveMaximumK(v) if integral =>
            Some(coalesce(array_max(target) < lit(v), lit(true)))
          case _ => None
        }
        if (preds.forall(_.isDefined))
          Some(target.isNull || preds.flatten.foldLeft(lit(true))(_ && _))
        else None
      case _ => None
    }
  }

  // ------------------------------------------------------------------
  /** properties / patternProperties / additionalProperties over a fixed
    * StructType: the "which fields are covered" question — runtime notes in
    * the reference (propertiesNote, validator.go:529-534,595-604) — is fully
    * static here, so additionalProperties costs nothing per row. MapType gets
    * the dynamic-key treatment via map_* higher-order functions. */
  private def compileObjectApplicators(propsK: Option[PropertiesK],
      patPropsK: Option[PatternPropertiesK], addPropsK: Option[AdditionalPropertiesK],
      ctx: Ctx, target: Column, dt: DataType, kwLoc: String,
      instLoc: Column): Seq[Compiled] = {
    if (propsK.isEmpty && patPropsK.isEmpty && addPropsK.isEmpty) return Nil
    dt match {
      case st: StructType =>
        val fieldNames = st.fieldNames.toSeq
        val props = propsK.map(_.props).getOrElse(Vector.empty)
        val pats = patPropsK.map(_.pats).getOrElse(Vector.empty)
        val propChecks = props.flatMap { case (name, sub) =>
          st.fields.find(_.name == name).map { f =>
            val child = target.getField(name)
            compileNode(sub, ctx.descend, child, f.dataType,
              s"$kwLoc/properties/${escapePtr(name)}",
              concat(instLoc, lit(s"/${escapePtr(name)}")))
          } // absent field → property not present → valid (skip)
        }
        val patChecks = pats.flatMap { case (pat, sub) =>
          val re = java.util.regex.Pattern.compile(RegexDialect.toJava(pat))
          fieldNames.filter(n => re.matcher(n).find()).map { n =>
            val fdt = st.fields.find(_.name == n).get.dataType
            compileNode(sub, ctx.descend, target.getField(n), fdt,
              s"$kwLoc/patternProperties/${escapePtr(pat)}",
              concat(instLoc, lit(s"/${escapePtr(n)}")))
          }
        }
        val addChecks = addPropsK.toSeq.flatMap { ap =>
          val covered = props.map(_._1).toSet
          val patRes = pats.map(p =>
            java.util.regex.Pattern.compile(RegexDialect.toJava(p._1)))
          val uncovered = fieldNames.filterNot(n =>
            covered(n) || patRes.exists(_.matcher(n).find()))
          uncovered.map { n =>
            val fdt = st.fields.find(_.name == n).get.dataType
            val child = target.getField(n)
            val inner = compileNode(ap.schema, ctx.descend, child, fdt,
              s"$kwLoc/additionalProperties",
              concat(instLoc, lit(s"/${escapePtr(n)}")))
            // only constrains *present* fields (table mode: null = absent;
            // conformance mode: a struct field IS present and a JSON-null
            // value must be validated by the subschema, like RequiredK);
            // message mirrors "unknown property %q" (validator.go:613-619)
            val absent = if (ctx.conformance) lit(false) else child.isNull
            Compiled(absent || inner.valid,
              when(absent || inner.valid, emptyViolations)
                .otherwise(when(lit(isFalseSchema(ap.schema)),
                  mkViolation("additionalProperties", s"$kwLoc/additionalProperties",
                    concat(instLoc, lit(s"/${escapePtr(n)}")), lit(s"unknown property \"$n\"")))
                .otherwise(inner.violations)))
          }
        }
        Seq(and(propChecks ++ patChecks ++ addChecks))

      case MapType(StringType, vt, _) =>
        val props = propsK.map(_.props).getOrElse(Vector.empty)
        val propChecks = props.map { case (name, sub) =>
          val v = element_at(target, lit(name))
          val inner = compileNode(sub, ctx.descend, v, vt,
            s"$kwLoc/properties/${escapePtr(name)}",
            concat(instLoc, lit(s"/${escapePtr(name)}")))
          // table mode: a null value = absent; conformance: presence is key
          // membership, and a present key's JSON-null value is validated
          val skip =
            if (ctx.conformance) target.isNull || !map_contains_key(target, lit(name))
            else v.isNull
          Compiled(skip || inner.valid,
            when(skip, emptyViolations).otherwise(inner.violations))
        }
        val patChecks = patPropsK.toSeq.flatMap(_.pats).map { case (pat, sub) =>
          val badKeys = filter(map_keys(target), k =>
            k.rlike(RegexDialect.toJava(pat)) &&
              !compileNode(sub, ctx.descend, element_at(target, k), vt,
              s"$kwLoc/patternProperties/${escapePtr(pat)}", instLoc).valid)
          // target.isNull guard: a null map is a non-object instance, which
          // object keywords skip (size(null) is -1, NOT 0 — without the
          // guard a null instance would fire a violation)
          simple(target.isNull || size(badKeys) === 0, "patternProperties",
            s"$kwLoc/patternProperties/${escapePtr(pat)}", instLoc,
            concat(lit("map values failing pattern schema at keys: "),
              array_join(badKeys, ",")))
        }
        val addChecks = addPropsK.toSeq.map { ap =>
          val covered = props.map(_._1)
          val pats = patPropsK.map(_.pats.map(_._1)).getOrElse(Vector.empty)
          val uncoveredKeys = filter(map_keys(target), k =>
            !k.isin(covered: _*) && !pats.foldLeft(lit(false))((acc, p) =>
              acc || k.rlike(RegexDialect.toJava(p))))
          val badKeys = filter(uncoveredKeys, k =>
            !compileNode(ap.schema, ctx.descend, element_at(target, k), vt,
              s"$kwLoc/additionalProperties", instLoc).valid)
          simple(target.isNull || size(badKeys) === 0, "additionalProperties",
            s"$kwLoc/additionalProperties", instLoc,
            concat(lit("unknown properties: "), array_join(badKeys, ",")))
        }
        Seq(and(propChecks ++ patChecks ++ addChecks))

      case _ => Seq(Compiled(lit(true), emptyViolations))
    }
  }

  private def isFalseSchema(n: SchemaNode): Boolean = n == BoolSchema(false)

  /** RFC6901 escaping for JSON-Pointer tokens (errors.go:76-100). */
  private def escapePtr(s: String): String = s.replace("~", "~0").replace("/", "~1")

  // ------------------------------------------------------------------
  private def compileKeyword(k: Keyword, ctx: Ctx, target: Column, dt: DataType,
                             kwLoc: String, instLoc: Column): Option[Compiled] = {
    val conf = ctx.conformance
    def loc(name: String) = s"$kwLoc/$name"

    /** numeric keyword: applies to numeric instances, and — reference quirk
      * (validator.go:1275-1281) — to strings that parse as floats, under
      * Go's EXACT ParseFloat acceptance (GoParseFloat): no whitespace trim,
      * no Java suffixes, overflow = unparseable, signed inf / unsigned nan
      * specials. Spark's CAST disagrees on all four. */
    def numericPred(f: Column => Column): Option[Column] = dt match {
      case _: NumericType => Some(target.isNull || f(target.cast(DoubleType)))
      case StringType =>
        val d = NumericExprs.goParseFloat(target)
        Some(target.isNull || d.isNull || f(d))
      case _ => None
    }
    /** Go float comparisons are totally silent on NaN — `NaN < x`, `NaN > x`,
      * `NaN <= x`, `NaN >= x` are all false, so every bound keyword PASSES a
      * NaN instance (validator.go:915-970 error conditions never fire).
      * Spark SQL instead ORDERS NaN above every double, which would fail
      * maximum/exclusiveMaximum — guard explicitly, but only on types that
      * can carry NaN (float/double columns, Go-parsed strings); integral
      * and decimal columns skip the check on the hot path. */
    def nanPasses(f: Column => Column): Column => Column = dt match {
      case DoubleType | FloatType | StringType => d => isnan(d) || f(d)
      case _ => f
    }
    def stringPred(f: Column => Column): Option[Column] = dt match {
      case StringType => Some(target.isNull || f(target))
      // TypeK maps these to JSON "string": string keywords apply to the same
      // canonical text form const/enum compare against (jvEq) — otherwise
      // `type:"string"` matches a date column but minLength/pattern silently
      // skip it
      case DateType | TimestampType | TimestampNTZType | BinaryType =>
        Some(target.isNull || f(target.cast(StringType)))
      case _ => None
    }
    def arrayPred(f: Column => Column): Option[Column] = dt match {
      case _: ArrayType => Some(target.isNull || f(target))
      case _ => None
    }

    k match {
      case TypeK(types) =>
        val nonNullOk: Column = dt match {
          case StringType => lit(types.contains("string"))
          case ByteType | ShortType | IntegerType | LongType =>
            lit(types.contains("integer") || types.contains("number"))
          case _: NumericType => // fractional: integer iff integral value (:801-809)
            if (types.contains("number")) lit(true)
            else if (types.contains("integer")) NumericExprs.isIntegral(target)
            else lit(false)
          case BooleanType => lit(types.contains("boolean"))
          case _: ArrayType => lit(types.contains("array"))
          case _: StructType | _: MapType => lit(types.contains("object"))
          case NullType => lit(types.contains("null"))
          case DateType | TimestampType | TimestampNTZType => lit(types.contains("string"))
          case BinaryType => lit(types.contains("string"))
          case _ => lit(false)
        }
        val pred = if (conf) when(target.isNull, lit(types.contains("null"))).otherwise(nonNullOk)
                   else target.isNull || nonNullOk
        Some(simple(pred, "type", loc("type"), instLoc,
          lit(s"instance is not of type ${types.toSeq.sorted.mkString("[", ",", "]")}")))

      case EnumK(values) =>
        val eqs = values.map(v => jvEq(target, dt, v))
        val anyEq = eqs.reduceOption(_ || _).getOrElse(lit(false))
        val pred =
          if (conf) when(target.isNull, lit(values.contains(JNull))).otherwise(anyEq)
          else target.isNull || anyEq
        Some(simple(pred, "enum", loc("enum"), instLoc, lit("value not found in enum")))

      case ConstK(v) =>
        val pred =
          if (conf) when(target.isNull, lit(v == JNull)).otherwise(jvEq(target, dt, v))
          else target.isNull || jvEq(target, dt, v)
        Some(simple(pred, "const", loc("const"), instLoc, lit("value does not equal const")))

      case MinimumK(v) => numericPred(nanPasses(_ >= lit(v))).map(p =>
        // message wording mirrors the reference's copy-paste quirk (:951)
        simple(p, "minimum", loc("minimum"), instLoc, lit(s"value is larger than minimum $v")))
      case MaximumK(v) => numericPred(nanPasses(_ <= lit(v))).map(p =>
        simple(p, "maximum", loc("maximum"), instLoc, lit(s"value is larger than maximum $v")))
      case ExclusiveMinimumK(v) => numericPred(nanPasses(_ > lit(v))).map(p =>
        simple(p, "exclusiveMinimum", loc("exclusiveMinimum"), instLoc,
          lit(s"value is not larger than exclusive minimum $v")))
      case ExclusiveMaximumK(v) => numericPred(nanPasses(_ < lit(v))).map(p =>
        simple(p, "exclusiveMaximum", loc("exclusiveMaximum"), instLoc,
          lit(s"value is not smaller than exclusive maximum $v")))
      case MultipleOfK(v) => numericPred(d => NumericExprs.isIntegral(d / lit(v))).map(p =>
        simple(p, "multipleOf", loc("multipleOf"), instLoc, lit(s"value is not a multiple of $v")))

      case MinLengthK(n) => stringPred(length(_) >= n).map(p =>
        simple(p, "minLength", loc("minLength"), instLoc, lit(s"length is less than $n")))
      case MaxLengthK(n) => stringPred(length(_) <= n).map(p =>
        simple(p, "maxLength", loc("maxLength"), instLoc, lit(s"length is greater than $n")))
      case PatternK(pat) =>
        // compile-time regex validity check (reference compiles per call,
        // validator.go:1008 — ours compiles once, after translating RE2-only
        // syntax Java lacks: (?P<name>, POSIX [[:class:]])
        val javaPat = RegexDialect.toJava(pat)
        java.util.regex.Pattern.compile(javaPat)
        stringPred(_.rlike(javaPat)).map(p =>
          simple(p, "pattern", loc("pattern"), instLoc, lit(s"value does not match pattern")))
      case FormatK(f) if ctx.opts.validateFormat =>
        graft.compile.Formats.predicate(f).flatMap(fp => stringPred(fp).map(p =>
          simple(p, "format", loc("format"), instLoc, lit(s"value is not a valid $f"))))

      case MinItemsK(n) => arrayPred(size(_) >= n.toInt).map(p =>
        simple(p, "minItems", loc("minItems"), instLoc, lit(s"array has fewer than $n items")))
      case MaxItemsK(n) => arrayPred(size(_) <= n.toInt).map(p =>
        simple(p, "maxItems", loc("maxItems"), instLoc, lit(s"array has more than $n items")))
      case UniqueItemsK(true) =>
        // Float equality must match the reference's Go-map semantics
        // (validator.go:1087-1096, map[any]bool over comparable elements):
        //  - -0.0 == 0.0 (duplicates) — array_distinct distinguishes them,
        //    so adding +0.0 normalizes the sign (IEEE: -0.0 + 0.0 = +0.0);
        //  - NaN != NaN (a NaN map key never collides, even with itself) —
        //    array_distinct COLLAPSES NaNs, so they are dropped from the
        //    duplicate check entirely (they cannot form duplicates). Nulls
        //    stay in (they dedupe like any value, unchanged behavior).
        val dedupInput: Column => Column = dt match {
          case ArrayType(FloatType | DoubleType, _) =>
            a => transform(filter(a, x => coalesce(!isnan(x), lit(true))),
              x => x + lit(0.0d))
          case _ => identity
        }
        arrayPred { a =>
          val ci = dedupInput(a)
          size(ci) === size(array_distinct(ci))
        }.map(p =>
          simple(p, "uniqueItems", loc("uniqueItems"), instLoc, lit("array items are not unique")))
      case UniqueItemsK(false) => None

      case RequiredK(names) => dt match {
        case st: StructType =>
          val checks = names.map { n =>
            val present: Column =
              if (!st.fieldNames.contains(n)) lit(false)
              else if (conf) lit(true) // field in inferred schema ⇒ present
              else target.getField(n).isNotNull
            simple(target.isNull || present, "required", loc("required"), instLoc,
              lit(s"missing required property \"$n\""))
          }
          Some(and(checks))
        case MapType(StringType, _, _) =>
          val checks = names.map(n => simple(target.isNull || map_contains_key(target, lit(n)),
            "required", loc("required"), instLoc, lit(s"missing required property \"$n\"")))
          Some(and(checks))
        case _ => None
      }

      case DependentRequiredK(deps) => dt match {
        case st: StructType =>
          val checks = deps.flatMap { case (key, names) =>
            if (!st.fieldNames.contains(key)) None
            else {
              val keyPresent = if (conf) lit(true) else target.getField(key).isNotNull
              val allThere = names.map { n =>
                if (!st.fieldNames.contains(n)) lit(false)
                else if (conf) lit(true) else target.getField(n).isNotNull
              }.reduceOption(_ && _).getOrElse(lit(true))
              Some(simple(target.isNull || !keyPresent || allThere, "dependentRequired",
                loc("dependentRequired"), instLoc,
                lit(s"properties required when \"$key\" is present: ${names.mkString(",")}")))
            }
          }
          Some(and(checks))
        case MapType(StringType, _, _) =>
          val checks = deps.map { case (key, names) =>
            val keyPresent = map_contains_key(target, lit(key))
            val allThere = names.map(n => map_contains_key(target, lit(n)))
              .reduceOption(_ && _).getOrElse(lit(true))
            simple(target.isNull || !keyPresent || allThere, "dependentRequired",
              loc("dependentRequired"), instLoc,
              lit(s"properties required when \"$key\" is present: ${names.mkString(",")}"))
          }
          Some(and(checks))
        case _ => None
      }

      case DependentSchemasK(deps) => dt match {
        case st: StructType =>
          val checks = deps.flatMap { case (key, sub) =>
            if (!st.fieldNames.contains(key)) None
            else {
              val keyPresent = if (conf) lit(true) else target.getField(key).isNotNull
              val inner = compileNode(sub, ctx, target, dt,
                s"$kwLoc/dependentSchemas/${escapePtr(key)}", instLoc)
              Some(Compiled(target.isNull || !keyPresent || inner.valid,
                when(target.isNull || !keyPresent, emptyViolations).otherwise(inner.violations)))
            }
          }
          Some(and(checks))
        case MapType(StringType, _, _) =>
          // dynamic-key path: key presence is a runtime map_contains_key, the
          // dependent schema applies to the whole map instance
          val checks = deps.map { case (key, sub) =>
            val keyPresent = map_contains_key(target, lit(key))
            val inner = compileNode(sub, ctx, target, dt,
              s"$kwLoc/dependentSchemas/${escapePtr(key)}", instLoc)
            Compiled(target.isNull || !keyPresent || inner.valid,
              when(target.isNull || !keyPresent, emptyViolations).otherwise(inner.violations))
          }
          Some(and(checks))
        case _ => None
      }

      case PropertyNamesK(sub) => dt match {
        case st: StructType =>
          // static: check each field name (a string literal) — constant folds.
          // Table mode additionally gates on per-row PRESENCE: a badly-named
          // OPTIONAL field only fails rows where it is non-null (present) —
          // the keyword constrains the names of properties the row HAS, not
          // the schema-declared superset.
          val bad = st.fieldNames.filterNot { n =>
            // driver-side evaluation of the name predicate via a tiny local
            // check: compile against lit(name) then constant-fold by hand for
            // the common cases; fall back to accepting (names are static)
            staticNameOk(sub, n, ctx)
          }
          val badPresent: Column =
            if (conf) lit(bad.nonEmpty) // conformance: struct field ⇒ present
            else bad.map(n => target.getField(n).isNotNull)
              .reduceOption(_ || _).getOrElse(lit(false))
          Some(simple(target.isNull || !badPresent, "propertyNames",
            loc("propertyNames"), instLoc,
            lit(s"property names not allowed: ${bad.mkString(",")}")))
        case MapType(StringType, _, _) =>
          val p = forall(map_keys(target), k =>
            compileNode(sub, ctx.descend, k, StringType, loc("propertyNames"), instLoc).valid)
          Some(simple(target.isNull || p, "propertyNames", loc("propertyNames"), instLoc,
            lit("a property name does not match propertyNames schema")))
        case _ => None
      }

      case MinPropertiesK(n) => dt match {
        case st: StructType =>
          val cnt: Column = if (conf) lit(st.fields.length)
            else st.fieldNames.map(f => target.getField(f).isNotNull.cast(IntegerType))
              .reduceOption(_ + _).getOrElse(lit(0))
          Some(simple(target.isNull || cnt >= n.toInt, "minProperties", loc("minProperties"),
            instLoc, lit(s"object has fewer than $n properties")))
        case MapType(StringType, _, _) =>
          Some(simple(target.isNull || size(map_keys(target)) >= n.toInt, "minProperties",
            loc("minProperties"), instLoc, lit(s"object has fewer than $n properties")))
        case _ => None
      }
      case MaxPropertiesK(n) => dt match {
        case st: StructType =>
          val cnt: Column = if (conf) lit(st.fields.length)
            else st.fieldNames.map(f => target.getField(f).isNotNull.cast(IntegerType))
              .reduceOption(_ + _).getOrElse(lit(0))
          Some(simple(target.isNull || cnt <= n.toInt, "maxProperties", loc("maxProperties"),
            instLoc, lit(s"object has more than $n properties")))
        case MapType(StringType, _, _) =>
          Some(simple(target.isNull || size(map_keys(target)) <= n.toInt, "maxProperties",
            loc("maxProperties"), instLoc, lit(s"object has more than $n properties")))
        case _ => None
      }

      case AllOfK(ss) =>
        val branches = ss.zipWithIndex.map { case (sub, i) =>
          compileNode(sub, ctx, target, dt, s"$kwLoc/allOf/$i", instLoc) }
        Some(and(branches))

      case AnyOfK(ss) =>
        val branches = ss.zipWithIndex.map { case (sub, i) =>
          compileNode(sub, ctx, target, dt, s"$kwLoc/anyOf/$i", instLoc) }
        val valid = branches.map(_.valid).reduce(_ || _)
        Some(Compiled(valid, when(valid, emptyViolations).otherwise(
          mkViolation("anyOf", loc("anyOf"), instLoc, lit("instance matches no anyOf schema")))))

      case OneOfK(ss) =>
        val branches = ss.zipWithIndex.map { case (sub, i) =>
          compileNode(sub, ctx, target, dt, s"$kwLoc/oneOf/$i", instLoc) }
        val matches = branches.map(_.valid.cast(IntegerType)).reduce(_ + _)
        val valid = matches === 1
        Some(Compiled(valid, when(valid, emptyViolations).otherwise(
          mkViolation("oneOf", loc("oneOf"), instLoc,
            when(matches === 0, lit("instance matches no oneOf schema"))
              .otherwise(lit("instance matches more than one oneOf schema"))))))

      case NotK(sub) =>
        val inner = compileNode(sub, ctx, target, dt, loc("not"), instLoc)
        Some(Compiled(!inner.valid, when(!inner.valid, emptyViolations).otherwise(
          mkViolation("not", loc("not"), instLoc, lit("instance matches \"not\" schema")))))

      case RefK(ref) =>
        // lazy compile-time inlining. A cycle with no intervening data
        // descent is unrolled MaxNoDescentUnroll times, then closed with the
        // least-fixpoint bottom (see its doc): recursion THROUGH data is
        // unbounded-depth-safe because the finite DataType terminates it
        // (descend clears the stack), and same-node recursion gets the
        // Kleene-iteration answer the reference reaches by short-circuiting
        // at validation time (validate.go's applicator evaluation).
        Some(compileRefLike("$ref", ref, ctx, target, dt, kwLoc, instLoc,
          c => c.doc.resolveRefFull(ref)))

      case DynamicRefK(ref) =>
        // dynamic-scope resolution (validate.go:84-182): resolve like $ref
        // first; if the target is a $dynamicAnchor of the same name
        // (bookending), re-resolve against the OUTERMOST resource in the
        // compile-time entry stack defining that anchor. The compile-time
        // inlining path equals the runtime validation path, so ctx.dynScope
        // is exact. Cycles without data descent get the same bounded
        // unrolling + least-fixpoint bottom as $ref.
        Some(compileRefLike("$dynamicRef", ref, ctx, target, dt, kwLoc, instLoc,
          { c =>
            val fragIdx = ref.indexOf('#')
            val frag = if (fragIdx < 0) "" else ref.substring(fragIdx + 1)
            val (raw0, base0, owner0) = c.doc.resolveRefFull(ref)
            val bookended = frag.nonEmpty && !frag.startsWith("/") && (raw0 match {
              case o: JObject => (o \ "$dynamicAnchor") == JString(frag)
              case _ => false
            })
            if (bookended)
              c.dynScope.collectFirst {
                case (d, b) if d.scopedDynAnchors.contains((b, frag)) =>
                  (d.scopedDynAnchors((b, frag)), b, d)
              }.getOrElse((raw0, base0, owner0))
            else (raw0, base0, owner0)
          }))

      case AnnotationK(name, v) =>
        // unknown keywords: custom-registered compilers apply
        // (ConstraintRegistry); otherwise retained always-valid (schema.go:521-532)
        ConstraintRegistry.get(name).flatMap { kc =>
          kc(v, target, dt).map { case (pred, msg) =>
            simple(target.isNull || pred, name, loc(name), instLoc, lit(msg))
          }
        }

      case _: DefaultK | _: FormatK => None
      case other =>
        throw new IllegalStateException(s"unhandled keyword ${other.name}")
    }
  }

  /** Shared `$ref` / `$dynamicRef` compile path: cycle detection over
    * `refStack`, the bounded no-descent unroll budget, the least-fixpoint
    * bottom (invalid + depth-guard violation), and the compile of the
    * resolved target under its owning document's dialect. `resolveTarget`
    * supplies the (raw subtree, base URI, owning doc) — plain resolution
    * for `$ref`, bookended dynamic-scope resolution for `$dynamicRef`. */
  private def compileRefLike(keyword: String, ref: String, ctx: Ctx,
      target: Column, dt: DataType, kwLoc: String, instLoc: Column,
      resolveTarget: Ctx => (JValue, String, SchemaDoc)): Compiled = {
    def loc(k: String) = s"$kwLoc/$k" // same composition as compileObj's loc
    val cycling = ctx.refStack.contains(ref)
    val spent = ctx.unroll.getOrElse(ref, 0)
    if (cycling && spent >= MaxNoDescentUnroll)
      simple(lit(false), keyword, loc(keyword), instLoc,
        lit(s"recursive $keyword exceeded the no-progress depth guard"))
    else {
      val ctx0 = if (cycling) ctx.copy(unroll = ctx.unroll + (ref -> (spent + 1))) else ctx
      val (rawT, baseT, ownerT) = resolveTarget(ctx0)
      // parse the target under its OWNING document's dialect
      val sub = SchemaParser.parseNode(rawT, baseT, ownerT.dialect)
      compileNode(sub, ctx0.copy(refStack = ctx0.refStack + ref,
          dynScope = pushScope(ctx0.dynScope, ownerT, baseT)),
        target, dt, loc(keyword), instLoc)
    }
  }

  /** Evaluate a propertyNames subschema against a static field name on the
    * driver. Supports the scalar-string keyword subset (enough for real
    * schemas: pattern / length / enum / const / format / type). */
  private def staticNameOk(sub: SchemaNode, name: String, ctx: Ctx): Boolean = sub match {
    case BoolSchema(b) => b
    case ObjSchema(kws) => kws.forall {
      case TypeK(ts) => ts.contains("string")
      case PatternK(p) =>
        RegexDialect.check(p, "propertyNames/pattern", ctx.opts.regexPolicy)
        java.util.regex.Pattern.compile(RegexDialect.toJava(p)).matcher(name).find()
      case MinLengthK(n) => name.codePointCount(0, name.length) >= n
      case MaxLengthK(n) => name.codePointCount(0, name.length) <= n
      case EnumK(vs) => vs.contains(JString(name))
      case ConstK(v) => v == JString(name)
      case _ => true
    }
  }

  /** Deep equality of a typed column against a JSON literal — the analogue of
    * `reflect.DeepEqual` for enum/const (validator.go:879,892), resolved
    * against the static DataType. Numbers compare as float64, matching the
    * reference's decode (all JSON numbers → float64). */
  private def jvEq(target: Column, dt: DataType, v: JValue): Column = (v, dt) match {
    case (JNull, _) => target.isNull
    case (JBool(b), BooleanType) => target <=> lit(b)
    case (JString(s), StringType) => target <=> lit(s)
    // TypeK maps these column types to JSON "string" (their canonical text
    // form); const/enum must agree or string constants become unsatisfiable
    // on date/timestamp/binary columns. Canonical text = Spark's CAST
    // rendering (dates ISO yyyy-MM-dd; timestamps space-separated).
    case (JString(s), DateType | TimestampType | TimestampNTZType | BinaryType) =>
      target.cast(StringType) <=> lit(s)
    case (JInt(_) | JLong(_) | JDouble(_) | JDecimal(_), _: NumericType) =>
      target.cast(DoubleType) <=> lit(jvNum(v))
    case (JArray(items), ArrayType(et, _)) =>
      val sameLen = size(target) === items.length
      val elemsEq = items.zipWithIndex.map { case (it, i) =>
        jvEq(element_at(target, i + 1), et, it) }
        .reduceOption(_ && _).getOrElse(lit(true))
      target.isNotNull && sameLen && elemsEq
    case (o: JObject, st: StructType) =>
      val objKeys = o.obj.map(_._1).toSet
      if (!objKeys.subsetOf(st.fieldNames.toSet)) lit(false)
      else {
        val fieldsEq = st.fields.map { f =>
          o.obj.find(_._1 == f.name) match {
            case Some((_, fv)) => jvEq(target.getField(f.name), f.dataType, fv)
            case None => target.getField(f.name).isNull
          }
        }.reduceOption(_ && _).getOrElse(lit(true))
        target.isNotNull && fieldsEq
      }
    case (o: JObject, MapType(StringType, vt, _)) =>
      // runtime-keyed objects: exactly the literal's keys, each deep-equal
      // (map_contains_key distinguishes a JSON-null member from a missing key)
      val sameSize = size(map_keys(target)) === o.obj.length
      val fieldsEq = o.obj.map { case (k, fv) =>
        map_contains_key(target, lit(k)) && jvEq(element_at(target, lit(k)), vt, fv)
      }.reduceOption(_ && _).getOrElse(lit(true))
      target.isNotNull && sameSize && fieldsEq
    case _ => lit(false) // cross-type: never deep-equal
  }

  private def jvNum(v: JValue): Double = v match {
    case JInt(i) => i.toDouble
    case JLong(l) => l.toDouble
    case JDouble(d) => d
    case JDecimal(d) => d.toDouble
    case _ => Double.NaN
  }
}
