package graft.row

import graft.compile.{Compiled, CompileOpts, ConstraintCompiler}
import graft.model.{SchemaDoc, SchemaParser}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Row-scope validation: compiles a schema once on the driver, then evaluates
  * it as ONE wide projection per row — the Spark analogue of the reference's
  * `Schema.Validate` recursion (`pkg/types/schema/schema.go:711-819`), with the
  * recursion unrolled at compile time into a whole-stage-codegen'd Column DAG.
  *
  * Never fail-fast: all violations per row are accumulated (mirrors
  * `AddError`, pkg/errors/errors.go:65-135) into an `array<struct>` column and
  * exploded into a violations Dataset.
  */
object RowValidator {
  /** Column reference by literal name — backtick-quoted so names containing
    * dots (common in JSON-derived frames) resolve as top-level columns, not
    * nested-field paths. */
  private def qcol(name: String): Column =
    org.apache.spark.sql.functions.col("`" + name.replace("`", "``") + "`")


  private def emptyViolationsLit: Column = ConstraintCompiler.emptyViolations

  /** Validate every row; returns the input plus `_valid: boolean` and
    * `_violations: array<struct<keyword,keywordLocation,instanceLocation,message>>`. */
  def withValidation(df: DataFrame, doc: SchemaDoc,
                     opts: CompileOpts = CompileOpts()): DataFrame = {
    val target = struct(df.columns.toIndexedSeq.map(qcol): _*)
    val compiled: Compiled =
      ConstraintCompiler.compile(doc, target, df.schema, opts)
    df.withColumn("_violations", compiled.violations)
      .withColumn("_valid", compiled.valid)
  }

  /** Violations Dataset: one row per (input row, failed constraint), carrying
    * the row id and the executor partition for lineage (FIXTURES.md §4).
    *
    * Two-phase shape, deliberately: the FILTER evaluates only the validity
    * predicate — a lambda-free Column tree that stays inside whole-stage
    * codegen — and the violation-record construction (which contains
    * higher-order functions, i.e. CodegenFallback expressions that would
    * knock the whole operator into interpreted eval) runs in a separate
    * projection that only ever sees the ~violation-rate fraction of rows. */
  def violations(df: DataFrame, doc: SchemaDoc, idCol: String,
                 opts: CompileOpts = CompileOpts(),
                 extraCols: Seq[String] = Nil): DataFrame = {
    val target = struct(df.columns.toIndexedSeq.map(qcol): _*)
    val compiled = ConstraintCompiler.compile(doc, target, df.schema, opts)
    val keep = (extraCols :+ idCol).distinct.map(qcol)
    // The nondeterministic-but-constant guard is load-bearing: without it,
    // InferFiltersFromGenerate derives `size(_violations) > 0` from the
    // explode below, and PushDownPredicates substitutes the ENTIRE violations
    // tree into the pre-filter — which then evaluates the HOF-laden
    // expression on every input row, interpreted (CodegenFallback), instead
    // of only on the failing fraction. Nondeterminism pins the violation
    // construction in its own projection above the codegen'd validity filter.
    val guarded = when(spark_partition_id() >= 0, compiled.violations)
      .otherwise(emptyViolationsLit)
    df.withColumn("_pid", spark_partition_id())
      .filter(!compiled.valid)                       // codegen'd hot path
      .select(keep :+ guarded.as("_violations") :+
        col("_pid").as("partition_id"): _*)          // interpreted, rare rows
      .select(keep :+ explode(col("_violations")).as("v") :+ col("partition_id"): _*)
      .select(keep ++ Seq(col("v.keyword").as("keyword"),
        col("v.keywordLocation").as("keywordLocation"),
        col("v.instanceLocation").as("instanceLocation"),
        col("v.message").as("message"), col("partition_id")): _*)
  }

  /** Validity predicate alone — the codegen'd hot-path filter of the
    * two-phase shape, for fused scans ([[graft.run.ValidationPipeline]]) that
    * defer violation construction to [[violationsFromPayload]]. */
  def validity(df: DataFrame, doc: SchemaDoc,
               opts: CompileOpts = CompileOpts()): Column = {
    val target = struct(df.columns.toIndexedSeq.map(qcol): _*)
    ConstraintCompiler.compile(doc, target, df.schema, opts).valid
  }

  /** Phase 2 of the fused-scan shape: construct violation records from a
    * digest whose `payloadCol` carries the FULL original row for invalid rows
    * only (null otherwise) and whose `pidCol` carries the scan-time partition
    * id. Same two-phase discipline as [[violations]] — the HOF-laden record
    * construction only ever sees the failing fraction, here pre-filtered by
    * `payloadCol IS NOT NULL` — but the wide source table is not re-scanned:
    * the caller's digest (typically persisted) is the only input. */
  def violationsFromPayload(digest: DataFrame, doc: SchemaDoc,
                            payloadCol: String, pidCol: String, idCol: String,
                            opts: CompileOpts = CompileOpts(),
                            extraCols: Seq[String] = Nil): DataFrame = {
    val rowSchema = digest.schema(payloadCol).dataType
    val compiled = ConstraintCompiler.compile(doc, col(payloadCol), rowSchema, opts)
    val keep = (extraCols :+ idCol).distinct.map(qcol)
    // same nondeterminism guard as violations(): pins the CodegenFallback
    // construction in its own projection above the isNotNull filter
    val guarded = when(spark_partition_id() >= 0, compiled.violations)
      .otherwise(emptyViolationsLit)
    digest.filter(col(payloadCol).isNotNull)
      .select(keep :+ guarded.as("_violations") :+ col(pidCol).as("partition_id"): _*)
      .select(keep :+ explode(col("_violations")).as("v") :+ col("partition_id"): _*)
      .select(keep ++ Seq(col("v.keyword").as("keyword"),
        col("v.keywordLocation").as("keywordLocation"),
        col("v.instanceLocation").as("instanceLocation"),
        col("v.message").as("message"), col("partition_id")): _*)
  }

  /** Violation TRIAGE sample: up to `k` distinct offending rows per keyword,
    * chosen deterministically (md5-rank — stable across engines, reruns, and
    * repartitioning, so two people debugging the same snapshot look at the
    * same rows). At 10^12 rows the full violation set is itself huge; this
    * is the bounded artifact a dashboard or ticket attaches. One shuffle on
    * the keyword key over the violation-rate-sized distinct pairs. */
  def sampleViolations(df: DataFrame, doc: SchemaDoc, idCol: String,
                       k: Int = 10): DataFrame =
    graft.table.Sampling.exactKPerStratum(
      violations(df, doc, idCol).select(idCol, "keyword").distinct(),
      "keyword", idCol, k)

  /** Convenience: is a single-column DataFrame of instances fully valid?
    * Used by the conformance-suite runner (value column = the instance). */
  def validColumn(df: DataFrame, schemaJson: String, valueCol: String = "value",
                  opts: CompileOpts = CompileOpts(nullIsAbsent = false)): Column = {
    val doc = SchemaParser.parse(schemaJson)
    val field = df.schema.find(_.name == valueCol)
      .getOrElse(throw new IllegalArgumentException(s"no column $valueCol"))
    ConstraintCompiler.compile(doc, col(valueCol), field.dataType, opts).valid
  }

  /** Draft 2020-12 "basic" output format, per row: the JSON document the
    * reference's error list serializes to (`pkg/errors/errors.go:15-22`
    * ValidationError fields, list-of-output-units shape from the spec's
    * §12.4.2 Basic structure) — `{"valid": bool, "errors": [{
    * "keywordLocation", "instanceLocation", "error"}, ...]}` with `errors`
    * omitted when valid. Adds `_basic_output: string` next to `_valid`; one
    * projection, the violations tree is shared with [[withValidation]]. */
  def withBasicOutput(df: DataFrame, doc: SchemaDoc,
                      opts: CompileOpts = CompileOpts()): DataFrame = {
    val v = withValidation(df, doc, opts)
    val units = transform(col("_violations"), x =>
      struct(x.getField("keywordLocation").as("keywordLocation"),
        x.getField("instanceLocation").as("instanceLocation"),
        x.getField("message").as("error")))
    v.withColumn("_basic_output",
      when(col("_valid"), to_json(struct(col("_valid").as("valid"))))
        .otherwise(to_json(struct(col("_valid").as("valid"), units.as("errors")))))
  }

  /** Companion to [[validColumn]]: the violation-record array for a
    * single-column DataFrame of instances (keyword, keywordLocation,
    * instanceLocation, message per entry). */
  def violationsColumn(df: DataFrame, schemaJson: String, valueCol: String = "value",
                       opts: CompileOpts = CompileOpts(nullIsAbsent = false)): Column = {
    val doc = SchemaParser.parse(schemaJson)
    val field = df.schema.find(_.name == valueCol)
      .getOrElse(throw new IllegalArgumentException(s"no column $valueCol"))
    ConstraintCompiler.compile(doc, col(valueCol), field.dataType, opts).violations
  }

  /** Apply `default` values before validation (mirrors the reference's
    * ApplyDefaults option): defaults apply at EVERY depth the validation
    * recursion reaches, not just top-level properties —
    *  - a property whose schema carries a default and is NOT in the enclosing
    *    schema's `required` (validator.go:468) gets `coalesce(value, default)`
    *    (absent-key map semantics, validator.go:479-495);
    *  - defaults nested inside object-valued properties are applied by
    *    rebuilding the struct, recursing the way ValidateProperties descends
    *    (validator.go:451-517); a NULL object is left null — the reference
    *    only sets fields of instances it actually descends into;
    *  - arrays: a prefixItems element schema carrying a default replaces a
    *    ZERO element (Go reflect.IsZero — null / 0 / "" / false,
    *    validator.go:281-297) at that position, and an `items` schema with
    *    nested defaults is applied to every element past the prefix.
    * Limitation: defaults behind an unresolved `$ref` property are not
    * applied (the compiler inlines refs lazily; this pre-validation rewrite
    * sees the raw node). */
  def applyDefaults(df: DataFrame, doc: SchemaDoc): DataFrame = {
    import graft.model._
    doc.root match {
      case ObjSchema(kws) =>
        val required: Set[String] =
          kws.collectFirst { case RequiredK(ns) => ns.toSet }.getOrElse(Set.empty)
        val props = kws.collectFirst { case PropertiesK(ps) => ps }.getOrElse(Vector.empty)
        props.foldLeft(df) { case (acc, (name, sub)) =>
          if (!acc.columns.contains(name)) acc
          else {
            val dt = acc.schema(name).dataType
            if (!hasDefaultsDeep(sub, dt, required(name))) acc
            else acc.withColumn(name, defaultedCol(sub, qcol(name), dt, required(name)))
          }
        }
      case _ => df
    }
  }

  /** Does any default apply under `sub` for a value of type `dt`? Pure
    * (schema, type) decision — used to avoid rebuilding untouched columns. */
  private def hasDefaultsDeep(sub: graft.model.SchemaNode,
                              dt: org.apache.spark.sql.types.DataType,
                              requiredAtParent: Boolean): Boolean = {
    import graft.model._
    import org.apache.spark.sql.types._
    sub match {
      case ObjSchema(kws) =>
        val own = !requiredAtParent &&
          kws.collectFirst { case DefaultK(v) => v }.flatMap(jvLit).isDefined
        val nested = dt match {
          case st: StructType =>
            val req = kws.collectFirst { case RequiredK(ns) => ns.toSet }
              .getOrElse(Set.empty[String])
            val props = kws.collectFirst { case PropertiesK(ps) => ps }
              .getOrElse(Vector.empty).toMap
            st.fields.exists(f => props.get(f.name)
              .exists(ps => hasDefaultsDeep(ps, f.dataType, req(f.name))))
          case at: ArrayType =>
            val prefix = kws.collectFirst { case PrefixItemsK(ss) => ss }
              .exists(_.exists {
                case ObjSchema(ks) =>
                  ks.collectFirst { case DefaultK(v) => v }.flatMap(jvLit).isDefined
                case _ => false
              })
            val items = kws.collectFirst { case ItemsK(s) => s }
              .exists(s => hasDefaultsDeep(s, at.elementType, requiredAtParent = false))
            prefix || items
          case _ => false
        }
        own || nested
      case _ => false
    }
  }

  /** The defaulted form of `c` under schema `sub` (callers gate on
    * hasDefaultsDeep). */
  private def defaultedCol(sub: graft.model.SchemaNode, c: Column,
                           dt: org.apache.spark.sql.types.DataType,
                           requiredAtParent: Boolean): Column = {
    import graft.model._
    import org.apache.spark.sql.types._
    sub match {
      case ObjSchema(kws) =>
        val base =
          if (requiredAtParent) c
          else kws.collectFirst { case DefaultK(v) => v }.flatMap(jvLit)
            .map(l => coalesce(c, l.cast(dt))).getOrElse(c)
        dt match {
          case st: StructType =>
            val req = kws.collectFirst { case RequiredK(ns) => ns.toSet }
              .getOrElse(Set.empty[String])
            val props = kws.collectFirst { case PropertiesK(ps) => ps }
              .getOrElse(Vector.empty).toMap
            val touched = st.fields.exists(f => props.get(f.name)
              .exists(ps => hasDefaultsDeep(ps, f.dataType, req(f.name))))
            if (!touched) base
            else {
              val fields = st.fields.toIndexedSeq.map { f =>
                val raw = base.getField(f.name)
                val withD = props.get(f.name) match {
                  case Some(ps) if hasDefaultsDeep(ps, f.dataType, req(f.name)) =>
                    defaultedCol(ps, raw, f.dataType, req(f.name))
                  case _ => raw
                }
                withD.as(f.name)
              }
              when(base.isNotNull, struct(fields: _*)).otherwise(lit(null).cast(st))
            }
          case at: ArrayType =>
            val prefixSchemas = kws.collectFirst { case PrefixItemsK(ss) => ss }
              .getOrElse(Vector.empty)
            val prefixDefs = prefixSchemas.zipWithIndex.flatMap {
              case (ObjSchema(ks), idx) =>
                ks.collectFirst { case DefaultK(v) => v }.flatMap(jvLit).map(idx -> _)
              case _ => None
            }
            val itemsSchema = kws.collectFirst { case ItemsK(s) => s }
              .filter(s => hasDefaultsDeep(s, at.elementType, requiredAtParent = false))
            if (prefixDefs.isEmpty && itemsSchema.isEmpty) base
            else {
              val isZero = (x: Column) => at.elementType match {
                case _: NumericType => x.isNull || x === lit(0)
                case StringType     => x.isNull || x === lit("")
                case BooleanType    => x.isNull || !x
                case _              => x.isNull
              }
              transform(base, (x, i) => {
                val afterPrefix = prefixDefs.foldLeft(x) { case (cur, (idx, d)) =>
                  when(i === lit(idx) && isZero(x), d.cast(at.elementType)).otherwise(cur)
                }
                itemsSchema match {
                  case Some(s) =>
                    when(i >= lit(prefixSchemas.length),
                      defaultedCol(s, afterPrefix, at.elementType, requiredAtParent = false))
                      .otherwise(afterPrefix)
                  case None => afterPrefix
                }
              })
            }
          case _ => base
        }
      case _ => c
    }
  }

  private def jvLit(v: org.json4s.JValue): Option[Column] = {
    import org.json4s._
    v match {
      case JString(s) => Some(lit(s))
      case JInt(i) => Some(lit(i.toLong))
      case JLong(l) => Some(lit(l))
      case JDouble(d) => Some(lit(d))
      case JDecimal(d) => Some(lit(d.toDouble))
      case JBool(b) => Some(lit(b))
      case JArray(items) =>
        val lits = items.map(jvLit)
        if (lits.forall(_.isDefined)) Some(array(lits.flatten: _*)) else None
      case _ => None
    }
  }
}
