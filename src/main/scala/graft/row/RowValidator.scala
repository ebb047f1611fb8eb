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

  /** Validate every row; returns the input plus `_valid: boolean` and
    * `_violations: array<struct<keyword,keywordLocation,instanceLocation,message>>`. */
  def withValidation(df: DataFrame, doc: SchemaDoc,
                     opts: CompileOpts = CompileOpts()): DataFrame = {
    val target = struct(df.columns.map(col): _*)
    val compiled: Compiled =
      ConstraintCompiler.compile(doc, target, df.schema, opts)
    df.withColumn("_violations", compiled.violations)
      .withColumn("_valid", compiled.valid)
  }

  /** Violations Dataset: one row per (input row, failed constraint), carrying
    * the row id and the executor partition for lineage (FIXTURES.md §4). */
  def violations(df: DataFrame, doc: SchemaDoc, idCol: String,
                 opts: CompileOpts = CompileOpts()): DataFrame =
    withValidation(df, doc, opts)
      .select(col(idCol), col("_violations"), spark_partition_id().as("partition_id"))
      .filter(size(col("_violations")) > 0)
      .select(col(idCol), explode(col("_violations")).as("v"), col("partition_id"))
      .select(col(idCol), col("v.keyword").as("keyword"),
        col("v.keywordLocation").as("keywordLocation"),
        col("v.instanceLocation").as("instanceLocation"),
        col("v.message").as("message"), col("partition_id"))

  /** Convenience: is a single-column DataFrame of instances fully valid?
    * Used by the conformance-suite runner (value column = the instance). */
  def validColumn(df: DataFrame, schemaJson: String, valueCol: String = "value",
                  opts: CompileOpts = CompileOpts(nullIsAbsent = false)): Column = {
    val doc = SchemaParser.parse(schemaJson)
    val field = df.schema.find(_.name == valueCol)
      .getOrElse(throw new IllegalArgumentException(s"no column $valueCol"))
    ConstraintCompiler.compile(doc, col(valueCol), field.dataType, opts).valid
  }

  /** Apply `default` values before validation — `coalesce(col, default)` per
    * top-level property carrying a default (mirrors ApplyDefaults,
    * validator.go:468-517; skipped for required fields like :468). */
  def applyDefaults(df: DataFrame, doc: SchemaDoc): DataFrame = {
    import graft.model._
    doc.root match {
      case ObjSchema(kws) =>
        val required: Set[String] =
          kws.collectFirst { case RequiredK(ns) => ns.toSet }.getOrElse(Set.empty)
        val props = kws.collectFirst { case PropertiesK(ps) => ps }.getOrElse(Vector.empty)
        props.foldLeft(df) { case (acc, (name, sub)) =>
          sub match {
            case ObjSchema(inner) if !required(name) && acc.columns.contains(name) =>
              inner.collectFirst { case DefaultK(v) => v } match {
                case Some(jv) =>
                  val fieldType = acc.schema(name).dataType
                  jvLit(jv).map(l => acc.withColumn(name, coalesce(col(name), l.cast(fieldType))))
                    .getOrElse(acc)
                case None => acc
              }
            case _ => acc
          }
        }
      case _ => df
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
