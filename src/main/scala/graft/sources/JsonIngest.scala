package graft.sources

import graft.model._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Untyped-JSON ingestion: the analogue of the reference's
  * `json.Unmarshal`-then-validate front door (`pkg/jsonschema/jsonschema.go:17-24`).
  * A JSON string column is parsed with `from_json` into the StructType DERIVED
  * from the constraint schema itself, then validated by the same compiled
  * plan as any typed table — schema inference here is the inverse of
  * `graft.model.Infer` (type → schema).
  *
  * Malformed documents surface as a `_malformed` flag (from_json yields null)
  * rather than failing the job — accumulate-don't-abort, like everything else.
  */
object JsonIngest {

  /** Derive the Spark type a schema validates — the read-side contract.
    * `type` drives the mapping; `integer` → LongType, `number` → DoubleType
    * (JSON numbers are float64 in the reference, validator.go:43-52, but an
    * integer-constrained column reads as long and the numeric keywords cast
    * as needed). Objects become structs with `required` fields non-nullable. */
  def structTypeFor(node: SchemaNode): DataType = node match {
    case BoolSchema(_) => StringType // unconstrained: read raw
    case ObjSchema(kws) =>
      val types = kws.collectFirst { case TypeK(ts) => ts }.getOrElse(Set.empty)
      if (types.contains("object") || kws.exists(_.isInstanceOf[PropertiesK])) {
        val props = kws.collectFirst { case PropertiesK(ps) => ps }.getOrElse(Vector.empty)
        val required = kws.collectFirst { case RequiredK(ns) => ns.toSet }.getOrElse(Set.empty)
        if (props.isEmpty) {
          // property-less object: the map VALUE type comes from the
          // additionalProperties / patternProperties value schema — reading
          // values as raw strings would stringify numbers and make the
          // compiled `type` keyword reject valid instances.
          val valueSchemas =
            kws.collectFirst { case AdditionalPropertiesK(s) => s }.toSeq ++
            kws.collectFirst { case PatternPropertiesK(ps) => ps.map(_._2) }
              .getOrElse(Vector.empty)
          valueSchemas.map(structTypeFor).distinct match {
            case Seq(single) => MapType(StringType, single)
            case _ => MapType(StringType, StringType) // mixed/unconstrained
          }
        }
        else StructType(props.map { case (name, sub) =>
          StructField(name, structTypeFor(sub), nullable = !required(name))
        })
      } else if (types.contains("array") || kws.exists(_.isInstanceOf[ItemsK])) {
        val items = kws.collectFirst { case ItemsK(s) => s }.getOrElse(BoolSchema(true))
        ArrayType(structTypeFor(items), containsNull = true)
      } else if (types.contains("integer")) LongType
      else if (types.contains("number")) DoubleType
      else if (types.contains("boolean")) BooleanType
      else StringType
  }

  /** Parse a JSON-string column into the schema-derived struct. Adds
    * `_malformed` (unparseable input) alongside the parsed struct column.
    * Malformed detection uses the standard corrupt-record column — a
    * PERMISSIVE `from_json` yields an all-null struct for garbage input,
    * which is indistinguishable from a legitimately empty object without it. */
  def parseJson(df: DataFrame, jsonCol: String, doc: SchemaDoc,
                parsedCol: String = "parsed"): DataFrame =
    structTypeFor(doc.root) match {
      case st: StructType =>
        val withCorrupt = st.add("_corrupt", StringType)
        df.withColumn(parsedCol,
            from_json(col(jsonCol), withCorrupt,
              Map("columnNameOfCorruptRecord" -> "_corrupt")))
          .withColumn("_malformed",
            col(jsonCol).isNotNull && col(parsedCol).getField("_corrupt").isNotNull)
          .withColumn(parsedCol, col(parsedCol).dropFields("_corrupt"))
      case dt =>
        df.withColumn(parsedCol, from_json(col(jsonCol), dt))
          .withColumn("_malformed", col(jsonCol).isNotNull && col(parsedCol).isNull)
    }

  /** End-to-end: parse + validate; returns parsed columns plus `_valid` /
    * `_violations` / `_malformed`. */
  def ingest(df: DataFrame, jsonCol: String, doc: SchemaDoc): DataFrame = {
    val parsed = parseJson(df, jsonCol, doc)
    val flat = parsed.select((df.columns.toIndexedSeq.map(col) :+
      col("parsed").as("parsed") :+ col("_malformed")): _*)
    val compiled = graft.compile.ConstraintCompiler.compile(
      doc, col("parsed"), structTypeFor(doc.root))
    flat.withColumn("_valid", !col("_malformed") && compiled.valid)
      .withColumn("_violations", when(col("_malformed"),
        array(struct(lit("$json").as("keyword"), lit("#").as("keywordLocation"),
          lit("#").as("instanceLocation"), lit("malformed JSON document").as("message"))))
        .otherwise(compiled.violations))
  }
}
