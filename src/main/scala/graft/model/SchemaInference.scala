package graft.model

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s.JsonAST.JString

import graft.expr.CappedCollectSet

/** DATA-driven schema inference: profile a DataFrame in ONE scan and emit a
  * draft-2020-12 schema whose facets are tightened to the observed data.
  *
  * This is the dynamic counterpart of [[Infer]] (the reference's reflection
  * walk, `/root/reference/pkg/builder/builder.go:241-625`, infers from the
  * STATIC type only): where `Infer` says "o_totalprice: number", this says
  * "number, minimum 857.71, maximum 555285.16"; where `Infer` says
  * "o_orderstatus: string", this says "enum [F, O, P]" because the scan proved
  * the domain is small. Together they close the loop the reference leaves to
  * the user: profile yesterday's snapshot → inferred schema → validate
  * today's snapshot with the row engine → drift shows up as violation rows.
  *
  * Scale shape (built for ~100 TB inputs):
  *   - exactly one pass over the data — every facet of every column rides the
  *     same partial aggregation (map-side combine, single 1-row exchange);
  *   - bounded state per column: min/max/count are O(1); the enum domain uses
  *     [[CappedCollectSet]], a bounded-state exact distinct-if-small sketch,
  *     so a high-cardinality column costs `enumCap + 1` slots, never an
  *     unbounded `collect_set` buffer;
  *   - the result is O(columns × enumCap) on the driver — independent of rows.
  */
object SchemaInference {

  /** Domain-encoding separator for `enum_csv`: U+001F (unit separator). */
  val EnumSep = "\u001f"


  /** Max distinct values for a string column to become an `enum`. */
  val DefaultEnumCap = 64

  private case class Facet(
      name: String, jsonType: String, format: Option[String],
      numeric: Boolean, lengthy: Boolean, enumable: Boolean)

  /** JSON-type mapping mirrors [[Infer.fromDataType]] (static inference) so
    * the two agree on every supported Spark type. */
  private def facetOf(f: StructField): Option[Facet] = f.dataType match {
    case ByteType | ShortType | IntegerType | LongType =>
      Some(Facet(f.name, "integer", None, numeric = true, lengthy = false, enumable = false))
    case FloatType | DoubleType | _: DecimalType =>
      Some(Facet(f.name, "number", None, numeric = true, lengthy = false, enumable = false))
    case StringType =>
      Some(Facet(f.name, "string", None, numeric = false, lengthy = true, enumable = true))
    case BooleanType =>
      Some(Facet(f.name, "boolean", None, numeric = false, lengthy = false, enumable = false))
    case DateType =>
      Some(Facet(f.name, "string", Some("date"), numeric = false, lengthy = false, enumable = false))
    case TimestampType | TimestampNTZType =>
      Some(Facet(f.name, "string", Some("date-time"), numeric = false, lengthy = false, enumable = false))
    case _ => None // nested/array/map columns: profile flattened views instead
  }

  /** Per-column facet rows, one scan. Columns of unsupported (nested) type are
    * skipped. Output schema:
    * (col_name, json_type, required, min_num, max_num, min_len, max_len, enum_csv).
    *
    * `enum_csv` is the SORTED distinct domain joined with the unit
    * separator (U+001F — a control char no observed value can contain,
    * unlike '|', which splits any value carrying a pipe into bogus
    * members) when the column
    * is a string with ≤ enumCap distinct values, else null. `required` means
    * zero observed nulls. Numeric facets are cast to double (JSON numbers
    * compare as float64 in the validator — `validator.go:43-52`). */
  def profile(df: DataFrame, enumCap: Int = DefaultEnumCap): DataFrame = {
    val spark = df.sparkSession
    val facets = df.schema.fields.flatMap(facetOf).toSeq
    require(facets.nonEmpty, "no profilable columns")

    val aggs: Seq[org.apache.spark.sql.Column] =
      count(lit(1)).as("__n") +: facets.flatMap { fc =>
        val c = col("`" + fc.name.replace("`", "``") + "`")
        Seq(count(c).as(s"${fc.name}__nn")) ++
          (if (fc.numeric) Seq(
            min(c).cast(DoubleType).as(s"${fc.name}__min"),
            max(c).cast(DoubleType).as(s"${fc.name}__max")) else Nil) ++
          (if (fc.lengthy) Seq(
            min(length(c)).cast(LongType).as(s"${fc.name}__minl"),
            max(length(c)).cast(LongType).as(s"${fc.name}__maxl")) else Nil) ++
          (if (fc.enumable) Seq(
            CappedCollectSet(c, enumCap).as(s"${fc.name}__dom")) else Nil)
      }

    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val total = row.getAs[Long]("__n")

    def opt[T](r: Row, name: String): Option[T] = {
      val i = r.fieldIndex(name)
      if (r.isNullAt(i)) None else Some(r.getAs[T](i))
    }

    val out = facets.map { fc =>
      val nn = row.getAs[Long](s"${fc.name}__nn")
      val dom: Option[Seq[String]] =
        if (!fc.enumable) None
        else opt[scala.collection.Seq[String]](row, s"${fc.name}__dom")
          .map(_.toSeq).filter(ds => ds.nonEmpty && ds.size <= enumCap)
          .map(_.sorted) // empty domain (all-null column) → no enum facet
      (fc.name, fc.jsonType, total > 0 && nn == total,
        if (fc.numeric) opt[Double](row, s"${fc.name}__min") else None,
        if (fc.numeric) opt[Double](row, s"${fc.name}__max") else None,
        if (fc.lengthy) opt[Long](row, s"${fc.name}__minl") else None,
        if (fc.lengthy) opt[Long](row, s"${fc.name}__maxl") else None,
        dom.map(_.mkString(EnumSep)))
    }

    import spark.implicits._
    out.toDF("col_name", "json_type", "required",
      "min_num", "max_num", "min_len", "max_len", "enum_csv")
  }

  /** Full inference: profile → draft-2020-12 object schema. String columns
    * with a small observed domain become `enum` (sorted; subsumes type);
    * numeric columns carry observed `minimum`/`maximum`; strings carry
    * observed length bounds; temporal columns carry `format`. Columns with no
    * observed nulls land in `required`. The inferred document validates every
    * profiled row by construction (bounds are closed, domains exact). */
  def infer(df: DataFrame, enumCap: Int = DefaultEnumCap): SchemaNode = {
    val facetsByName = df.schema.fields.flatMap(facetOf).map(f => f.name -> f).toMap
    val rows = profile(df, enumCap).collect()

    val props: Vector[(String, SchemaNode)] = rows.toVector.map { r =>
      val name = r.getAs[String]("col_name")
      val fc = facetsByName(name)
      def optD(i: String) = if (r.isNullAt(r.fieldIndex(i))) None else Some(r.getAs[Double](i))
      def optL(i: String) = if (r.isNullAt(r.fieldIndex(i))) None else Some(r.getAs[Long](i))
      val enumCsv = if (r.isNullAt(r.fieldIndex("enum_csv"))) None
                    else Some(r.getAs[String]("enum_csv"))

      val kws: Vector[Keyword] = enumCsv match {
        case Some(csv) =>
          // exact domain: enum subsumes type/length facets
          Vector(EnumK(csv.split(EnumSep).toList.map(JString(_))))
        case None =>
          Vector(TypeK(Set(r.getAs[String]("json_type")))) ++
            fc.format.map(FormatK(_)) ++
            optD("min_num").map(MinimumK(_)) ++ optD("max_num").map(MaximumK(_)) ++
            optL("min_len").map(MinLengthK(_)) ++ optL("max_len").map(MaxLengthK(_))
      }
      name -> (ObjSchema(kws): SchemaNode)
    }

    val required = rows.filter(_.getAs[Boolean]("required"))
      .map(_.getAs[String]("col_name")).toList

    ObjSchema(Vector(
      TypeK(Set("object")),
      PropertiesK(props)) ++
      (if (required.nonEmpty) Vector(RequiredK(required)) else Vector.empty))
  }

  /** Inference straight to canonical JSON (deterministic [[Marshal]] order). */
  def inferJson(df: DataFrame, enumCap: Int = DefaultEnumCap): String =
    Marshal.toJson(infer(df, enumCap))

  /** PROFILE drift: compare the one-scan profiles of two snapshots and report,
    * per column, which inferred facets a validator trained on `baseline`
    * would now see violated by `current` — the schema-level complement of the
    * value-distribution drifts in [[graft.table.TableChecks]] (KS/chi²/PSI
    * move when frequencies shift; this moves when the DOMAIN shifts: new
    * columns, widened ranges, longer strings, unseen enum values, new nulls).
    *
    * Cost: exactly two profile scans (one per side — each the single-pass
    * bounded-state aggregation of [[profile]]); the comparison itself is
    * O(columns × enumCap) on the driver.
    *
    * Output per column (sorted by name; only columns profilable on either
    * side): `status` added|removed|common; for common columns, booleans for
    * type change, new nulls (required → nullable), widened numeric bounds and
    * string lengths, plus `new_enum_values` — the sorted '|'-joined values
    * outside the baseline's exact domain (null when the baseline had no
    * bounded domain, or nothing new appeared). */
  def profileDrift(current: DataFrame, baseline: DataFrame,
                   enumCap: Int = DefaultEnumCap): DataFrame = {
    val spark = current.sparkSession
    case class P(jsonType: String, required: Boolean,
                 minNum: Option[Double], maxNum: Option[Double],
                 minLen: Option[Long], maxLen: Option[Long],
                 dom: Option[Set[String]])
    def read(df: DataFrame): Map[String, P] =
      profile(df, enumCap).collect().map { r =>
        def o[T](n: String): Option[T] = {
          val i = r.fieldIndex(n)
          if (r.isNullAt(i)) None else Some(r.getAs[T](i))
        }
        r.getAs[String]("col_name") -> P(r.getAs[String]("json_type"),
          r.getAs[Boolean]("required"),
          o[Double]("min_num"), o[Double]("max_num"),
          o[Long]("min_len"), o[Long]("max_len"),
          o[String]("enum_csv").map(_.split(EnumSep).toSet))
      }.toMap
    val cur = read(current)
    val base = read(baseline)

    val rows = (cur.keySet ++ base.keySet).toSeq.sorted.map { name =>
      (cur.get(name), base.get(name)) match {
        case (Some(_), None) =>
          (name, "added", null, null, null, null, null)
        case (None, Some(_)) =>
          (name, "removed", null, null, null, null, null)
        case (Some(c), Some(b)) =>
          val newEnum = b.dom.map(bd =>
            c.dom.fold(Set("<domain exceeded cap>"))(_.diff(bd)))
            .filter(_.nonEmpty).map(_.toSeq.sorted.mkString("|")).orNull
          (name, "common",
            java.lang.Boolean.valueOf(c.jsonType != b.jsonType),
            java.lang.Boolean.valueOf(b.required && !c.required),
            java.lang.Boolean.valueOf(
              (for (cm <- c.minNum; bm <- b.minNum) yield cm < bm).getOrElse(false) ||
              (for (cm <- c.maxNum; bm <- b.maxNum) yield cm > bm).getOrElse(false)),
            java.lang.Boolean.valueOf(
              (for (cl <- c.minLen; bl <- b.minLen) yield cl < bl).getOrElse(false) ||
              (for (cl <- c.maxLen; bl <- b.maxLen) yield cl > bl).getOrElse(false)),
            newEnum)
        case _ => throw new IllegalStateException("unreachable")
      }
    }
    import spark.implicits._
    rows.toDF("col_name", "status", "type_changed", "new_nulls",
      "bounds_widened", "length_widened", "new_enum_values")
  }
}
