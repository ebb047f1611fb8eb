package graft.model

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.types._
import org.json4s._

/** Programmatic, argument-type-checked schema construction — the analogue of
  * the reference's fluent Builder (`pkg/builder/builder.go:40-181` and the
  * generated per-keyword wrappers, `pkg/draft202012/keywords.go:484-801`),
  * as an immutable Scala DSL:
  *
  * {{{
  * val schema = Schema.obj(
  *   "doc_id" -> Schema.string.format("uuid"),
  *   "tokens" -> Schema.array(Schema.integer.min(0).max(4095)).minItems(1),
  *   "n_tok"  -> Schema.integer.min(1).max(8192),
  *   "source" -> Schema.string.enumOf("web", "books", "code", "wiki")
  * ).required("doc_id", "tokens", "n_tok", "source").closed
  * }}}
  */
final case class Schema private (keywords: Vector[Keyword]) {

  private def add(k: Keyword): Schema = Schema(keywords :+ k)

  def min(v: Double): Schema = add(MinimumK(v))
  def max(v: Double): Schema = add(MaximumK(v))
  def exclusiveMin(v: Double): Schema = add(ExclusiveMinimumK(v))
  def exclusiveMax(v: Double): Schema = add(ExclusiveMaximumK(v))
  def multipleOf(v: Double): Schema = add(MultipleOfK(v))
  def minLength(n: Long): Schema = add(MinLengthK(n))
  def maxLength(n: Long): Schema = add(MaxLengthK(n))
  def pattern(re: String): Schema = {
    java.util.regex.Pattern.compile(re) // fail fast like builder arg checks
    add(PatternK(re))
  }
  def format(f: String): Schema = add(FormatK(f))
  def enumOf(vs: Any*): Schema = add(EnumK(vs.map(Schema.toJValue).toList))
  def const(v: Any): Schema = add(ConstK(Schema.toJValue(v)))
  def default(v: Any): Schema = add(DefaultK(Schema.toJValue(v)))

  def minItems(n: Long): Schema = add(MinItemsK(n))
  def maxItems(n: Long): Schema = add(MaxItemsK(n))
  def uniqueItems: Schema = add(UniqueItemsK(true))
  def contains(s: Schema): Schema = add(ContainsK(s.toNode))
  def minContains(n: Long): Schema = add(MinContainsK(n))
  def maxContains(n: Long): Schema = add(MaxContainsK(n))
  def prefixItems(ss: Schema*): Schema = add(PrefixItemsK(ss.map(_.toNode).toVector))

  def required(names: String*): Schema = add(RequiredK(names.toList))
  def minProperties(n: Long): Schema = add(MinPropertiesK(n))
  def maxProperties(n: Long): Schema = add(MaxPropertiesK(n))
  def propertyNames(s: Schema): Schema = add(PropertyNamesK(s.toNode))
  def dependentRequired(deps: (String, List[String])*): Schema =
    add(DependentRequiredK(deps.toVector))
  /** `additionalProperties: false` — closed object like inferred structs
    * (builder.go:394-503). */
  def closed: Schema = add(AdditionalPropertiesK(BoolSchema(false)))

  def allOf(ss: Schema*): Schema = add(AllOfK(ss.map(_.toNode).toVector))
  def anyOf(ss: Schema*): Schema = add(AnyOfK(ss.map(_.toNode).toVector))
  def oneOf(ss: Schema*): Schema = add(OneOfK(ss.map(_.toNode).toVector))
  def not(s: Schema): Schema = add(NotK(s.toNode))

  def title(t: String): Schema = add(AnnotationK("title", JString(t)))
  def description(d: String): Schema = add(AnnotationK("description", JString(d)))

  def toNode: SchemaNode = ObjSchema(keywords)
  def toDoc: SchemaDoc = SchemaParser.parseJValue(Marshal.toJValue(toNode))
  def json: String = Marshal.toJson(toNode)
}

object Schema {
  val any: Schema = Schema(Vector.empty)
  def typed(t: String): Schema = Schema(Vector(TypeK(Set(t))))
  def string: Schema = typed("string")
  def integer: Schema = typed("integer")
  def number: Schema = typed("number")
  def boolean: Schema = typed("boolean")
  def nul: Schema = typed("null")
  def array(items: Schema): Schema =
    Schema(Vector(TypeK(Set("array")), ItemsK(items.toNode)))
  def obj(props: (String, Schema)*): Schema =
    Schema(Vector(TypeK(Set("object")),
      PropertiesK(props.map { case (n, s) => n -> s.toNode }.toVector)))
  def ref(r: String): Schema = Schema(Vector(RefK(r)))

  private[model] def toJValue(v: Any): JValue = v match {
    case null => JNull
    case j: JValue => j
    case b: Boolean => JBool(b)
    case s: String => JString(s)
    case i: Int => JInt(BigInt(i))
    case l: Long => JInt(BigInt(l))
    case d: Double => JDouble(d)
    case f: Float => JDouble(f.toDouble)
    case bd: BigDecimal => JDecimal(bd)
    case xs: Seq[_] => JArray(xs.map(toJValue).toList)
    case m: Map[_, _] => JObject(m.toList.map { case (k, x) => k.toString -> toJValue(x) })
    case other => throw new IllegalArgumentException(s"cannot lift $other to JSON")
  }
}

/** Schema inference from Spark types — the analogue of the reference's
  * reflection walk (`pkg/builder/builder.go:241-625`): sized ints get exact
  * bounds (builder.go:315-351), arrays get `items` (:378-393), structs become
  * closed objects with `required` for non-nullable fields (:394-503),
  * string-keyed maps become open objects (:362-368 requires string keys). */
object Infer {

  /** Canonical entry: infer from a case class via its Encoder — our
    * `FromType[T]` (`pkg/jsonschema/jsonschema.go:26-38`). */
  def fromEncoder[T](implicit enc: Encoder[T]): SchemaNode =
    fromStructType(enc.schema)

  def fromStructType(st: StructType): SchemaNode = ObjSchema(Vector(
    TypeK(Set("object")),
    PropertiesK(st.fields.toVector.map(f => f.name -> fromDataType(f.dataType))),
    RequiredK(st.fields.filterNot(_.nullable).map(_.name).toList),
    AdditionalPropertiesK(BoolSchema(false))))

  def fromDataType(dt: DataType): SchemaNode = dt match {
    case ByteType => bounded(Byte.MinValue, Byte.MaxValue)
    case ShortType => bounded(Short.MinValue, Short.MaxValue)
    case IntegerType => bounded(Int.MinValue, Int.MaxValue)
    // int64 bounds exceed float64 precision — emit unbounded integer rather
    // than lie (numbers compare as float64 throughout, validator.go:43-52)
    case LongType => ObjSchema(Vector(TypeK(Set("integer"))))
    case FloatType | DoubleType | _: DecimalType => ObjSchema(Vector(TypeK(Set("number"))))
    case StringType => ObjSchema(Vector(TypeK(Set("string"))))
    case BooleanType => ObjSchema(Vector(TypeK(Set("boolean"))))
    case DateType => ObjSchema(Vector(TypeK(Set("string")), FormatK("date")))
    case TimestampType | TimestampNTZType =>
      ObjSchema(Vector(TypeK(Set("string")), FormatK("date-time")))
    case BinaryType => ObjSchema(Vector(TypeK(Set("string")),
      AnnotationK("contentEncoding", JString("base64"))))
    case ArrayType(et, containsNull) =>
      val base = Vector(TypeK(Set("array")), ItemsK(fromDataType(et)))
      ObjSchema(base)
    case st: StructType => fromStructType(st)
    case MapType(StringType, vt, _) => ObjSchema(Vector(
      TypeK(Set("object")), AdditionalPropertiesK(fromDataType(vt))))
    case MapType(kt, _, _) =>
      throw new IllegalArgumentException(
        s"maps must have string keys (builder.go:362-368), got $kt")
    case other => ObjSchema(Vector.empty) // opaque: always-valid
  }

  private def bounded(lo: Double, hi: Double): SchemaNode =
    ObjSchema(Vector(TypeK(Set("integer")), MinimumK(lo), MaximumK(hi)))
}

/** Deterministic SchemaNode → JSON serialization — the analogue of the
  * reference's `Marshal` (`pkg/types/schema/schema.go:211-367`): stable
  * keyword order, boolean schemas in short form. Round-trips through
  * `SchemaParser.parseJValue`. */
object Marshal {

  import org.json4s.jackson.JsonMethods

  def toJson(node: SchemaNode): String =
    JsonMethods.compact(JsonMethods.render(toJValue(node)))

  def toJValue(node: SchemaNode): JValue = node match {
    case BoolSchema(b) => JBool(b) // short form (schema.go:371-384)
    case ObjSchema(kws) =>
      // stable serialization: keywords in canonical order, then source order
      JObject(kws.sortBy(k => rank(k.name)).map(keywordJson).toList)
  }

  /** Canonical keyword order mirroring the reference's deterministic key sort
    * (`schema.go:301-304`) — identifiers, then assertions, then applicators. */
  private val order: Map[String, Int] = Seq(
    "$schema", "$id", "$anchor", "$dynamicAnchor", "$ref", "$dynamicRef",
    "$vocabulary", "$comment", "$defs", "title", "description", "type", "enum",
    "const", "default", "minimum", "maximum", "exclusiveMinimum",
    "exclusiveMaximum", "multipleOf", "minLength", "maxLength", "pattern",
    "format", "prefixItems", "items", "contains", "minContains", "maxContains",
    "minItems", "maxItems", "uniqueItems", "properties", "patternProperties",
    "additionalProperties", "propertyNames", "required", "dependentRequired",
    "dependentSchemas", "minProperties", "maxProperties", "allOf", "anyOf",
    "oneOf", "not", "if", "then", "else", "unevaluatedProperties",
    "unevaluatedItems").zipWithIndex.toMap
  private def rank(name: String): Int = order.getOrElse(name, Int.MaxValue)

  private def keywordJson(k: Keyword): (String, JValue) = k.name -> (k match {
    case TypeK(ts) =>
      if (ts.size == 1) JString(ts.head) else JArray(ts.toList.sorted.map(JString(_)))
    case EnumK(vs) => JArray(vs)
    case ConstK(v) => v
    case MinimumK(v) => num(v)
    case MaximumK(v) => num(v)
    case ExclusiveMinimumK(v) => num(v)
    case ExclusiveMaximumK(v) => num(v)
    case MultipleOfK(v) => num(v)
    case MinLengthK(n) => JInt(BigInt(n))
    case MaxLengthK(n) => JInt(BigInt(n))
    case PatternK(p) => JString(p)
    case FormatK(f) => JString(f)
    case DefaultK(v) => v
    case ItemsK(s) => toJValue(s)
    case PrefixItemsK(ss) => JArray(ss.map(toJValue).toList)
    case ContainsK(s) => toJValue(s)
    case MinContainsK(n) => JInt(BigInt(n))
    case MaxContainsK(n) => JInt(BigInt(n))
    case MinItemsK(n) => JInt(BigInt(n))
    case MaxItemsK(n) => JInt(BigInt(n))
    case UniqueItemsK(b) => JBool(b)
    case PropertiesK(props) => JObject(props.map { case (n, s) => n -> toJValue(s) }.toList)
    case PatternPropertiesK(pats) => JObject(pats.map { case (n, s) => n -> toJValue(s) }.toList)
    case AdditionalPropertiesK(s) => toJValue(s)
    case PropertyNamesK(s) => toJValue(s)
    case RequiredK(names) => JArray(names.map(JString(_)))
    case DependentRequiredK(deps) =>
      JObject(deps.map { case (n, l) => n -> JArray(l.map(JString(_))) }.toList)
    case DependentSchemasK(deps) =>
      JObject(deps.map { case (n, s) => n -> toJValue(s) }.toList)
    case MinPropertiesK(n) => JInt(BigInt(n))
    case MaxPropertiesK(n) => JInt(BigInt(n))
    case AllOfK(ss) => JArray(ss.map(toJValue).toList)
    case AnyOfK(ss) => JArray(ss.map(toJValue).toList)
    case OneOfK(ss) => JArray(ss.map(toJValue).toList)
    case NotK(s) => toJValue(s)
    case IfK(s) => toJValue(s)
    case ThenK(s) => toJValue(s)
    case ElseK(s) => toJValue(s)
    case UnevaluatedPropertiesK(s) => toJValue(s)
    case UnevaluatedItemsK(s) => toJValue(s)
    case RefK(r) => JString(r)
    case DynamicRefK(r) => JString(r)
    case AnnotationK(_, v) => v
  })

  /** Integral doubles serialize as integers (JSON numbers decode to float64
    * both ways, so this is lossless under the engine's numeric model). */
  private def num(v: Double): JValue =
    if (v.isWhole && math.abs(v) < 1e15) JInt(BigInt(v.toLong)) else JDouble(v)
}
