package graft.model

import org.json4s._

/** A `$schema`-selected keyword dialect: a name, the `$schema` URIs that
  * select it, and keyword-parse overrides consulted BEFORE the shared
  * draft-2020-12 parser chain (return None to fall through).
  *
  * This is the analogue of the reference's vocabulary registry — a
  * `Vocabulary` is selected by `$schema` URI with a default fallback
  * (`/root/reference/pkg/types/schema/schema.go:420-465`, registry at
  * `:1200-1291`). Two extension surfaces compose here, mirroring the
  * reference's split: `Dialects.register` changes how KEYWORDS PARSE
  * (per-`$schema` syntax, e.g. draft-7's array-form `items`), while
  * `graft.compile.ConstraintRegistry.register` adds custom-keyword
  * VALIDATION semantics (the RegisterValidator analogue) — a custom
  * vocabulary typically uses both. */
final case class Dialect(
    name: String,
    uris: Set[String],
    overrides: (String, JValue, String, JObject) => Option[Keyword])

object Dialects {
  private lazy val log = org.slf4j.LoggerFactory.getLogger("graft.model.Dialects")

  /** Default dialect: draft 2020-12 keyword set, plus the always-on draft-7
    * `dependencies` compat the shared parser carries (validator.go:1299-1342
    * honors it in every dialect too). */
  val draft202012: Dialect = Dialect(
    "draft-2020-12",
    Set("https://json-schema.org/draft/2020-12/schema"),
    (_, _, _, _) => None)

  /** Draft-7: array-form `items` is the per-position schema list (2020-12
    * `prefixItems`) and `additionalItems` is the rest-of-array schema
    * (2020-12 `items`); `dependencies` parses natively via the shared chain.
    * `additionalItems` only has meaning when the SIBLING `items` is the
    * array form — with schema-form (or absent) `items` the draft-7 spec
    * ignores it, so mapping it to ItemsK there would shadow (or invent) the
    * real rest-of-array schema. */
  lazy val draft7: Dialect = Dialect(
    "draft-7",
    Set("http://json-schema.org/draft-07/schema"),
    (k, v, base, siblings) => (k, v) match {
      case ("items", JArray(xs)) =>
        Some(PrefixItemsK(xs.map(x => SchemaParser.parseNode(x, base, draft7)).toVector))
      case ("additionalItems", s) => (siblings \ "items") match {
        case JArray(_) => Some(ItemsK(SchemaParser.parseNode(s, base, draft7)))
        case _ => Some(AnnotationK("additionalItems", s)) // ignored per spec
      }
      case _ => None
    })

  private def normalize(uri: String): String = uri.stripSuffix("#")

  private val registry = scala.collection.concurrent.TrieMap.empty[String, Dialect]
  Seq(draft202012, draft7).foreach(register)

  /** Register a dialect for its `$schema` URIs (the RegisterVocabulary
    * analogue, schema.go:1200-1291). Later registrations shadow earlier. */
  def register(d: Dialect): Unit =
    d.uris.foreach(u => registry.put(normalize(u), d))

  /** Dialect for a document's `$schema` URI; unknown URIs fall back to the
    * default with a warning (buildTopFromJSON's default path). */
  def forSchemaUri(uri: Option[String]): Dialect = uri match {
    case None => draft202012
    case Some(u) => registry.getOrElse(normalize(u), {
      log.warn(s"unknown $$schema dialect '$u'; falling back to ${draft202012.name}")
      draft202012
    })
  }
}
