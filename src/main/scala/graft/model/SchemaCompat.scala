package graft.model

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Schema-evolution compatibility: classify every keyword-level change
  * between two schema documents as
  *
  *  - [[SchemaCompat.Tightened]] — some instance valid under OLD may be
  *    invalid under NEW (promoting the schema requires revalidating data),
  *  - [[SchemaCompat.Relaxed]]   — every OLD-valid instance stays valid
  *    (verdicts and manifests stand; no rescan needed),
  *  - [[SchemaCompat.Info]]      — annotation-only, no validity impact.
  *
  * This is the promotion gate of a STANDING validation pipeline: a 100 TB
  * corpus validated under schema v1 does not need a rescan for a v2 that
  * only relaxes — `canPromoteWithoutRescan` decides that from the two
  * documents alone, in O(schema), never O(data).
  *
  * Soundness contract: the classifier only answers `Relaxed` when the change
  * is PROVABLY monotone-relaxing. Anything it cannot reason about — changes
  * inside non-monotone contexts (`oneOf`, `if`, changed `$ref` targets or
  * `$defs` bodies), regex/format swaps, incomparable enum sets — classifies
  * as `Tightened`, forcing a rescan rather than ever wrongly skipping one.
  * Polarity flips under `not` (relaxing the negated schema tightens the
  * parent); `anyOf` is monotone (branch added/relaxed → relaxed).
  *
  * The reference has no analogue (stateless, single-document validator);
  * keyword semantics follow its validator families
  * (`/root/reference/internal/validator/validator.go`).
  */
object SchemaCompat {

  sealed trait Direction
  case object Tightened extends Direction
  case object Relaxed extends Direction
  case object Info extends Direction
  /** The classifier cannot prove monotonicity in EITHER direction. Forces a
    * rescan like [[Tightened]], but — critically — is NEVER flipped by a
    * `not` context: flipping an unprovable "Tightened" to "Relaxed" under
    * negation would let `canPromoteWithoutRescan` skip a rescan on a change
    * it cannot reason about (e.g. `{"not":{"type":"string"}}` →
    * `{"not":{"type":"integer"}}` genuinely tightens). */
  case object Incomparable extends Direction

  final case class Change(path: String, keyword: String, oldValue: Option[String],
                          newValue: Option[String], direction: Direction,
                          detail: String)

  /** True iff no change tightens — old verdicts remain valid under the new
    * schema, so promotion needs no data rescan. */
  def canPromoteWithoutRescan(changes: Seq[Change]): Boolean =
    !changes.exists(c => c.direction == Tightened || c.direction == Incomparable)

  def diff(oldJson: String, newJson: String): Seq[Change] =
    diffSchemas(JsonMethods.parse(oldJson), JsonMethods.parse(newJson), "", flip = false)

  // ------------------------------------------------------------------ walk

  // keywords where a LARGER value only admits more instances
  private val MinLike = Set("minimum", "exclusiveMinimum", "minLength",
    "minItems", "minProperties", "minContains")
  private val MaxLike = Set("maximum", "exclusiveMaximum", "maxLength",
    "maxItems", "maxProperties", "maxContains")
  // keyword-absent behaves like this value (others: absent = unbounded)
  private val VacuousValue = Map("minLength" -> 0.0, "minItems" -> 0.0,
    "minProperties" -> 0.0, "minContains" -> 1.0)
  private val Annotations = Set("title", "description", "default", "examples",
    "deprecated", "readOnly", "writeOnly", "$comment", "$schema", "$id",
    "$anchor", "$dynamicAnchor", "$vocabulary", "contentMediaType",
    "contentEncoding", "contentSchema")
  // subschema-valued keywords recursed with the SAME polarity
  private val MonotoneSub = Set("items", "additionalProperties", "propertyNames",
    "contains", "unevaluatedProperties", "unevaluatedItems")

  private def render(v: JValue): String = JsonMethods.compact(JsonMethods.render(v))

  private def dir(flip: Boolean, d: Direction): Direction = d match {
    // only PROVABLY-monotone classifications flip under negation;
    // Incomparable/Info pass through
    case Tightened if flip => Relaxed
    case Relaxed if flip => Tightened
    case other => other
  }

  private def num(v: JValue): Option[Double] = v match {
    case JInt(i) => Some(i.toDouble)
    case JLong(l) => Some(l.toDouble)
    case JDouble(d) => Some(d)
    case JDecimal(d) => Some(d.toDouble)
    case _ => None
  }

  private def diffSchemas(o: JValue, n: JValue, path: String,
                          flip: Boolean): Seq[Change] = (o, n) match {
    case (a, b) if a == b => Seq.empty
    // boolean-schema transitions (and schema <-> boolean)
    case (JBool(ob), JBool(nb)) =>
      Seq(Change(path, "$bool", Some(ob.toString), Some(nb.toString),
        dir(flip, if (nb) Relaxed else Tightened), "boolean schema flipped"))
    case (JBool(ob), _: JObject) =>
      Seq(Change(path, "$bool", Some(ob.toString), Some("schema"),
        dir(flip, if (ob) Tightened else Relaxed),
        if (ob) "true replaced by constraints" else "false replaced by a satisfiable schema"))
    case (_: JObject, JBool(nb)) =>
      Seq(Change(path, "$bool", Some("schema"), Some(nb.toString),
        dir(flip, if (nb) Relaxed else Tightened),
        if (nb) "constraints dropped for true" else "schema replaced by false"))
    case (oo: JObject, no: JObject) =>
      // does the NEW schema constrain keys that fall past properties/
      // patternProperties? If so, REMOVING a property entry is not a
      // relaxation — the key falls to the (possibly stricter) catch-all.
      val newCatchAllFree = Seq("additionalProperties", "unevaluatedProperties")
        .forall(kw => (no \ kw) match {
          case JNothing | JBool(true) | JObject(Nil) => true
          case _ => false
        })
      // const and enum are ONE logical constraint (a value set of size 1 vs
      // n) — compare them jointly so const -> superset-enum reads as the
      // relaxation it is
      def valueSet(s: JObject): Option[Set[JValue]] = (s \ "const", s \ "enum") match {
        case (JNothing, JNothing) => None
        case (c, JNothing) => Some(Set(c))
        case (JNothing, JArray(xs)) => Some(xs.toSet)
        case _ => None // both present: handled as opaque below, never as a set
      }
      // const AND enum jointly present on either side: the effective value
      // set is their intersection under JSON-number equality, which this
      // syntactic classifier does not model — any difference is Incomparable
      // (a Some(Set.empty) encoding here would read as subset-of-everything
      // and misclassify as Relaxed)
      def opaqueValues(s: JObject): Boolean =
        (s \ "const") != JNothing && (s \ "enum") != JNothing
      val valueChange: Seq[Change] =
       if (opaqueValues(oo) || opaqueValues(no)) {
        if ((oo \ "const", oo \ "enum") == (no \ "const", no \ "enum")) Seq.empty
        else Seq(Change(s"$path/enum", "enum/const", Some("const+enum"),
          Some("const+enum"), Incomparable,
          "const and enum jointly present; compared opaquely"))
       } else (valueSet(oo), valueSet(no)) match {
        case (a, b) if a == b => Seq.empty
        case (None, Some(_)) => Seq(Change(s"$path/enum", "enum/const", None,
          Some(render(no \ "enum" match { case JNothing => no \ "const"; case e => e })),
          dir(flip, Tightened), "value constraint introduced"))
        case (Some(_), None) => Seq(Change(s"$path/enum", "enum/const",
          Some(render(oo \ "enum" match { case JNothing => oo \ "const"; case e => e })),
          None, dir(flip, Relaxed), "value constraint removed"))
        case (Some(a), Some(b)) =>
          val (d, msg) =
            if (a.subsetOf(b)) (dir(flip, Relaxed), "allowed values grew")
            else if (b.subsetOf(a)) (dir(flip, Tightened), "allowed values shrank")
            else (Incomparable: Direction, "allowed values diverged")
          Seq(Change(s"$path/enum", "enum/const", Some(a.map(render).toSeq.sorted.mkString(",")),
            Some(b.map(render).toSeq.sorted.mkString(",")), d, msg))
      }
      val keys = (oo.obj.map(_._1) ++ no.obj.map(_._1)).distinct
        .filterNot(k => k == "const" || k == "enum")
      valueChange ++ keys.flatMap { k =>
        diffKeyword(k, oo \ k, no \ k, path, flip, newCatchAllFree)
      }
    case _ =>
      Seq(Change(path, "$schema-shape", Some(render(o)), Some(render(n)),
        Tightened, "schema node changed shape; cannot classify"))
  }

  /** One keyword at one subschema. `ov`/`nv` are JNothing when absent;
    * `newCatchAllFree` = the new schema has no constraining
    * additionalProperties/unevaluatedProperties sibling. */
  private def diffKeyword(k: String, ov: JValue, nv: JValue, path: String,
                          flip: Boolean, newCatchAllFree: Boolean = true): Seq[Change] = {
    if (ov == nv) return Seq.empty
    val p = s"$path/$k"
    def both(d: Direction, detail: String) = Seq(Change(p, k,
      Option(ov).filter(_ != JNothing).map(render),
      Option(nv).filter(_ != JNothing).map(render), dir(flip, d), detail))

    k match {
      case _ if Annotations.contains(k) =>
        Seq(Change(p, k, Option(ov).filter(_ != JNothing).map(render),
          Option(nv).filter(_ != JNothing).map(render), Info, "annotation only"))

      case kw if MinLike.contains(kw) || MaxLike.contains(kw) =>
        val vac = VacuousValue.get(kw)
        val oN = num(ov).orElse(vac)
        val nN = num(nv).orElse(vac)
        (oN, nN) match {
          case (Some(a), Some(b)) if a == b => Seq.empty
          case (Some(a), Some(b)) =>
            val relaxing = if (MinLike.contains(kw)) b < a else b > a
            both(if (relaxing) Relaxed else Tightened,
              s"bound ${if (relaxing) "loosened" else "tightened"}")
          case (None, Some(_)) => both(Tightened, "bound introduced")
          case (Some(_), None) => both(Relaxed, "bound removed")
          case _ => Seq.empty
        }

      case "multipleOf" => (num(ov), num(nv)) match {
        case (None, Some(_)) => both(Tightened, "divisor introduced")
        case (Some(_), None) => both(Relaxed, "divisor removed")
        case (Some(a), Some(b)) =>
          // every multiple of a is a multiple of b iff b divides a exactly
          val q = a / b
          if (q == math.floor(q) && !q.isInfinite) both(Relaxed, "new divisor divides the old")
          else {
            val r = b / a
            if (r == math.floor(r) && !r.isInfinite)
              both(Tightened, "old divisor divides the new")
            else Seq(Change(p, k, Some(render(ov)), Some(render(nv)),
              Incomparable, "divisors incomparable"))
          }
        case _ => Seq.empty
      }

      case "type" =>
        def set(v: JValue): Option[Set[String]] = v match {
          case JString(s) => Some(Set(s))
          case JArray(xs) => Some(xs.collect { case JString(s) => s }.toSet)
          case _ => None
        }
        def widen(s: Set[String]) = if (s.contains("number")) s + "integer" else s
        (set(ov), set(nv)) match {
          case (None, Some(_)) => both(Tightened, "type constraint introduced")
          case (Some(_), None) => both(Relaxed, "type constraint removed")
          case (Some(a), Some(b)) =>
            if (widen(a).subsetOf(widen(b))) both(Relaxed, "type set expanded")
            else if (widen(b).subsetOf(widen(a))) both(Tightened, "type set narrowed")
            else Seq(Change(p, k, Some(render(ov)), Some(render(nv)),
              Incomparable, "type sets incomparable"))
          case _ => Seq.empty
        }

      case "required" =>
        def set(v: JValue) = v match {
          case JArray(xs) => xs.collect { case JString(s) => s }.toSet
          case _ => Set.empty[String]
        }
        val added = set(nv) -- set(ov)
        val removed = set(ov) -- set(nv)
        if (added.nonEmpty && removed.nonEmpty)
          Seq(Change(p, k, Option(ov).filter(_ != JNothing).map(render),
            Option(nv).filter(_ != JNothing).map(render), Incomparable,
            s"required keys both added (${added.toSeq.sorted.mkString(",")}) " +
              s"and removed (${removed.toSeq.sorted.mkString(",")})"))
        else if (added.nonEmpty)
          both(Tightened, s"now required: ${added.toSeq.sorted.mkString(",")}")
        else if (removed.nonEmpty)
          both(Relaxed, s"no longer required: ${removed.toSeq.sorted.mkString(",")}")
        else Seq.empty

      case "pattern" | "format" =>
        (ov, nv) match {
          case (JNothing, _) => both(Tightened, s"$k introduced")
          case (_, JNothing) => both(Relaxed, s"$k removed")
          case _ => Seq(Change(p, k, Some(render(ov)), Some(render(nv)),
            Incomparable, s"$k changed; regex/format inclusion not provable"))
        }

      case "uniqueItems" =>
        val o = ov == JBool(true); val n = nv == JBool(true)
        if (!o && n) both(Tightened, "uniqueness introduced")
        else if (o && !n) both(Relaxed, "uniqueness dropped")
        else Seq.empty

      case "properties" | "patternProperties" =>
        val oProps = ov match { case JObject(f) => f.toMap; case _ => Map.empty[String, JValue] }
        val nProps = nv match { case JObject(f) => f.toMap; case _ => Map.empty[String, JValue] }
        (oProps.keySet ++ nProps.keySet).toSeq.sorted.flatMap { name =>
          (oProps.get(name), nProps.get(name)) match {
            case (Some(os), Some(ns)) => diffSchemas(os, ns, s"$p/$name", flip)
            case (None, Some(ns)) if ns == JBool(true) || ns == JObject(Nil) =>
              Seq(Change(s"$p/$name", k, None, Some(render(ns)), Info,
                "unconstrained subschema added"))
            case (None, Some(ns)) =>
              Seq(Change(s"$p/$name", k, None, Some(render(ns)),
                dir(flip, Tightened), "subschema introduced for previously-unconstrained keys"))
            case (Some(os), None) if newCatchAllFree =>
              Seq(Change(s"$p/$name", k, Some(render(os)), None,
                dir(flip, Relaxed), "subschema removed; keys fall through unconstrained"))
            case (Some(os), None) =>
              // the key now falls to the catch-all, which may be looser OR
              // stricter than the removed subschema — not provable either way
              Seq(Change(s"$p/$name", k, Some(render(os)), None,
                Incomparable,
                "subschema removed; keys now fall to a constraining additional/unevaluatedProperties"))
            case _ => Seq.empty
          }
        }

      case kw if MonotoneSub.contains(kw) =>
        (ov, nv) match {
          case (JNothing, _) => diffSchemas(JBool(true), nv, p, flip)
          case (_, JNothing) => diffSchemas(ov, JBool(true), p, flip)
          case _ => diffSchemas(ov, nv, p, flip)
        }

      case "prefixItems" => (ov, nv) match {
        case (JArray(os), JArray(ns)) if os.length == ns.length =>
          os.zip(ns).zipWithIndex.flatMap { case ((a, b), i) =>
            diffSchemas(a, b, s"$p/$i", flip) }
        case _ => Seq(Change(p, k, Option(ov).filter(_ != JNothing).map(render),
          Option(nv).filter(_ != JNothing).map(render), Incomparable,
          "prefix length changed; positional semantics shift"))
      }

      case "not" => (ov, nv) match {
        case (JNothing, _) => both(Tightened, "negation introduced")
        case (_, JNothing) => both(Relaxed, "negation removed")
        case _ => diffSchemas(ov, nv, p, !flip)
      }

      case "anyOf" => (ov, nv) match {
        case (JArray(os), JArray(ns)) =>
          // anyOf's valid set is the UNION of its branches, so duplicate
          // branches are idempotent and SET comparison is exact — a
          // length-based check would read [s,s]→[s,t] as "no change"
          val osS = os.toSet; val nsS = ns.toSet
          if (osS == nsS) Seq.empty
          else if (osS.subsetOf(nsS)) both(Relaxed, "branches added")
          else if (nsS.subsetOf(osS)) both(Tightened, "branches removed")
          else Seq(Change(p, k, Some(render(ov)), Some(render(nv)),
            Incomparable, "branches changed; not provably monotone"))
        case (JNothing, _) => both(Tightened, "anyOf introduced")
        case (_, JNothing) => both(Relaxed, "anyOf removed")
        case _ => Seq(Change(p, k, Option(ov).filter(_ != JNothing).map(render),
          Option(nv).filter(_ != JNothing).map(render), Incomparable,
          "anyOf changed shape"))
      }

      case "allOf" => (ov, nv) match {
        case (JArray(os), JArray(ns)) =>
          // conjunction: duplicates idempotent, so compare as SETS first;
          // equal-length non-subset lists fall back to positional recursion
          // (a reorder then reads as spurious per-branch changes — safe
          // direction, it can only force an unnecessary rescan)
          val osS = os.toSet; val nsS = ns.toSet
          if (osS == nsS) Seq.empty
          else if (nsS.subsetOf(osS)) both(Relaxed, "branches removed")
          else if (osS.subsetOf(nsS)) both(Tightened, "branches added")
          else if (os.length == ns.length)
            os.zip(ns).zipWithIndex.flatMap { case ((a, b), i) =>
              diffSchemas(a, b, s"$p/$i", flip) }
          else Seq(Change(p, k, Some(render(ov)), Some(render(nv)),
            Incomparable, "branches changed; not provably monotone"))
        case (JNothing, _) => both(Tightened, "allOf introduced")
        case (_, JNothing) => both(Relaxed, "allOf removed")
        case _ => Seq(Change(p, k, Option(ov).filter(_ != JNothing).map(render),
          Option(nv).filter(_ != JNothing).map(render), Incomparable,
          "allOf changed shape"))
      }

      case "dependentRequired" | "dependencies" | "dependentSchemas" =>
        val oM = ov match { case JObject(f) => f.toMap; case _ => Map.empty[String, JValue] }
        val nM = nv match { case JObject(f) => f.toMap; case _ => Map.empty[String, JValue] }
        (oM.keySet ++ nM.keySet).toSeq.sorted.flatMap { trig =>
          (oM.get(trig), nM.get(trig)) match {
            case (Some(a), Some(b)) if a == b => Seq.empty
            case (None, Some(b)) => Seq(Change(s"$p/$trig", k, None, Some(render(b)),
              dir(flip, Tightened), "dependency introduced"))
            case (Some(a), None) => Seq(Change(s"$p/$trig", k, Some(render(a)), None,
              dir(flip, Relaxed), "dependency removed"))
            case (Some(JArray(a)), Some(JArray(b))) =>
              val as = a.toSet; val bs = b.toSet
              if (as.subsetOf(bs)) Seq(Change(s"$p/$trig", k, Some(render(JArray(a))),
                Some(render(JArray(b))), dir(flip, Tightened), "dependents added"))
              else if (bs.subsetOf(as)) Seq(Change(s"$p/$trig", k, Some(render(JArray(a))),
                Some(render(JArray(b))), dir(flip, Relaxed), "dependents removed"))
              else Seq(Change(s"$p/$trig", k, Some(render(JArray(a))),
                Some(render(JArray(b))), Incomparable, "dependents incomparable"))
            case (Some(a), Some(b)) => diffSchemas(a, b, s"$p/$trig", flip)
            case _ => Seq.empty
          }
        }

      // non-monotone or resolution-dependent contexts: any change forces a rescan
      case "oneOf" | "if" | "then" | "else" | "$ref" | "$dynamicRef" | "$defs"
           | "definitions" =>
        Seq(Change(p, k, Option(ov).filter(_ != JNothing).map(render),
          Option(nv).filter(_ != JNothing).map(render), Incomparable,
          s"$k changed; non-monotone or resolution-dependent — rescan required"))

      case _ =>
        Seq(Change(p, k, Option(ov).filter(_ != JNothing).map(render),
          Option(nv).filter(_ != JNothing).map(render), Info,
          "unknown keyword (annotation by default)"))
    }
  }
}
