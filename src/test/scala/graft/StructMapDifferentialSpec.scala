package graft

import graft.compile.{CompileOpts, ConstraintCompiler}
import graft.model.SchemaParser
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Differential oracle across the compiler's TWO object-typing paths: an
  * object instance with homogeneous integer values can be typed either as a
  * StructType (one field per present key — the compile-time static path:
  * properties/required/additionalProperties resolve against the schema of
  * the column) or as a MapType(string, long) (the dynamic-key path:
  * presence via map_contains_key, patternProperties via runtime rlike,
  * unevaluatedProperties via runtime key-set arithmetic). The two
  * compilations share NO code beyond keyword parsing, so agreement over a
  * seeded random schema×instance sweep is a genuine two-implementation
  * check — the same role the DuckDB oracle plays for the dataset operators.
  *
  * 1,200 seeded (schema, instance) pairs (three independent seeds) over the object-keyword grammar
  * (properties / patternProperties / additionalProperties / propertyNames /
  * required / dependentRequired / min-maxProperties / unevaluatedProperties
  * / allOf / anyOf / oneOf / not, with integer leaf constraints). Any
  * verdict disagreement fails with the reproducing pair printed. */
class StructMapDifferentialSpec extends SparkSpec {

  private val keyPool = Vector("a", "b", "c", "pa", "pb", "zz")

  private def leafSchema(r: scala.util.Random): String = r.nextInt(6) match {
    case 0 => """{"type": "integer"}"""
    case 1 => s"""{"minimum": ${r.nextInt(10)}}"""
    case 2 => s"""{"maximum": ${r.nextInt(10)}}"""
    case 3 => s"""{"multipleOf": ${r.nextInt(3) + 1}}"""
    case 4 => "true"
    case 5 => s"""{"minimum": ${r.nextInt(5)}, "maximum": ${r.nextInt(5) + 5}}"""
  }

  private def objKeyword(r: scala.util.Random, depth: Int): Option[String] =
    r.nextInt(14) match {
      case 0 =>
        val ks = r.shuffle(keyPool).take(r.nextInt(3) + 1)
        Some(s""""properties": {${ks.map(k => s""""$k": ${leafSchema(r)}""").mkString(",")}}""")
      case 1 =>
        val ks = r.shuffle(keyPool).take(r.nextInt(2) + 1)
        Some(s""""required": [${ks.map("\"" + _ + "\"").mkString(",")}]""")
      case 2 => Some(s""""minProperties": ${r.nextInt(4)}""")
      case 3 => Some(s""""maxProperties": ${r.nextInt(4) + 1}""")
      case 4 => Some(s""""patternProperties": {"^p": ${leafSchema(r)}}""")
      case 5 => Some(s""""additionalProperties": ${if (r.nextBoolean()) leafSchema(r) else r.nextBoolean().toString}""")
      case 6 => Some(s""""propertyNames": {"maxLength": ${r.nextInt(2) + 1}}""")
      case 7 =>
        val trigger = keyPool(r.nextInt(keyPool.size))
        val dep = keyPool(r.nextInt(keyPool.size))
        Some(s""""dependentRequired": {"$trigger": ["$dep"]}""")
      case 8 if depth > 0 =>
        val n = r.nextInt(2) + 1
        Some(s""""allOf": [${Seq.fill(n)(objSchema(r, depth - 1)).mkString(",")}]""")
      case 9 if depth > 0 =>
        val n = r.nextInt(2) + 1
        Some(s""""anyOf": [${Seq.fill(n)(objSchema(r, depth - 1)).mkString(",")}]""")
      case 10 if depth > 0 =>
        Some(s""""oneOf": [${objSchema(r, depth - 1)}, ${objSchema(r, depth - 1)}]""")
      case 11 if depth > 0 =>
        Some(s""""not": ${objSchema(r, depth - 1)}""")
      case 12 if depth > 0 =>
        val parts = Seq(
          s""""if": ${objSchema(r, depth - 1)}""") ++
          (if (r.nextBoolean()) Seq(s""""then": ${objSchema(r, depth - 1)}""") else Nil) ++
          (if (r.nextBoolean()) Seq(s""""else": ${objSchema(r, depth - 1)}""") else Nil)
        Some(parts.mkString(","))
      case 13 if depth > 0 =>
        val trigger = keyPool(r.nextInt(keyPool.size))
        Some(s""""dependentSchemas": {"$trigger": ${objSchema(r, depth - 1)}}""")
      case _ => None
    }

  private def objSchema(r: scala.util.Random, depth: Int): String = {
    val kws = (0 until (r.nextInt(3) + 1)).flatMap(_ => objKeyword(r, depth)).distinct
    // unevaluatedProperties only at the top of a subschema, sometimes
    val uneval =
      if (r.nextInt(3) == 0)
        Seq(s""""unevaluatedProperties": ${if (r.nextBoolean()) "false" else leafSchema(r)}""")
      else Nil
    (kws ++ uneval).mkString("{", ",", "}")
  }

  private def instance(r: scala.util.Random): Seq[(String, Long)] =
    r.shuffle(keyPool).take(r.nextInt(keyPool.size + 1))
      .map(k => k -> (r.nextInt(13) - 2).toLong).sortBy(_._1)

  private def verdict(schemaJson: String, pairs: Seq[(String, Long)],
                      asMap: Boolean): Either[String, Boolean] = {
    val doc = SchemaParser.parse(schemaJson)
    val (dt, value): (DataType, Any) =
      if (asMap) (MapType(StringType, LongType), pairs.toMap)
      else (StructType(pairs.map(p => StructField(p._1, LongType))),
            Row(pairs.map(_._2): _*))
    val schema = StructType(Seq(StructField("value", dt, nullable = true)))
    val df = spark.createDataFrame(java.util.Arrays.asList(Row(value)), schema)
    try {
      val c = ConstraintCompiler.compile(doc, col("value"), dt,
        CompileOpts(nullIsAbsent = false))
      Right(df.select(c.valid.as("ok")).collect()(0).getBoolean(0))
    } catch { case e: Exception => Left(e.getClass.getSimpleName + ": " + e.getMessage) }
  }

  test("struct-typed and map-typed object validation agree (3 seeds x 400 pairs)") {
    val disagreements = scala.collection.mutable.Buffer[String]()
    var checked = 0
    Seq(20260821L, 424242L, 77055L).foreach { seed =>
      val r = new scala.util.Random(seed)
      (1 to 400).foreach { i =>
        val s = objSchema(r, depth = 2)
        val inst = instance(r)
        (verdict(s, inst, asMap = false), verdict(s, inst, asMap = true)) match {
          case (Right(a), Right(b)) =>
            checked += 1
            if (a != b)
              disagreements += s"seed=$seed #$i struct=$a map=$b\n  schema: $s\n  instance: $inst"
          case (Left(ea), Left(eb)) => // both paths reject the schema — agreement
            checked += 1
            if (ea.takeWhile(_ != ':') != eb.takeWhile(_ != ':'))
              disagreements += s"seed=$seed #$i differing exceptions\n  struct: $ea\n  map: $eb\n  schema: $s"
          case (Right(a), Left(eb)) =>
            disagreements += s"seed=$seed #$i struct=$a but map path threw $eb\n  schema: $s\n  instance: $inst"
          case (Left(ea), Right(b)) =>
            disagreements += s"seed=$seed #$i map=$b but struct path threw $ea\n  schema: $s\n  instance: $inst"
        }
      }
    }
    info(s"$checked/1200 pairs compared")
    assert(disagreements.isEmpty,
      s"\n${disagreements.size} disagreements:\n${disagreements.take(5).mkString("\n")}")
  }
}
