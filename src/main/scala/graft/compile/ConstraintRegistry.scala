package graft.compile

import org.apache.spark.sql.Column
import org.apache.spark.sql.types.DataType
import org.json4s.JValue

/** Custom-keyword extension point — the engine-level analogue of the
  * reference's pluggable Vocabulary/keyword registry
  * (`pkg/types/schema/schema.go:1218-1291`): a registered compiler turns an
  * (argument, target column, target type) triple into a validity predicate +
  * violation message. Unregistered unknown keywords remain always-valid
  * annotations (schema.go:521-532).
  *
  * {{{
  * ConstraintRegistry.register("maxTokenSum") { (arg, target, dt) =>
  *   val bound = arg.asInstanceOf[JInt].num.toLong
  *   Some((aggregate(target, lit(0L), (a, x) => a + x) <= bound,
  *         s"token sum exceeds $bound"))
  * }
  * }}}
  */
object ConstraintRegistry {

  /** Returns Some((validityPredicate, violationMessage)) when the compiler
    * applies to the target type; None → keyword ignored for this column
    * (matching scalar keywords ignoring wrong-typed instances,
    * validator.go:976,991,1003). */
  type KeywordCompiler = (JValue, Column, DataType) => Option[(Column, String)]

  private val compilers =
    new java.util.concurrent.ConcurrentHashMap[String, KeywordCompiler]()

  def register(name: String)(compiler: KeywordCompiler): Unit =
    compilers.put(name, compiler)

  def unregister(name: String): Unit = compilers.remove(name)

  def get(name: String): Option[KeywordCompiler] = Option(compilers.get(name))
}
