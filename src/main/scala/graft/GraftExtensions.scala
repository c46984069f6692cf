package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.expressions.PolyHash

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions with the SQL function registry so `spark.sql` users get
  * them too (`SELECT poly_hash(text) FROM docs`).
  *
  * Enable with:
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)            // programmatic, or
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * This is the injection point for future whole-operator extensions
  * (custom LogicalPlan + Rule + Strategy) if an operator ever outgrows
  * what the DataFrame combinators express.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => PolyHash(c)
        case Seq(c, b, m) => PolyHash(c,
          b.eval().asInstanceOf[Number].longValue(),
          m.eval().asInstanceOf[Number].longValue())
        case _ => throw new IllegalArgumentException(
          "poly_hash(str[, base, mod]) takes 1 or 3 arguments")
      }))
  }
}
