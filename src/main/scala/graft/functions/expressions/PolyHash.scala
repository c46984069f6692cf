package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd polynomial rolling hash: acc = (acc*base + char) % mod
  * over the string's UTF-16 units.
  *
  * This is the custom-Expression extension path (SURVEY.md §6): the
  * per-character loop can't be expressed efficiently with built-ins —
  * the array-HOF composition (`transform`/`aggregate` over substr+ascii)
  * is CodegenFallback and allocates per character, while this compiles
  * into the stage's generated Java as a tight loop.
  */
case class PolyHash(child: Expression, base: Long = 31L, mod: Long = 1000000007L)
    extends UnaryExpression {

  // the fold computes (acc * base + char) % mod in 64-bit arithmetic:
  // acc < mod, char < 2^16, so mod * base + 2^16 must stay below
  // Long.MaxValue or the hash silently wraps (and mod <= 0 divides by
  // zero per row at execution time) — fail at construction instead
  require(base > 0 && mod > 0 && mod <= (Long.MaxValue - 65536L) / base,
    s"poly_hash: need base > 0, mod > 0, mod*base+2^16 <= Long.MaxValue (got base=$base, mod=$mod)")

  // Applied only through the typed wrapper below (string input enforced
  // there with an explicit cast), so no ExpectsInputTypes machinery.
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.eval(input.asInstanceOf[UTF8String].toString, base, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |java.lang.String $s = $c.toString();
         |long $acc = 0L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  $acc = ($acc * ${base}L + $s.charAt($i)) % ${mod}L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  def eval(s: String, base: Long, mod: Long): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) { acc = (acc * base + s.charAt(i)) % mod; i += 1 }
    acc
  }

  /** Column wrapper (Spark 4 Columns wrap ColumnNodes, not Expressions). */
  def apply(c: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      PolyHash(org.apache.spark.sql.graftbridge.ColumnBridge.expression(c.cast(StringType))))
}
