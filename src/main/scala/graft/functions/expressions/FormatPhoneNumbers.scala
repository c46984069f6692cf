package graft.functions.expressions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Israeli phone-number formatting (helpers.py:17-55
  * `transform_phone_numbers`), one compiled pass per row: split the
  * newline-separated value, whitespace-strip each entry (regex `\s` char
  * set — Python `str.strip()` fidelity), drop empties, extract digits,
  * strip a +972 country prefix (restoring the leading 0), then group
  * 9-digit 0x as xx-xxx-xxxx, 10-digit 0x as xxx-xxx-xxxx and 10-digit
  * 1-800-style as x-xxx-xxxxxx; entries fitting no pattern keep their
  * trimmed text.
  *
  * Why native: the HOF form ran an interpreted lambda per entry with
  * three regexp_replace passes and repeated substring allocation — on the
  * q49/q64 profiles and inside every CardPipeline run. Equality with the
  * HOF composition is property-tested in PropertySpec.
  */
case class FormatPhoneNumbers(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    FormatPhoneNumbers.format(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = FormatPhoneNumbers.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.format($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): FormatPhoneNumbers =
    copy(child = newChild)
  override def prettyName: String = "format_phone_numbers"
}

object FormatPhoneNumbers {

  def apply(raw: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      FormatPhoneNumbers(org.apache.spark.sql.graftbridge.ColumnBridge.expression(raw)))

  /** Java-regex `\s` class (what the HOF form's regexp_replace matched). */
  private def isWs(ch: Char): Boolean =
    ch == ' ' || ch == '\t' || ch == '\n' || ch == 11.toChar || ch == '\f' || ch == '\r'

  private def group(d: String, cuts: Int*): String = {
    val sb = new java.lang.StringBuilder(d.length + cuts.length)
    var start = 0
    var first = true
    for (c <- cuts :+ d.length) {
      if (!first) sb.append('-')
      sb.append(d, start, c)
      start = c
      first = false
    }
    sb.toString
  }

  /** Called from generated code — one compiled pass over the raw value. */
  def format(raw: UTF8String): GenericArrayData = {
    val s = raw.toString
    val out = ArrayBuffer.empty[Any]
    var start = 0
    while (start <= s.length) {
      val nl = s.indexOf('\n', start)
      val end = if (nl < 0) s.length else nl
      // whitespace-strip the entry
      var a = start
      var b = end
      while (a < b && isWs(s.charAt(a))) a += 1
      while (b > a && isWs(s.charAt(b - 1))) b -= 1
      if (b > a) {
        val n = s.substring(a, b)
        val digits = n.filter(c => c >= '0' && c <= '9')
        // +972 prefix strip with leading-0 restore (d0 past 10 digits only)
        val d =
          if (digits.length > 10 && digits.startsWith("972")) {
            val after = digits.substring(3)
            if (after.length < 10 && !after.startsWith("0")) "0" + after else after
          } else digits
        val grouped =
          if (d.length == 9 && d.charAt(0) == '0') group(d, 2, 5)
          else if (d.length == 10 && d.charAt(0) == '0') group(d, 3, 6)
          else if (d.length == 10 && d.charAt(0) == '1') group(d, 1, 4)
          else n
        out += UTF8String.fromString(grouped)
      }
      start = if (nl < 0) s.length + 1 else nl + 1
    }
    new GenericArrayData(out.toArray)
  }
}
