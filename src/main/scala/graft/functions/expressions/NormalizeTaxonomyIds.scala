package graft.functions.expressions

import java.util.regex.Pattern

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native taxonomy-id normalization (to_dp.py:116 `normalize_taxonomy_ids`),
  * the whole five-stage chain in one compiled pass per row:
  *
  *   1. split comma-concatenated values;
  *   2. whitespace-strip each part (regex `\s` char set — Python
  *      `str.strip()` fidelity, NOT Java trim), dropping empties;
  *   3. re-split parts holding >1 full ids smashed together with spaces
  *      (same alternation pattern as the HOF form);
  *   4. canonicalize the singular root `human_situation:` →
  *      `human_situations:`, then strip whitespace and leading/trailing
  *      `,;` punctuation;
  *   5. drop empties and the bare root token, dedup preserving first
  *      appearance.
  *
  * Why native: this chain ran as five chained higher-order array
  * functions — ALL CodegenFallback, each allocating a lambda frame and an
  * intermediate array per element per stage (the top of the round-2 bench
  * profile, VERDICT r2 finding #2). Here the per-row work is one
  * compiled-Scala loop; `doGenCode` keeps the call inside whole-stage
  * codegen. Equality with the HOF composition is property-tested in
  * TaxonomySpec on randomized messy inputs.
  *
  * Null input array → null; null elements are skipped (Python's
  * `emit(None)` drops falsy tokens).
  */
case class NormalizeTaxonomyIds(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    NormalizeTaxonomyIds.normalize(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = NormalizeTaxonomyIds.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.normalize($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): NormalizeTaxonomyIds =
    copy(child = newChild)
  override def prettyName: String = "normalize_taxonomy_ids"
}

object NormalizeTaxonomyIds {

  def apply(ids: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      NormalizeTaxonomyIds(org.apache.spark.sql.graftbridge.ColumnBridge.expression(ids)))

  private val SmashedPat: Pattern =
    Pattern.compile("human_situations:[A-Za-z0-9_:-]+|human_situation:[A-Za-z0-9_:-]+")

  private val Root = "human_situations"
  private val SingularPrefix = "human_situation:"
  private val PluralPrefix = "human_situations:"

  /** Java-regex `\s` class (what the HOF form's regexp_replace matched). */
  private def isWs(ch: Char): Boolean =
    ch == ' ' || ch == '\t' || ch == '\n' || ch == 11.toChar || ch == '\f' || ch == '\r'

  private def stripWs(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && isWs(s.charAt(a))) a += 1
    while (b > a && isWs(s.charAt(b - 1))) b -= 1
    if (a == 0 && b == s.length) s else s.substring(a, b)
  }

  private def stripPunct(s: String): String = {
    var a = 0
    var b = s.length
    while (b > a && (s.charAt(b - 1) == ',' || s.charAt(b - 1) == ';')) b -= 1
    while (a < b && (s.charAt(a) == ',' || s.charAt(a) == ';')) a += 1
    if (a == 0 && b == s.length) s else s.substring(a, b)
  }

  /** Stage 4+5 for one token: canonicalize, strip, gate, dedup-emit. */
  private def emit(token: String, seen: mutable.LinkedHashSet[String]): Unit = {
    val canon =
      if (token.startsWith(SingularPrefix) && !token.startsWith(PluralPrefix))
        PluralPrefix + token.substring(SingularPrefix.length)
      else token
    val stripped = stripPunct(stripWs(canon))
    if (stripped.nonEmpty && stripped != Root) seen.add(stripped)
  }

  /** Called from generated code — one compiled pass over the id array. */
  def normalize(ids: ArrayData): ArrayData = {
    val n = ids.numElements()
    val seen = mutable.LinkedHashSet.empty[String]
    var i = 0
    while (i < n) {
      val raw = ids.getUTF8String(i)
      if (raw != null) {
        val s = raw.toString
        // stage 1: comma split (split keeps interior empties, like
        // split(x, ",") did; they fall out at the empty-part filter)
        var start = 0
        var idx = s.indexOf(',')
        while (start <= s.length) {
          val part0 = if (idx >= 0) s.substring(start, idx) else s.substring(start)
          val part = stripWs(part0)
          if (part.nonEmpty) {
            // stage 3: smashed full ids re-split when the pattern matches
            // more than once (same >1 rule as the HOF form)
            val m = SmashedPat.matcher(part)
            var tokens: List[String] = Nil
            while (m.find()) tokens ::= m.group()
            if (tokens.length > 1) tokens.reverse.foreach(emit(_, seen))
            else emit(part, seen)
          }
          if (idx < 0) start = s.length + 1
          else { start = idx + 1; idx = s.indexOf(',', start) }
        }
      }
      i += 1
    }
    val out = new Array[Any](seen.size)
    var j = 0
    seen.foreach { t => out(j) = UTF8String.fromString(t); j += 1 }
    new GenericArrayData(out)
  }
}
