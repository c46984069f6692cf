package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFKC + case-fold normalization — the text-normalization
  * standard for exact-dedup / holdout keys that `lower(trim(...))`
  * approximates: compatibility forms collapse (fullwidth Ｃａｆｅ →
  * cafe, ligature ﬁ → fi, circled ① → 1, no-break / ideographic spaces
  * → space), combining sequences compose, and case maps fold (ß → ss
  * via the ROOT-locale full lowercase mapping).
  *
  * Realized as NFKC ∘ lowercase(ROOT) ∘ NFKC over `java.text.Normalizer`
  * (public JDK Unicode tables — the same normalize-fold-normalize
  * composition as Unicode's NFKC_Casefold, with String.toLowerCase
  * standing in for full case folding; the two differ only on a handful
  * of titlecase/Cherokee mappings, documented here rather than silently
  * approximated away).
  *
  * Codegen calls the static fold — one virtual call per row around an
  * intrinsically table-driven transform (same posture as the JDK-codec
  * media expressions); the expression stays inside whole-stage codegen
  * so upstream/downstream projections still fuse.
  */
case class NfkcFold(child: Expression) extends UnaryExpression {

  // Applied only through the typed wrapper / SQL builder below (string
  // input enforced there with an explicit cast), like PolyHash.
  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(NfkcFold.fold(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = NfkcFold.getClass.getName.stripSuffix("$")
      s"${ev.value} = UTF8String.fromString($cls.fold($c.toString()));"
    })

  override protected def withNewChildInternal(newChild: Expression): NfkcFold =
    copy(child = newChild)
  override def prettyName: String = "nfkc_fold"
}

object NfkcFold {
  import java.text.Normalizer

  /** NFKC → full lowercase (ROOT) → NFKC. The second normalize closes
    * the composition: lowercasing can denormalize (e.g. İ → i + U+0307
    * needs recomposition). */
  def fold(s: String): String = {
    val nfkc = Normalizer.normalize(s, Normalizer.Form.NFKC)
    Normalizer.normalize(nfkc.toLowerCase(java.util.Locale.ROOT), Normalizer.Form.NFKC)
  }

  /** Column wrapper (Spark 4 Columns wrap ColumnNodes, not Expressions). */
  def apply(c: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      NfkcFold(org.apache.spark.sql.graftbridge.ColumnBridge.expression(c.cast(StringType))))
}
