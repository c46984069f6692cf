package graft.functions.expressions

import java.util.regex.Pattern

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native schema-directed text-field extraction (to_es.py:145
  * `select_text_fields`): walk every nested field of a document value,
  * skip excluded keys, and collect the regex hits from every string
  * leaf — depth-first in schema order, exactly the traversal the
  * composed form (EsDocs.textFieldsHof) produces.
  *
  * Why native: the composed form is pure plan-time recursion — ideal
  * until the document contains an ARRAY of structs, where the per-element
  * step becomes an interpreted `transform` lambda running
  * regexp_extract_all per child row (q45's profile). Here the whole
  * document walks in one compiled pass: the walker closure tree is built
  * ONCE from the schema when the expression is bound, so per-row work is
  * just typed accessor calls and one precompiled regex matcher.
  * Equality with the composed form is pinned in EsQueriesSpec-style
  * tests (PropertySpec) on q45's document shape.
  */
case class TextFieldsExtract(child: Expression, pattern: String, exclude: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val walker =
    new TextFieldsExtract.DocWalker(child.dataType, pattern, exclude.toSet)

  override protected def nullSafeEval(input: Any): Any = walker.run(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val w = ctx.addReferenceObj("walker", walker,
        classOf[TextFieldsExtract.DocWalker].getName)
      s"${ev.value} = $w.run($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): TextFieldsExtract =
    copy(child = newChild)
  override def prettyName: String = "text_fields_extract"
}

object TextFieldsExtract {

  def apply(doc: Column, dt: DataType, pattern: String, exclude: Set[String]): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      TextFieldsExtract(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(doc),
        pattern, exclude.toSeq.sorted))

  /** Serializable schema-bound walker; the closure tree rebuilds lazily on
    * each executor from (dataType, pattern, exclude). */
  final class DocWalker(dt: DataType, pattern: String, exclude: Set[String])
      extends Serializable {

    @transient private lazy val regex: Pattern = Pattern.compile(pattern)
    @transient private lazy val walk: (Any, ArrayBuffer[Any]) => Unit = build(dt)

    private def build(t: DataType): (Any, ArrayBuffer[Any]) => Unit = t match {
      case StringType =>
        (v, out) => {
          val m = regex.matcher(v.asInstanceOf[UTF8String].toString)
          while (m.find()) out += UTF8String.fromString(m.group())
        }
      case st: StructType =>
        // precompute (ordinal, accessor type, sub-walker) for kept fields
        val steps = st.fields.zipWithIndex.toSeq
          .filterNot { case (f, _) => exclude.contains(f.name) }
          .map { case (f, i) => (i, f.dataType, build(f.dataType)) }
        (v, out) => {
          val row = v.asInstanceOf[InternalRow]
          steps.foreach { case (i, ft, sub) =>
            if (!row.isNullAt(i)) sub(row.get(i, ft), out)
          }
        }
      case ArrayType(et, _) =>
        val sub = build(et)
        (v, out) => {
          val arr = v.asInstanceOf[ArrayData]
          val n = arr.numElements()
          var j = 0
          while (j < n) {
            if (!arr.isNullAt(j)) sub(arr.get(j, et), out)
            j += 1
          }
        }
      case _ => (_, _) => ()
    }

    /** Called from generated code. */
    def run(value: Any): GenericArrayData = {
      val out = ArrayBuffer.empty[Any]
      walk(value, out)
      new GenericArrayData(out.toArray)
    }
  }
}
