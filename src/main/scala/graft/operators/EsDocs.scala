package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Search-document derivation (SURVEY.md §2.D — to_es.py).
  *
  * `textFields` re-expresses the reference's recursive
  * `select_text_fields` (to_es.py:145): walk every nested field of a
  * document, skip excluded keys, and collect the regex hits from every
  * string leaf. The reference recurses over Python dicts at runtime; a
  * DataFrame schema is static, so the recursion happens at PLAN BUILD
  * time over the schema tree and compiles into one array expression —
  * no per-row reflection, and Catalyst sees a plain projection.
  */
object EsDocs {

  /** All regex matches from every string leaf under `c` (schema-directed
    * recursion), in schema order — mirroring select_text_fields' generator
    * order. `exclude` skips struct keys like the reference's
    * data_sources/service_urls/... exclusion list.
    *
    * Native single-pass walker (expressions.TextFieldsExtract): the
    * composed form below is plan-time recursion, but arrays of structs
    * degrade its per-element step to an interpreted transform lambda;
    * the walker runs the whole document in compiled code. Equality is
    * property-tested in PropertySpec. */
  def textFields(c: Column, dt: DataType, pattern: String,
                 exclude: Set[String] = Set.empty): Column =
    // coalesce: a NULL document must yield [] (the composed form's
    // contract — its coalesce keeps concat well-defined), while the
    // native walker's UnaryExpression null handling would return NULL
    coalesce(
      graft.functions.expressions.TextFieldsExtract(c, dt, pattern, exclude),
      array().cast("array<string>"))

  /** The original composed form of [[textFields]] — kept as the
    * property-test reference for the native walker. */
  private[graft] def textFieldsHof(c: Column, dt: DataType, pattern: String,
                 exclude: Set[String] = Set.empty): Column = dt match {
    case StringType =>
      // regexp_extract_all returns [] on no match; null strings yield null
      // -> coalesce keeps concat well-defined.
      coalesce(regexp_extract_all(c, lit(pattern), lit(0)), array())
    case st: StructType =>
      val parts = st.fields.toSeq
        .filterNot(f => exclude.contains(f.name))
        .map(f => textFieldsHof(c.getField(f.name), f.dataType, pattern, exclude))
      if (parts.isEmpty) array() else concat(parts: _*)
    case ArrayType(et, _) =>
      coalesce(flatten(transform(c, x => textFieldsHof(x, et, pattern, exclude))), array())
    case _ => array()
  }
}
