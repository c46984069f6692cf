package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** w-token shingles of a token array, natively: window i joins tokens
  * [i, i+w) with a single space; arrays shorter than w produce one
  * shingle joining everything (the same contract as the HOF form in
  * Dedup.shingles, asserted equal in PropertySpec).
  *
  * Why native: shingling executes once per TOKEN of the whole corpus —
  * the single most-executed path in a dedup pipeline — and the HOF
  * composition (`transform(sequence(...), i => array_join(slice(...)))`)
  * is CodegenFallback, allocating a slice copy and lambda frame per
  * window. Here each window is one UTF8String.concatWs over the backing
  * array, inside the stage's generated code.
  */
case class Shingles(child: Expression, w: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(w >= 1, "shingle width must be >= 1")

  // analysis-time gate for the SQL-registered form: a non-array<string>
  // child would reinterpret raw Unsafe bytes as (offset, length) pairs —
  // garbage or a JVM fault, never an error
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val sep = Shingles.Sep
    if (n < w) {
      val all = new Array[UTF8String](n)
      var i = 0
      while (i < n) { all(i) = toks.getUTF8String(i); i += 1 }
      new GenericArrayData(Array[Any](UTF8String.concatWs(sep, all: _*)))
    } else {
      val out = new Array[Any](n - w + 1)
      var i = 0
      while (i < out.length) {
        val win = new Array[UTF8String](w)
        var j = 0
        while (j < w) { win(j) = toks.getUTF8String(i + j); j += 1 }
        out(i) = UTF8String.concatWs(sep, win: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val out = ctx.freshName("out")
      val win = ctx.freshName("win")
      val sep = ctx.addReferenceObj("sep", Shingles.Sep, classOf[UTF8String].getName)
      val u = classOf[UTF8String].getName
      s"""
         |int $n = $c.numElements();
         |Object[] $out;
         |if ($n < $w) {
         |  $u[] $win = new $u[$n];
         |  for (int $j = 0; $j < $n; $j++) { $win[$j] = $c.getUTF8String($j); }
         |  $out = new Object[]{ $u.concatWs($sep, $win) };
         |} else {
         |  $out = new Object[$n - $w + 1];
         |  for (int $i = 0; $i < $out.length; $i++) {
         |    $u[] $win = new $u[$w];
         |    for (int $j = 0; $j < $w; $j++) { $win[$j] = $c.getUTF8String($i + $j); }
         |    $out[$i] = $u.concatWs($sep, $win);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
  override def prettyName: String = "shingles"
}

object Shingles {
  private val Sep: UTF8String = UTF8String.fromString(" ")

  def apply(tokens: Column, w: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      Shingles(org.apache.spark.sql.graftbridge.ColumnBridge.expression(tokens), w))
}
