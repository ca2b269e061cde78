package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, BinaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for cosine similarity over
  * `ArrayType(FloatType)` embedding columns.
  *
  * A Scala UDF here would box every element through the encoder on every row;
  * this expression reads the unsafe array buffer directly and participates in
  * whole-stage codegen (`doGenCode` emits a call into the static kernel, so
  * the similarity stays inside the generated loop — no iterator breaks in the
  * hot path of a 100 TB similarity scan).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must be ArrayType(FloatType) — call sites are controlled by
  // VectorFunctions.cosine, so no analyzer-time coercion is registered
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSimilarity.compute(
      a.asInstanceOf[ArrayData].toFloatArray(),
      b.asInstanceOf[ArrayData].toFloatArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.CosineSimilarity$$.MODULE$$.compute($a.toFloatArray(), $b.toFloatArray())")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object CosineSimilarity {
  /** Double-accumulated cosine; NaN for mismatched dims / zero vectors so the
    * caller can filter. Single fused pass — one load per element.
    */
  def compute(x: Array[Float], y: Array[Float]): Double = {
    if (x.length != y.length) return Double.NaN
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < x.length) {
      val a = x(i).toDouble; val b = y(i).toDouble
      dot += a * b; nx += a * a; ny += b * b
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) Double.NaN
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }
}

object VectorFunctions {
  /** Cosine similarity between two float-array columns. */
  def cosine(a: Column, b: Column): Column =
    bridge.column(CosineSimilarity(bridge.expression(a), bridge.expression(b)))
}
