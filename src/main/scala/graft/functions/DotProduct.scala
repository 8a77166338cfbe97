package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product of two FLOAT/DOUBLE-array columns, accumulated
  * in double — the production scorer for PRE-NORMALIZED embeddings.
  *
  * Cosine recomputes both norms on every pair: scoring Q queries
  * against an N-vector corpus costs 3·Q·N·dim multiply-adds. At scale
  * the corpus is normalized ONCE at ingest ([[DotProduct.normalized]],
  * O(N·dim)), after which cosine(a,b) == dot(â,b̂) at a third of the
  * per-pair flops. This expression is the fused single-loop codegen
  * for that path; [[CosineSimilarity]] remains the scorer for raw
  * vectors (and the oracle-verified registry queries keep using it so
  * their DuckDB SQL stays the literal cosine formula).
  *
  * Same conventions as [[CosineSimilarity]]: mismatched lengths score
  * the common prefix, a NULL element makes the result NULL (checks
  * generated only when the type admits null elements).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"dot_product requires array<float|double> inputs, got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  private def mayHaveNullElements(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _                          => false
  }

  override def nullable: Boolean =
    super.nullable || mayHaveNullElements(left) || mayHaveNullElements(right)

  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val (lf, rf) = (isFloat(left), isFloat(right))
    if (mayHaveNullElements(left) || mayHaveNullElements(right)) {
      var j = 0
      while (j < n) {
        if (x.isNullAt(j) || y.isNullAt(j)) return null
        j += 1
      }
    }
    var dot = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val getX = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getY = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      val nullGuard =
        if (mayHaveNullElements(left) || mayHaveNullElements(right)) {
          val j = ctx.freshName("j")
          s"""
             |for (int $j = 0; $j < $n && !${ev.isNull}; $j++) {
             |  if ($a.isNullAt($j) || $b.isNullAt($j)) ${ev.isNull} = true;
             |}
           """.stripMargin
        } else ""
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |$nullGuard
         |if (!${ev.isNull}) {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += $getX * $getY;
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {

  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      new DotProduct(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** L2-normalize a vector column once at ingest (the O(N·dim)
    * pre-pass that makes every later pair scoring a plain dot).
    * The norm comes from the fused `DotProduct(v, v)`; the division
    * is a higher-order `transform` — interpreted, but it runs once
    * per VECTOR at write time, not per scored pair.
    *
    * A zero (or empty) vector yields NULL — explicitly, rather than
    * letting non-ANSI 0/0 division produce an array of NULL elements
    * that downstream NULL-element guards would silently turn into
    * NULL scores with no signal at the source.
    */
  def normalized(v: Column): Column = {
    import org.apache.spark.sql.functions._
    val norm = sqrt(DotProduct(v, v))
    when(norm > 0, transform(v, x => x.cast(DoubleType) / norm))
  }
}
