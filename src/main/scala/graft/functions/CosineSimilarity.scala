package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity of two FLOAT-array
  * columns, accumulated in double.
  *
  * Why a custom `Expression` (SURVEY.md §7.1-7, preference order (b)):
  * the composable formulation — `aggregate(zip_with(a, b, _*_), ...)`
  * — is semantically identical but higher-order functions evaluate
  * interpreted (no codegen) and allocate a lambda frame per element.
  * This expression emits a single fused Java loop via `doGenCode`, so
  * it stays inside whole-stage codegen; per-row cost drops from three
  * interpreted array folds to one branch-free loop. Interpreted
  * `nullSafeEval` is kept for completeness (and matches the codegen
  * path bit-for-bit: same accumulation order).
  *
  * Mismatched lengths score over the common prefix; empty arrays give
  * NaN (0/0), which callers filter or never produce. A NULL array
  * element makes the whole result NULL (the checks are only generated
  * when the input type says elements can be null, so the
  * containsNull=false hot path stays a branch-free loop).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"cosine_similarity requires array<float|double> inputs, got ($l, $r)")
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

  override def prettyName: String = "cosine_similarity"

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
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
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
         |  double $na = 0.0;
         |  double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $xi = $getX;
         |    final double $yi = $getY;
         |    $dot += $xi * $yi;
         |    $na += $xi * $xi;
         |    $nb += $yi * $yi;
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {

  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      new CosineSimilarity(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
