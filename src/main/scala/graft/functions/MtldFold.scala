package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: both directional MTLD factor counts
  * (McCarthy & Jarvis, BRM 2010) of a token array in ONE imperative
  * walk — `struct(n_tokens INT, fcf DOUBLE, fcb DOUBLE)`.
  *
  * Replaces the `text_mtld` query's two `aggregate` higher-order
  * projections (forward, and over `reverse(toks)`). The HOF
  * formulation is semantically right but `ArrayAggregate` evaluates
  * its lambda per element through the interpreted expression walker —
  * Catalyst rebuilt a 4-field struct state plus an `array_contains`
  * scan per token, twice per document (it was the #2 bench row three
  * rounds running). Here the same grid math runs as a JVM loop: the
  * forward and backward folds advance together over one pass
  * (index i and n-1-i), run-distinct membership is a HashSet instead
  * of an O(run) array scan, and `doGenCode` emits a single static
  * call so the expression stays inside whole-stage codegen (the
  * [[JaroWinkler]] pattern).
  *
  * Bit-parity contract with the HOF formulation and the DuckDB
  * recursive-CTE oracle (both engines fold identical token order with
  * identical double compares):
  *  - TTR dip test: `(typec+isNew) / (tokc+1) < 0.72` evaluated in
  *    IEEE doubles exactly as `aggregate`'s
  *    `typec2.cast(double) / tokc2.cast(double) < lit(0.72)`.
  *  - Partial-factor remainder: `factors + (1 − typec/tokc) / (1−0.72)`
  *    with `1−0.72` folded to the SAME double the HOF folded in
  *    `lit(1.0 - MtldThreshold)` (the oracle interpolates the
  *    identical literal).
  *  - Zero-token finish publishes 0.0 (the caller's `fc > 0` guard
  *    turns that into a NULL direction), matching `aggregate`'s
  *    finish over the zero state.
  * ExtSpec pins the parity: native ≡ the original dual-HOF plan on
  * the corpus plus adversarial edges (empty, all-distinct,
  * single-token-repeated, reset-at-boundary docs).
  */
case class MtldFold(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"mtld_fold requires array<string> input, got $t")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("fcf", DoubleType, nullable = false),
    StructField("fcb", DoubleType, nullable = false)))

  override def prettyName: String = "mtld_fold"

  override def nullSafeEval(toks: Any): Any =
    MtldFold.compute(toks.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MtldFold.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): MtldFold =
    copy(child = newChild)
}

object MtldFold {

  val Threshold = 0.72
  private val PartialDenom = 1.0 - Threshold

  /** Column-API entry point. */
  def apply(toks: Column): Column =
    GraftColumnBridge.column(new MtldFold(GraftColumnBridge.expression(toks)))

  /** One fused pass: forward state consumes element i while backward
    * state consumes element n-1-i. Null elements cannot occur (the
    * tokenizer is a regex split) but degrade to array_contains
    * semantics anyway: HashSet admits null like `array_contains`
    * treats it. Called from generated code — stays public and
    * allocation-light (two sets, reused across resets via clear()).
    */
  def compute(toks: ArrayData): InternalRow = {
    val n = toks.numElements()
    val fwdTypes = new java.util.HashSet[UTF8String]()
    val bwdTypes = new java.util.HashSet[UTF8String]()
    var fwdTokc, fwdTypec, fwdFactors = 0
    var bwdTokc, bwdTypec, bwdFactors = 0
    var i = 0
    while (i < n) {
      val tf = toks.getUTF8String(i)
      val tb = toks.getUTF8String(n - 1 - i)
      // forward step
      val fNew = if (fwdTypes.contains(tf)) 0 else 1
      val fTypec2 = fwdTypec + fNew
      val fTokc2 = fwdTokc + 1
      if (fTypec2.toDouble / fTokc2.toDouble < Threshold) {
        fwdTypes.clear(); fwdTokc = 0; fwdTypec = 0; fwdFactors += 1
      } else {
        if (fNew == 1) fwdTypes.add(tf)
        fwdTokc = fTokc2; fwdTypec = fTypec2
      }
      // backward step (same math over the reversed order)
      val bNew = if (bwdTypes.contains(tb)) 0 else 1
      val bTypec2 = bwdTypec + bNew
      val bTokc2 = bwdTokc + 1
      if (bTypec2.toDouble / bTokc2.toDouble < Threshold) {
        bwdTypes.clear(); bwdTokc = 0; bwdTypec = 0; bwdFactors += 1
      } else {
        if (bNew == 1) bwdTypes.add(tb)
        bwdTokc = bTokc2; bwdTypec = bTypec2
      }
      i += 1
    }
    def finish(factors: Int, tokc: Int, typec: Int): Double =
      factors.toDouble + (if (tokc > 0)
        (1.0 - typec.toDouble / tokc.toDouble) / PartialDenom else 0.0)
    InternalRow(n, finish(fwdFactors, fwdTokc, fwdTypec),
      finish(bwdFactors, bwdTokc, bwdTypec))
  }
}
