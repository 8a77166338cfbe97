package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Jaro–Winkler similarity of two string
  * columns — the record-linkage scorer (census/MDM lineage) that
  * rewards shared prefixes, complementing levenshtein's uniform edit
  * cost.
  *
  * Spark ships no Jaro–Winkler; the alternatives are a Scala UDF
  * (opaque to codegen, per-row encoder traffic) or shipping the loop
  * here: a single static JVM method shared BIT-FOR-BIT by the
  * interpreted path and the generated code (`doGenCode` emits one
  * static call, so the expression stays inside whole-stage codegen —
  * the CosineSimilarity pattern, with the loop hoisted to a method
  * because a 40-line dual-pointer algorithm has no business being a
  * codegen template string).
  *
  * Operates on BYTES, not codepoints — deliberately: the DuckDB
  * oracle's `jaro_winkler_similarity` (RapidFuzz lineage) is
  * byte-based, and the library's linkage keys are ASCII-projected
  * anyway ([[graft.ext.Dedup.snmKey]]), where bytes == codepoints.
  * Standard parameters, matching the oracle exactly: match window
  * ⌊max(|a|,|b|)/2⌋−1, transpositions = half the out-of-order
  * matches, Winkler boost `sim + ℓ·0.1·(1−sim)` for sim > 0.7 with
  * ℓ = shared prefix capped at 4. Verified value-identical to DuckDB
  * on the classic literature pairs (martha/marhta 0.9611…,
  * dixon/dicksonx 0.8133…, dwayne/duane 0.84) and on every SNM
  * candidate pair of the fixture corpus (the `dedup_record_linkage`
  * oracle gate).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"jaro_winkler requires (string, string) inputs, got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(
      a.asInstanceOf[UTF8String].getBytes, b.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler.similarity($a.getBytes(), $b.getBytes());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      new JaroWinkler(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** The shared scalar kernel (called from generated code — must stay
    * public, static-forwardable, and allocation-light). IEEE op order
    * is part of the contract: `(m/|a| + m/|b| + (m−t)/m) / 3`, then
    * the boost — the same sequence the oracle's implementation runs,
    * so results are bit-identical, not just close.
    */
  def similarity(a: Array[Byte], b: Array[Byte]): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 && lb == 0) return 1.0
    if (la == 0 || lb == 0) return 0.0
    if (java.util.Arrays.equals(a, b)) return 1.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb, i + window + 1)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!mb(j) && a(i) == b(j)) {
          ma(i) = true; mb(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    var sim = (m.toDouble / la + m.toDouble / lb + (m - t).toDouble / m) / 3.0
    if (sim > 0.7) {
      var prefix = 0
      val cap = math.min(4, math.min(la, lb))
      while (prefix < cap && a(prefix) == b(prefix)) prefix += 1
      sim = sim + prefix * 0.1 * (1.0 - sim)
    }
    sim
  }
}
