package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the first 60 bits of md5(s) as a
  * non-negative long — the engine's portable content-hash key
  * (see `Dedup.hash60`), value-identical to the composed SQL
  * `conv(substring(md5(encode(s, 'UTF-8')), 1, 15), 16, 10)` and to
  * the DuckDB oracle replay `('0x' || substr(md5(s), 1, 15))::BIGINT`.
  *
  * Why a custom `Expression` (SURVEY.md §7.1-7, preference order (b)):
  * the composed form materializes a 32-char hex STRING per row, takes
  * a substring, and re-parses it base-16 — three UTF8String
  * allocations and a digit loop on the hottest path in the library
  * (every shingle/span/fingerprint/sample operator hashes through
  * it). This expression digests the raw UTF-8 bytes and assembles the
  * 60-bit value directly from the first 8 digest bytes: zero hex
  * round-trip, one thread-local MessageDigest (the built-in `md5`
  * constructs a fresh digest per call via commons-codec). `doGenCode`
  * delegates to the same static helper, so the expression stays
  * inside whole-stage codegen and the interpreted path is
  * bit-identical by construction.
  *
  * Measured honestly (BENCHNOTES round 8): sf0.1 wall-clock on the
  * hash-heavy queries is UNCHANGED within this box's noise band — the
  * md5 block computation dominates and the hex round-trip it removes
  * is a few percent of those queries' cost. The win is allocation/GC
  * pressure (three fewer short-lived strings per hashed row, which a
  * memory-bound 1000-executor run does feel), not single-node seconds;
  * the expression is kept for that and for the `hash60` SQL surface.
  *
  * 60 bits (not 64) because the value must survive the oracle's
  * BIGINT parse of 15 hex digits — always non-negative, never
  * overflowing.
  */
case class Hash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hash60 requires a string input, got $t")
    }

  override def prettyName: String = "hash60"

  protected override def nullSafeEval(input: Any): Any =
    Hash60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash60 =
    copy(child = newChild)
}

object Hash60 {

  /** Column-API entry point. */
  def apply(s: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      new Hash60(org.apache.spark.sql.GraftColumnBridge.expression(s)))

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 15 hex digits of md5 as a long: digest bytes 0–6 are the
    * first 14 hex digits (56 bits, big-endian), the 15th digit is the
    * high nibble of byte 7.
    */
  def hash(s: UTF8String): Long = {
    val md = digest.get()
    md.reset()
    val b = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) {
      v = (v << 8) | (b(i) & 0xffL)
      i += 1
    }
    (v << 4) | ((b(7) & 0xf0L) >>> 4)
  }
}
