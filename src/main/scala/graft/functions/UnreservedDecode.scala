package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: RFC 3986 §2.3/§6.2.2.2 percent-decode
  * of the UNRESERVED set only (ALPHA / DIGIT / `-` `.` `_` `~`), one
  * left-to-right pass. `%7Ealice` and `~alice` are the same resource;
  * escapes of RESERVED characters (`%2F`, `%3F`, …) stay encoded —
  * decoding those would change the URL's structure. Malformed or
  * reserved escapes pass through literally and scanning continues
  * after the `%`, so the operation is a true single pass: decoded
  * output is never re-examined, which makes it idempotent by
  * construction (no unreserved decode can mint a new `%` — percent
  * itself is not unreserved).
  *
  * Why a custom `Expression` (SURVEY.md §7.1-7, preference order (b)):
  * the composed alternative is a 66-deep `regexp_replace` chain — one
  * pattern per unreserved character — which (measured, BENCHNOTES r17)
  * made the url-canonicalization registry row 6.9× slower even when
  * guarded behind an `instr` check, and whose sequential semantics
  * differ from a single pass on crafted inputs (`%4%41`: the chain
  * first rewrites `%41`→`A`, minting a fresh `%4A` that a LATER
  * pattern then decodes to `J`; one pass yields `%4A` and stops). The
  * DuckDB oracle replays the exact single-pass semantics with a
  * split-on-`%` + per-piece decode (see `Dedup.canonicalUrl`'s oracle
  * SQL), so the engines agree on every input, not just escape-free
  * ones. `doGenCode` delegates to the same static helper, keeping the
  * expression inside whole-stage codegen with a bit-identical
  * interpreted path.
  */
case class UnreservedDecode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"unreserved_decode requires a string input, got $t")
    }

  override def prettyName: String = "unreserved_decode"

  protected override def nullSafeEval(input: Any): Any =
    UnreservedDecode.decode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnreservedDecode.decode($c)")

  override protected def withNewChildInternal(newChild: Expression): UnreservedDecode =
    copy(child = newChild)
}

object UnreservedDecode {

  /** Column-API entry point. */
  def apply(s: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      new UnreservedDecode(org.apache.spark.sql.GraftColumnBridge.expression(s)))

  private def isUnreserved(v: Int): Boolean =
    (v >= 'A' && v <= 'Z') || (v >= 'a' && v <= 'z') ||
      (v >= '0' && v <= '9') || v == '-' || v == '.' || v == '_' || v == '~'

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else -1

  /** Static helper shared by the interpreted and generated paths. The
    * escape-free fast path returns the input UTF8String unchanged —
    * the overwhelmingly common case pays one byte scan, zero
    * allocation. Escapes are ASCII by definition, so the decode loop
    * can work on the Java string safely (multi-byte characters pass
    * through untouched).
    */
  def decode(s: UTF8String): UTF8String = {
    val str = s.toString
    if (str.indexOf('%') < 0) return s
    val n = str.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      if (c == '%' && i + 2 < n) {
        val h = hexVal(str.charAt(i + 1))
        val l = hexVal(str.charAt(i + 2))
        val v = if (h >= 0 && l >= 0) (h << 4) | l else -1
        if (v >= 0 && isUnreserved(v)) { sb.append(v.toChar); i += 3 }
        else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    UTF8String.fromString(sb.toString)
  }
}
