package graft

import org.apache.spark.sql.functions._

import graft.functions.UnreservedDecode

/** Single-pass RFC 3986 unreserved percent-decode: the URL-dedup
  * canonicalizer's decode stage (see `Dedup.canonicalUrl`), whose
  * DuckDB oracle replays the same split-on-% semantics.
  */
class UnreservedDecodeSpec extends SparkSpec {

  private def decode(rows: Seq[String]): Seq[String] = {
    import spark.implicits._
    rows.toDF("s").select(UnreservedDecode(col("s")).as("d"))
      .collect().toSeq.map(_.getString(0))
  }

  test("decodes unreserved escapes (both hex cases), keeps reserved and malformed ones") {
    val cases = Seq(
      "%7Ealice" -> "~alice",
      "%7ealice" -> "~alice",
      "%41%62%63" -> "Abc",
      "%2D%2E%5F%7E" -> "-._~",
      "a%2Fb" -> "a%2Fb", // '/' is reserved — structure must not change
      "a%3Fq%3D1" -> "a%3Fq%3D1", // '?' '=' reserved
      "%25 stays" -> "%25 stays", // percent itself is not unreserved
      "x%" -> "x%", // trailing stray %
      "x%4" -> "x%4", // truncated escape
      "x%zz" -> "x%zz", // non-hex escape
      "%4%41" -> "%4A", // single pass: decoded output never re-scanned
      "" -> "",
      "é中文%41😀" -> "é中文A😀") // multi-byte neighbors untouched
    val (in, want) = cases.unzip
    assert(decode(in) === want)
  }

  test("idempotent on every valid percent-encoding and on its own output") {
    val valid = Seq("%7Ea", "a%2Fb", "plain", "%41%42", "%25%25")
    val once = decode(valid)
    assert(decode(once) === once)
  }

  test("GraftExtensions registers unreserved_decode for spark.sql users") {
    import org.apache.spark.sql.SparkSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder().master("local[2]")
        .withExtensions(new graft.functions.GraftExtensions).getOrCreate()
      val got = s2.sql("SELECT unreserved_decode('%7Ealice/%41') AS d").head.getString(0)
      assert(got === "~alice/A")
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
