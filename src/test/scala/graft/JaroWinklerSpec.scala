package graft

import org.apache.spark.sql.functions._

import graft.functions.JaroWinkler

/** The native Jaro–Winkler expression: literature values, kernel
  * properties, codegen-vs-kernel agreement, and SQL registration.
  */
class JaroWinklerSpec extends SparkSpec {

  // The classic pairs every JW implementation is validated against
  // (Winkler 1990 / RapidFuzz test vectors) — DuckDB returns these
  // exact doubles too (prototype-verified), which is what makes
  // dedup_record_linkage's raw-double tier comparisons oracle-safe.
  private val known = Seq(
    ("martha", "marhta", 0.9611111111111111),
    ("dwayne", "duane", 0.8400000000000001),
    ("dixon", "dicksonx", 0.8133333333333332),
    ("kitten", "sitting", 0.746031746031746),
    ("CRATE", "TRACE", 0.7333333333333334),
    ("aaaa", "aaa", 0.9416666666666667),
    ("abc", "abc", 1.0),
    ("abc", "", 0.0),
    ("a", "b", 0.0))

  test("kernel reproduces the literature values exactly") {
    known.foreach { case (a, b, want) =>
      val got = JaroWinkler.similarity(a.getBytes("UTF-8"), b.getBytes("UTF-8"))
      assert(got === want, s"jw($a, $b)")
    }
  }

  test("kernel is symmetric and bounded on random ASCII strings") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val a = Array.fill(rnd.nextInt(20))(('a' + rnd.nextInt(4)).toByte)
      val b = Array.fill(rnd.nextInt(20))(('a' + rnd.nextInt(4)).toByte)
      val ab = JaroWinkler.similarity(a, b)
      assert(ab === JaroWinkler.similarity(b, a))
      assert(ab >= 0.0 && ab <= 1.0)
    }
  }

  test("expression (codegen path) equals the kernel on dataframe rows") {
    import spark.implicits._
    val df = known.map { case (a, b, _) => (a, b) }.toDF("a", "b")
    val got = df.select(col("a"), col("b"), JaroWinkler(col("a"), col("b")).as("jw"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got === known)
    // NULL propagates
    val nl = df.limit(1).select(JaroWinkler(lit(null).cast("string"), col("b")))
    assert(nl.head.isNullAt(0))
  }

  test("GraftExtensions registers jaro_winkler for spark.sql users") {
    import org.apache.spark.sql.SparkSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder().master("local[2]")
        .withExtensions(new graft.functions.GraftExtensions).getOrCreate()
      val r = s2.sql("SELECT jaro_winkler('martha', 'marhta') AS j").head.getDouble(0)
      assert(r === 0.9611111111111111)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
