package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ext.Dedup

/** Span-removal funnel measurement (dev tool; VERDICT r16 ask #3): a
  * production run wants the per-doc removal counts AND the cleaned
  * corpus. Standalone, each row pays the window/hash HOF pass twice
  * (once per side of the keep-first join-back); the funnel persists
  * the raw window relation for exactly one flag pass, keeps only the
  * sparse flagged rows cached, and derives both outputs from them.
  *
  * Legs:
  *   - standalone_counts / standalone_cleaned: today's registry rows
  *   - funnel_counts: counts + the shared flag pass (runs first,
  *     populates the cache)
  *   - funnel_cleaned: cleaned FROM the cached flagged rows — the leg
  *     whose delta vs standalone_cleaned is the funnel's saving
  *
  * Usage: sbt "runMain graft.tools.SubstringEval <dir>"
  * Prints one JSON line per leg.
  */
object SubstringEval {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS",
          math.max(cpus.toInt, graft.engine.Partitioning.partitionsFor(
            graft.engine.Partitioning.dirBytes(dir))).toString))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def timed(tag: String)(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      val dt = (System.nanoTime() - t0) / 1e9
      println(s"""{"leg":"$tag","wall_s":$dt,"dir":"$dir"}""")
      dt
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // codegen warmup on the smallest harness corpus
    val warm = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    noop(Dedup.substringCleanDf(warm))
    noop(Dedup.substringCleanedDf(warm))

    timed("standalone_counts") { noop(Dedup.substringCleanDf(docs)) }
    timed("standalone_cleaned") { noop(Dedup.substringCleanedDf(docs)) }
    // the eager flag pass inside substringFunnel is funnel cost — it
    // must sit inside the first timed leg, not before it
    var f: Dedup.SubstringFunnel = null
    try {
      val c = timed("funnel_counts") { f = Dedup.substringFunnel(docs); noop(f.counts) }
      val l = timed("funnel_cleaned") { noop(f.cleaned) }
      println(s"""{"leg":"funnel_total","wall_s":${c + l},"dir":"$dir"}""")
    } finally if (f != null) f.unpersist()
    spark.stop()
  }
}
