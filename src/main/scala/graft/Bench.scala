package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): run every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, print ONE JSON line with per-query seconds.
  *
  * Queries execute through the `noop` sink so the full plan — every
  * column, every operator — actually runs (a bare `count()` would let
  * Catalyst prune projections and undercount the work).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Codegen/JIT warmup: every query has its own generated code, and a
    // cold first run is dominated by compiling it (measured 5.3 s cold
    // vs 0.9 s warm for the shingle pipeline alone) — noise that says
    // nothing about throughput at scale. Warm EVERY query shape once on
    // the smallest dataset available (falling back to sfDir), so the
    // measured pass below reports steady-state execution. Warmup
    // failures must never abort the bench.
    val warmDir = Seq("/root/testdata/sf0.001", sfDir)
      .find(p => new java.io.File(p).isDirectory).getOrElse(sfDir)
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] warmup $name failed: ${e.getMessage}") }
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}") }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-28s $dt%8.2f s")
      name -> dt
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val blob = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(blob)
    // The driver captures only a ~3.5 KB TAIL of stdout, and the
    // 100+-query blob no longer fits in it (BENCH_r06/r07 both landed
    // with `parsed: null` — the window starts mid-JSON). Two-part fix:
    // the full blob is persisted to target/bench.json (above the tail
    // problem entirely), and a COMPACT summary line — small enough to
    // always sit whole inside any tail window — is printed LAST so a
    // tail-parser recovers the total even when the full blob scrolls
    // out. Per-query detail lives in the file and in BENCHNOTES.
    try {
      val out = java.nio.file.Paths.get("target", "bench.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.write(out, (blob + "\n").getBytes("UTF-8"))
    } catch { case e: Throwable => System.err.println(s"[bench] file write failed: ${e.getMessage}") }
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"detail":"target/bench.json","sf":"$sfDir"}""")
    spark.stop()
  }
}
