package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ext.Dedup

/** Shared-scan funnel measurement (dev tool; VERDICT r15 ask #2): the
  * standalone `dedup_lsh_occupancy` gauge re-pays the full L·B
  * hyperplane grid the pair pipeline also pays — 27.6 s of pure
  * recompute at the 30× corpus, 93.6 s at 100× (BENCHNOTES r15).
  * [[Dedup.embeddingLshFunnel]] derives gauge AND pairs from ONE
  * persisted bucket-keys pass; this main times the four legs on a
  * (scaled) corpus at the RE-BANDING POLICY planes (the configuration
  * a production funnel actually gates at — the fixed-B contract
  * planes saturate at 30×, which is the gauge's own demo):
  *
  *   - standalone_gauge / standalone_pairs: today's two recomputes
  *   - funnel_gauge: gauge + cache population (the gate runs first)
  *   - funnel_pairs: pairs FROM the populated cache — the leg whose
  *     delta vs standalone_pairs is the funnel's saving; the gauge's
  *     marginal cost in the funnel is funnel_total − standalone_pairs.
  *
  * Usage:
  *   SPARK_DRIVER_MEM=8g sbt "runMain graft.tools.FunnelEval <dir>"
  * Prints one JSON line per leg.
  */
object FunnelEval {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = graft.queries.Inventory.rebalanced(
      spark.read.parquet(s"$dir/embeddings.parquet"), "vec_id")
    val n = e.count()
    // the policy's documented operating point (BENCHNOTES r14/r15:
    // B=9/L=16 at 30×, B=11/L=24 at 100×, recall 1.000) — NOT the
    // harness-contract τ=0.4, whose S-curve needs L≈220 tables (a
    // ~2000-expression bucket projection that OOMs janino's codegen;
    // re-banding at low τ is where a production run switches from
    // random projections to the MinHash family)
    val tau = 0.85
    val planes = Dedup.rebandedPlanes(n, tau)
    val (b, l) = Dedup.rebandedParams(n, tau)

    def timed(tag: String)(body: => Long): Double = {
      val t0 = System.nanoTime()
      val rows = body
      val dt = (System.nanoTime() - t0) / 1e9
      println(s"""{"config":"$tag","rows":$n,"bits":$b,"tables":$l,""" +
        s""""out_rows":$rows,"wall_s":$dt,"dir":"$dir"}""")
      dt
    }

    timed("standalone_gauge") { Dedup.lshOccupancyOf(e, planes).count() }
    timed("standalone_pairs") {
      Dedup.embeddingLshPairs(e, tau, planes).count()
    }
    val f = Dedup.embeddingLshFunnel(e, tau, planes)
    val g = timed("funnel_gauge") { f.occupancy.count() }
    val p = timed("funnel_pairs") { f.pairs.count() }
    println(s"""{"config":"funnel_total","rows":$n,"wall_s":${g + p},"dir":"$dir"}""")
    f.unpersist()
    spark.stop()
  }
}
