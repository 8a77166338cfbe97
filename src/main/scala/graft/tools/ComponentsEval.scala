package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Clusters

/** Components-algorithm measurement (dev tool, r17): min-label
  * propagation (+ gated pointer jumping) vs the alternating
  * large-star/small-star variant on the two adversarial shapes —
  * a single LONG CHAIN (diameter = n; propagation's worst case,
  * bounded only by the pointer jump) and a HUB-HEAVY graph (many
  * medium stars; star rewriting's constant-factor worst case).
  * ExtSpec pins value identity; this prices the trade so the
  * operator scaladocs can say which to reach for.
  *
  * Usage: sbt "runMain graft.tools.ComponentsEval [chainN] [hubs] [hubDeg]"
  */
object ComponentsEval {

  def main(args: Array[String]): Unit = {
    val chainN = if (args.length > 0) args(0).toLong else 1000000L
    val hubs = if (args.length > 1) args(1).toLong else 1000L
    val hubDeg = if (args.length > 2) args(2).toLong else 1000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(graphTag: String, algo: String, verts: DataFrame, pairs: DataFrame,
        maxIter: Int): Unit = {
      val t0 = System.nanoTime()
      val labels =
        if (algo == "star") Clusters.connectedComponentsStar(verts, pairs, maxIter)
        else Clusters.connectedComponents(verts, pairs, maxIter)
      val nComp = labels.select("cluster_id").distinct().count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(s"""{"graph":"$graphTag","algo":"$algo","components":$nComp,"wall_s":$dt}""")
    }

    // one chain of chainN vertices — diameter chainN
    val chainVerts = spark.range(chainN).select(col("id").as("doc_id"))
    val chainPairs = spark.range(chainN - 1)
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
    // warm both loops on a sliver
    timed("warm", "prop", chainVerts.limit(100), chainPairs.limit(99), 200)
    timed("warm", "star", chainVerts.limit(100), chainPairs.limit(99), 40)
    timed("chain", "prop", chainVerts, chainPairs, 200)
    timed("chain", "star", chainVerts, chainPairs, 40)

    // hubs: `hubs` stars of degree `hubDeg` (disjoint components)
    val hubVerts = spark.range(hubs * (hubDeg + 1)).select(col("id").as("doc_id"))
    val hub = floor(col("id") / hubDeg).cast("long") // `/` on longs is double division
    val hubPairs = spark.range(hubs * hubDeg).select(
      (hub * (hubDeg + 1)).as("doc_a"),
      (hub * (hubDeg + 1) + (col("id") % hubDeg) + 1).as("doc_b"))
    timed("hubs", "prop", hubVerts, hubPairs, 200)
    timed("hubs", "star", hubVerts, hubPairs, 40)

    spark.stop()
  }
}
