package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ext.Dedup

/** Direct-vs-prefix pair-generation measurement (dev tool; VERDICT r20
  * asks #1/#2): times [[Dedup.pairsFromPosts]] against
  * [[Dedup.pairsFromPostsPrefix]] over a MATERIALIZED postings
  * checkpoint (the production DAG shape — `corpus_postings` /
  * `dedup_postings`), and prints the df-skew probe
  * ([[Dedup.postingSkewProbe]]) whose fan-out reading
  * `Dedup.pairsFromPostsAuto` gates on. The numbers set — and
  * re-justify — `Dedup.DirectPairFanoutMax` (SCALING.md
  * "direct-vs-prefix policy").
  *
  * Usage:
  *   SPARK_DRIVER_MEM=8g sbt "runMain graft.tools.PairsEval <dir> [legs]"
  * where `legs` is a comma-set of probe,direct,prefix (default all).
  * Prints one JSON line per leg.
  */
object PairsEval {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val legs: Set[String] =
      if (args.length > 1) args(1).split(",").toSet else Set("probe", "direct", "prefix")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // session-derived shuffle partitions, same policy as Bench: the
    // scale legs need the data-sized count (a 100× corpus at 32
    // partitions would straggle for configuration reasons, not plan
    // reasons)
    val shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS",
      math.max(cpus.toInt,
        graft.engine.Partitioning.partitionsFor(
          graft.engine.Partitioning.dirBytes(dir))).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // materialize the postings checkpoint once (the DAG's
    // corpus_postings write) — its cost is shared by both generators
    // and is NOT part of the compared legs
    val scratch = java.nio.file.Files.createTempDirectory("graft-pairseval")
    try {
      val t0 = System.nanoTime()
      Dedup.shinglePostsDf(spark.read.parquet(s"$dir/documents.parquet"))
        .write.mode("overwrite").parquet(s"$scratch/posts")
      val build = (System.nanoTime() - t0) / 1e9
      val posts = spark.read.parquet(s"$scratch/posts")
      println(s"""{"leg":"postings_build","wall_s":$build,"dir":"$dir","shuffle_partitions":$shufflePartitions}""")

      if (legs("probe")) {
        spark.sparkContext.setJobDescription("pairs: df-skew probe")
        val p0 = System.nanoTime()
        val (sq, n) = Dedup.postingSkewProbe(posts)
        val dt = (System.nanoTime() - p0) / 1e9
        val fanout = if (n > 0) sq / n else 0.0
        val pick = if (sq <= Dedup.DirectPairFanoutMax * n) "direct" else "prefix"
        println(s"""{"leg":"probe","wall_s":$dt,"sum_df_sq":$sq,"posts":$n,""" +
          s""""fanout":$fanout,"budget":${Dedup.DirectPairFanoutMax},"pick":"$pick","dir":"$dir"}""")
      }

      def timed(tag: String)(body: => org.apache.spark.sql.DataFrame): Unit = {
        spark.sparkContext.setJobDescription(s"pairs: $tag")
        val t = System.nanoTime()
        body.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t) / 1e9
        println(s"""{"leg":"$tag","wall_s":$dt,"dir":"$dir"}""")
      }
      if (legs("direct")) timed("direct")(Dedup.pairsFromPosts(posts))
      if (legs("prefix")) timed("prefix")(Dedup.pairsFromPostsPrefix(posts))
      if (legs("plans")) {
        // .explain("formatted") artifacts for plans/r21 — the pair
        // stage's plan over the postings checkpoint, both generators
        def fmt(df: org.apache.spark.sql.DataFrame): String =
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        println("==== PLAN direct (pairsFromPosts) ====")
        println(fmt(Dedup.pairsFromPosts(posts)))
        println("==== PLAN prefix (pairsFromPostsPrefix) ====")
        println(fmt(Dedup.pairsFromPostsPrefix(posts)))
      }
    } finally graft.engine.Scratch.deleteTree(scratch)
    spark.stop()
  }
}
