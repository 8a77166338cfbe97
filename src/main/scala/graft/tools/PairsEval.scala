package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
  *   SPARK_DRIVER_MEM=8g sbt "runMain graft.tools.PairsEval <dir> [legs] [batchFrom]"
  * where `legs` is a comma-set of probe,direct,prefix (default all)
  * plus the r22 incremental legs delta_probe,delta_direct,
  * delta_prefix,delta_plans (batch = doc_id >= batchFrom, args(2)).
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
      // prototype: prefix candidates + ARRAY-based verify (ship each
      // doc's shingle set once as one row — guide §8 — instead of
      // re-shuffling the whole posting table twice through the verify
      // SMJs); measured before swapping into pairsFromPostsPrefix
      if (legs("prefix2")) {
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.types.DoubleType
        val tau = Dedup.JaccardTau
        val df = posts.groupBy("hs").agg(count(lit(1)).as("df"))
        val ranked = posts.join(df, Seq("hs"))
          .withColumn("rnk", row_number().over(
            Window.partitionBy("doc_id").orderBy("df", "hs")))
        val prefix = ranked
          .filter(col("rnk") <= col("sz") - ceil(col("sz") * tau) + 1)
          .select(col("hs"), col("doc_id"), col("sz"))
        val a2 = prefix.select(col("hs"), col("doc_id").as("doc_a"), col("sz").as("sz_a"))
        val b2 = prefix.select(col("hs"), col("doc_id").as("doc_b"), col("sz").as("sz_b"))
        val cand = a2.join(b2.hint("merge"), Seq("hs"))
          .filter(col("doc_a") < col("doc_b") &&
            col("sz_a") >= col("sz_b") * tau && col("sz_b") >= col("sz_a") * tau)
          .select("doc_a", "doc_b").distinct()
        val sets = posts.groupBy("doc_id").agg(collect_set(col("hs")).as("hss"))
        val jac2 = col("overlap").cast(DoubleType) /
          (col("sz_a") + col("sz_b") - col("overlap"))
        timed("prefix2")(cand
          .join(sets.select(col("doc_id").as("doc_a"), col("hss").as("hs_a")).hint("shuffle_hash"), Seq("doc_a"))
          .join(sets.select(col("doc_id").as("doc_b"), col("hss").as("hs_b")).hint("shuffle_hash"), Seq("doc_b"))
          .select(col("doc_a"), col("doc_b"),
            size(col("hs_a")).cast("long").as("sz_a"),
            size(col("hs_b")).cast("long").as("sz_b"),
            size(array_intersect(col("hs_a"), col("hs_b"))).cast("long").as("overlap"))
          .filter(jac2 >= tau)
          .select(col("doc_a"), col("doc_b"),
            graft.engine.Functions.roundPortable(jac2, 6).as("jaccard"))
          .orderBy("doc_a", "doc_b"))
      }
      // stage split: candidate generation alone (df build + rank +
      // prefix self-join + distinct), i.e. the prefix leg minus the
      // verify re-join — run to decide whether a cheaper verify
      // formulation is worth pursuing
      if (legs("cand")) {
        import org.apache.spark.sql.expressions.Window
        val tau = Dedup.JaccardTau
        val df = posts.groupBy("hs").agg(count(lit(1)).as("df"))
        val ranked = posts.join(df, Seq("hs"))
          .withColumn("rnk", row_number().over(
            Window.partitionBy("doc_id").orderBy("df", "hs")))
        val prefix = ranked
          .filter(col("rnk") <= col("sz") - ceil(col("sz") * tau) + 1)
          .select(col("hs"), col("doc_id"), col("sz"))
        val a2 = prefix.select(col("hs"), col("doc_id").as("doc_a"), col("sz").as("sz_a"))
        val b2 = prefix.select(col("hs"), col("doc_id").as("doc_b"), col("sz").as("sz_b"))
        timed("cand")(a2.join(b2.hint("merge"), Seq("hs"))
          .filter(col("doc_a") < col("doc_b") &&
            col("sz_a") >= col("sz_b") * tau && col("sz_b") >= col("sz_a") * tau)
          .select("doc_a", "doc_b").distinct())
      }
      // ---- DELTA legs (r22, VERDICT r21 #3): the incremental pair
      // stage over the same checkpoint — batch = doc_id >= batchFrom
      // (args(2); REQUIRED for these legs). delta_direct is the
      // broadcast-probe join the pipeline shipped before r22;
      // delta_prefix the batch-restricted prefix route; delta_probe
      // prints the Σ(df_all·df_batch) fan-out the gate reads.
      val batchFrom: Long =
        if (args.length > 2) args(2).toLong else Long.MinValue
      if (legs("delta_probe")) {
        spark.sparkContext.setJobDescription("pairs: delta df-skew probe")
        val p0 = System.nanoTime()
        val (sq, n) = Dedup.deltaSkewProbe(posts, batchFrom)
        val dt = (System.nanoTime() - p0) / 1e9
        val fanout = if (n > 0) sq / n else 0.0
        val pick = if (sq <= Dedup.DirectPairFanoutMax * n) "direct" else "prefix"
        println(s"""{"leg":"delta_probe","wall_s":$dt,"sum_dfa_dfb":$sq,"all_posts":$n,""" +
          s""""fanout_per_corpus_row":$fanout,"budget":${Dedup.DirectPairFanoutMax},"pick":"$pick","batch_from":$batchFrom,"dir":"$dir"}""")
      }
      if (legs("delta_direct")) timed("delta_direct")(Dedup.pairsFromPosts(posts,
        probe = Some(posts.filter(col("doc_id") >= batchFrom))))
      if (legs("delta_prefix")) timed("delta_prefix")(
        Dedup.pairsFromPostsPrefixDelta(posts, batchFrom))
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
      if (legs("delta_plans")) {
        def fmt(df: org.apache.spark.sql.DataFrame): String =
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        println("==== PLAN delta direct (pairsFromPosts probe) ====")
        println(fmt(Dedup.pairsFromPosts(posts,
          probe = Some(posts.filter(col("doc_id") >= batchFrom)))))
        println("==== PLAN delta prefix (pairsFromPostsPrefixDelta) ====")
        println(fmt(Dedup.pairsFromPostsPrefixDelta(posts, batchFrom)))
      }
    } finally graft.engine.Scratch.deleteTree(scratch)
    spark.stop()
  }
}
