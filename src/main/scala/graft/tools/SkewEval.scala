package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hot-key argmax/argmin measurement (dev tool; VERDICT r16 asks #1a/b):
  * the r16 registry carried two windows on degeneracy-prone keys —
  * `row_number over cluster_id` (keep-best) and `min-struct over hs`
  * (span keep-first). A window requires every row of a partition key in
  * ONE sorted task, so a degenerate key (the 10⁸-member boilerplate
  * cluster, the billion-occurrence license span) serializes into a
  * single straggler with no map-side combine. Round 17 converted both
  * to partial-aggregated argmax/argmin + join-back; this main measures
  * the two forms on a PLANTED degenerate key — one cluster / one span
  * hash carrying `hot` rows (default 10⁷) over a `cold`-row background —
  * with the shuffle sized so the hot key's posting is many times one
  * task's fair share.
  *
  * Expected shape: the window form's wall is dominated by the one task
  * that sorts the hot partition (and grows linearly with `hot`
  * regardless of cores); the aggregate form collapses the hot key into
  * per-task partials, so its wall tracks total rows / cores. The
  * ExtSpec value-identity tests pin that both forms agree; this tool
  * prices them.
  *
  * Usage: sbt "runMain graft.tools.SkewEval [hot] [cold]"
  * Prints one JSON line per (operator, form); a warm pass on a 1000-row
  * sliver precedes each timed pair so codegen/JIT is out of the window.
  */
object SkewEval {

  def main(args: Array[String]): Unit = {
    val hot = if (args.length > 0) args(0).toLong else 10000000L
    val cold = if (args.length > 1) args(1).toLong else 10000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.expressions.Window

    // the straggler signal itself: the longest single task of each run.
    // A window over the hot key serializes its whole posting into one
    // task, so max_task tracks `hot` no matter how many cores exist;
    // the aggregate form's max task is ~(rows/partitions).
    val maxTask = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskInfo != null)
            maxTask.updateAndGet(m => math.max(m, t.taskInfo.duration))
      })

    def timed(op: String, form: String, df: => DataFrame, silent: Boolean = false): Unit = {
      maxTask.set(0L)
      val frame = df
      val t0 = System.nanoTime()
      frame.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain before snapshotting
      if (!silent)
        println(s"""{"op":"$op","form":"$form","hot":$hot,"cold":$cold,""" +
          s""""wall_s":$dt,"max_task_s":${maxTask.get() / 1000.0}}""")
      if (!silent && sys.env.contains("SKEW_EVAL_PLANS"))
        System.err.println(s"=== $op/$form final plan ===\n" +
          frame.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0))
    }

    // ---- keep-best: one mega-cluster + `cold` singletons ------------
    def mkLabels(h: Long, c: Long): DataFrame =
      spark.range(h).select(col("id").as("doc_id"), lit(0L).as("cluster_id"))
        .unionAll(spark.range(h, h + c)
          .select(col("id").as("doc_id"), col("id").as("cluster_id")))
    def mkDocs(labels: DataFrame): DataFrame =
      labels.select(col("doc_id"), (col("doc_id") % 100000L).as("n_chars"))
    def keepBestWindow(labels: DataFrame, docs: DataFrame): DataFrame = {
      val w = Window.partitionBy("cluster_id").orderBy(col("n_chars").desc, col("doc_id"))
      val sized = labels.join(docs, Seq("doc_id"))
      val sizes = labels.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
      sized.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("cluster_id"), col("doc_id").as("kept_doc"), col("n_chars").as("kept_chars"))
        .join(sizes, Seq("cluster_id"))
    }
    val (warmL, warmD) = { val l = mkLabels(500L, 500L); (l, mkDocs(l)) }
    timed("keep_best", "warm", keepBestWindow(warmL, warmD), silent = true)
    timed("keep_best", "warm", graft.ext.Clusters.keepBest(warmL, warmD), silent = true)
    val labels = mkLabels(hot, cold); val docs = mkDocs(labels)
    timed("keep_best", "window", keepBestWindow(labels, docs))
    timed("keep_best", "aggregate", graft.ext.Clusters.keepBest(labels, docs))

    // ---- span keep-first: one mega-hash + `cold` unique hashes ------
    def mkWins(h: Long, c: Long): DataFrame =
      spark.range(h)
        .select((col("id") % 1000000L).as("doc_id"), col("id").as("pos"), lit(7L).as("hs"))
        .unionAll(spark.range(h, h + c)
          .select(col("id").as("doc_id"), lit(0L).as("pos"), col("id").as("hs")))
    def flaggedWindow(wins: DataFrame): DataFrame = {
      val byHash = Window.partitionBy("hs")
      wins.withColumn("keep", struct(col("doc_id"), col("pos")) ===
        min(struct(col("doc_id"), col("pos"))).over(byHash))
        .filter(!col("keep")).select("doc_id", "pos")
    }
    val warmW = mkWins(500L, 500L)
    timed("span_keep_first", "warm", flaggedWindow(warmW), silent = true)
    timed("span_keep_first", "warm", graft.ext.Dedup.spanFlagged(warmW), silent = true)
    val wins = mkWins(hot, cold)
    timed("span_keep_first", "window", flaggedWindow(wins))
    timed("span_keep_first", "aggregate", graft.ext.Dedup.spanFlagged(wins))

    spark.stop()
  }
}
