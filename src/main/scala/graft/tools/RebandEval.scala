package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.ext.{Dedup, Similarity}

/** Scale-sweep evaluation of the embedding-LSH RE-BANDING POLICY
  * (dev tool; VERDICT r13 ask #1): BENCHNOTES r12 fixed the contract
  * row at B=4/L=16 and prescribed B = ⌈log₂(n / 125)⌉ with L raised
  * to hold recall as the corpus grows. This main measures, at a given
  * (scaled) corpus:
  *
  *   1. the B=4 CONTRACT candidate curve at the harness τ=0.4
  *      (candidates/row — the quantity whose growth the MaxBucket
  *      guard clips; r12 measured 637.7 at 1× and 760.6 at 10×), and
  *   2. RECALL at the production near-dup regime (τ=0.85) for each
  *      candidate (B, L): near-dup twins are PLANTED into the corpus
  *      (deterministic hash-noise perturbation of every 40th vector,
  *      the ExtSpec recipe at corpus scale), truth is the EXACT
  *      within-replica-block pair set (the scale corpus decorrelates
  *      across replicas by construction — cross-replica cosine ≈ 0.1,
  *      measured in tools/scale_corpus.py — and the audit column
  *      `recalled_cross` counts any published cross-block pair, so a
  *      violated assumption is visible, not silent), and the system
  *      under test is the production [[Dedup.embeddingLshPairs]] path
  *      (MaxBucket guard included).
  *
  * Usage:
  *   SPARK_DRIVER_MEM=8g sbt "runMain graft.tools.RebandEval <dir> <B,L[:B,L…]>"
  * (":" separates configs — sbt -batch treats ";" as a command break.)
  * Prints one JSON line per configuration.
  */
object RebandEval {

  /** Block id: replicas are offset by r·1e6 (tools/scale_corpus.py);
    * planted twins sit at +5e8 and inherit their source's block.
    */
  private val TwinOffset = 500000000L
  private def blockOf(c: org.apache.spark.sql.Column) =
    ((c % TwinOffset) / 1000000L).cast("long")

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val configs: Seq[(Int, Int)] = args(1).split("[;:]").toSeq
      .map { s => val Array(b, l) = s.split(","); (b.toInt, l.toInt) }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // r22: overridable shuffle-partition count (PairsEval's knob) — the
    // in-place bucket verify puts the co-occurrence cosine CPU on the
    // (table, bucket) join partitions, so a hardcoded 32 understates
    // the balance a data-sized session (Bench/production policy) gets
    // when the bucket-key count is small (B=9/L=16 → 8192 keys)
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val raw = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = raw.count()

    // --- 1. the B=4/L=16 contract candidate curve at tau=0.4 -------
    val t0 = System.nanoTime()
    val contractCands = candidateCount(raw, Dedup.embPlanes)
    val dt0 = (System.nanoTime() - t0) / 1e9
    println(s"""{"config":"contract_B4_L16_tau0.4","rows":$n,"candidates":$contractCands,""" +
      s""""cand_per_row":${contractCands.toDouble / n},"wall_s":$dt0,"dir":"$dir"}""")

    // --- 2. plant near-dup twins, deterministic hash noise ----------
    // every 40th vector gets a twin: x_i + 0.12 * u_i with
    // u_i = hash(vec_id, i)-derived uniform in [-0.5, 0.5) — E|eps|
    // ~0.17 against |x| ~0.96, so planted cosines land ~0.93-0.99,
    // comfortably above tau=0.85 but perturbed enough that banding
    // has to earn its recall.
    val noisy = raw.filter(col("vec_id") % 40 === 0)
      .select((col("vec_id") + TwinOffset).as("vec_id"),
        transform(col("embedding"),
          (x, i) => (x + (pmod(hash(col("vec_id"), i), lit(1000)).cast(DoubleType) / 1000.0 - 0.5)
            * 0.12).cast("float")).as("embedding"))
    val all = raw.select("vec_id", "embedding").unionByName(noisy)
      .repartition(col("vec_id")).cache()
    val nAll = all.count()

    // --- exact truth: within-block all-pairs at tau=0.85 ------------
    // ids-only block join first, vectors attached afterwards by
    // BROADCAST hash joins (the whole corpus of vectors is ~52 MB at
    // 100× — broadcastable; forced, since the 10 MB default threshold
    // would decline): a merge join carrying the embedding arrays
    // sorts ~550 B rows for every candidate pair — measured >76 GB of
    // spill at 100× (210M within-block pairs), which filled the disk.
    // The pair stream stays (id_a, id_b) longs end to end; vectors
    // attach in-flight with no sort.
    val ids = all.select(col("vec_id"), blockOf(col("vec_id")).as("blk"))
    val cand = ids.select(col("blk"), col("vec_id").as("id_a"))
      .join(ids.select(col("blk"), col("vec_id").as("id_b")).hint("merge"), Seq("blk"))
      .filter(col("id_a") < col("id_b"))
    val va = all.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val vb = all.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    val cosR = graft.engine.Functions.roundPortable(
      graft.functions.CosineSimilarity(col("va"), col("vb")), 6)
    val truth = cand
      .join(broadcast(va), Seq("id_a"))
      .join(broadcast(vb), Seq("id_b"))
      .select(col("id_a"), col("id_b"), cosR.as("cos_sim"))
      .filter(col("cos_sim") >= 0.85)
      .select("id_a", "id_b").cache()
    val nTruth = truth.count()
    println(s"""{"planted_corpus_rows":$nAll,"n_truth":$nTruth}""")

    // --- recall per (B, L) at tau=0.85 ------------------------------
    configs.foreach { case (b, l) =>
      val planes = Similarity.gaussianPlanes(l, b, Similarity.Dim, 43)
      val t1 = System.nanoTime()
      val lsh = Dedup.embeddingLshPairs(all, 0.85, planes)
        .select("id_a", "id_b").cache()
      val nRecalled = lsh.count()
      val dt = (System.nanoTime() - t1) / 1e9
      val nHit = truth.join(lsh, Seq("id_a", "id_b"), "left_semi").count()
      val nCross = lsh.filter(blockOf(col("id_a")) =!= blockOf(col("id_b"))).count()
      val cands = candidateCount(all, planes)
      println(s"""{"config":"B${b}_L${l}_tau0.85","rows":$nAll,"candidates":$cands,""" +
        s""""cand_per_row":${cands.toDouble / nAll},"n_truth":$nTruth,""" +
        s""""n_recalled":$nRecalled,"n_hit":$nHit,"recall":${nHit.toDouble / math.max(1L, nTruth)},""" +
        s""""recalled_cross":$nCross,"wall_s":$dt}""")
      lsh.unpersist()
    }
    spark.stop()
  }

  /** Candidate-pair count of the banded path BEFORE exact verify —
    * the same block/guard/join algebra as [[Dedup.embeddingLshPairs]]
    * (MaxBucket=1000), counted instead of scored.
    */
  private def candidateCount(e: DataFrame, planes: Array[Array[Array[Double]]]): Long = {
    import org.apache.spark.sql.expressions.Window
    val keys = Similarity.bucketKeys(e, "vec_id", "embedding", planes)
      .withColumn("bucket_n", count(lit(1)).over(Window.partitionBy("table", "bucket")))
      .filter(col("bucket_n") <= Dedup.EmbMaxBucket)
    keys.select(col("table"), col("bucket"), col("vec_id").as("id_a"))
      .join(keys.select(col("table"), col("bucket"), col("vec_id").as("id_b")).hint("merge"),
        Seq("table", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
      .count()
  }
}
