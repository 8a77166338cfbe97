package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.TableSink

/** Partition-only write fan-out measurement (dev tool; VERDICT r15
  * ask #6 — `writersPerPartition` shipped in r15 with no measurement):
  * a partition-only parquet write clusters on the partition columns,
  * which serializes each directory into ONE task — correct for the
  * harness's handful of tiny IVF cells (whole files, full row
  * groups), a straggler ceiling for a corpus-scale codes table with
  * few cells. `writersPerPartition = W` salts the clustering so up to
  * W tasks (= files) write each directory.
  *
  * This main builds a codes-shaped relation (embeddings replicated
  * `REP`× with offset ids, 5 cells — ~1M wide rows at the 30×
  * corpus), caches it (isolating WRITE cost from compute), and times
  * the same partition-only write at writers 1 vs 4 vs 8.
  *
  * Usage:
  *   SPARK_DRIVER_MEM=8g sbt "runMain graft.tools.WritersEval <dir>"
  * Prints one JSON line per configuration.
  */
object WritersEval {

  val Rep = 16
  val Cells = 5

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = graft.queries.Inventory.rebalanced(
      spark.read.parquet(s"$dir/embeddings.parquet"), "vec_id")
    val codes = (0 until Rep).map { r =>
      e.select((col("vec_id") + lit(r * 10000000L)).as("vec_id"), col("embedding"))
    }.reduce(_.unionByName(_))
      .withColumn("cluster", pmod(col("vec_id"), lit(Cells)).cast("int"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = codes.count()

    val out = java.nio.file.Files.createTempDirectory("graft-writers").toString
    try {
      Seq(1, 4, 8).foreach { w =>
        val sink = new TableSink.BucketedParquet(s"$out/w$w",
          buckets = Map.empty, partitions = Map("codes" -> Seq("cluster")),
          writersPerPartition = w)
        val t0 = System.nanoTime()
        sink.write("codes", codes)
        val dt = (System.nanoTime() - t0) / 1e9
        val st = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$out/w$w"))
        val files =
          try st.filter(p => p.toString.endsWith(".parquet")).count()
          finally st.close()
        println(s"""{"config":"writers_$w","rows":$n,"cells":$Cells,""" +
          s""""files":$files,"wall_s":$dt,"dir":"$dir"}""")
      }
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(out)).deleteRecursively()
      ()
    }
    spark.stop()
  }
}
