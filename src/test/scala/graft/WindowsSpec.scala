package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Windows

/** Pins the two-phase global row number and the closed-form ntile
  * against Spark's own single-partition window implementations.
  */
class WindowsSpec extends SparkSpec {

  test("globalRowNumber equals the single-partition row_number for every partitioning") {
    import spark.implicits._
    // keys with heavy ties force the id tiebreak; values interleave
    // so range partitions split tie groups across boundaries
    val df = (1 to 997).map(i => (i % 13, i.toLong)).toDF("k", "id")
    val expected = df
      .withColumn("rn", row_number().over(Window.orderBy(col("k"), col("id"))))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2).toLong)).sorted
    for (parts <- Seq(1, 3, 32)) {
      val got = Windows.globalRowNumber(df, Seq(col("k"), col("id")), partitions = parts)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted
      assert(got.toSeq === expected.toSeq, s"partitions=$parts")
    }
  }

  test("ntileFromRowNumber matches Spark ntile across n mod buckets boundaries") {
    import spark.implicits._
    for (n <- Seq(3, 5, 7, 100, 101, 104)) {
      val df = (1 to n).map(_.toLong).toDF("id")
      val viaNtile = df
        .withColumn("t", ntile(5).over(Window.orderBy(col("id"))))
        .collect().map(r => (r.getLong(0), r.getInt(1))).sorted
      val viaClosed = df
        .withColumn("rn", row_number().over(Window.orderBy(col("id"))).cast("long"))
        .withColumn("t", Windows.ntileFromRowNumber(col("rn"), lit(n), 5))
        .collect().map(r => (r.getLong(0), r.getInt(2))).sorted
      assert(viaClosed.toSeq === viaNtile.toSeq, s"n=$n")
    }
  }
}
