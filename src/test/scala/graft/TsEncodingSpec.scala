package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

import graft.queries.Inventory

/** The harness `events.ts` has shipped in three physical encodings
  * across rounds — ns-precision INT64 (read as `LongType` under
  * `spark.sql.legacy.parquet.nanosAsLong`), µs `TIMESTAMP_NTZ`, and µs
  * `TIMESTAMP` (UTC-adjusted) — and the round-9 drift to NTZ silently
  * broke every `unix_micros(ts)` consumer because the loader's
  * fallthrough left the new type unnormalized. This spec pins the
  * loader contract so the NEXT format drift breaks loudly in-repo:
  * for each encoding, `Inventory.normalizeTs` must produce
  * `TimestampType` with the identical micros multiset, and every
  * events-consuming registry query must at least pass analysis.
  *
  * The ns-as-long fixture is written as a plain INT64 column (Spark
  * cannot author TIMESTAMP(NANOS) parquet) — observationally identical
  * to the harness file through the loader, which sees `LongType`
  * either way.
  */
class TsEncodingSpec extends SparkSpec {

  private val fixRoot = "target/ts-fixtures"

  /** Builds one fixture dir per encoding: events.parquet re-encoded
    * from sf0.001, every other harness table symlinked so any
    * registry query resolves its scans.
    */
  private lazy val fixtureDirs: Map[String, String] = {
    val canon = Inventory.events(spark, sf())
    val others = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings")
    val encodings = Map(
      "ns_long" -> canon.withColumn("ts", expr("unix_micros(ts) * 1000L")),
      "us_ntz" -> canon.withColumn("ts", col("ts").cast(TimestampNTZType)),
      "us_ltz" -> canon)
    encodings.map { case (name, df) =>
      val dir = s"$fixRoot/$name"
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
      others.foreach { t =>
        val link = Paths.get(dir, s"$t.parquet")
        if (!Files.exists(link, java.nio.file.LinkOption.NOFOLLOW_LINKS))
          Files.createSymbolicLink(link, Paths.get(sf(), s"$t.parquet"))
      }
      name -> dir
    }
  }

  private def rawTsType(dir: String) =
    spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType

  test("fixtures actually exercise three distinct physical encodings") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    assert(rawTsType(fixtureDirs("ns_long")) === LongType)
    assert(rawTsType(fixtureDirs("us_ntz")) === TimestampNTZType)
    assert(rawTsType(fixtureDirs("us_ltz")) === TimestampType)
  }

  test("normalizeTs yields TimestampType with the identical micros multiset on all encodings") {
    val canonMicros = Inventory.events(spark, sf())
      .select(expr("unix_micros(ts)")).collect().map(_.getLong(0)).sorted.toSeq
    assert(canonMicros.nonEmpty)
    for ((enc, dir) <- fixtureDirs) {
      val ev = Inventory.events(spark, dir)
      assert(ev.schema("ts").dataType === TimestampType, s"$enc: loader must normalize to TimestampType")
      val micros = ev.select(expr("unix_micros(ts)")).collect().map(_.getLong(0)).sorted.toSeq
      assert(micros === canonMicros, s"$enc: micros multiset drifted")
    }
  }

  test("every events-consuming registry query analyzes under each encoding") {
    val consumers = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => n.startsWith("events_") || n == "join_interval_overlap")
    assert(consumers.size >= 20, s"expected the full events family, got $consumers")
    for ((enc, dir) <- fixtureDirs; name <- consumers) {
      // .schema forces analysis — exactly the phase the round-9 drift
      // broke (unix_micros over TIMESTAMP_NTZ fails analysis, not runtime)
      try SparkEntry.queries(name)(spark, dir).schema
      catch {
        case e: Throwable =>
          fail(s"$name failed analysis under $enc encoding: ${e.getMessage}")
      }
    }
  }
}
