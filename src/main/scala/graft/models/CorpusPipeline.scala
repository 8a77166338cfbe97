package graft.models

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.engine.{Catalog, DagRunner, Materialization, Model, NotNull, ParquetCatalog, RunResult, TableSink, Unique}
import graft.engine.Functions.roundPortable
import graft.ext.{Dedup, Pipelines, TextAnalysis}

/** The corpus-curation pipeline as a materialized DAG — the DOC-LEVEL
  * composition of the per-stage registry queries (which each report a
  * summary over the raw corpus by the standalone-query contract):
  *
  * {{{
  *   documents ─> corpus_cleaned (Table) ─> corpus_decontaminated (Table)
  *                      ─> corpus_capped (Table) ─> corpus_packed (Table)
  * }}}
  *
  * Stage semantics reuse the SAME shared building blocks as the
  * registry queries — `TextAnalysis.qualityCols` for the gate,
  * `Dedup.shinglePostsDf` for contamination shingles, the
  * `Pipelines.DomainCap`/`PackBudget` constants — so the funnel cannot
  * silently fork from the published per-stage metrics.
  *
  * Why materialize every stage: each Table write is the checkpoint the
  * next stage scans — tokenization/scoring runs ONCE over the corpus
  * (in `corpus_cleaned`) instead of once per downstream stage, and a
  * failed stage test (duplicate doc, leaked benchmark doc) gates the
  * descendants instead of shipping a corrupt training set. At 100 TB
  * each stage is one bounded pass: clean is scan+window, decontaminate
  * broadcasts the benchmark shingles, cap is one per-lang window,
  * pack is one per-shard running sum.
  */
object CorpusPipeline {

  /** Quality gate threshold shared with `Pipelines.cleanCorpus`. */
  val QualityMin = 0.5

  val cleaned: Model =
    Model("corpus_cleaned", Seq("documents"), Materialization.Table,
      tests = Seq(Unique("doc_id"), NotNull("lang"))) { in =>
      val qc = TextAnalysis.qualityCols(col("text"))
      // gate on the RAW score (same predicate as the registry
      // cleanCorpus query — the 6dp-rounded `quality` is for
      // output/ranking only, so the DAG cannot fork from the
      // published metrics on a score inside the rounding epsilon)
      val scored = in("documents")
        .select(col("doc_id"), col("lang"), col("source"), col("text"),
          qc.nTokens.cast("long").as("n_tokens"),
          qc.score.as("quality_raw"),
          roundPortable(qc.score, 6).as("quality"),
          qc.stopRatio.as("stop_ratio"),
          md5(encode(col("text"), "UTF-8")).as("text_hash"))
        .filter(col("quality_raw") >= QualityMin && col("stop_ratio") > 0)
      // exact dedup: keep the smallest doc_id per content hash
      val w = Window.partitionBy("text_hash").orderBy("doc_id")
      scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("doc_id", "lang", "source", "text", "n_tokens", "quality")
    }

  val decontaminated: Model =
    Model("corpus_decontaminated", Seq("corpus_cleaned", "documents"), Materialization.Table,
      tests = Seq(Unique("doc_id"))) { in =>
      // benchmark = the harness eval stand-in (same split as the
      // pipeline_decontaminate registry query); its shingles broadcast
      val bench = Dedup.shinglePostsDf(
        in("documents").filter(col("doc_id") < Pipelines.BenchmarkDocs))
        .select(col("hs"), col("doc_id").as("bench_id"))
      val corpusDocs = in("corpus_cleaned")
        .filter(col("doc_id") >= Pipelines.BenchmarkDocs)
      val posts = Dedup.shinglePostsDf(corpusDocs)
      val frac = col("shared").cast(DoubleType) / col("sz")
      val contaminated = posts.join(broadcast(bench), Seq("hs"))
        .groupBy("doc_id", "bench_id", "sz")
        .agg(count(lit(1)).as("shared"))
        .filter(frac >= Pipelines.ContaminationTau)
        .select("doc_id").distinct()
      corpusDocs.join(contaminated, Seq("doc_id"), "left_anti")
    }

  val capped: Model =
    Model("corpus_capped", Seq("corpus_decontaminated"), Materialization.Table,
      tests = Seq(Unique("doc_id"))) { in =>
      val w = Window.partitionBy("lang").orderBy(col("quality").desc, col("doc_id"))
      in("corpus_decontaminated")
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= Pipelines.DomainCap)
        .drop("rnk")
    }

  val packed: Model =
    Model("corpus_packed", Seq("corpus_capped"), Materialization.Table,
      tests = Seq(NotNull("pack_id"))) { in =>
      val w = Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      in("corpus_capped")
        .select(col("doc_id"), col("lang"), col("n_tokens"))
        .withColumn("cum", sum(col("n_tokens")).over(w))
        .withColumn("pack_id", expr(s"(cum - n_tokens) div ${Pipelines.PackBudget}"))
        .select("doc_id", "lang", "n_tokens", "pack_id")
    }

  val all: Seq[Model] = Seq(cleaned, decontaminated, capped, packed)

  def run(spark: SparkSession, dir: String,
          sink: TableSink = new TableSink.Cached): RunResult =
    run(new ParquetCatalog(spark, dir), sink)

  def run(catalog: Catalog, sink: TableSink): RunResult =
    new DagRunner(catalog, sink).run(all)
}
