package graft.ext

import org.apache.spark.sql.functions._

import graft.engine.Functions.{avgExact, roundPortable}
import graft.ext.Dedup.hash60
import graft.ext.TextAnalysis
import graft.queries.Inventory.Q

/** Corpus-preparation operators that COMPOSE the per-document
  * primitives into the shapes a training-data pipeline actually ships:
  * deterministic splits and an end-to-end cleaning funnel.
  *
  * Scale notes: both are single-scan per stage with no driver-side
  * state; split assignment is a pure projection (no shuffle at all),
  * so it composes with any partitioning upstream. Assignments are
  * content-hash-based — stable across runs, cluster sizes, and row
  * order, which is what makes a 100 TB split reproducible.
  */
object Pipelines {

  /** Deterministic stratified train/val/test assignment: bucket =
    * content-hash mod 100 → 80/10/10. Hash-based (not `rand()`)
    * sharding is re-executable under task retries and stable when the
    * corpus is re-partitioned — the property that matters when the
    * split must be reproduced months later.
    */
  val stratifiedSplit: Q = Q(
    (s, d) => {
      val docs = s.read.parquet(s"$d/documents.parquet")
      val bucket = hash60(col("text")) % 100
      docs
        .select(col("doc_id"), col("lang"), bucket.as("bucket"))
        .withColumn("split",
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "val")
            .otherwise("test"))
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc_id"))
        .orderBy("lang", "split")
    },
    Some("""WITH b AS (
           |  SELECT doc_id, lang,
           |    ('0x' || substr(md5(text), 1, 15))::BIGINT % 100 AS bucket
           |  FROM documents
           |)
           |SELECT lang,
           |       CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
           |       count(*) AS n_docs, min(doc_id) AS min_doc_id
           |FROM b GROUP BY 1, 2 ORDER BY lang, split""".stripMargin)
  )

  /** The cleaning funnel: quality-score gate → exact dedup (keep the
    * smallest doc_id per content hash) → stopword-bearing English gate,
    * reporting corpus stats per declared language. One scan, two
    * shuffles (dedup group, final group) — each stage is a projection
    * or aggregation over the previous, so Catalyst fuses the gates
    * into the scan.
    */
  val cleanCorpus: Q = Q(
    (s, d) => {
      val docs = s.read.parquet(s"$d/documents.parquet")
      val qc = TextAnalysis.qualityCols(col("text"))
      docs
        .select(col("doc_id"), col("lang"), col("text"),
          qc.nTokens.as("n_tokens"), qc.score.as("quality_score"), qc.stopRatio.as("stop_ratio"))
        .filter(col("quality_score") >= 0.5)
        .groupBy(md5(encode(col("text"), "UTF-8")).as("text_hash"))
        .agg(
          min(col("doc_id")).as("doc_id"),
          min_by(col("lang"), col("doc_id")).as("lang"),
          min_by(col("n_tokens"), col("doc_id")).as("n_tokens"),
          min_by(col("stop_ratio"), col("doc_id")).as("stop_ratio"))
        .filter(col("stop_ratio") > 0)
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          roundPortable(avgExact(col("n_tokens")), 4).as("avg_tokens"))
        .orderBy("lang")
    },
    Some("""WITH scored AS (
           |  SELECT doc_id, lang, text,
           |    len(string_split_regex(lower(trim(text)), '\s+')) AS n_tokens,
           |    least(CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS DOUBLE) / 100.0, 1.0) * 0.5
           |      + (1.0 - CAST(length(regexp_replace(lower(text), '[a-z0-9\s]', '', 'g')) AS DOUBLE) / length(text)) * 0.3
           |      + CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
           |            x -> x IN ('the','of','and','to','in','is','it','a'))) AS DOUBLE)
           |        / len(string_split_regex(lower(trim(text)), '\s+')) * 0.2 AS quality_score,
           |    CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
           |            x -> x IN ('the','of','and','to','in','is','it','a'))) AS DOUBLE)
           |        / len(string_split_regex(lower(trim(text)), '\s+')) AS stop_ratio
           |  FROM documents
           |), deduped AS (
           |  SELECT md5(text) AS text_hash, min(doc_id) AS doc_id,
           |         arg_min(lang, doc_id) AS lang,
           |         arg_min(n_tokens, doc_id) AS n_tokens,
           |         arg_min(stop_ratio, doc_id) AS stop_ratio
           |  FROM scored WHERE quality_score >= 0.5 GROUP BY 1
           |)
           |SELECT lang, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           |       floor(CAST(sum(CAST(n_tokens AS DECIMAL(18,2))) AS DOUBLE) / count(*) * 10000 + 0.5) / 10000 AS avg_tokens
           |FROM deduped WHERE stop_ratio > 0
           |GROUP BY lang ORDER BY lang""".stripMargin)
  )

  val queries: Seq[(String, Q)] = Seq(
    "pipeline_stratified_split" -> stratifiedSplit,
    "pipeline_clean_corpus" -> cleanCorpus
  )
}
