package graft.models

import org.apache.spark.sql.SparkSession

import graft.engine.{Catalog, DagRunner, Materialization, Model, NotNull, ParquetCatalog, RunResult, TableSink, Unique}
import graft.ext.Pipelines

/** The classifier EVALUATION layer as a materialized DAG — the
  * production lifecycle of the three `pipeline_classifier_*` /
  * `pipeline_rater_agreement` registry queries, which each re-score
  * the held-out fold in-query by the driver contract. A real eval
  * pipeline scores ONCE per model version and every report reads the
  * scores table:
  *
  * {{{
  *   documents ──> nb_heldout_scores (Table)
  *                    ├─> classifier_eval_report (View)
  *                    ├─> classifier_calibration_report (View)
  *                    └─> rater_agreement_report (View)
  * }}}
  *
  * The scores table is the expensive artifact (train-fold vocabulary
  * + NB aggregates + test-fold scoring — the corpus-scaled work); the
  * three reports are constant-row derivations that share the EXACT
  * DataFrame functions the registry queries run
  * ([[Pipelines.classifierEvalOf]] / [[Pipelines.classifierCalibrationOf]]
  * / [[Pipelines.raterAgreementOf]]), so materialization cannot
  * change answers — EngineSpec pins each view row-equal to its
  * registry twin through the parquet round-trip. Model tests gate the
  * emit the dbt way: a duplicate doc_id or a NULL score skips the
  * report views instead of publishing a corrupt eval.
  */
object EvalPipeline {

  val scores: Model =
    Model("nb_heldout_scores", Seq("documents"), Materialization.Table,
      tests = Seq(Unique("doc_id"), NotNull("slr"), NotNull("prior_b"))) { in =>
      Pipelines.nbHeldoutScoredDf(in("documents"))
    }

  val evalReport: Model =
    Model("classifier_eval_report", Seq("nb_heldout_scores"), Materialization.View) { in =>
      Pipelines.classifierEvalOf(in("nb_heldout_scores"))
    }

  val calibrationReport: Model =
    Model("classifier_calibration_report", Seq("nb_heldout_scores"), Materialization.View) { in =>
      Pipelines.classifierCalibrationOf(in("nb_heldout_scores"))
    }

  val agreementReport: Model =
    Model("rater_agreement_report", Seq("nb_heldout_scores"), Materialization.View) { in =>
      Pipelines.raterAgreementOf(in("nb_heldout_scores"))
    }

  val all: Seq[Model] = Seq(scores, evalReport, calibrationReport, agreementReport)

  def run(spark: SparkSession, dir: String,
      sink: TableSink = new TableSink.Cached): RunResult =
    run(new ParquetCatalog(spark, dir), sink)

  def run(catalog: Catalog, sink: TableSink): RunResult =
    new DagRunner(catalog, sink).run(all)
}
