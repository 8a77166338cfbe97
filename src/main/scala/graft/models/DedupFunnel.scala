package graft.models

import org.apache.spark.sql.SparkSession

import graft.engine.{Catalog, DagRunner, Materialization, Model, NotNull, ParquetCatalog, RunResult, TableSink, Unique}
import graft.ext.{Clusters, Dedup}

/** The dedup funnel as a materialized DAG — the production shape of
  * the standalone `dedup_components` / `dedup_keep_best` registry
  * queries (which, by the driver contract, each rebuild the whole
  * pair graph; `Clusters.dedupKeepBest` documents the cost).
  *
  * Structure (shingle → candidates → verify → components → emit):
  *
  * {{{
  *   documents ──> dedup_postings (Table) ──> dedup_pairs (Table) ──> dedup_labels (Table) ──┬─> dedup_cluster_report (View)
  *                                                                                           └─> dedup_keep_list (Table)
  * }}}
  *
  * Why this shape at 100 TB: pair verification is the dominant cost of
  * the whole funnel and must run ONCE — materializing `dedup_pairs`
  * (and the fixpoint `dedup_labels` after it) means the two consumers
  * read kilobyte-scale parquet instead of re-running the shingle
  * window + posting-list join over the corpus. The postings checkpoint
  * (r21) exists for the pair stage's MEASURED direct-vs-prefix
  * routing: the df-skew probe and the prefix branch's repeated
  * postings references read a column-pruned parquet scan instead of
  * re-shingling the corpus per reference. With a
  * `TableSink.Parquet` sink, downstream models receive the
  * POST-materialization relation (a plain parquet scan of the labels
  * table) — `EngineSpec` pins that plan property, and pins the outputs
  * row-for-row against the standalone registry queries.
  *
  * Model tests gate the funnel the dbt way: a label must exist and be
  * unique per document, and the keep list must be one row per cluster —
  * a failed invariant skips the downstream emit instead of shipping a
  * corrupt keep list.
  */
object DedupFunnel {

  val postings: Model =
    Model("dedup_postings", Seq("documents"), Materialization.Table,
      tests = Seq(NotNull("hs"))) { in =>
      Dedup.shinglePostsDf(in("documents"))
    }

  val pairs: Model =
    Model("dedup_pairs", Seq("dedup_postings"), Materialization.Table,
      tests = Seq(NotNull("doc_a"), NotNull("doc_b"))) { in =>
      // measured direct-vs-prefix routing over the MATERIALIZED
      // postings checkpoint (VERDICT r20 #1 — the funnel previously
      // re-shingled inside jaccardPairsDf and was locked to the
      // direct posting join whose Σdf² fan-out the r20 100× legs
      // measured superlinear on boilerplate-heavy corpora). The
      // checkpoint makes the df-skew probe one column-pruned parquet
      // scan and lets the prefix branch's four postings references
      // read parquet instead of re-running the shingle window.
      Dedup.pairsFromPostsAuto(in("dedup_postings"))
    }

  val labels: Model =
    Model("dedup_labels", Seq("documents", "dedup_pairs"), Materialization.Table,
      tests = Seq(Unique("doc_id"), NotNull("cluster_id"))) { in =>
      Clusters.connectedComponents(
        in("documents").select("doc_id"),
        in("dedup_pairs").select("doc_a", "doc_b"))
    }

  val clusterReport: Model =
    Model("dedup_cluster_report", Seq("dedup_labels"), Materialization.View) { in =>
      Clusters.componentReport(in("dedup_labels"))
    }

  val keepList: Model =
    Model("dedup_keep_list", Seq("dedup_labels", "documents"), Materialization.Table,
      tests = Seq(Unique("cluster_id"), NotNull("kept_doc"))) { in =>
      Clusters.keepBest(in("dedup_labels"), in("documents"))
    }

  val all: Seq[Model] = Seq(postings, pairs, labels, clusterReport, keepList)

  /** Run the funnel over a harness data directory. */
  def run(spark: SparkSession, dir: String,
          sink: TableSink = new TableSink.Cached): RunResult =
    run(new ParquetCatalog(spark, dir), sink)

  def run(catalog: Catalog, sink: TableSink): RunResult =
    new DagRunner(catalog, sink).run(all)
}
