package graft.models

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.{Catalog, DagRunner, Materialization, Model, NotNull, ParquetCatalog, RunResult, TableSink, Unique}
import graft.ext.{KMeans, Similarity}

/** The ANN index BUILD as a materialized DAG — the production
  * lifecycle of the registry's IVF+PQ search
  * (`ann_ivfpq_topk`, whose standalone form re-trains per query by
  * the driver contract; `PLANS.md` documents that cost). A real
  * vector-search deployment trains and encodes ONCE per corpus
  * version and every query after that reads the index tables:
  *
  * {{{
  *   embeddings ──> ann_centroids (Table) ──> ann_cells (Table) ──┐
  *   embeddings ──> ann_pq_codebook (Table) ──> ann_pq_codes ─────┼─> ann_index_report (View)
  *                                             (Table)            │
  *                                       search reads all four ───┘
  * }}}
  *
  * Why this shape at 100 TB: the codes table IS the stored index —
  * PqBlocks 4-bit-ish codes per vector, ~64× smaller than the float
  * corpus — and cells/codebook/centroids are broadcast-sized. Search
  * cost is then probe-join + LUT-sum over materialized parquet
  * (bucketing the codes table by cell makes the probe join partition
  * pruning). Model tests gate the build the dbt way: duplicate cell
  * assignments or a hole in the codebook skip the downstream emit
  * instead of shipping a corrupt index.
  *
  * EngineSpec pins the contract that matters: [[search]] over the
  * MATERIALIZED tables returns row-for-row the registry query's
  * result — materialization must never change answers.
  */
object AnnIndexPipeline {

  val centroids: Model =
    Model("ann_centroids", Seq("embeddings"), Materialization.Table,
      tests = Seq(Unique("cluster"), NotNull("centroid"))) { in =>
      KMeans.trained(in("embeddings"))
    }

  val cells: Model =
    Model("ann_cells", Seq("embeddings", "ann_centroids"), Materialization.Table,
      tests = Seq(Unique("vec_id"), NotNull("cluster"))) { in =>
      KMeans.assign(in("embeddings"), in("ann_centroids"))
        .select("vec_id", "cluster")
    }

  val codebook: Model =
    Model("ann_pq_codebook", Seq("embeddings"), Materialization.Table,
      tests = Seq(NotNull("cv"))) { in =>
      Similarity.pqTrainCodebook(in("embeddings"))
    }

  val codes: Model =
    Model("ann_pq_codes", Seq("embeddings", "ann_pq_codebook"), Materialization.Table,
      tests = Seq(NotNull("code"))) { in =>
      Similarity.pqEncodeCodes(in("embeddings"), in("ann_pq_codebook"))
    }

  /** Index health: cell-size balance and code-usage coverage — the
    * monitoring view an index rebuild job watches (an empty cell or a
    * dead codeword signals training drift before recall decays).
    */
  val report: Model =
    Model("ann_index_report",
      Seq("ann_centroids", "ann_cells", "ann_pq_codebook", "ann_pq_codes"),
      Materialization.View) { in =>
      val cellSizes = in("ann_cells").groupBy("cluster")
        .agg(count(lit(1)).as("n_vecs"))
      val codeUse = in("ann_pq_codes").groupBy("blk")
        .agg(countDistinct(col("code")).as("codes_used"))
      cellSizes.agg(
        count(lit(1)).as("n_cells"),
        sum(col("n_vecs")).as("n_indexed"),
        min(col("n_vecs")).as("min_cell"),
        max(col("n_vecs")).as("max_cell"))
        .crossJoin(codeUse.agg(
          min(col("codes_used")).as("min_codes_used"),
          max(col("codes_used")).as("max_codes_used")))
    }

  val all: Seq[Model] = Seq(centroids, cells, codebook, codes, report)

  /** IVF+PQ top-k against the MATERIALIZED index. `embeddings` is the
    * raw corpus (query vectors come from it by the registry's
    * vec_id < NumQueries convention).
    */
  def search(embeddings: org.apache.spark.sql.DataFrame,
      catalogRead: String => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    Similarity.ivfpqSearchFromIndex(embeddings,
      catalogRead("ann_centroids"), catalogRead("ann_cells"),
      catalogRead("ann_pq_codebook"), catalogRead("ann_pq_codes"))

  /** INCREMENTAL refresh: encode a NEW vector batch against the
    * FROZEN materialized index (codebook + centroids stay fixed) and
    * upsert its codes and cell assignments — the production path when
    * vectors arrive continuously: per-batch cost is encode-only
    * (broadcast codebook, no training), and retraining is a scheduled
    * REBUILD that swaps the whole index version. Same-key rows
    * replace (re-ingest of a vector re-encodes it); the staged-swap
    * upsert keeps readers consistent mid-refresh.
    */
  def refresh(spark: SparkSession, warehouse: String,
      batch: org.apache.spark.sql.DataFrame): Unit = {
    val sink = new TableSink.ParquetUpsert(warehouse, Map(
      "ann_cells" -> Seq("vec_id"),
      "ann_pq_codes" -> Seq("vec_id", "blk")))
    val cents = spark.read.parquet(s"$warehouse/ann_centroids")
    val cb = spark.read.parquet(s"$warehouse/ann_pq_codebook")
    sink.write("ann_cells",
      KMeans.assign(batch, cents).select("vec_id", "cluster"))
    sink.write("ann_pq_codes", Similarity.pqEncodeCodes(batch, cb))
  }

  /** Build the index over a harness data directory. */
  def run(spark: SparkSession, dir: String,
      sink: TableSink = new TableSink.Cached): RunResult =
    run(new ParquetCatalog(spark, dir), sink)

  def run(catalog: Catalog, sink: TableSink): RunResult =
    new DagRunner(catalog, sink).run(all)

  /** The production READ path as a registry row (VERDICT r11 ask #7):
    * build the index DAG into a parquet warehouse, then answer with
    * [[search]] over the MATERIALIZED tables — so the driver
    * hash-checks the whole materialize-then-read lifecycle against
    * the same oracle as the standalone `ann_ivfpq_topk` (search is
    * pinned row-equal by EngineSpec; this makes it driver-verified
    * too), and the official bench prices the lifecycle every round.
    * BENCHNOTES r12 decomposes the cost into build+write vs
    * search-only. A corrupt build (failed model test) must never
    * serve: the gate requires on the DAG's own test results.
    */
  val fromIndex: graft.queries.Inventory.Q = graft.queries.Inventory.Q(
    (s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-annidx-reg").toString
      val r = run(s, d, new TableSink.Parquet(wh))
      require(r.allTestsPassed && r.skipped.isEmpty,
        s"index build gated: ${r.tests.filterNot(_.passed).mkString(", ")}")
      search(s.read.parquet(s"$d/embeddings.parquet"), r(_))
    },
    graft.ext.Similarity.ivfpqTopK.oracle)

  val queries: Seq[(String, graft.queries.Inventory.Q)] =
    Seq("ann_ivfpq_from_index" -> fromIndex)
}
