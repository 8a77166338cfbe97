package graft.engine

import org.apache.spark.sql.DataFrame

import scala.collection.mutable

/** Result of one DAG run. `relations` holds every successfully built
  * model (views lazily, tables post-materialization); `tests` every
  * executed data test; `skipped` models not built because an upstream
  * model's tests failed (dbt `build` gating, SURVEY.md §3.1 step 6).
  */
final case class RunResult(
    relations: Map[String, DataFrame],
    tests: Seq[TestResult],
    skipped: Seq[String]
) {
  def allTestsPassed: Boolean = tests.forall(_.passed)
  def apply(name: String): DataFrame = relations(name)
}

/** Dependency-ordered DAG executor — the one piece of dbt-core the
  * warehouse doesn't provide (SURVEY.md §3.4). Pure Scala scheduling;
  * all data movement stays inside Spark.
  *
  * Semantics matched to `dbt build` (SURVEY.md §3.1):
  *   1. topo-sort models; unknown deps resolve against the catalog
  *      (= dbt sources).
  *   2. View models stay lazy DataFrames (warehouse view inlining —
  *      Catalyst pushes predicates/pruning through them for free).
  *   3. Table models materialize through the [[TableSink]].
  *   4. Each model's tests run right after materialization; a failed
  *      test marks all transitive descendants skipped.
  *
  * Scale note: the runner never calls an action on view models, and
  * table models incur exactly one job each (the write). Independent
  * subtrees could be submitted from separate threads for concurrent
  * Spark scheduling; at 100 TB the write itself dominates, so we keep
  * scheduling sequential-and-simple here.
  */
final class DagRunner(catalog: Catalog, sink: TableSink = new TableSink.Cached) {

  /** Kahn topo-sort over model-to-model edges; deterministic order
    * (insertion-ordered among ready nodes); throws on cycles and on
    * names that are neither models nor catalog tables.
    */
  def topoSort(models: Seq[Model]): Seq[Model] = {
    val byName = models.map(m => m.name -> m).toMap
    val indeg = mutable.LinkedHashMap(models.map(m => m.name -> 0): _*)
    val out = mutable.Map.empty[String, List[String]].withDefaultValue(Nil)
    for (m <- models; d <- m.deps if byName.contains(d)) {
      indeg(m.name) += 1
      out(d) ::= m.name
    }
    val ready = mutable.Queue(indeg.collect { case (n, 0) => n }.toSeq: _*)
    val order = mutable.ArrayBuffer.empty[Model]
    while (ready.nonEmpty) {
      val n = ready.dequeue()
      order += byName(n)
      for (c <- out(n).reverse) {
        indeg(c) -= 1
        if (indeg(c) == 0) ready += c
      }
    }
    if (order.size != models.size) {
      val stuck = indeg.collect { case (n, d) if d > 0 => n }
      throw new IllegalArgumentException(s"model DAG has a cycle involving: ${stuck.mkString(", ")}")
    }
    order.toSeq
  }

  def run(models: Seq[Model]): RunResult = {
    val order = topoSort(models)
    val modelNames = models.map(_.name).toSet
    val built = mutable.LinkedHashMap.empty[String, DataFrame]
    val results = mutable.ArrayBuffer.empty[TestResult]
    val failedOrSkipped = mutable.Set.empty[String]
    val skipped = mutable.ArrayBuffer.empty[String]

    for (m <- order) {
      if (m.deps.exists(d => failedOrSkipped.contains(d))) {
        failedOrSkipped += m.name
        skipped += m.name
      } else {
        val inputs: Map[String, DataFrame] =
          m.deps.map { d =>
            d -> (if (modelNames.contains(d)) built(d) else catalog.table(d))
          }.toMap
        val df = m.transform(inputs)
        val rel = m.materialization match {
          case Materialization.View  => df
          case Materialization.Table => sink.write(m.name, df)
        }
        built += m.name -> rel
        val testRs = m.tests.map(t => TestResult(m.name, t.name, t.passes(rel)))
        results ++= testRs
        if (testRs.exists(!_.passed)) failedOrSkipped += m.name
      }
    }
    RunResult(built.toMap, results.toSeq, skipped.toSeq)
  }
}
