package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Project manifest — the analogue of `dbt docs generate`'s
  * `manifest.json` lineage artifact: one row per model with its
  * dependencies, materialization, test inventory, and DAG depth, as a
  * DataFrame (queryable, writable, joinable — the idiomatic shape for
  * a Spark-native engine rather than a JSON side-file).
  *
  * Depth is the longest dependency path from a source, i.e. the wave
  * index a [[DagRunner]] executes the model in — so `ORDER BY depth`
  * reads as the execution schedule.
  */
object Manifest {

  final case class ModelInfo(
      name: String,
      materialization: String,
      depth: Int,
      deps: Seq[String],
      sources: Seq[String],
      tests: Seq[String])

  def manifest(spark: SparkSession, models: Seq[Model]): DataFrame = {
    import spark.implicits._
    val names = models.map(_.name).toSet
    val depth = scala.collection.mutable.Map.empty[String, Int]
    // DagRunner validates cycles before running, but manifest() is
    // callable on its own — guard the recursion so a cyclic deps
    // declaration is a named error, not a StackOverflowError.
    val visiting = scala.collection.mutable.LinkedHashSet.empty[String]
    def depthOf(m: Model): Int =
      depth.getOrElse(m.name, {
        if (!visiting.add(m.name))
          throw new IllegalArgumentException(
            s"dependency cycle: ${(visiting.toSeq.dropWhile(_ != m.name) :+ m.name).mkString(" -> ")}")
        val d = m.deps.filter(names.contains)
          .map(dep => depthOf(models.find(_.name == dep).get) + 1)
          .maxOption.getOrElse(0)
        visiting.remove(m.name)
        depth.update(m.name, d)
        d
      })
    models.map { m =>
      ModelInfo(
        name = m.name,
        materialization = m.materialization match {
          case Materialization.View  => "view"
          case Materialization.Table => "table"
        },
        depth = depthOf(m),
        deps = m.deps.filter(names.contains),
        sources = m.deps.filterNot(names.contains),
        tests = m.tests.map(_.name))
    }.toDF().orderBy("depth", "name")
  }
}
