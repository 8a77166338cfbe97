package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump every Window node in every registry plan with its partition
  * keys (expr-ids stripped) — the generator for PlanSpec's mechanical
  * partitioned-window allowlist (VERDICT r18 ask #3): the
  * unpartitioned-window sweep made ONE degenerate class mechanical;
  * this catalogs the partitioned-but-possibly-degenerate class so the
  * spec can pin, per query, exactly which partition keys windows are
  * allowed over.
  *
  * Since r19 the dump also catalogs UNBOUNDED-STATE COLLECTORS
  * (`collect_list`/`collect_set`) with their grouping keys (COLAUDIT
  * lines) — the aggregate-side twin of the degenerate-key window
  * family: partial aggregation bounds a sum/min/heap state by
  * CONSTRUCTION, but a collector's state is the group's row count, so
  * a collector grouped by a hot key rebuilds the very
  * whole-group-in-one-buffer shape the window conversions engineered
  * out. PlanSpec pins these to an exact per-query key allowlist too.
  *
  * And EXPLICIT BROADCAST HINTS (BCAUDIT lines): AQE's auto-broadcast
  * self-corrects at scale (it sizes the real build side at runtime),
  * but an explicit `broadcast(df)` is obeyed regardless — a hint on a
  * corpus-scaled relation that fits at the test SF is a guaranteed
  * driver/executor OOM at 100 TB. Each hinted subtree gets a
  * mechanical signature `<shape>:<sorted leaf tables>` where shape is
  * `agg` (an Aggregate/Distinct collapses the subtree to a bounded
  * domain before the hint), `flt` (a Filter gates it — bounded only
  * if the predicate is a contract, which the PlanSpec allowlist
  * classifies), or `raw` (the leaves flow to the hint unreduced —
  * safe only for fixed-cardinality dimension tables).
  *
  * Usage: sbt "runMain graft.tools.WindowAudit [sfDir]"
  * Prints one line per (query, window partition-key set), one per
  * (query, collector grouping-key set), and one per (query,
  * broadcast-hint signature).
  */
object WindowAudit {

  /** One signature per explicit broadcast hint in the plan:
    * `<shape>:<sorted distinct leaf tables>`. Shape `agg` = an
    * Aggregate/Distinct/Deduplicate/GlobalLimit collapses the hinted
    * subtree to a bounded domain; `flt` = a Filter gates it (bounded
    * only when the predicate is a contract — the allowlist classifies
    * which); `raw` = leaves flow to the hint unreduced. Shared by the
    * BCAUDIT dump and PlanSpec's broadcast-hint sweep so the ground
    * truth and the pin can never drift.
    */
  def broadcastSignatures(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Seq[String] = {
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    plan.collect {
      case h: ResolvedHint if h.hints.strategy.contains(BROADCAST) =>
        val leaves = h.child.collect {
          case lr: LogicalRelation =>
            lr.relation match {
              case fs: HadoopFsRelation =>
                fs.location.rootPaths.map(_.getName.stripSuffix(".parquet"))
                  .distinct.sorted.mkString("|")
              case other => other.getClass.getSimpleName
            }
          case _: LocalRelation => "local"
          case _: Range => "range"
          case l: LeafNode => l.nodeName
        }
        val shape =
          if (h.child.exists {
                case _: Aggregate | _: Distinct | _: Deduplicate | _: GlobalLimit => true
                case _ => false
              }) "agg"
          else if (h.child.exists { case _: Filter => true; case _ => false }) "flt"
          else "raw"
        s"$shape:${leaves.distinct.sorted.mkString("+")}"
    }
  }

  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.catalyst.expressions.aggregate.{CollectList, CollectSet}
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    // The ANALYZED plan, not the optimized one: cache substitution
    // (CacheManager.useCachedData) rewrites optimized plans through
    // InMemoryRelation whenever an EARLIER query persisted a matching
    // subtree, so optimized-plan window sets depend on build ORDER —
    // the analyzed plan is cache-independent (and cache-hidden windows
    // still run on a cold cache, so it is also truer to the audit's
    // intent). Lineage truncated through RDDs (checkpointed loops)
    // stays invisible either way; those stages are priced separately.
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, d).queryExecution.analyzed
        val wins = plan.collect { case w: LWindow => w }
        if (wins.exists(_.partitionSpec.isEmpty)) println(s"""WINAUDIT\t$name\t<GLOBAL>""")
        wins.filter(_.partitionSpec.nonEmpty)
          .map(_.partitionSpec.map(e => e.sql.replaceAll("#\\d+", "")).sorted.mkString(","))
          .toSet.toSeq.sorted.foreach(k => println(s"""WINAUDIT\t$name\t$k"""))
        plan.collect {
          case a: Aggregate if a.aggregateExpressions.exists(_.exists {
                case _: CollectList | _: CollectSet => true
                case _ => false
              }) =>
            if (a.groupingExpressions.isEmpty) "<GLOBAL>"
            else a.groupingExpressions
              .map(_.sql.replaceAll("#\\d+", "")).sorted.mkString(",")
        }.toSet.toSeq.sorted.foreach(k => println(s"""COLAUDIT\t$name\t$k"""))
        broadcastSignatures(plan).toSet.toSeq.sorted
          .foreach(k => println(s"""BCAUDIT\t$name\t$k"""))
      } catch {
        case e: Throwable => println(s"""WINAUDIT_ERR\t$name\t${e.getClass.getSimpleName}""")
      }
    }
    spark.stop()
  }
}
