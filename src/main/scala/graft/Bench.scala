package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong
import scala.jdk.CollectionConverters._

/** Benchmark main (driver contract): run every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, print ONE JSON line with per-query seconds.
  *
  * Queries execute through the `noop` sink so the full plan — every
  * column, every operator — actually runs (a bare `count()` would let
  * Catalyst prune projections and undercount the work).
  *
  * Beside wall seconds, a task-metrics listener records per-query
  * shuffle bytes, spill, input bytes, task CPU and GC time. Wall time
  * on a shared box is contaminated by whatever else runs (the round-8
  * official bench inflated carried queries 13–23× while a concurrent
  * session compiled; round 12 repeated the episode with a ~30 s
  * starvation window over five ann_* rows); bytes shuffled/read and
  * rows produced by a fixed plan are invariant under contention, and
  * task CPU time nearly so — so round-over-round plan regressions stay
  * adjudicable from the artifact alone even when wall is poisoned.
  *
  * Timing runs TWO serialized passes and reports the per-query MIN
  * (standard best-of-N steady-state practice): transient external
  * contention only adds time, so min-of-2 bounds a single burst's
  * damage to whichever pass it hit. Both raw passes land in
  * target/bench.json (`queries_p1`/`queries_p2`) for audit.
  */
object Bench {

  /** Sums TaskMetrics across every task that ends between reset() and
    * snapshot(). Queries run one at a time, so the window attribution
    * is exact once the listener bus is drained.
    */
  private final class TaskMetricsAgg extends SparkListener {
    private val m = new ConcurrentHashMap[String, AtomicLong]()
    private def cell(k: String) = m.computeIfAbsent(k, _ => new AtomicLong())
    def reset(): Unit = m.clear()
    def snapshot(): Map[String, Long] =
      m.asScala.map { case (k, v) => k -> v.get }.toMap
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val tm = t.taskMetrics
      if (tm != null) {
        cell("tasks").addAndGet(1L)
        cell("shuffle_read_b").addAndGet(tm.shuffleReadMetrics.totalBytesRead)
        cell("shuffle_write_b").addAndGet(tm.shuffleWriteMetrics.bytesWritten)
        cell("shuffle_rows").addAndGet(tm.shuffleWriteMetrics.recordsWritten)
        cell("spill_mem_b").addAndGet(tm.memoryBytesSpilled)
        cell("spill_disk_b").addAndGet(tm.diskBytesSpilled)
        cell("input_b").addAndGet(tm.inputMetrics.bytesRead)
        cell("input_rows").addAndGet(tm.inputMetrics.recordsRead)
        cell("cpu_ms").addAndGet(tm.executorCpuTime / 1000000L)
        cell("run_ms").addAndGet(tm.executorRunTime)
        cell("gc_ms").addAndGet(tm.jvmGCTime)
        cell("peak_mem_b").updateAndGet(p => math.max(p, tm.peakExecutionMemory))
      }
    }
  }

  /** Listener events are delivered async; flush them so snapshot() sees
    * every task of the query that just finished. `listenerBus` is
    * private[spark] in source but public in bytecode — reflection keeps
    * this a dev-metrics concern with zero library-API footprint.
    */
  private def drainListenerBus(sc: org.apache.spark.SparkContext): Unit =
    try {
      val bus = sc.getClass.getMethods.find(_.getName == "listenerBus").get.invoke(sc)
      bus.getClass.getMethods
        .find(x => x.getName == "waitUntilEmpty" && x.getParameterCount == 0)
        .get.invoke(bus)
    } catch { case _: Throwable => Thread.sleep(500) }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val agg = new TaskMetricsAgg
    def newSession(): SparkSession = {
      // Partition count decouples from thread count for the scale
      // sweeps: at 30× data under a small heap, partitions=cpus(4)
      // puts a quarter of the corpus in one task — the spill-merge
      // fan-in (one read-ahead buffer per spill file) then OOMs the
      // heap regardless of plan quality. Since r15 the default is
      // POLICY, not a hand-set knob: max(cpus, data-sized count from
      // measured input bytes — engine.Partitioning). At the official
      // sf0.1 this is exactly the old partitions = cpus (17 MiB of
      // input → the cpus floor wins, so official numbers are
      // unaffected); at 30×/100× the count grows with the corpus and
      // the r14 sweep's hand-set 64 falls out as ~57/~178. The env
      // override remains for explicit experiments.
      val shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS",
        math.max(cpus.toInt,
          graft.engine.Partitioning.partitionsFor(
            graft.engine.Partitioning.dirBytes(sfDir))).toString)
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", shufflePartitions)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s.sparkContext.addSparkListener(agg)
      s
    }
    var spark = newSession()
    // An executor-thread OutOfMemoryError in local mode kills the
    // SHARED SparkContext (SparkUncaughtExceptionHandler), and every
    // later row would then fail on "stopped SparkContext" — one bad
    // query poisoning the rest of the pass (observed in the r14 30×
    // sweep: dedup_components OOMed the 1 GiB heap and 25 healthy
    // rows lost their measurement). The OOM row itself must stay LOUD
    // in the artifact (it does — its error is recorded); the recovery
    // below rebuilds the session so the remaining rows still measure.
    def ensureLive(): Unit =
      if (spark.sparkContext.isStopped) {
        System.err.println("[bench] SparkContext died — rebuilding session for remaining queries")
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
        spark = newSession()
      }
    // Codegen/JIT warmup: every query has its own generated code, and a
    // cold first run is dominated by compiling it (measured 5.3 s cold
    // vs 0.9 s warm for the shingle pipeline alone) — noise that says
    // nothing about throughput at scale. Warm EVERY query shape once on
    // the smallest dataset available (falling back to sfDir), so the
    // measured pass below reports steady-state execution. Warmup
    // failures must never abort the bench.
    val warmDir = Seq("/root/testdata/sf0.001", sfDir)
      .find(p => new java.io.File(p).isDirectory).getOrElse(sfDir)
    // Local-iteration filter (comma-separated names). The driver never
    // sets it — official rounds always time the full registry.
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    selected.foreach { case (name, fn) =>
      try { ensureLive(); fn(spark, warmDir).write.format("noop").mode("overwrite").save() }
      catch { case e: Throwable => System.err.println(s"[bench] warmup $name failed: ${e.getMessage}") }
    }
    // One serialized timed pass over every selected query.
    def timedPass(pass: Int): Seq[(String, Double, Map[String, Long], Option[String])] =
      selected.map { case (name, fn) =>
        // Self-contained timing: no cached relation (several queries
        // .cache() by convention — customer_rfm base, components labels,
        // pagerank ranks) may carry storage or GC pressure into the next
        // measurement. clearCache sits OUTSIDE the timed window.
        ensureLive()
        spark.catalog.clearCache()
        agg.reset()
        val t0 = System.nanoTime()
        // A failed query must be LOUD in the artifact: round 9 had nine
        // analysis failures run as ~0.05 s no-ops, which IMPROVED the
        // headline total while silently dropping ~6 s of real work.
        val err: Option[String] =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            val cut = Option(e.getMessage).getOrElse(e.getClass.getName)
              .linesIterator.take(2).mkString(" ").take(300)
            // a 300-char cut can split a UTF-16 surrogate pair; trim to
            // a code-point boundary so the JSON stays encodable
            Some(if (cut.nonEmpty && Character.isHighSurrogate(cut.last)) cut.dropRight(1) else cut)
          }
        val dt = (System.nanoTime() - t0) / 1e9
        drainListenerBus(spark.sparkContext)
        val tm = agg.snapshot()
        System.err.println(f"[bench p$pass] $name%-28s $dt%8.2f s  cpu=${tm.getOrElse("cpu_ms", 0L) / 1000.0}%7.1f s" +
          f"  shuf=${tm.getOrElse("shuffle_write_b", 0L) / 1048576.0}%8.1f MiB" +
          f"  spill=${tm.getOrElse("spill_disk_b", 0L) / 1048576.0}%6.1f MiB" +
          err.map(m => s"  ERROR: $m").getOrElse(""))
        (name, dt, tm, err)
      }
    // Best-of-2: the r12 official pass carried a ~30 s external CPU-
    // starvation window (queries #20–24 inflated 4–23× wall with task
    // counts IDENTICAL to archived passes and ann_recall_eval at wall
    // 3.9× / cpu 1.04× — pure core starvation, not code; see BENCHNOTES
    // r13 adjudication). A fixed plan's steady-state cost is the
    // per-query MIN across serialized passes: transient contention can
    // only ever ADD time, never subtract it. Both raw passes are
    // persisted in target/bench.json (queries_p1/p2) so the headline
    // number stays auditable against its inputs.
    // Pass count knob for the SCALE-SWEEP harness only (pass/fail
    // memory-ceiling runs don't need best-of-2 and the second pass
    // doubles a multi-hour 1 GiB sweep): official rounds never set it
    // — the driver runs the default, which stays 2.
    val nPasses = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").toInt
    val pass1 = timedPass(1)
    val pass2 = if (nPasses > 1) timedPass(2) else pass1
    val results = pass1.zip(pass2).map { case (r1 @ (n1, d1, _, e1), r2 @ (_, d2, _, e2)) =>
      // prefer a successful pass; among successes, the faster one
      (e1, e2) match {
        case (Some(_), None) => r2
        case (None, Some(_)) => r1
        case _               => if (d1 <= d2) r1 else r2
      }
    }
    // Single-pass mode emits ONLY queries_p1 — duplicating pass 1 into
    // a fabricated queries_p2 would show a reader two "passes" that
    // never both ran (ADVICE r14); the "timing" marker names the mode.
    val passes = Seq("queries_p1" -> pass1) ++
      (if (nPasses > 1) Seq("queries_p2" -> pass2) else Nil)
    val passJson = passes.map { case (label, p) =>
      "\"" + label + "\":" + p.map { case (k, v, _, _) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    }.mkString(",")
    val qs = results.map { case (k, v, _, _) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val tmJson = results.map { case (k, _, tm, _) =>
      "\"" + k + "\":" + tm.toSeq.sortBy(_._1)
        .map { case (mk, mv) => "\"" + mk + "\":" + mv }.mkString("{", ",", "}")
    }.mkString("{", ",", "}")
    // full JSON string escaping: backslash, quote, AND control chars
    // (< 0x20 as \u00XX) — exception messages carry tabs/CRs that would
    // otherwise make the errors map technically invalid JSON
    def jstr(s: String) = s.foldLeft(new StringBuilder("\"")) { (sb, c) =>
      c match {
        case '\\' => sb.append("\\\\")
        case '"' => sb.append("\\\"")
        case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
    }.append('"').toString
    val failed = results.collect { case (k, _, _, Some(m)) => (k, m) }
    val errJson = failed.map { case (k, m) => jstr(k) + ":" + jstr(m) }.mkString("{", ",", "}")
    // A query that fails in exactly ONE pass is healed by best-of-2
    // (the success is chosen), but the flake must stay LOUD in the
    // audited artifact, not just stderr (ADVICE r13): per-pass error
    // maps ride beside the per-pass durations.
    val errPasses = Seq("errors_p1" -> pass1) ++
      (if (nPasses > 1) Seq("errors_p2" -> pass2) else Nil)
    val passErrJson = errPasses.map { case (label, p) =>
      "\"" + label + "\":" + p.collect { case (k, _, _, Some(m)) => (k, m) }
        .map { case (k, m) => jstr(k) + ":" + jstr(m) }.mkString("{", ",", "}")
    }.mkString(",")
    val total = results.map(_._2).sum
    // "timing" marks the methodology IN the artifact (ADVICE r13):
    // cross-round readers must not attribute the best-of-2 vs
    // single-pass delta to code.
    val timing = if (nPasses > 1) "min_of_2" else "single_pass"
    // Stdout carries the ONE contract JSON line INCLUDING the
    // per-query seconds map (VERDICT r21 #2: PERF_r20/r21 both landed
    // `per_query: {}` because the compact line carried no "queries"
    // field, so the driver could not attribute per-query regressions).
    // Per-query values are rounded to 0.1 ms to keep the line compact
    // (~6 KB); full-precision seconds per pass plus task metrics and
    // errors are persisted to target/bench.json (`detail` points at
    // it) and archived as BENCH_detail_rN.json at round close. Because
    // historical rounds saw a ~2 KB tail-capture window cut an
    // embedded map mid-JSON (BENCH_r06..r16 `parsed: null`; r16's map
    // truncated at 55 keys), a compact summary WITHOUT the map is
    // also printed to stderr right before — any tail window that
    // clips the full line still contains one complete parseable
    // summary object.
    try {
      val out = java.nio.file.Paths.get("target", "bench.json")
      java.nio.file.Files.createDirectories(out.getParent)
      val full = s"""{"metric":"total","value":$total,"unit":"sec","timing":"$timing","queries":$qs,$passJson,$passErrJson,"task_metrics":$tmJson,"n_failed":${failed.size},"errors":$errJson,"sf":"$sfDir"}"""
      java.nio.file.Files.write(out, (full + "\n").getBytes("UTF-8"))
    } catch { case e: Throwable => System.err.println(s"[bench] file write failed: ${e.getMessage}") }
    // errors ride along only while they fit a ~3.5 KB tail window
    // beside the rest of the line; a mass-failure round points at the
    // detail file instead of truncating mid-JSON
    val errField = if (failed.size <= 3) errJson else "\"see detail\""
    // 0.1 ms-rounded per-query seconds for the contract line (additions
    // only: every registry name stays; target/bench.json keeps full
    // precision)
    val qsRounded = results
      .map { case (k, v, _, _) => "\"" + k + "\":" + (math.rint(v * 10000) / 10000) }
      .mkString("{", ",", "}")
    System.err.println(s"""{"metric":"total","value":$total,"unit":"sec","timing":"$timing","n_queries":${results.size},"n_failed":${failed.size},"errors":$errField,"detail":"target/bench.json","sf":"$sfDir"}""")
    println(s"""{"metric":"total","value":$total,"unit":"sec","timing":"$timing","n_queries":${results.size},"n_failed":${failed.size},"errors":$errField,"queries":$qsRounded,"detail":"target/bench.json","sf":"$sfDir"}""")
    spark.stop()
  }
}
