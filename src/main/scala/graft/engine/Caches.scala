package graft.engine

import org.apache.spark.sql.DataFrame

/** Explicit ownership for caches that OUTLIVE the function that built
  * them — the loop-state retention contract of the component fixpoints
  * ([[graft.ext.Clusters]]): the returned plan reads a cached relation,
  * so the producer cannot unpersist it, and in a long-lived session it
  * normally stays resident until the consumer is done with it.
  *
  * Consumers that fully materialize such a result (the funnel registry
  * rows, which collect a bounded output) reclaim the storage by running
  * the producer inside [[scoped]]. The earlier idiom — snapshotting
  * `sparkContext.getPersistentRDDs` and unpersisting the id DELTA —
  * freed every cache that appeared during the run, including caches a
  * CONCURRENT query on the same session was still using (ADVICE r18);
  * this registry is thread-local, so a scope only ever releases caches
  * its own call stack explicitly [[retain]]ed.
  */
object Caches {

  private val scopeLocal =
    new ThreadLocal[scala.collection.mutable.ArrayBuffer[DataFrame]]()

  /** Register a cached DataFrame that the caller hands to its own
    * caller still-cached (the returned plan reads it). No-op when no
    * [[scoped]] block is active on this thread — the default session
    * behavior (cache lives until the session drops it) is unchanged.
    */
  private[graft] def retain(df: DataFrame): DataFrame = {
    val buf = scopeLocal.get()
    if (buf != null) buf += df
    df
  }

  /** Run `body`; afterwards unpersist every cache [[retain]]ed on THIS
    * thread inside it (async — storage frees in the background).
    * Scopes nest: an inner scope releases only its own retentions.
    * `body` must fully consume the retained relations (collect or
    * write) before returning — their caches are gone afterwards and
    * lazy plans over them would recompute from scratch.
    */
  def scoped[T](body: => T): T = {
    val outer = scopeLocal.get()
    val buf = scala.collection.mutable.ArrayBuffer[DataFrame]()
    scopeLocal.set(buf)
    try body
    finally {
      scopeLocal.set(outer)
      buf.foreach(_.unpersist(blocking = false))
    }
  }
}

/** Scratch-directory hygiene for registry rows that materialize into a
  * temp warehouse (the verification-pricing pattern: run the real DAG,
  * gate on its tests, collect the bounded deliverable, leave nothing).
  */
object Scratch {

  /** Recursive delete, deepest-first; best-effort by design (a file
    * the OS still holds just stays for tmp-reaping). The walk stream
    * is CLOSED — `Files.walk` holds a directory handle per open level
    * and leaks it if only iterated (ADVICE r18).
    */
  def deleteTree(root: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    val st = java.nio.file.Files.walk(root)
    try st.iterator().asScala.toSeq.reverse
      .foreach(p => java.nio.file.Files.deleteIfExists(p))
    finally st.close()
  }
}
