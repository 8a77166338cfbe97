package graft.engine

/** Data-sized partition policy (VERDICT r14 ask #4): loop operators
  * and the scale-sweep harness used to size shuffle partitions from
  * THREAD COUNT (`local[n]` → n), which is a memory hazard, not a
  * policy — at the 30× corpus, partitions = cpus(4) put a quarter of
  * the exploded posting stream in one task and the spill-merge fan-in
  * (one read-ahead buffer per spill file) OOMed any small heap
  * regardless of plan quality; the r14 sweep survived only with a
  * hand-set 64. This object makes the working number a computed one:
  * partition counts derive from measured INPUT BYTES, so the same
  * code is correct at 1× and 100× and under any heap — exactly how a
  * production cluster sizes (executors scale with data volume, not
  * with one box's core count).
  */
object Partitioning {

  /** Target compressed-parquet input bytes per shuffle partition.
    * 8 MiB of columnar-compressed text expands roughly 4–8× once
    * exploded into posting/shingle rows on the shuffle wire, landing
    * each in-flight partition near AQE's 64 MiB advisory partition
    * size — small enough that a 1 GiB heap holds a few partitions
    * plus their spill buffers (the r14 measured-good configuration:
    * 454 MiB of 30× input over 57–64 partitions), large enough that
    * the harness corpus never fans into scheduling noise.
    */
  val BytesPerPartition = 8L << 20

  /** Shuffle-wire bytes per undirected edge in a loop operator's
    * cached state: two longs plus row/serialization overhead.
    */
  val EdgeWireBytes = 48L

  /** Target bytes of cached loop STATE per partition. Smaller than
    * [[BytesPerPartition]] because a fixed-point round re-caches its
    * whole partition every iteration and joins it against the edge
    * set — ~4 MiB ≈ 87k edges keeps each round's tasks meaningful
    * (the measured ~100k-edges-per-partition rule of r12) while
    * bounding any round's per-task memory at any corpus size.
    */
  val EdgeStateBytesPerPartition = 4L << 20

  /** Partitions for `inputBytes` of data at `bytesPerPartition` each;
    * floored at 1, NO ceiling — the count grows with the data by
    * design (a ceiling is how the thread-count hazard re-enters).
    */
  def partitionsFor(inputBytes: Long,
      bytesPerPartition: Long = BytesPerPartition): Int = {
    require(bytesPerPartition > 0)
    math.max(1L, (inputBytes + bytesPerPartition - 1) / bytesPerPartition)
      .min(Int.MaxValue.toLong).toInt
  }

  /** Loop partitioning for an `nEdges`-edge graph state. */
  def forEdges(nEdges: Long): Int =
    partitionsFor(nEdges * EdgeWireBytes, EdgeStateBytesPerPartition)

  /** Total DATA-file bytes under a directory (recursive) — the
    * measured input-size feed for [[partitionsFor]] when sizing a
    * session for a data directory (Bench's scale-sweep sessions).
    * Directory symlinks ARE followed — Spark's file listing follows
    * them, and a data dir laid out via symlinks (dataset version
    * switching) must not size to ~0 (ADVICE r16). The visited set is
    * keyed by traversal EDGE — (real parent dir, child entry name) —
    * not by real path alone (ADVICE r17): two sibling links resolving
    * to the same data directory are each counted, matching Spark's
    * per-link listing, while a symlink cycle repeats an edge after one
    * lap and terminates instead of hanging session construction (the
    * ADVICE r15 hazard the old skip-all-symlinks rule over-fixed).
    * Remaining documented slack (deliberately err-high — this feeds a
    * partition-count FLOOR): a subtree multiply linked from DIFFERENT
    * parents is sized once per distinct edge at its top but its
    * sub-directories dedup on the second pass — sizes land between
    * "once" and Spark's "per link"; and a symlink CYCLE terminates
    * after one extra lap, so regular files inside the cycle count
    * TWICE (ADVICE r18) — inflation on a layout Spark's own recursive
    * listing cannot enumerate at all (it would loop), accepted over
    * re-keying files by real path, which would undo the per-link
    * sibling counting that matches Spark's listing on the layouts
    * that actually occur. Write-metadata files that Spark's
    * own readers skip (`_SUCCESS`, `_metadata`, dot-files, checkpoint
    * dirs) don't count: they are not scan input, so they must not
    * inflate the partition count.
    */
  def dirBytes(path: String): Long = {
    def metadata(name: String) = name.startsWith("_") || name.startsWith(".")
    val seen = scala.collection.mutable.Set[(java.nio.file.Path, String)]()
    def walk(f: java.io.File, edge: (java.nio.file.Path, String)): Long =
      if (f.isDirectory) {
        val real =
          try Some(f.toPath.toRealPath())
          catch { case _: java.io.IOException => None }
        real match {
          case Some(r) if seen.add(edge) =>
            Option(f.listFiles())
              .map(_.iterator.filterNot(c => metadata(c.getName))
                .map(c => walk(c, (r, c.getName))).sum)
              .getOrElse(0L)
          case _ => 0L // repeated edge (cycle lap) or unresolvable link
        }
      } else f.length()
    val root = new java.io.File(path)
    if (root.exists()) walk(root, (null, path)) else 0L
  }
}
