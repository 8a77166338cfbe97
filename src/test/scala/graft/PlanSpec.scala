package graft

import org.apache.spark.sql.functions._

import graft.queries.Inventory
import graft.ext.{Dedup, Similarity}

/** Physical-plan regression guards: the properties that make these
  * queries scale (pushdown, pruning, broadcast choice, no accidental
  * cartesian products) asserted against the optimizer's actual output,
  * so a refactor that silently loses them fails CI.
  */
class PlanSpec extends SparkSpec {

  private val d = sf("0.01")

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** The string anchors in this suite ("Scan parquet", "RangeFrame, -6",
    * partial-before-final HashAggregate ordering, …) are physical-plan
    * RENDERINGS, validated against Spark 4.1.2 (the version pinned at
    * /opt/spark/jars). They can legitimately shift across Spark
    * upgrades without a real regression — on an upgrade, re-run this
    * suite and re-anchor; scan counting is centralized here so a
    * rename is a one-line fix.
    */
  private def parquetScans(p: String): Int =
    p.linesIterator.count(_.contains("Scan parquet"))

  test("filters and column pruning reach the parquet scan") {
    val q = spark.read.parquet(s"$d/lineitem.parquet")
      .filter(col("l_quantity") > 40)
      .select("l_orderkey", "l_quantity")
    val p = plan(q)
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,40.0)]"), p)
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"), p)
  }

  test("dimension joins broadcast (never shuffle the small side)") {
    val p = plan(Inventory.joinRevenueByNation.build(spark, d))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  /** One ANALYZED-plan pass over the whole registry, shared by the
    * window sweeps AND the collector sweep (building every plan —
    * including the rows that materialize whole DAGs — is the expensive
    * part; collecting per-sweep would multiply it). Analyzed, NOT
    * optimized: cache substitution (CacheManager.useCachedData)
    * rewrites optimized plans through InMemoryRelation whenever an
    * earlier-built query persisted a matching subtree, making
    * optimized-plan node sets depend on build ORDER; the analyzed plan
    * is cache-independent, and a cache-hidden node still runs on a
    * cold cache, so analyzed is also truer to the sweeps' intent.
    */
  private lazy val registryPlans
      : Map[String, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] =
    SparkEntry.queries.toSeq.map { case (name, fn) =>
      name -> fn(spark, d).queryExecution.analyzed
    }.toMap

  private lazy val registryWindows
      : Map[String, Seq[org.apache.spark.sql.catalyst.plans.logical.Window]] =
    registryPlans.map { case (name, p) =>
      name -> p.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
    }

  test("unpartitioned windows appear ONLY over bounded collapses (exact allowlist)") {
    // The mechanical form of SURVEY §9.3's window audit (r17 VERDICT
    // falsified the prose version): an empty partitionSpec moves the
    // whole relation into ONE task — the accidental-serialization
    // family this repo keeps engineering out. Every UNBOUNDED global
    // ordering now routes through Windows.globalRowNumber /
    // groupedPrefixSum (range partition + windowless offset fold);
    // what remains is the bounded-collapse convention: a grand-total /
    // share window over a relation ALREADY aggregated to a fixed
    // domain (≤25 nations, NumShards shards, |langs|, calibration
    // bins, k centroids, day grain) — a few dozen rows by
    // construction, where one task IS the right plan. The allowlist
    // is exact in both directions, so adding an unpartitioned window
    // to any other row fails here, and converting one of these
    // without pruning the list fails too.
    val boundedCollapse = Set(
      "dedup_semdedup_auto", "dedup_semdedup_multi", "dedup_semdedup_probe",
      "dedup_shingle_profile", "events_concurrency", "events_decayed_counts",
      "events_seasonal_decompose", "orders_backlog", "orders_benford",
      "pipeline_classifier_calibration", "pipeline_classifier_eval",
      "pipeline_dsir_weights", "pipeline_lang_mix", "pipeline_mixture_kl",
      "pipeline_quality_classifier", "pipeline_rater_agreement",
      "pipeline_shard_balance", "pipeline_token_budget",
      "privacy_k_anonymity", "privacy_l_diversity", "privacy_t_closeness",
      "text_countmin_hitters", "text_heaps_law", "text_heavy_hitters",
      "text_jsd_sources", "text_langid_eval", "text_rake_keywords")
    val offenders = registryWindows.collect {
      case (name, ws) if ws.exists(_.partitionSpec.isEmpty) => name
    }.toSet
    assert((offenders -- boundedCollapse).isEmpty,
      s"NEW unpartitioned window (route through Windows.globalRowNumber/" +
        s"groupedPrefixSum or justify here): ${(offenders -- boundedCollapse).toSeq.sorted.mkString(", ")}")
    assert((boundedCollapse -- offenders).isEmpty,
      s"stale allowlist entries (row converted — prune): ${(boundedCollapse -- offenders).toSeq.sorted.mkString(", ")}")
  }

  test("partitioned windows run only over scale-safe keys (exact allowlist)") {
    // The PARTITIONED analogue of the sweep above (VERDICT r18 ask #3):
    // a keyed window is scale-safe only if no single key's posting can
    // grow with the corpus — a window PARTITION BY lang/qbin/day over
    // row-scaled data bounds the task COUNT, not the task SIZE (the
    // degenerate-group family: r18 converted cap/pack/keep-first, r19
    // converted curriculum/waterline/concurrency). Every window below
    // is classified by WHY its key is safe; the map is exact in both
    // directions, so a new window over an unclassified key fails here
    // and a converted one fails until pruned. Key-set strings are the
    // window's partition columns, name-sorted, comma-joined
    // (expr-ids stripped) — `tools/WindowAudit` regenerates them.
    //
    // Classes:
    //  ENTITY    key cardinality scales WITH the data, so per-key
    //            postings stay bounded by construction (per-doc,
    //            per-query, per-vector, per-user, per-node, per-token,
    //            LSH bucket/band, PQ block, audio fingerprint).
    //  TASK      key includes __pid (spark_partition_id) — the
    //            two-phase Windows primitives' local pass; one task's
    //            slice by definition.
    //  COLLAPSED the window's INPUT is already aggregated to a bounded
    //            domain before the window (vocab per lang, |types|²
    //            transition matrix, attribute-domain privacy counts,
    //            calendar grain), so even a degenerate key sees a
    //            bounded relation.
    //  DEMO      demo-contract rows (scaladoc'd): the plain as-of
    //            variants whose bucketed twins are the scale path, and
    //            the window_* showcase rows (GroupLimit-pinned or
    //            calendar-collapsed).
    val allowed: Map[String, Set[String]] = Map(
      // ---- ENTITY --------------------------------------------------
      "ann_hybrid_rrf" -> Set("q_id"),
      "ann_ivf_kmeans_topk" -> Set("q_id", "vec_id"),
      "ann_ivf_topk" -> Set("q_id"),
      "ann_ivfpq_topk" -> Set("blk,vec_id", "q_id", "vec_id"),
      "ann_mmr_rerank" -> Set("q_id"),
      "ann_pq_topk" -> Set("blk,vec_id"),
      "dedup_containment" -> Set("doc_id"),
      "dedup_cross_source" -> Set("doc_id"),
      "dedup_embedding_lsh" -> Set("bucket,table"),
      "dedup_incremental" -> Set("doc_id"),
      "dedup_jaccard_pairs" -> Set("doc_id"),
      "dedup_minhash_estimate" -> Set("doc_id"),
      "dedup_minhash_lsh" -> Set("band,key", "doc_id"),
      "dedup_minhash_occupancy" -> Set("doc_id"),
      "dedup_ngram_novelty" -> Set("doc_id"),
      "dedup_recall_eval" -> Set("band,key", "doc_id"),
      "dedup_semdedup" -> Set("vec_id"),
      "dedup_semdedup_occupancy" -> Set("vec_id"),
      "dedup_shingle_profile" -> Set("doc_id"),
      "dedup_substring_clean" -> Set("doc_id"),
      "emb_cluster_keywords" -> Set("cluster", "vec_id"), // cluster: vocab×k COLLAPSED
      "emb_kmeans_assign" -> Set("vec_id"),
      "events_asof_nearest" -> Set("user_id"),
      "events_asof_tolerance" -> Set("user_id"),
      "events_attribution" -> Set("p_id,user_id"),
      "events_cadence" -> Set("user_id"),
      "events_debounce" -> Set("event_type,user_id"),
      "events_growth_accounting" -> Set("user_id"),
      "events_sessionize" -> Set("user_id"),
      "events_streaks" -> Set("user_id"),
      "events_survival_km" -> Set("sess,user_id", "user_id"),
      "events_top_paths" -> Set("user_id"),
      "graph_link_prediction" -> Set("doc_id"),
      "graph_pagerank" -> Set("src", "user_id"),
      "graph_triangles" -> Set("user_id"),
      "join_interval_overlap" -> Set("user_id"),
      "multimodal_audio_dedup" -> Set("envelope_bits,peak_window"),
      "pipeline_decontaminate" -> Set("doc_id"),
      "pipeline_quality_resample" -> Set("doc_id"),
      "text_collocation_pmi" -> Set("doc_id", "lang"), // lang: bigram-vocab COLLAPSED
      "text_heaps_law" -> Set("t"), // per-token over (t, bucket) counts
      "text_lm_perplexity" -> Set("doc_id"),
      "text_rake_keywords" -> Set("doc_id"),
      "text_repetition" -> Set("doc_id"),
      "text_tfidf_top_terms" -> Set("doc_id"),
      "text_winnow_fingerprints" -> Set("doc_id"),
      // ---- TASK (two-phase Windows primitives) ---------------------
      "customer_rfm" -> Set("__pid"),
      "dedup_record_linkage" -> Set("__pid"),
      "dedup_sorted_neighborhood" -> Set("__pid"),
      "events_concurrency" -> Set("__pid,day"), // r19 conversion; the user_id
      // sessionize window moved behind the rangedPid boundary in r20 —
      // upstream-of-boundary nodes are lineage-truncated (the audit's
      // documented RDD caveat)
      "events_gini" -> Set("__pid"),
      "pipeline_classifier_calibration" -> Set("__pid"), // r20 nbVocab rank
      "pipeline_classifier_eval" -> Set("__pid"), // r20 nbVocab rank
      "pipeline_curriculum" -> Set("__pid,lang"),
      "pipeline_pack_sequences" -> Set("__pid,lang"),
      "pipeline_quality_classifier" -> Set("__pid"), // r20 nbVocab rank
      "pipeline_rater_agreement" -> Set("__pid"), // r20 nbVocab rank
      "pipeline_token_budget" -> Set("__pid,qbin"),
      "text_vocab_coverage" -> Set("__pid"),
      // ---- COLLAPSED (bounded-domain input) ------------------------
      "events_entropy_daily" -> Set("day"), // over (day, type) counts
      "events_transition_matrix" -> Set("from_type", "user_id"), // |types|² matrix
      "graph_kcore_words" -> Set("lang"), // vocab-bounded core degrees
      "privacy_t_closeness" -> Set("c_mktsegment", "c_nationkey"), // 25×5 domain
      "text_jsd_sources" -> Set("source"), // (source, t) vocab counts
      "text_langid_eval" -> Set("declared_lang"), // |langs|² confusion
      "text_term_drift" -> Set("lang"), // (lang, t) vocab counts
      "text_textrank_keywords" -> Set("doc_id", "lang", "lang,src"), // vocab graph
      "text_top_bigrams" -> Set("doc_id", "lang"), // bigram-vocab ranks
      "text_zipf_slope" -> Set("lang"), // (lang, t) vocab counts
      // ---- DEMO (supplier-collapsed input; scaled path scaladoc'd) --
      "window_pareto_share" -> Set("n_name"), // |suppliers|/25 posting — groupedPrefixSum is the scale path
      // ---- DEMO (scaladoc'd demo contract; bucketed/GroupLimit twins)
      "events_asof_next" -> Set("event_type"),
      "events_asof_next_bucketed" -> Set("_bucket,event_type", "event_type"),
      "events_asof_rates" -> Set("event_type"),
      "events_asof_rates_bucketed" -> Set("_bucket,event_type", "event_type"),
      "window_rank_suite" -> Set("c_nationkey"),
      "window_rolling_range" -> Set("event_type"),
      "window_topk_per_group" -> Set("event_type"),
      "window_wow_change" -> Set("event_type"))
    val got: Map[String, Set[String]] = registryWindows.flatMap { case (name, ws) =>
      val keys = ws.filter(_.partitionSpec.nonEmpty)
        .map(_.partitionSpec.map(_.sql.replaceAll("#\\d+", "")).sorted.mkString(","))
        .toSet
      if (keys.isEmpty) None else Some(name -> keys)
    }
    val newQueries = got.keySet -- allowed.keySet
    assert(newQueries.isEmpty,
      s"UNCLASSIFIED partitioned window (classify its key here or convert): " +
        newQueries.toSeq.sorted.map(n => s"$n=${got(n).toSeq.sorted.mkString("|")}").mkString(", "))
    val stale = allowed.keySet -- got.keySet
    assert(stale.isEmpty,
      s"stale allowlist entries (windows converted — prune): ${stale.toSeq.sorted.mkString(", ")}")
    val drifted = allowed.keySet.intersect(got.keySet).filter(n => allowed(n) != got(n))
    assert(drifted.isEmpty,
      "partition-key drift (re-classify): " + drifted.toSeq.sorted
        .map(n => s"$n got=${got(n).toSeq.sorted.mkString("|")} allowed=${allowed(n).toSeq.sorted.mkString("|")}")
        .mkString(", "))
  }

  test("unbounded-state collectors group only over scale-safe keys (exact allowlist)") {
    // The third operator class of the degenerate-key audit (r18:
    // unpartitioned windows; r19: partitioned windows; this sweep:
    // AGGREGATES). Partial aggregation bounds a sum/min/max/heap state
    // by CONSTRUCTION, so groupBy over a hot key is safe for those —
    // but `collect_list`/`collect_set` state is the group's ELEMENT
    // COUNT: a collector grouped by a degeneracy-prone key rebuilds
    // exactly the whole-group-in-one-buffer shape the window
    // conversions engineered out (the map-side partial buffers every
    // element too, so it is the collector's INPUT that must be
    // bounded, not just its post-shuffle merge). Every collector
    // below is classified by WHY its per-group element count cannot
    // scale with the corpus; the map is exact in both directions.
    // Key strings are the Aggregate's grouping expressions,
    // name-sorted, comma-joined, expr-ids stripped, "<GLOBAL>" for a
    // global aggregate — `tools/WindowAudit` (COLAUDIT lines)
    // regenerates them.
    //
    // Classes:
    //  ENTITY    grouped per doc/vector/query/media/session — the
    //            collected elements are the entity's own tokens /
    //            shingles / codebook candidates, bounded by the
    //            entity, never the corpus.
    //  PARTS     the two-phase Windows primitives' offset assembly:
    //            elements are per-(pid, group) partial sums, ≤ the
    //            shuffle-partition count per group regardless of key
    //            skew. Mechanically verified below: every collector
    //            under a PARTS keyset must reference __pid.
    //  COLLAPSED the collector's input is already aggregated to a
    //            bounded domain (embedding dims per centroid/codeword,
    //            calendar days per series, duration grain per stratum)
    //            — a degenerate group still sees a bounded relation.
    val ENTITY = "ENTITY"; val PARTS = "PARTS"; val COLLAPSED = "COLLAPSED"
    val allowed: Map[String, Map[String, String]] = Map(
      "ann_ivf_kmeans_topk" -> Map("cluster" -> COLLAPSED), // centroid recompute: ≤Dim (pos, avg) structs
      "ann_ivf_topk" -> Map("label" -> COLLAPSED), // centroids(): ≤Dim structs
      "ann_ivfpq_topk" -> Map("blk,code" -> COLLAPSED, "cluster" -> COLLAPSED), // PQ codebook + coarse centroids: ≤Dim
      "ann_mmr_rerank" -> Map("q_id" -> ENTITY), // ≤C candidates / C² sims per query (posting-capped)
      "ann_pq_topk" -> Map("blk,code" -> COLLAPSED), // PQ codebook: ≤Dim structs per codeword
      "customer_rfm" -> Map("<GLOBAL>" -> PARTS),
      "dedup_containment" -> Map("doc_id" -> ENTITY),
      "dedup_incremental" -> Map("doc_id" -> ENTITY),
      "dedup_jaccard_pairs" -> Map("doc_id" -> ENTITY),
      "dedup_minhash_estimate" -> Map("doc_id" -> ENTITY),
      "dedup_minhash_lsh" -> Map("doc_id" -> ENTITY),
      "dedup_minhash_occupancy" -> Map("doc_id" -> ENTITY),
      "dedup_ngram_novelty" -> Map("doc_id" -> ENTITY),
      "dedup_recall_eval" -> Map("doc_id" -> ENTITY),
      "dedup_record_linkage" -> Map("<GLOBAL>" -> PARTS),
      "dedup_semdedup" -> Map("cluster" -> COLLAPSED), // Lloyd recompute: ≤Dim per cluster
      "dedup_semdedup_auto" -> Map("cluster" -> COLLAPSED),
      "dedup_semdedup_multi" -> Map("cluster" -> COLLAPSED),
      "dedup_semdedup_occupancy" -> Map("cluster" -> COLLAPSED),
      "dedup_semdedup_probe" -> Map("cluster" -> COLLAPSED, "vec_id" -> ENTITY), // probe pick: ≤|coarse cells| per vector
      "dedup_semdedup_twolevel" -> Map("cluster" -> COLLAPSED, "vec_id" -> ENTITY),
      "dedup_shingle_profile" -> Map("doc_id" -> ENTITY),
      "dedup_sorted_neighborhood" -> Map("<GLOBAL>" -> PARTS),
      "dedup_substring_cleaned" -> Map("doc_id" -> ENTITY), // flagged positions per doc
      "emb_cluster_keywords" -> Map("cluster" -> COLLAPSED),
      "emb_kmeans_assign" -> Map("cluster" -> COLLAPSED),
      "emb_outliers_maha" -> Map("<GLOBAL>" -> COLLAPSED), // ≤Dim (dim, mu, v) structs after groupBy(dim)
      "events_changepoint" -> Map("event_type" -> COLLAPSED), // daily-collapsed series
      "events_concurrency" -> Map("day" -> PARTS),
      "events_forecast_holt" -> Map("event_type" -> COLLAPSED),
      "events_gini" -> Map("<GLOBAL>" -> PARTS),
      "events_survival_km" -> Map("stratum" -> COLLAPSED), // duration-grain (dur_min, d, c) counts
      "events_top_paths" -> Map("sess_no,user_id" -> ENTITY), // one session's events (scaladoc'd bound)
      "multimodal_frame_dedup" -> Map("media_id" -> ENTITY),
      "pipeline_classifier_calibration" -> Map("<GLOBAL>" -> PARTS), // r20 nbVocab rank offsets
      "pipeline_classifier_eval" -> Map("<GLOBAL>" -> PARTS),
      "pipeline_curriculum" -> Map("lang" -> PARTS),
      "pipeline_decontaminate" -> Map("doc_id" -> ENTITY),
      "pipeline_pack_sequences" -> Map("lang" -> PARTS),
      "pipeline_quality_classifier" -> Map("<GLOBAL>" -> PARTS),
      "pipeline_rater_agreement" -> Map("<GLOBAL>" -> PARTS),
      "pipeline_token_budget" -> Map("qbin" -> PARTS),
      "text_rake_keywords" -> Map("doc_id,pid" -> ENTITY), // one candidate phrase's tokens
      "text_vocab_coverage" -> Map("<GLOBAL>" -> PARTS))
    // keyset → does EVERY collector under it reference __pid (the
    // PARTS signature: collect_list(struct(__pid, partial))). Sites
    // come from the shared tools/WindowAudit.collectorSites — which
    // also covers collectors used as WINDOW functions (a windowed
    // collect_list buffers one partition's elements per row, the same
    // unbounded state) — so the COLAUDIT dump and this pin can't
    // drift.
    val got: Map[String, Map[String, Boolean]] = registryPlans.flatMap { case (name, p) =>
      val sites = graft.tools.WindowAudit.collectorSites(p)
      if (sites.isEmpty) None
      else Some(name -> sites.groupBy(_._1).map { case (k, v) => k -> v.forall(_._2) })
    }
    val newQueries = got.keySet -- allowed.keySet
    assert(newQueries.isEmpty,
      s"UNCLASSIFIED collector (bound its group's element count or classify here): " +
        newQueries.toSeq.sorted.map(n => s"$n=${got(n).keys.toSeq.sorted.mkString("|")}").mkString(", "))
    val stale = allowed.keySet -- got.keySet
    assert(stale.isEmpty,
      s"stale collector allowlist entries (prune): ${stale.toSeq.sorted.mkString(", ")}")
    val drifted = allowed.keySet.intersect(got.keySet)
      .filter(n => allowed(n).keySet != got(n).keySet)
    assert(drifted.isEmpty,
      "collector grouping-key drift (re-classify): " + drifted.toSeq.sorted
        .map(n => s"$n got=${got(n).keys.toSeq.sorted.mkString("|")} allowed=${allowed(n).keys.toSeq.sorted.mkString("|")}")
        .mkString(", "))
    val badParts = allowed.toSeq.flatMap { case (n, ks) =>
      ks.collect { case (k, cls) if cls == PARTS && !got(n).getOrElse(k, false) => s"$n=$k" }
    }
    assert(badParts.isEmpty,
      s"PARTS-classified collector does not reference __pid (not the two-phase " +
        s"offset assembly — re-classify): ${badParts.sorted.mkString(", ")}")
  }

  test("RDD lineage boundaries appear only at the audited sites (exact allowlist)") {
    // THE AUDIT BLIND-SPOT RULE, stated mechanically (VERDICT r20 #4 /
    // r21 #5): every sweep in this suite reads the ANALYZED plan, and
    // an RDD boundary — `df.rdd` → `createDataFrame` (Windows.rangedPid,
    // the Clusters fixpoints' loop-state truncation), `localCheckpoint`
    // (graph rounds) — TRUNCATES that plan at a LogicalRDD leaf: nodes
    // upstream of the boundary are INVISIBLE to the window / collector /
    // broadcast / repartition sweeps above. The repo rule is therefore
    // that an RDD boundary may hide ONLY one of two audited subtrees:
    //
    //  RANGED    Windows.rangedPid's frozen range exchange —
    //            repartitionByRange(session-derived partitions, sort
    //            cols) + sortWithinPartitions + the __pid tag, nothing
    //            else (the full subtree is the four lines of
    //            engine/Windows.scala rangedPid; its session-derived
    //            partition count is pinned by WindowsSpec's
    //            newSession(37) test, and AuditSpec pins that the
    //            boundary hides exactly that shape).
    //  FIXPOINT  a fixed-point loop's own state (Clusters label/edge
    //            propagation, k-core localCheckpoint rounds): the
    //            hidden subtree is the relation the audited loop body
    //            built the round before — same operators the sweeps
    //            already saw on round 1's un-truncated plan.
    //
    // A query appearing here under neither class is a NEW blind spot:
    // classify it (and audit what it hides) before shipping. The map is
    // exact in both directions so a conversion that removes a boundary
    // fails until pruned.
    val RANGED = "RANGED"; val FIXPOINT = "FIXPOINT"
    val allowed: Map[String, String] = Map(
      "customer_rfm" -> RANGED,
      "dedup_record_linkage" -> RANGED,
      "dedup_sorted_neighborhood" -> RANGED,
      "events_concurrency" -> RANGED,
      "events_gini" -> RANGED,
      "pipeline_classifier_calibration" -> RANGED,
      "pipeline_classifier_eval" -> RANGED,
      "pipeline_curriculum" -> RANGED,
      "pipeline_pack_sequences" -> RANGED,
      "pipeline_quality_classifier" -> RANGED,
      "pipeline_rater_agreement" -> RANGED,
      "pipeline_token_budget" -> RANGED,
      "text_vocab_coverage" -> RANGED,
      "dedup_components" -> FIXPOINT,
      "dedup_components_star" -> FIXPOINT,
      "dedup_keep_best" -> FIXPOINT,
      "dedup_semdedup_keep" -> FIXPOINT,
      "graph_kcore_words" -> FIXPOINT)
    val got = registryPlans.collect {
      case (name, p) if p.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD]) => name
    }.toSet
    assert((got -- allowed.keySet).isEmpty,
      s"NEW RDD lineage boundary (a fresh audit blind spot — classify it " +
        s"here and audit what it hides): ${(got -- allowed.keySet).toSeq.sorted.mkString(", ")}")
    assert((allowed.keySet -- got).isEmpty,
      s"stale RDD-boundary entries (boundary removed — prune): " +
        (allowed.keySet -- got).toSeq.sorted.mkString(", "))
  }

  test("explicit broadcast hints cover only corpus-independent relations (exact allowlist)") {
    // The fourth operator class of the degenerate-scale audit (r18:
    // unpartitioned windows; r19: partitioned windows, collectors, and
    // this). AQE's auto-broadcast self-corrects at scale — it sizes
    // the REAL build side at runtime and falls back to a shuffle join
    // when it outgrows the threshold. An explicit `broadcast(df)` hint
    // is obeyed regardless, so a hint on a relation whose size scales
    // with the corpus fits at the harness SF and OOMs the driver at
    // 100 TB. This sweep caught two live instances on its first run:
    // join_revenue_by_nation broadcast raw `customer` and
    // window_pareto_share broadcast raw `supplier` — both SF-scaled
    // TPC-H tables hiding behind a "dims ≪ fact" comment (converted
    // to unhinted joins; AQE still broadcasts them at every measured
    // scale). Signatures are `<shape>:<sorted leaf tables>` from
    // tools/WindowAudit.broadcastSignatures (shared, so pin and
    // ground-truth generator cannot drift). Shape comes from an
    // OUTPUT-CARDINALITY walk, not exists() — an Aggregate on one join
    // branch cannot launder the other branch's raw leaves (see the
    // generator's scaladoc): `agg(<keys>)` = a collapse bounds the
    // hint's output BY ITS KEY DOMAIN (keys carried since r20),
    // `lim` = a GlobalLimit bounds it by a literal, `flt` = a Filter
    // gates it (bounded only when the predicate is a contract),
    // `exp[...]` = a Generate re-raises a collapse (ADVICE r19 —
    // explode must be judged explicitly, never inherit the collapse's
    // certificate), `raw` = leaves reach the hint unreduced.
    val got: Map[String, Set[String]] = registryPlans.flatMap { case (name, p) =>
      val sigs = graft.tools.WindowAudit.broadcastSignatures(p).toSet
      if (sigs.isEmpty) None else Some(name -> sigs)
    }
    // GLOBAL rule, no per-query escape: a raw (un-collapsed,
    // un-filtered) hint may only cover fixed-cardinality dims (nation
    // = 25, region = 5 rows at ANY TPC-H scale factor) and literal /
    // range seeds. Every SF-scaled table (customer supplier part
    // orders lineitem events documents embeddings) must reach an
    // explicit broadcast through a bounding collapse or contract
    // filter — or not be hinted at all.
    val rawSafe = Set("nation", "region", "local", "range")
    def sigCls(s: String): String = s.takeWhile(_.isLetter)
    val rawOffenders = got.toSeq.flatMap { case (n, sigs) =>
      sigs.filter(sigCls(_) == "raw").filterNot(
        _.dropWhile(_ != ':').stripPrefix(":").split("\\+").forall(rawSafe)).map(s => s"$n=$s")
    }
    assert(rawOffenders.isEmpty,
      s"EXPLICIT broadcast hint over an un-collapsed SF-scaled relation (drop the " +
        s"hint — AQE sizes it — or bound it first): ${rawOffenders.sorted.mkString(", ")}")
    // Exact per-(query, signature) pin, two-sided, with a DOMAIN CLASS
    // per signature (VERDICT r19 ask #2 — signatures now carry agg
    // grouping keys, so a 1-row global agg and a corpus-scaled-key agg
    // over the same leaves are mechanically distinct; the r19
    // granularity gap let agg_market_basket's SF-scaled freq broadcast
    // read as "top-K rollup". That hint is gone — r20 broadcasts only
    // the 1-row order-count anchor; AQE broadcasts the ≤K co side).
    //
    // Classes, each with mechanical teeth below:
    //  SCALAR    agg() — a global collapse, ≤ a few rows at any SF.
    //            Checked: signature must start "agg():".
    //  KBOUND    agg(<keys>) whose key domain is fixed or
    //            config-bounded (k centroids, PQ blk×code ≤ Dim·256,
    //            lang, calendar day/dow/week anchors, quality bins,
    //            feature names, source enum). Checked: keys must not
    //            contain a corpus-scaled entity key (the laundering
    //            shape — an agg(doc_id) classified KBOUND fails).
    //  PARTS     exp[agg(<group keys>)] — the two-phase Windows
    //            primitives' offset tables: a per-(pid, group) partial
    //            collapse re-exploded, ≤ |groups| + partitions − 1
    //            rows by range-contiguity. Checked: shape must be
    //            exp over agg; the matching queries' collector sweep
    //            separately verifies the collected structs carry
    //            __pid.
    //  CONTRACT  a reviewed bounding contract the walk cannot prove:
    //            flt (predicate = query-set slice vec_id/doc_id <
    //            NumQueries, SNM boundary stitch ≤ (SnmWindow−1)·tasks
    //            rows) or agg over a contract-filtered slice
    //            (bm25/rrf per-term stats: tf is filtered to the
    //            literal query vocabulary BELOW the agg, so the tok
    //            domain ≤ |Bm25QueryTerms|). The explicit escape
    //            hatch: classification here is the review.
    //  TOPK      exp over a top-N-filtered collapse (CountMin probes
    //            ≤ CmTopN·CmDepth rows, SpaceSaving hitter state).
    //  MEASURED  dedup_incremental — the batch side broadcasts only
    //            under the byte-measured IncrementalBroadcastMaxChars
    //            gate (spec-pinned); the outgrown branch stays SMJ.
    //  LIMIT     lim — a GlobalLimit bounds the subtree by a literal.
    //            Checked: signature must start "lim".
    //  DIM       raw over fixed-cardinality dims only (also enforced
    //            by the global raw rule above).
    // Leaf note: a `LogicalRDD` leaf is the Windows.rangedPid RDD
    // boundary (r20) — the frozen-partitioning materialization the
    // two-phase primitives read; its upstream subtree executes in a
    // separate query and is lineage-truncated here (the audit's
    // documented RDD caveat, same as checkpointed loops).
    val SCALAR = "SCALAR"; val KBOUND = "KBOUND"; val PARTS = "PARTS"
    val CONTRACT = "CONTRACT"; val TOPK = "TOPK"; val MEASURED = "MEASURED"
    val LIMIT = "LIMIT"; val DIM = "DIM"
    val allowed: Map[String, Map[String, String]] = Map(
      "agg_market_basket" -> Map("agg():lineitem" -> SCALAR), // 1-row n_orders anchor (freq de-hinted r20)
      "ann_cosine_topk" -> Map("flt:embeddings" -> CONTRACT),
      "ann_dot_topk" -> Map("flt:embeddings" -> CONTRACT),
      "ann_hard_negatives" -> Map("flt:embeddings" -> CONTRACT),
      "ann_hybrid_rrf" -> Map("agg():documents" -> SCALAR,
        "agg(tok):documents" -> CONTRACT, // per-term stats, query-vocab-filtered below
        "exp[flt]:documents" -> CONTRACT, // query-doc token explode (doc_id < NumQueries)
        "flt:embeddings" -> CONTRACT),
      "ann_ivf_kmeans_topk" -> Map("agg(cluster):embeddings" -> KBOUND, "flt:embeddings" -> CONTRACT),
      "ann_ivf_topk" -> Map("agg(label):embeddings" -> KBOUND, "flt:embeddings" -> CONTRACT),
      "ann_ivfpq_topk" -> Map("agg(blk,code):embeddings" -> KBOUND,
        "agg(cluster):embeddings" -> KBOUND, "flt:embeddings" -> CONTRACT),
      "ann_mmr_rerank" -> Map("flt:embeddings" -> CONTRACT),
      "ann_pq_topk" -> Map("agg(blk,code):embeddings" -> KBOUND, "flt:embeddings" -> CONTRACT),
      "ann_quantized_topk" -> Map("flt:embeddings" -> CONTRACT),
      "ann_recall_eval" -> Map("flt:embeddings" -> CONTRACT),
      "customer_rfm" -> Map("agg():orders" -> SCALAR, // quantile anchor
        "exp[agg()]:LogicalRDD" -> PARTS), // globalRowNumber offsets over the rangedPid boundary
      "dedup_cross_source" -> Map("agg(source):documents" -> KBOUND),
      "dedup_embedding_pairs" -> Map("flt:embeddings" -> CONTRACT),
      "dedup_incremental" -> Map("flt[exp[agg(doc_id)]]:documents" -> MEASURED),
      "dedup_recall_eval" -> Map("agg():documents" -> SCALAR),
      "dedup_record_linkage" -> Map("exp[agg()]:LogicalRDD" -> PARTS,
        "flt:LogicalRDD" -> CONTRACT), // SNM boundary stitch
      "dedup_semdedup" -> Map("agg(cluster):embeddings" -> KBOUND, "flt:embeddings" -> CONTRACT),
      "dedup_semdedup_auto" -> Map("agg(cluster):embeddings" -> KBOUND, "lim:embeddings" -> LIMIT),
      "dedup_semdedup_multi" -> Map("agg(cluster):embeddings" -> KBOUND, "lim:embeddings" -> LIMIT),
      "dedup_semdedup_occupancy" -> Map("agg(cluster):embeddings" -> KBOUND, "flt:embeddings" -> CONTRACT),
      "dedup_semdedup_probe" -> Map("agg(cluster):embeddings" -> KBOUND, "lim:embeddings" -> LIMIT),
      "dedup_semdedup_twolevel" -> Map("agg(cluster):local" -> KBOUND, "flt:local" -> CONTRACT),
      "dedup_sorted_neighborhood" -> Map("exp[agg()]:LogicalRDD" -> PARTS,
        "flt:LogicalRDD" -> CONTRACT), // SNM boundary stitch
      "emb_cluster_keywords" -> Map("agg():documents+embeddings" -> SCALAR,
        "agg(cluster):embeddings" -> KBOUND, "flt:embeddings" -> CONTRACT),
      "emb_isotropy" -> Map("agg():embeddings" -> SCALAR),
      "emb_kmeans_assign" -> Map("agg(cluster):embeddings" -> KBOUND, "flt:embeddings" -> CONTRACT),
      "emb_outliers_maha" -> Map("agg():embeddings" -> SCALAR),
      "emb_project_top" -> Map("raw:local" -> DIM),
      "events_active_users" -> Map("agg(anchor):events" -> KBOUND), // calendar grain
      "events_cohort_retention" -> Map("agg(cohort_week):events" -> KBOUND),
      "events_concurrency" -> Map("exp[agg(day)]:LogicalRDD" -> PARTS), // groupedPrefixSum offsets
      "events_dau_mau" -> Map("agg(anchor):events" -> KBOUND),
      "events_decayed_counts" -> Map("agg():events" -> SCALAR),
      "events_gini" -> Map("exp[agg()]:LogicalRDD" -> PARTS), // globalRowNumber offsets
      "events_growth_accounting" -> Map("agg():events" -> SCALAR),
      "events_seasonal_decompose" -> Map("agg(dow):events" -> KBOUND), // 7 rows
      "events_survival_km" -> Map("agg():events" -> SCALAR),
      "graph_pagerank" -> Map("agg():events" -> SCALAR), // dangling-mass scalar
      "join_interval_overlap" -> Map("agg():events" -> SCALAR),
      "join_range_bands" -> Map("raw:local" -> DIM),
      "join_revenue_by_nation" -> Map("raw:nation" -> DIM),
      "pipeline_classifier_calibration" -> Map("agg():documents" -> SCALAR,
        "agg(feat):LogicalRDD+documents" -> KBOUND, // <= NbVocabMax+1 capped features
        "exp[agg()]:LogicalRDD" -> PARTS), // r20 nbVocab rank offsets
      "pipeline_classifier_eval" -> Map("agg():documents" -> SCALAR,
        "agg(feat):LogicalRDD+documents" -> KBOUND,
        "exp[agg()]:LogicalRDD" -> PARTS),
      "pipeline_curriculum" -> Map("agg(lang):LogicalRDD" -> KBOUND, // group totals
        "exp[agg(lang)]:LogicalRDD" -> PARTS), // groupedNtile offsets
      "pipeline_decontaminate" -> Map("flt[exp[agg(doc_id)]]:documents" -> CONTRACT), // doc_id < BenchmarkDocs
      "pipeline_dsir_weights" -> Map("agg(b):documents" -> KBOUND), // hash bins
      "pipeline_pack_sequences" -> Map("exp[agg(lang)]:LogicalRDD" -> PARTS),
      "pipeline_quality_classifier" -> Map("agg(feat):LogicalRDD+documents" -> KBOUND,
        "exp[agg()]:LogicalRDD" -> PARTS),
      "pipeline_quality_resample" -> Map("agg():documents" -> SCALAR,
        "agg(lang):documents" -> KBOUND),
      "pipeline_rater_agreement" -> Map("agg():documents" -> SCALAR,
        "agg(feat):LogicalRDD+documents" -> KBOUND,
        "exp[agg()]:LogicalRDD" -> PARTS),
      "pipeline_token_budget" -> Map("agg(qbin):documents" -> KBOUND,
        "exp[agg(qbin)]:LogicalRDD" -> PARTS), // groupedPrefixSum offsets
      "privacy_t_closeness" -> Map("agg():customer" -> SCALAR),
      "text_bm25_topk" -> Map("agg():documents" -> SCALAR,
        "agg(tok):documents" -> CONTRACT), // ≤ |Bm25QueryTerms| (filter below agg)
      "text_countmin_hitters" -> Map("exp[agg(t)]:documents" -> TOPK), // ≤ CmTopN·CmDepth probes
      "text_heaps_law" -> Map("agg():documents" -> SCALAR),
      "text_heavy_hitters" -> Map("exp[agg()]:documents" -> TOPK),
      "text_jsd_sources" -> Map("agg():documents" -> SCALAR),
      "text_lm_perplexity" -> Map("agg():documents" -> SCALAR),
      "text_tfidf_top_terms" -> Map("agg():documents" -> SCALAR),
      "text_vocab_coverage" -> Map("agg():LogicalRDD" -> SCALAR,
        "exp[agg()]:LogicalRDD" -> PARTS),
      "window_pareto_share" -> Map("raw:nation" -> DIM))
    // ---- mechanical teeth per class --------------------------------
    // corpus-scaled entity keys: an agg grouped by one of these is NOT
    // a bounding collapse (its domain grows with the data) — it may
    // only reach a hint via CONTRACT/MEASURED/TOPK/PARTS review
    val sfScaledKeys = Set("doc_id", "vec_id", "user_id", "q_id", "tok", "t",
      "hs", "text_hash", "l_partkey", "l_orderkey", "o_orderkey",
      "c_custkey", "s_suppkey", "p_partkey", "ps_partkey", "media_id")
    def aggKeys(sig: String): Set[String] =
      "agg\\(([^)]*)\\)".r.findAllMatchIn(sig)
        .flatMap(_.group(1).split(",")).map(_.trim).filter(_.nonEmpty).toSet
    val shapeViolations = allowed.toSeq.flatMap { case (n, sigs) =>
      sigs.flatMap { case (sig, c) =>
        val bad = c match {
          case `SCALAR` => !sig.startsWith("agg():")
          case `KBOUND` => sigCls(sig) != "agg" || aggKeys(sig).exists(sfScaledKeys)
          case `PARTS` => !sig.startsWith("exp[agg(")
          case `LIMIT` => !sig.startsWith("lim")
          case `DIM` => sigCls(sig) != "raw"
          case _ => false // CONTRACT/TOPK/MEASURED: the entry IS the review
        }
        if (bad) Some(s"$n=$sig[$c]") else None
      }
    }
    assert(shapeViolations.isEmpty,
      s"broadcast allowlist class does not match its signature's shape (an " +
        s"SF-scaled-key agg classified KBOUND is the laundering shape this " +
        s"check exists for): ${shapeViolations.sorted.mkString(", ")}")
    val newQueries = got.keySet -- allowed.keySet
    assert(newQueries.isEmpty,
      s"UNCLASSIFIED broadcast hint (bound it or classify here): " +
        newQueries.toSeq.sorted.map(n => s"$n=${got(n).toSeq.sorted.mkString("|")}").mkString(", "))
    val stale = allowed.keySet -- got.keySet
    assert(stale.isEmpty,
      s"stale broadcast allowlist entries (hints removed — prune): ${stale.toSeq.sorted.mkString(", ")}")
    val drifted = allowed.keySet.intersect(got.keySet).filter(n => allowed(n).keySet != got(n))
    assert(drifted.isEmpty,
      "broadcast-hint drift (re-classify): " + drifted.toSeq.sorted
        .map(n => s"$n got=${got(n).toSeq.sorted.mkString("|")} allowed=${allowed(n).keySet.toSeq.sorted.mkString("|")}")
        .mkString(", "))
  }

  test("explicit repartition counts are session-derived, never hardcoded literals (exact allowlist, off-default conf)") {
    // The FIFTH operator class of the degenerate-scale audit (r18:
    // unpartitioned windows; r19: partitioned windows, collectors,
    // broadcast hints; r20: this). A hardcoded repartition COUNT is
    // frozen parallelism — correct at the harness SF, a 32-way
    // ceiling on a 1000-executor cluster (the Windows primitives'
    // old literal-32 default was exactly this class, VERDICT r19 #2).
    //
    // Mechanism: rebuild every registry plan under a session whose
    // shuffle-partition conf is an OFF-DEFAULT PRIME (37). A
    // session-derived count follows the conf and reads 37; a
    // hardcoded literal keeps its constant — the literal-vs-config
    // distinction no single-conf dump can make (at the shared
    // session's value, a literal equal to the conf is invisible).
    // newSession shares the SparkContext but owns its SQLConf, so
    // this costs one extra analysis pass, not a second JVM.
    //
    // Two cluster-sized origins are accepted mechanically:
    //  - the session conf (reads 37 under this sweep's session) — the
    //    Windows primitives' range splits;
    //  - sparkContext.defaultParallelism (reads this box's core
    //    count) — Inventory.rebalanced's minimum-parallelism rescue
    //    for unsplittable narrow scans ahead of CPU-heavy per-row
    //    work, which on a real cluster is total executor cores.
    // Residual blind spot, accepted: a literal that happens to equal
    // THIS box's core count would hide — but it would resurface on
    // any box with a different count, and the audit main runs at
    // local[8] while tests run local[4], so a literal cannot match
    // both.
    //
    // r20 ground truth: every explicit-count site in the registry
    // (62 at audit time — entity-key rebalances and the Windows
    // primitives' range splits) reads one of the two cluster-sized
    // origins, so the semantic-literal allowlist is EMPTY. A new
    // hardcoded count fails here until classified or converted; a
    // classified one that later converts fails as stale.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "37")
    val dp = spark.sparkContext.defaultParallelism
    val allowed: Map[String, Set[String]] = Map()
    val got: Map[String, Set[String]] = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val sites = graft.tools.WindowAudit
        .repartitionSites(fn(s2, d).queryExecution.analyzed)
        .filterNot(s => s.startsWith("37:") || s.startsWith(s"$dp:")).toSet
      if (sites.isEmpty) None else Some(name -> sites)
    }.toMap
    val newQueries = got.keySet -- allowed.keySet
    assert(newQueries.isEmpty,
      s"HARDCODED repartition count (size it from the session conf / " +
        s"Partitioning, or classify the literal here): " +
        newQueries.toSeq.sorted.map(n => s"$n=${got(n).toSeq.sorted.mkString("|")}").mkString(", "))
    val stale = allowed.keySet -- got.keySet
    assert(stale.isEmpty,
      s"stale repartition-literal allowlist entries (prune): ${stale.toSeq.sorted.mkString(", ")}")
    val drifted = allowed.keySet.intersect(got.keySet).filter(n => allowed(n) != got(n))
    assert(drifted.isEmpty,
      "repartition-literal drift (re-classify): " + drifted.toSeq.sorted
        .map(n => s"$n got=${got(n).toSeq.sorted.mkString("|")}").mkString(", "))
  }

  test("no query in the registry plans a cartesian product") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val p = plan(fn(spark, d))
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian product:\n$p")
    }
  }

  test("no registry query emits wide decimals in its hashed output schema") {
    // Round-10 lesson (emb_centroid_drift, hash-red for three rounds):
    // the driver's hash canonicalization routes DECIMAL through double,
    // which is implementation-defined above 2^53. Wide decimals may
    // exist INTERNALLY (agg_stats_exact does this and is green) but
    // must never reach the output contract — derive a double, round,
    // or cast to BIGINT/VARCHAR before the final select.
    import org.apache.spark.sql.types.DecimalType
    SparkEntry.queries.foreach { case (name, fn) =>
      val wide = fn(spark, d).schema.fields.collect {
        case f if f.dataType.isInstanceOf[DecimalType]
          && f.dataType.asInstanceOf[DecimalType].precision > 18 => f.name
      }
      assert(wide.isEmpty,
        s"$name emits DecimalType(p>18) columns ${wide.mkString(",")} — " +
          "the driver-hash double canonicalization trap; cast to BIGINT/DOUBLE/VARCHAR")
    }
  }

  test("aggregation queries use hash aggregation (partial+final capable)") {
    Seq(
      "a_group_agg" -> Inventory.aGroupAgg,
      "mart_weekly_events_summary" -> Inventory.martWeeklyEventsSummary).foreach {
      case (name, q) =>
        val p = plan(q.build(spark, d))
        assert(p.contains("HashAggregate"), s"$name lost hash aggregation:\n$p")
    }
  }

  test("multi-branch queries read their fact table exactly once") {
    // the 4-scope weekly mart and the multi-column data tests are
    // single-scan conditional aggregates, not one scan per branch
    Seq(
      "mart_weekly_events_summary" -> Inventory.martWeeklyEventsSummary,
      "t1_not_null" -> Inventory.t1NotNull).foreach { case (name, q) =>
      val p = plan(q.build(spark, d))
      val scans = parquetScans(p)
      assert(scans === 1, s"$name scans its input $scans times:\n$p")
    }
  }

  test("shingle pipeline shuffles exactly once (window partitioning reused by per-doc dedup)") {
    // cold-cache plan: the r22 gated pair rows persist their postings,
    // and an earlier-built query in this shared session would
    // substitute that cache here (InMemoryTableScan), hiding the
    // exchange shape this test pins
    spark.catalog.clearCache()
    val p = plan(Dedup.shinglePosts(spark, d, Dedup.hash60))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges === 1, s"shinglePosts plans $exchanges exchanges (want 1):\n$p")
  }

  test("LSH banding join is an equi-join, not a nested loop") {
    val p = plan(Dedup.minhashLsh.build(spark, d))
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"), p)
  }

  test("bucketed tables co-locate their join: no shuffle exchange in the plan") {
    import spark.implicits._
    // external tables at explicit paths — the (static) warehouse dir
    // is irrelevant, only the metastore entry + bucket spec matter
    val wh = java.nio.file.Files.createTempDirectory("graft-bucket").toString
    val facts = (1L to 1000L).map(i => (i % 50, i)).toDF("k", "v")
    val dims = (0L until 50L).map(i => (i, s"dim_$i")).toDF("k", "name")
    facts.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .option("path", s"$wh/bfacts").saveAsTable("bfacts")
    dims.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .option("path", s"$wh/bdims").saveAsTable("bdims")
    try {
      // below the broadcast threshold the join would broadcast; force
      // the shuffle-join path to show bucketing removes the exchange
      val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("bfacts").join(spark.table("bdims"), "k")
        val p = plan(joined)
        assert(!p.contains("Exchange hashpartitioning"),
          s"bucketed join still shuffles:\n$p")
        assert(joined.count() === 1000L)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bfacts")
      spark.sql("DROP TABLE IF EXISTS bdims")
    }
  }

  test("partitioned materialization enables partition pruning (the reference's refresh_date claim)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val src = Seq(("2024-01-01", 1L), ("2024-01-01", 2L), ("2024-01-08", 3L))
      .toDF("refresh_date", "id")
    val sink = new graft.engine.TableSink.Parquet(dir, Map("part" -> Seq("refresh_date")))
    val rel = sink.write("part", src)
    val pruned = rel.filter(col("refresh_date") === "2024-01-08")
    assert(pruned.count() === 1)
    val p = plan(pruned)
    assert(p.contains("PartitionFilters: [isnotnull(refresh_date"), p)
    // only the matching partition directory is scanned
    assert(!p.contains("PartitionFilters: []"), p)
  }

  test("bucketed as-of join sub-keys its window beyond the join key") {
    val p = plan(graft.ext.AsOf.eventsAsofRatesBucketed.build(spark, d))
    // the main fill window must partition on (key, _bucket), not key alone
    assert("hashpartitioning\\(event_type[^)]*_bucket".r.findFirstIn(p).isDefined,
      s"as-of window not sub-keyed by time bucket:\n$p")
  }

  test("decontamination broadcasts the benchmark side (corpus never shuffles for the join)") {
    val p = plan(graft.ext.Pipelines.decontaminate.build(spark, d))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("quantized ANN prefilter reduces map-side via partial_topk_pairs") {
    val p = plan(Similarity.quantizedTopK.build(spark, d))
    assert(p.contains("partial_topk_pairs"), p)
  }

  test("ANN top-k ranks via partial (map-side) object aggregation, not a window sort") {
    val p = plan(Similarity.bruteForceTopK.build(spark, d))
    assert(p.contains("partial_topk_pairs"), p)
    assert(!p.contains("RunningWindowFunction") && !p.contains("Window "), p)
  }

  test("brute-force ANN broadcasts the query side") {
    // BroadcastNestedLoopJoin with the tiny query set broadcast IS the
    // intended embarrassingly-parallel corpus scan
    val p = plan(Similarity.bruteForceTopK.build(spark, d))
    assert(p.contains("Broadcast"), p)
  }

  test("top-k per group prunes map-side via WindowGroupLimit (bounded shuffle)") {
    val p = plan(Inventory.windowTopkPerGroup.build(spark, d))
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("pivot with explicit values scans the fact table exactly once") {
    // an implicit pivot would run a separate distinct job to discover
    // the column values — the explicit list keeps it to one pass
    val p = plan(Inventory.aggPivot.build(spark, d))
    assert(parquetScans(p) === 1, p)
  }

  test("cube computes all grouping combinations in one pass (Expand, single scan)") {
    val p = plan(Inventory.aggCube.build(spark, d))
    assert(p.contains("Expand"), p)
    assert(parquetScans(p) === 1, p)
  }

  test("explicit grouping sets stay one pass too (Expand, single scan)") {
    val p = plan(Inventory.aggGroupingSets.build(spark, d))
    assert(p.contains("Expand"), p)
    assert(parquetScans(p) === 1, s"UNION-of-aggregates shape crept in:\n$p")
  }

  test("rolling window runs a RANGE frame over the daily aggregate, not raw events") {
    val p = plan(Inventory.windowRollingRange.build(spark, d))
    assert(p.contains("RangeFrame, -6"), p)
    // window sits ABOVE the aggregate: daily rollup shuffles the full
    // data once, the frame then runs over |keys|x|days| rows
    val aggIdx = p.indexOf("HashAggregate")
    val winIdx = p.indexOf("Window")
    assert(aggIdx >= 0 && winIdx >= 0 && winIdx < aggIdx, p)
  }

  test("runtime bloom filter from the filtered build side prunes the fact scan") {
    // sf0.01 sits far below the 10 GB application-side default, and the
    // ~5k filtered orders rows would broadcast; lower both thresholds so
    // InjectRuntimeFilter fires here exactly the way it would on the
    // 100 TB shuffle join this query models.
    val overrides = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = overrides.map { case (k, _) => k -> spark.conf.getOption(k) }
    overrides.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val p = plan(Inventory.joinRuntimeFiltered.build(spark, d))
      assert(p.contains("might_contain"), s"no runtime bloom filter injected:\n$p")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("substring spans: no window over the span hash, and the tokenize/md5 pass runs once (reused exchange)") {
    // VERDICT r16: a window over hs serializes the hottest span into
    // one task. The two-level shape must (a) carry no hs window and
    // (b) still hash the corpus once — both join branches of the
    // dup-decision shuffle the SAME (hs, doc_id) aggregate, so the
    // executed plan reuses its exchange instead of re-tokenizing.
    val df = graft.ext.Dedup.substringSpans.build(spark, d)
    val p0 = plan(df)
    // no window ANYWHERE: the hs window was the r16 straggler, and
    // the earlier lead()-window span formation re-executed per join
    // branch (its doc_id partitioning satisfies the (hs, doc_id)
    // clustering, so no shareable exchange boundary ever formed —
    // measured 2.2× task CPU); windows come from the map-side HOF
    assert(!p0.contains("Window"), s"span row plans a window:\n$p0")
    assert(!p0.contains("CartesianProduct") && !p0.contains("BroadcastNestedLoopJoin"),
      s"span dedup must not enumerate pairs:\n$p0")
    val p = finalPlan(df)
    assert(parquetScans(p) === 1, s"tokenize/hash pipeline duplicated:\n$p")
    assert(p.contains("ReusedExchange"),
      s"dup-decision branches must share the (hs, doc_id) exchange:\n$p")
    val hashed = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashed.nonEmpty &&
      hashed.forall(l => l.contains("doc_id") || l.contains("hs")), s"$hashed")
  }

  test("corpus cap/pack/keep-first paths plan no window over lang or text_hash") {
    // VERDICT r17 lead finding: the corpus-pipeline models carried the
    // same window-on-a-degenerate-key family the registry dedup paths
    // had already eliminated — row_number over text_hash (cleanBody),
    // per-lang rank (capped / pipeline_domain_cap), per-lang prefix
    // sum (packed / pipeline_pack_sequences). Converted forms: min_by
    // keep-first, bounded TopKPairs heap, two-level groupedPrefixSum.
    // The ONLY window any of these paths may plan is groupedPrefixSum's
    // local cumsum, whose partition spec carries the range-partition id
    // (__pid) — a window line without __pid means a whole group
    // serializes into one sorted task again.
    import graft.models.CorpusPipeline
    val pCap = plan(graft.ext.Pipelines.domainCap.build(spark, d))
    assert(!pCap.contains("Window"), s"domain cap plans a window:\n$pCap")
    assert(pCap.contains("ObjectHashAggregate"),
      s"domain cap lost the bounded heap aggregate:\n$pCap")
    val pPack = plan(graft.ext.Pipelines.packSequences.build(spark, d))
    val packWins = pPack.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(packWins.nonEmpty && packWins.forall(_.contains("__pid")),
      s"pack sequences windows outside the range-partitioned local cumsum:\n${packWins.mkString("\n")}")
    assert(pPack.contains("rangepartitioning"),
      s"pack sequences lost the range split of degenerate langs:\n$pPack")
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val pClean = plan(CorpusPipeline.cleaned.transform(Map("documents" -> docs)))
    assert(!pClean.contains("Window"),
      s"cleanBody plans a window over text_hash:\n$pClean")
    val res = docs.select(col("doc_id"), col("lang"), col("source"), col("text"),
      lit(5L).as("n_tokens"), lit(0.5).as("quality"))
    val pCapped = plan(CorpusPipeline.capped.transform(Map("corpus_resampled" -> res)))
    assert(!pCapped.contains("Window"), s"corpus_capped plans a window:\n$pCapped")
    assert(pCapped.contains("ObjectHashAggregate"),
      s"corpus_capped lost the bounded heap aggregate:\n$pCapped")
    val pPacked = plan(CorpusPipeline.packed.transform(Map("corpus_budget" -> res)))
    val packedWins = pPacked.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(packedWins.nonEmpty && packedWins.forall(_.contains("__pid")),
      s"corpus_packed windows outside the range-partitioned local cumsum:\n${packedWins.mkString("\n")}")
  }

  test("heavy hitters re-ranks sketch candidates via broadcasts (vocab never shuffles twice)") {
    val p = plan(graft.ext.TextAnalysis.heavyHitters.build(spark, d))
    // the candidate set reaches both the semi-join filter and the
    // estimate join as broadcasts
    assert("BroadcastHashJoin.*LeftSemi".r.findFirstIn(p).isDefined,
      s"candidate filter must be a broadcast semi-join:\n$p")
    assert("BroadcastExchange".r.findAllIn(p).length >= 2, p)
  }

  test("weighted sample bounds top-k map-side (TakeOrderedAndProject, no global sort)") {
    val p = plan(graft.ext.Pipelines.weightedSample.build(spark, d))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), s"global sort crept in:\n$p")
  }

  test("salted join lands on (key, salt) — the hot key spreads over the salt space") {
    val p = plan(Inventory.joinSkewSalted.build(spark, d))
    assert(p.contains("_salt"), s"salt column missing from the join plan:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("z-order scan prunes to the two clustered columns") {
    val p = plan(Inventory.sortZorder.build(spark, d))
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_discount:double>"),
      s"z-order must read only its two dimensions:\n$p")
  }

  test("pagerank iterations stay equi-joins over |V|-sized state (anchors broadcast)") {
    val p = plan(graft.ext.Graph.pagerank.build(spark, d))
    assert(!p.contains("CartesianProduct"), p)
    // the only nested-loop joins are the broadcast 1-row |V| anchors
    val nested = p.linesIterator.filter(_.contains("BroadcastNestedLoopJoin")).size
    assert(nested <= PageRankAnchors, s"unexpected non-anchor nested-loop join:\n$p")
  }

  private val PageRankAnchors = graft.ext.Graph.PageRankIters + 1

  test("AQE splits a skewed sort-merge join at runtime (the free skew path salting complements)") {
    // One hot key (~3 MB of rows in one partition) against a key-unique
    // dim, broadcast disabled so the join stays sort-merge: AQE must
    // mark the hot partition skewed and split it. This is the runtime
    // half of the skew story — saltedJoin/saltedAgg cover the cases AQE
    // can't (aggregations, shuffle-hash, stateful consumers).
    val c = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> c.getOption(k)).toMap
    try {
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      c.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      c.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      c.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256KB")
      c.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128KB")
      val hot = spark.range(200000).select(lit(0L).as("k"), col("id").as("v"))
        .union(spark.range(2000).select((col("id") % 50 + 1).as("k"), col("id").as("v")))
      val dim = spark.range(51).select(col("id").as("k"), (col("id") * 10).as("w"))
      val joined = hot.join(dim, "k")
      // collect() executes THIS queryExecution, so its adaptive plan
      // finalizes (count() would plan a separate execution)
      assert(joined.collect().length === 202000) // value-correct under the split
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"), p)
      assert(p.contains("skew=true"), s"AQE did not split the skewed partition:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => c.set(k, v)
      case (k, None) => c.unset(k)
    }
  }

  test("salted skew aggregation is two-level: exchange on (key, salt) then on key") {
    val p = plan(Inventory.aggSaltedSkew.build(spark, d))
    // phase 1 spreads the hot key over the salt space...
    assert("hashpartitioning\\(event_type[^)]*_salt".r.findFirstIn(p).isDefined,
      s"phase-1 exchange not salted:\n$p")
    // ...and exactly one more hash exchange merges the salt partials
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges === 2, s"want 2 hash exchanges (salted then merge), got $exchanges:\n$p")
  }

  test("incremental dedup: measured in-contract batch broadcasts; outgrown branch stays SMJ through AQE") {
    // r15 contract (replacing the r14 test, whose BroadcastHashJoin
    // assertion matched the unrelated final left join): the strategy
    // choice is made by the engine's own batch measurement, not by
    // the planner. In-contract (the driver query at sf0.01 measures a
    // tiny batch): the hs probe join itself must be a STATIC
    // BroadcastHashJoin keyed on hs — corpus probe fused onto its
    // scan, zero corpus shuffle.
    val p = plan(Dedup.incremental.build(spark, d))
    assert("BroadcastHashJoin \\[hs#".r.findFirstIn(p).isDefined,
      s"hs probe join is not a static broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    // Outgrown: the merge-hinted degradation must NOT regain a
    // broadcast at runtime — on Spark 4.1.2 JoinSelection honors a
    // user strategy hint through AQE re-planning (this pin is the
    // empirical check of the r15 scaladoc; the r14 scaladoc claimed
    // the opposite). incrementalMatches ends at the match aggregate,
    // so the only join in this plan IS the hs probe join.
    val posts = Dedup.shinglePostsDf(spark.read.parquet(s"$d/documents.parquet"))
    val corpus = posts.filter(col("doc_id") % 2 === 0)
      .select(col("hs"), col("doc_id").as("corpus_doc"), col("sz").as("sz_c"))
    val batch = posts.filter(col("doc_id") % 2 === 1)
      .select(col("hs"), col("doc_id").as("batch_doc"), col("sz").as("sz_b"))
    val fin = finalPlan(Dedup.incrementalMatches(corpus, batch, fits = false))
    assert(fin.contains("SortMergeJoin"),
      s"outgrown branch lost its SMJ:\n$fin")
    assert(!fin.contains("BroadcastHashJoin"),
      s"AQE demoted the hinted SMJ to broadcast — the honored-hint premise changed:\n$fin")
  }

  test("url canonical dedup: pruned scan (no text column), expression-only canonicalization, no url window") {
    val p = plan(Dedup.urlCanonical.build(spark, d))
    // the whole canonicalization must ride the scan projection: the
    // scan reads only the synthesis columns, never the document text
    val schema = "ReadSchema: [^\\n]*".r.findFirstIn(p).getOrElse("")
    assert(schema.contains("source") && schema.contains("lang"), p)
    assert(!schema.contains("text"), s"url canonicalization must not read text:\n$schema")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    // the group report is a partial-aggregated count/min + join-back,
    // never a window over canonical_url (a crawler trap's canonical
    // key is a degenerate partition — the r16 window family)
    assert(!p.contains("Window"), s"url dedup plans a window over the canonical key:\n$p")
    val lines = p.linesIterator.toSeq
    val partial = lines.indexWhere(l => l.contains("partial_count") && l.contains("partial_min"))
    val exch = lines.indexWhere(l => l.contains("Exchange hashpartitioning") && l.contains("canonical_url"))
    assert(partial >= 0 && exch >= 0 && exch < partial,
      s"count/min partials must sit below the canonical_url exchange:\n$p")
  }

  test("50-token span dedup: windows come from the map-side HOF, never 49 sort-window leads") {
    val df = Dedup.substringSpansLong.build(spark, d)
    val p0 = plan(df)
    assert(!p0.contains("lead("),
      s"long spans must not be lead()-generated (per-doc sort of 50-token rows):\n$p0")
    assert(!p0.linesIterator.exists(l => l.contains("Window") && l.contains("hs")),
      s"span dup decision plans a window over hs:\n$p0")
    assert(p0.contains("lambdafunction"), s"expected the transform HOF in-plan:\n$p0")
    // the executed plan reuses the (hs, doc_id) aggregate exchange:
    // one live tokenize/md5 pass despite the join-back
    assert(parquetScans(finalPlan(df)) === 1, finalPlan(df))
  }

  test("span keep-first flagging: no window over hs; partial min-struct collapses before the hs exchange") {
    // both the counts row and the cleaned-corpus row share
    // spanFlagged; the only windows allowed in these plans are the
    // per-doc interval merge (partitioned on doc_id — sparse flagged
    // rows, never the corpus-wide hash posting)
    for (q <- Seq(Dedup.substringClean, Dedup.substringCleaned)) {
      val p = plan(q.build(spark, d))
      val hsWindows = p.linesIterator.filter(l => l.contains("Window") && l.contains("hs")).toSeq
      assert(hsWindows.isEmpty, s"keep-first plans a window over hs:\n$hsWindows")
      val lines = p.linesIterator.toSeq
      val partial = lines.indexWhere(l => l.contains("partial_min") && l.contains("pos"))
      val exch = lines.indexWhere(l => l.contains("Exchange hashpartitioning") && l.contains("hs"))
      assert(partial >= 0 && exch >= 0 && exch < partial,
        s"min-struct partial must sit below the hs exchange (map-side combine):\n$p")
    }
  }

  test("substring funnel: counts and cleaned both read the persisted flagged blocks") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    // AQE wraps executed subtrees in QueryStage nodes (leaf nodes whose
    // real plan hangs off `plan`, including TableCacheQueryStage around
    // cache reads) — descend through them, but never into an
    // InMemoryRelation's cached child (storage provenance, not a live
    // scan)
    def live(n: SparkPlan): Iterator[SparkPlan] = Iterator(n) ++ (n match {
      case a: AdaptiveSparkPlanExec => live(a.executedPlan)
      case _ if n.getClass.getName.contains("QueryStage") =>
        n.getClass.getMethods.find(m => m.getName == "plan" && m.getParameterCount == 0)
          .iterator.flatMap(m => live(m.invoke(n).asInstanceOf[SparkPlan]))
      case _ => n.children.iterator.flatMap(live)
    })
    val f = Dedup.substringFunnel(spark.read.parquet(s"$d/documents.parquet"))
    try {
      for (c <- Seq(f.counts, f.cleaned)) {
        c.collect()
        val nodes = live(c.queryExecution.executedPlan).toSeq
        val im = nodes.count(_.isInstanceOf[InMemoryTableScanExec])
        val pq = nodes.count(_.isInstanceOf[FileSourceScanExec])
        assert(im === 1, s"consumer must read the cached flagged relation (got $im):\n${nodes.head}")
        // parquet is scanned only for the per-doc token pass — the
        // window/hash/flag pipeline never re-runs
        assert(pq === 1, s"consumer rebuilds the window pipeline ($pq scans):\n${nodes.head}")
      }
    } finally f.unpersist()
  }

  test("occupancy gauges: join-free, map-side partial aggregation throughout") {
    // cold-cache plan (see the shingle-pipeline test): a persisted
    // postings cache from the r22 gated pair rows must not substitute
    // into the gauge plans this test pins
    spark.catalog.clearCache()
    Seq(Dedup.lshOccupancy, Dedup.minhashOccupancy).foreach { q =>
      val p = plan(q.build(spark, d))
      assert(!p.contains("Join"), s"occupancy must be aggregation-only:\n$p")
      assert(p.contains("partial_count") || "HashAggregate\\(keys=[^)]*\\bpartial".r.findFirstIn(p).isDefined
        || p.contains("Partial"), s"expected partial aggregation:\n$p")
      assert(parquetScans(p) === 1, p)
    }
  }

  test("BM25 top-k is TakeOrderedAndProject (map-side partial top-k), never a global sort") {
    val p = plan(graft.ext.TextAnalysis.bm25TopK.build(spark, d))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("approx column profile keeps the sketch pass un-expanded (one Expand total, exact side only)") {
    // the whole point of the sketch variant: HLL aggregates must NOT
    // ride through the multi-distinct Expand (measured 2.4 s fused vs
    // 0.85 s clean at sf0.1). The exact oracle side contributes the
    // single allowed Expand; the sketch side is a plain two-phase agg.
    val p = plan(Inventory.profileColumnsApprox.build(spark, d))
    assert(p.linesIterator.count(_.contains("Expand [")) === 1, p)
    assert(p.contains("approx_count_distinct"), p)
  }

  test("kmeans-IVF probes via broadcasts: centroids and probe set never shuffle the corpus") {
    val p = plan(Similarity.ivfKmeansTopK.build(spark, d))
    assert(p.contains("BroadcastHashJoin"), p) // probe → corpus on cluster
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_topk_pairs"), p) // bounded map-side top-k
  }

  test("PQ ANN: codebook, LUT, and query sides all broadcast; top-k is map-side bounded") {
    // the ADC scan's scale contract: the only corpus-sized shuffles
    // are the encode assignment windows and the (q_id, vec_id)
    // long-sum — codebook/LUT/query joins must never shuffle the
    // corpus, and the RefineK cut must reduce before exchanging
    Seq("ann_pq_topk" -> Similarity.pqTopK, "ann_ivfpq_topk" -> Similarity.ivfpqTopK)
      .foreach { case (name, q) =>
        val p = plan(q.build(spark, d))
        assert(p.contains("BroadcastHashJoin"), s"$name:\n$p")
        assert(!p.contains("CartesianProduct"), s"$name:\n$p")
        assert(p.contains("partial_topk_pairs"), s"$name:\n$p")
      }
    // flat PQ has no probe ranking, so not even a broadcast nested
    // loop may appear (ivfpq keeps the Q×k probe crossJoin, broadcast
    // small side — the ivfKmeansTopK precedent)
    assert(!plan(Similarity.pqTopK.build(spark, d)).contains("BroadcastNestedLoop"))
  }

  test("JSON extraction is a native projected expression, not a UDF") {
    // get_json_object sits in the Project fused under the scan —
    // a codegen'd Catalyst expression, no eval break in the pipeline
    val p = plan(Inventory.eventsJsonProps.build(spark, d))
    assert(p.contains("get_json_object"), p)
    assert(!p.contains("BatchEvalPython") && !p.toLowerCase.contains("scalaudf"), p)
  }

  test("market basket bounds top-K map-side; lift joins broadcast by SIZE, not by hint") {
    // r20 (VERDICT r19 lead finding): freq = groupBy(l_partkey).count
    // is SF-SCALED — its former explicit broadcast() hint was a forced
    // 100 TB driver OOM. The hints are gone (only the 1-row n_orders
    // anchor keeps one); the planner still chooses broadcast at
    // measured scale because the sides genuinely fit — and at 100 TB
    // AQE sizes the real relations and flips the ≤K co side to the
    // build side instead. The ≥3 assertion pins measured-scale parity,
    // the BCAUDIT allowlist (agg():lineitem only) pins hint absence.
    val p = plan(Inventory.marketBasket.build(spark, d))
    assert(p.contains("TakeOrderedAndProject"),
      s"top-K must be map-side bounded, not a global sort+limit:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"pair generation must stay within orders:\n$p")
    assert(p.linesIterator.count(_.contains("BroadcastExchange")) >= 3,
      s"size-chosen broadcasts expected at harness scale:\n$p")
  }

  test("pareto running sums stay partitioned by nation (no single-partition window)") {
    val p = plan(Inventory.paretoShare.build(spark, d))
    assert(!p.contains("Exchange SinglePartition"),
      s"a global ordered window crept in:\n$p")
    assert(p.contains("windowspecdefinition(n_name"), p)
  }

  test("LM perplexity broadcasts only the 1-row vocab anchor; count joins are key joins") {
    val p = plan(graft.ext.TextAnalysis.lmPerplexity.build(spark, d))
    // the vocab anchor is the ONLY nested-loop side, and it is broadcast
    val nl = p.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    assert(nl <= 1, s"unexpected nested-loop joins (vocab^2 structure?):\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("ngram novelty shuffles int64 keys only — no pair join anywhere") {
    val p = plan(graft.ext.Dedup.ngramNovelty.build(spark, d))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"novelty must not enumerate pairs:\n$p")
    // first-occurrence attribution is an aggregate + equi-join, so every
    // non-broadcast exchange hashes on doc_id or the shingle hash
    val hashed = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashed.nonEmpty &&
      hashed.forall(l => l.contains("doc_id") || l.contains("hs")), s"$hashed")
  }

  test("gopher gates are a pure projection: the only exchange is the output sort's") {
    // every rule boolean is computed in the scan's fused Project; the
    // sole Exchange in the plan is the rangepartitioning for the
    // deterministic ORDER BY doc_id (which production consumers drop)
    val p = plan(graft.ext.TextAnalysis.gopherRules.build(spark, d))
    assert(parquetScans(p) === 1, p)
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges === 1 && p.contains("rangepartitioning"),
      s"expected only the sort's range exchange, got $exchanges:\n$p")
  }

  test("interval-overlap join runs as a bucketed equi-join, never a nested loop") {
    // Joins.intervalJoin's whole point: the inequality predicate is
    // carried by a cell equi-join; a BNLJ/cartesian here is the
    // O(|L|·|R|) range-join scale killer the rewrite exists to avoid.
    // (The one nested loop allowed is the broadcast 1-row totals
    // anchor that derives the incident threshold.)
    val p = plan(graft.ext.Sessions.intervalOverlap.build(spark, d))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) <= 1, p)
    val joinLine = p.linesIterator.find(l =>
      l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin") ||
        (l.contains("BroadcastHashJoin") && l.contains("_cell")))
    assert(joinLine.exists(_.contains("_cell")),
      s"expected the session-incident join keyed on the grid cell:\n$p")
  }

  test("rolling active users fans out a bounded explode, then equi-joins broadcast days") {
    // the anti-pattern is a range join against the day dimension
    // (O(|days|) comparisons per presence row); the plan must show a
    // plain BroadcastHashJoin on the anchor instead, and no BNLJ.
    val p = plan(graft.ext.Sessions.activeUsers.build(spark, d))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("document chunking is a pure map stage: the only exchange is the output sort's") {
    // same contract as the gopher gates — tokenize/explode/slice fuse
    // into the scan's projection; production consumers (which drop the
    // deterministic ORDER BY) chunk with zero shuffles.
    val p = plan(graft.ext.Pipelines.chunkDocuments.build(spark, d))
    assert(parquetScans(p) === 1, p)
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges === 1 && p.contains("rangepartitioning"),
      s"expected only the sort's range exchange, got $exchanges:\n$p")
  }

  test("bloom prefilter probes in a Project via scalar subquery — no join carries the sketch") {
    // the 100 TB property: the corpus membership set rides as ONE
    // subquery-evaluated binary, so the probe is a row-local
    // projection; the only join in the plan is the exact-dup verify
    val p = plan(graft.ext.Dedup.bloomPrefilter.build(spark, d))
    val probeLine = p.linesIterator.find(_.contains("might_contain"))
    assert(probeLine.exists(l => l.contains("Project") && l.contains("Subquery")),
      s"expected might_contain inlined as a scalar-subquery projection:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  /** The adaptive FINAL plan (post-execution, Initial Plan section
    * stripped) — where AQE's ReusedExchange dedup is visible.
    */
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("sorted-neighborhood reads the frozen rank boundary; pairs come from the window, not a join") {
    // r20: the ranked relation is Windows.rangedPid's RDD boundary —
    // the documents scan + key build + range exchange run ONCE in the
    // boundary's sub-execution (single execution by RDD identity, a
    // STRONGER guarantee than the ReusedExchange this pin used to
    // assert), and every branch of the published plan (window pairs +
    // boundary stitch) reads the frozen partitioning via ExistingRDD.
    val p = finalPlan(graft.ext.Dedup.sortedNeighborhood.build(spark, d))
    assert(parquetScans(p) === 0,
      s"published plan must read the boundary, not rescan documents:\n$p")
    assert(p.contains("ExistingRDD"), p)
    assert(p.contains("lead(doc_id"),
      s"in-partition neighbor pairs must come from window lead():\n$p")
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("kcore peel: published plan reads checkpointed state; corpus never rescanned") {
    // The fixed-point peel materializes each round via eager
    // localCheckpoint (the corpus bigram build runs exactly once, in
    // the round-0 job) — so the PUBLISHED top-k plan must contain no
    // parquet scan at all: it consumes the final edge set as an
    // in-memory RDD. This is the lineage-truncation contract that
    // also keeps every per-round plan constant-size (an un-truncated
    // loop is 3^rounds and OOMs explainString past ~8 rounds).
    val p = finalPlan(graft.ext.Graph.kcoreWords.build(spark, d))
    assert(parquetScans(p) === 0,
      s"published peel plan must read the checkpointed edge set, not rescan the corpus:\n$p")
    assert(p.contains("ExistingRDD"),
      s"published peel plan must source from the checkpointed RDD:\n$p")
  }

  test("concurrency sweep line scans events ONCE (inside the frozen boundary); no corpus-sized global window") {
    // sessions -> +-1 transitions -> groupedPrefixSum intra-day prefix
    // (r19: a per-day WINDOW bounded task count, not task size) +
    // days-collapse global cumsum. r20: the transition build + range
    // exchange run ONCE in Windows.rangedPid's boundary sub-execution
    // (single execution by RDD identity); the published plan reads
    // the frozen partitioning via ExistingRDD and must not touch
    // parquet again — the only unpartitioned window runs over the
    // |days| collapse.
    val p = finalPlan(graft.ext.Sessions.concurrency.build(spark, d))
    assert(parquetScans(p) === 0, s"published plan must read the boundary:\n$p")
    assert(p.contains("ExistingRDD"), p)
  }

  test("rake keywords: top-25 is a bounded TakeOrderedAndProject, never a global sort of all phrases") {
    val p = finalPlan(graft.ext.TextAnalysis.rakeKeywords.build(spark, d))
    assert(p.contains("TakeOrderedAndProject"),
      s"phrase top-k must prune map-side:\n$p")
  }

  test("isotropy is one corpus scan and d-row state; no pair join anywhere") {
    val p = finalPlan(graft.ext.Similarity.isotropy.build(spark, d))
    assert(parquetScans(p) <= 2, s"resultant-vector closed form must not re-read per pair:\n$p")
    // the only join is the 1-row scalar attach (BNLJ on a broadcast
    // singleton); a pair formulation would surface as a cartesian or
    // an equi-join between two corpus-derived sides
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), s"no pair join expected:\n$p")
  }

  test("mmr rerank: two corpus scans, bounded broadcasts, no cartesian") {
    // candidate gen (query-broadcast scan) + the pair-sim vector
    // fetch; the 5 greedy rounds run entirely on reused stages
    val p = finalPlan(Similarity.mmrRerank.build(spark, d))
    assert(parquetScans(p) === 2, s"greedy rounds must not rescan:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the query side must broadcast under the relevance scan:\n$p")
  }

  test("heaps law: ONE tokenization pass; both aggregates derive from the (t,b) table") {
    // a two-aggregate draft re-tokenized the corpus per consumer
    // (3 scans); the vocab-by-bucket count table cuts it to max-scan
    // + one token pass
    val p = finalPlan(graft.ext.TextAnalysis.heapsLaw.build(spark, d))
    assert(parquetScans(p) === 2, s"max(doc_id) probe + ONE token pass:\n$p")
  }

  test("ann recall eval: composes the two verified rankings without a cartesian") {
    val p = finalPlan(Similarity.recallEval.build(spark, d))
    assert(parquetScans(p) === 2, s"exact + lsh pipelines, one scan each:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("textrank's unrolled power iteration scans the corpus ONCE (AQE stage reuse)") {
    // the static plan shows 14 scans — AQE dedupes the identical
    // edge/node subplans at RUNTIME, so the pin must read the final
    // adaptive plan; losing this reuse (e.g. by perturbing one
    // iteration's subplan so the stages stop being identical) turns
    // a k-step iteration into k corpus scans at 100 TB
    val p = finalPlan(graft.ext.Graph.textrankKeywords.build(spark, d))
    assert(parquetScans(p) === 1,
      s"iteration subplans must be stage-reused, not rescanned:\n$p")
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage"), p)
  }

  test("link prediction scans the corpus once and caps the middle-vertex join") {
    val p = finalPlan(graft.ext.Graph.linkPrediction.build(spark, d))
    assert(parquetScans(p) === 1, s"adjacency branches must reuse stages:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("customer_rfm runs ONE orders scan; the cached base feeds every rank branch") {
    try {
      val p = finalPlan(graft.queries.Inventory.customerRfm.build(spark, d))
      assert(parquetScans(p) === 1,
        s"base must be cached — per-branch pruned subtrees rescan orders:\n$p")
      assert(p.contains("InMemoryTableScan") || p.contains("TableCacheQueryStage"), p)
    } finally spark.sharedState.cacheManager.clearCache()
  }

  test("mixture KL windows over the per-lang aggregate, never the corpus") {
    // the sum-over-() total must sit ABOVE the HashAggregate pair:
    // scan -> partial agg -> exchange -> final agg -> window(5 rows)
    val p = plan(graft.ext.Pipelines.mixtureKl.build(spark, d))
    assert(parquetScans(p) === 1, p)
    val lines = p.linesIterator.toSeq
    val winAt = lines.indexWhere(_.contains("Window"))
    val aggAt = lines.indexWhere(_.contains("HashAggregate"))
    assert(winAt >= 0 && aggAt >= 0 && winAt < aggAt,
      s"window must consume the aggregate, not the corpus:\n$p")
  }

  test("BPE merges: one corpus scan; pair count is vocab-sized; top-K bounded map-side") {
    val p = plan(graft.ext.TextAnalysis.bpeMerges.build(spark, d))
    assert(parquetScans(p) === 1, p)
    assert(p.contains("TakeOrderedAndProject"), p)
    // pair generation consumes the word AGGREGATE (vocab), not the
    // token stream: the sequence-explode Generate sits above the
    // word-count HashAggregate
    val lines = p.linesIterator.toSeq
    val seqGen = lines.indexWhere(_.contains("explode(sequence"))
    val wordAgg = lines.indexWhere(_.contains("HashAggregate(keys=[w#"))
    assert(seqGen >= 0 && wordAgg >= 0 && seqGen < wordAgg,
      s"pair explode must run over the vocab aggregate:\n$p")
  }

  test("hybrid RRF: both pools prune map-side via WindowGroupLimit; no cartesian") {
    val p = plan(Similarity.hybridRrf.build(spark, d))
    assert(p.linesIterator.count(_.contains("WindowGroupLimit")) >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("DSIR scoring scans thrice but never evaluates quality per token row") {
    val p = plan(graft.ext.Pipelines.dsirWeights.build(spark, d))
    assert(parquetScans(p) === 3, p)
    // the quality HOF (filter(..., lambdafunction)) may appear only in
    // a per-doc Filter, never in a Project — a Project formulation
    // means CollapseProject inlined it above a Generate, re-evaluating
    // it per TOKEN row (measured 18× on this query at sf0.1)
    val lines = p.linesIterator.toSeq
    assert(lines.exists(l => l.contains("Filter") && l.contains("lambdafunction")), p)
    assert(!lines.exists(l => l.contains("Project [") && l.contains("lambdafunction")),
      s"quality HOF must not sit in a per-token Project:\n$p")
    // the B-row ratio table must enter the scoring join as a broadcast
    // (statically or via AQE) — never as a corpus-sized exchange; the
    // run-and-strip check is the AQE-safe formulation
    val df = graft.ext.Pipelines.dsirWeights.build(spark, d)
    df.collect()
    val fin = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(fin.contains("BroadcastHashJoin"), fin)
  }

  test("nearest as-of composes two window passes with one exchange each") {
    // backward pass: one hashpartitioning(user_id) exchange over the
    // union; forward pass: one more over its union — 2 total, no join
    // machinery, no cartesian; events scans 3× (clicks + 2 purchase
    // payload branches), the pass-1 result flows without rescanning
    val df = graft.ext.AsOf.eventsAsofNearest.build(spark, d)
    df.collect()
    val fin = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(fin.linesIterator.count(_.contains("Exchange hashpartitioning")) === 2, fin)
    assert(fin.linesIterator.count(_.contains("Scan parquet")) === 3, fin)
    assert(!fin.contains("CartesianProduct"), fin)
  }

  test("quality classifier scores through a broadcast model join") {
    // the (≤ vocab+1)-row NB model must reach the corpus-sized scoring
    // join as a broadcast (statically or via AQE), never as a
    // corpus-wide exchange; run-and-strip is the AQE-safe check
    val df = graft.ext.Pipelines.qualityClassifier.build(spark, d)
    df.collect()
    val fin = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(fin.contains("BroadcastHashJoin"), fin)
    assert(!fin.contains("CartesianProduct"), fin)
  }

  test("cell-major ANN index: probe join is dynamic partition pruning; no assignment-table scan") {
    // The index layout contract (VERDICT r12 ask #3): ann_pq_codes is
    // stored partitioned BY CLUSTER (cell-major — the IVF layout), so
    // the probe join must reach the codes scan as a DYNAMIC PARTITION
    // PRUNING filter (only probed cells' directories are read:
    // SCALING.md's "IVF's probe pruning is partition pruning once the
    // corpus is laid out by cell"), and search must scan ONE
    // corpus-scale input — the assignment table dropped out of the
    // query path when codes became cell-major.
    val wh = java.nio.file.Files.createTempDirectory("graft-annidx-plan")
    try {
      val r = graft.models.AnnIndexPipeline.run(
        spark, d, graft.models.AnnIndexPipeline.cellMajorSink(wh.toString))
      assert(r.allTestsPassed, r.tests.filterNot(_.passed).mkString(", "))
      val raw = spark.read.parquet(s"$d/embeddings.parquet")
      val df = graft.models.AnnIndexPipeline.search(raw, r(_))
      val codesScan = plan(df).linesIterator
        .filter(l => l.contains("Scan parquet") && l.contains("ann_pq_codes"))
        .mkString("\n")
      assert(codesScan.nonEmpty, plan(df))
      assert(codesScan.contains("dynamicpruning"),
        s"probe join must prune codes partitions dynamically:\n$codesScan")
      assert(!plan(df).contains("ann_cells"),
        s"search must not scan the assignment table:\n${plan(df)}")
      // and the layout never changes answers (EngineSpec pins the
      // same equality for the plain-parquet sink)
      assert(df.collect().toSeq ===
        Similarity.ivfpqTopK.build(spark, d).collect().toSeq)
    } finally {
      Seq("ann_cells", "ann_pq_codes").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS `$t`"))
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(wh).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("centroid drift collapses the corpus map-side on (label, slice, i)") {
    val p = plan(Similarity.centroidDrift.build(spark, d))
    assert(parquetScans(p) === 1, p)
    val lines = p.linesIterator.toSeq
    val exch = lines.indexWhere(l => l.contains("Exchange hashpartitioning") && l.contains("label"))
    val partial = lines.indexWhere(l => l.contains("HashAggregate") && l.contains("partial_sum"))
    assert(exch >= 0 && partial >= 0 && exch < partial,
      s"partial aggregate must precede the (label, slice, i) exchange:\n$p")
  }

  test("formula-k assignment paths: no n·k window exchange; two-level refines via shuffled hash") {
    val e = graft.queries.Inventory.rebalanced(
      spark.read.parquet(s"$d/embeddings.parquet"), "vec_id")
    // assignWith (the argmax-by-aggregation shared by assignK and
    // semdedupPairsMulti): the scored crossJoin collapses in a
    // partial max_by BEFORE any exchange — a Window here would mean
    // the n·k rank sort the scaladoc warns against has crept back
    val pFlat = plan(graft.ext.KMeans.assignK(e, graft.ext.KMeans.K))
    // the seed-ranking window over skinny ids is legitimate; a window
    // that ranks the SCORED grid (csim) is the n·k hazard
    assert(!pFlat.linesIterator.exists(l => l.contains("Window") && l.contains("csim")),
      s"assignK plans a rank window over the scored grid:\n$pFlat")
    val lines = pFlat.linesIterator.toSeq
    val partial = lines.indexWhere(_.contains("partial_max_by"))
    val join = lines.indexWhere(_.contains("BroadcastNestedLoopJoin"))
    assert(partial >= 0 && join > partial, s"scored-grid join/partial shape missing:\n$pFlat")
    assert(!lines.slice(partial + 1, join).exists(_.contains("Exchange")),
      s"an exchange moves the scored n·k grid before the partial argmax collapses it:\n$pFlat")
    // two-level: the refine join must be a ShuffledHashJoin on
    // (coarse, shard) — SMJ would sort the embedding-wide probe
    // stream (the r14 spill class), broadcast would carry the k-sized
    // fine relation the two-level shape exists to avoid
    val p2 = plan(graft.ext.KMeans.assignKTwoLevel(e, graft.ext.KMeans.K))
    assert(p2.contains("ShuffledHashJoin [coarse"),
      s"two-level refine join is not a shuffled hash join on coarse:\n$p2")
    assert(!p2.contains("SortMergeJoin"),
      s"two-level plans a sort-merge join over wide probe rows:\n$p2")
  }

  test("keep-best is a partial-aggregated argmax: no window over cluster_id anywhere in the path") {
    // VERDICT r16 "what's wrong" #2: a row_number window over
    // cluster_id serializes a degenerate cluster (10⁸-member
    // boilerplate class on a web corpus) into one sorted task with no
    // map-side combine. The aggregate form's max_by/count partials
    // collapse the hot key before the exchange.
    import spark.implicits._
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 3L)).toDF("doc_id", "cluster_id")
    val docs = Seq((1L, 10L), (2L, 20L), (3L, 5L)).toDF("doc_id", "n_chars")
    val p = plan(graft.ext.Clusters.keepBest(labels, docs))
    assert(!p.contains("Window"), s"keepBest plans a window:\n$p")
    assert(p.contains("partial_max_by") || p.contains("max_by"),
      s"keepBest lost its argmax aggregate:\n$p")
    val lines = p.linesIterator.toSeq
    val partial = lines.indexWhere(_.contains("partial_max_by"))
    val exch = lines.indexWhere(l => l.contains("Exchange hashpartitioning") && l.contains("cluster_id"))
    assert(partial >= 0 && exch >= 0 && exch < partial,
      s"max_by partial must sit below the cluster_id exchange (map-side combine):\n$p")
  }

  test("lsh funnel: gauge and pairs both read the persisted blocks, not a recomputed grid") {
    val e = graft.queries.Inventory.rebalanced(
      spark.read.parquet(s"$d/embeddings.parquet"), "vec_id")
    val f = graft.ext.Dedup.embeddingLshFunnel(e, graft.ext.Dedup.CosTau, graft.ext.Dedup.embPlanes)
    try {
      f.occupancy.collect() // the gate runs first and populates the cache
      assert(plan(f.occupancy).contains("InMemoryTableScan"),
        s"gauge does not read the shared blocks:\n${plan(f.occupancy)}")
      // count scans on the physical TREE, not the rendering: the
      // InMemoryRelation string re-renders its cached child plan
      // (including the original parquet scan), which is storage
      // provenance, not a live scan
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
      val root: SparkPlan = f.pairs.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      var (pq, im) = (0, 0)
      root.foreach {
        case _: FileSourceScanExec => pq += 1
        case _: InMemoryTableScanExec => im += 1
        case _ => ()
      }
      assert(im === 2, s"both candidate sides must read the shared blocks (got $im):\n$root")
      // blocking comes from cache — parquet is scanned only for the
      // two vector attaches of the verify stage
      assert(pq === 2, s"pairs recompute the blocking grid from parquet ($pq scans):\n$root")
    } finally f.unpersist()
    // the minhash twin: same contract — cached bands feed both
    // candidate sides, parquet scans only for the posting verify
    val posts = graft.ext.Dedup.shinglePosts(spark, d, graft.ext.Dedup.hash60)
    val fm = graft.ext.Dedup.minhashLshFunnel(posts)
    try {
      fm.occupancy.collect()
      assert(plan(fm.occupancy).contains("InMemoryTableScan"), plan(fm.occupancy))
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
      val root: SparkPlan = fm.pairs.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      var (pq, im) = (0, 0)
      root.foreach {
        case _: FileSourceScanExec => pq += 1
        case _: InMemoryTableScanExec => im += 1
        case _ => ()
      }
      assert(im === 2, s"minhash candidate sides must read cached bands (got $im):\n$root")
      assert(pq === 2, s"minhash pairs re-tokenize beyond the two posting attaches ($pq):\n$root")
    } finally fm.unpersist()
  }
}
