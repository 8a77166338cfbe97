package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.engine.Functions.roundPortable
import graft.queries.Inventory
import graft.queries.Inventory.Q

/** Iterative graph analytics over DataFrames — the second graph
  * operator family beside [[Clusters]]' connected components (label
  * propagation). Same engine philosophy: the iteration is UNROLLED
  * into one lazy Catalyst plan (no driver-side collect per step), all
  * joins are declared so AQE/broadcast planning applies, and the
  * per-iteration state is a (node, rank) table — O(|V|) rows, never
  * materialized edge products.
  */
object Graph {

  // ------------------------------------------------------------------
  // PageRank (Page/Brin/Motwani/Winograd, "The PageRank Citation
  // Ranking", Stanford tech report 1999 — public algorithm) over the
  // behavioral event-transition graph: nodes = event types, edges =
  // observed consecutive transitions per user (the same edge
  // construction as `events_transition_matrix`), edge weight = the
  // transition probability. The result ranks event types by
  // steady-state visit probability — "which states does user behavior
  // concentrate in" — the canonical importance score for any directed
  // weighted graph (document link graphs, session flows, citation
  // networks).
  //
  // Engine shape: FIXED-ITERATION (k=3) power method, unrolled lazily
  // — each step is ranks ⋈ edges (shuffle on src) → groupBy dst →
  // left-join back onto the node set (nodes with no inbound edges
  // keep the teleport term). |state| = |V| rows throughout; at a
  // billion-node graph each step is one co-partitionable join (edges
  // pre-partitioned by src, REUSED across iterations — the plan keys
  // every step's shuffle identically) plus an O(|V|) aggregate, and
  // production would persist+checkpoint the rank table per step
  // (exactly as [[KMeans]] documents for its centroid loop; the
  // 5-node harness graph doesn't warrant it).
  //
  // Numeric contract: ranks are IEEE doubles; per-node contribution
  // sums have engine-dependent ADD ORDER, so raw ranks can differ by
  // ~1 ulp — published ranks round at 1e-6 (the repo's standard
  // double-rounding contract, same as zipf_slope's regression), far
  // above the drift and far below rank separations. No dangling-node
  // mass redistribution: every harness node has out-edges, and the
  // simplification is stated so the oracle replays it exactly.
  // ------------------------------------------------------------------
  val PageRankIters = 3
  val Damping = 0.85

  val pagerank: Q = Q(
    (s, d) => {
      val ev = Inventory.events(s, d)
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val edges = ev
        .withColumn("next_type", lead(col("event_type"), 1).over(byUser))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("src"), col("next_type").as("dst"))
        .agg(count(lit(1)).as("w"))
        .withColumn("p", col("w").cast(DoubleType) /
          sum(col("w")).over(Window.partitionBy("src")).cast(DoubleType))
      val nodes = ev.select(col("event_type").as("node")).distinct()
      // |V| as a broadcast 1-row anchor — the plan stays fully lazy
      val n = nodes.agg(count(lit(1)).cast(DoubleType).as("n_nodes"))
      var ranks: DataFrame = nodes.crossJoin(broadcast(n))
        .select(col("node"), (lit(1.0) / col("n_nodes")).as("r"))
      for (_ <- 1 to PageRankIters) {
        val contrib = edges
          .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
          .groupBy(col("dst").as("node"))
          .agg(sum(col("r") * col("p")).as("c"))
        ranks = nodes.crossJoin(broadcast(n))
          .join(contrib, Seq("node"), "left")
          .select(col("node"),
            // literal 0.15 (not 1.0-0.85, which rounds differently in
            // binary) so both engines start from the same double
            (lit(0.15) / col("n_nodes") +
              lit(Damping) * coalesce(col("c"), lit(0.0))).as("r"))
      }
      ranks
        .select(col("node"), roundPortable(col("r"), 6).as("pr"))
        .orderBy(col("pr").desc, col("node"))
    },
    Some {
      val iter = (k: Int) =>
        s"""r$k AS (
           |  SELECT nodes.node, 0.15 / n.n + 0.85 * coalesce(c.c, 0) AS r
           |  FROM nodes CROSS JOIN n
           |  LEFT JOIN (
           |    SELECT p.dst AS node, sum(r${k - 1}.r * p.p) AS c
           |    FROM p JOIN r${k - 1} ON r${k - 1}.node = p.src GROUP BY 1
           |  ) c ON c.node = nodes.node
           |)""".stripMargin
      s"""WITH seq AS (
         |  SELECT event_type,
         |         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
         |  FROM events
         |), e AS (
         |  SELECT event_type AS src, next_type AS dst, count(*) AS w
         |  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
         |), p AS (
         |  SELECT src, dst, CAST(w AS DOUBLE) / sum(w) OVER (PARTITION BY src) AS p FROM e
         |), nodes AS (
         |  SELECT DISTINCT event_type AS node FROM events
         |), n AS (
         |  SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes
         |), r0 AS (
         |  SELECT node, 1.0 / n.n AS r FROM nodes CROSS JOIN n
         |), ${(1 to PageRankIters).map(iter).mkString(", ")}
         |SELECT node, floor(r * 1000000 + 0.5) / 1000000 AS pr
         |FROM r$PageRankIters ORDER BY pr DESC, node""".stripMargin
    }
  )

  // ------------------------------------------------------------------
  // Triangle enumeration over the undirected co-transition graph —
  // the clustering-coefficient / community-density primitive. The
  // classic distributed formulation: ORIENT each undirected edge
  // low→high (halves the edge set, kills directed double-counting),
  // then two equi-joins enumerate each triangle exactly once as
  // a<b<c — never a cartesian product, and the join keys are plain
  // vertex ids. At scale the orientation step is what bounds the
  // work: joining oriented edge lists costs Σ d_out(v)², and
  // ordering by DEGREE instead of id caps d_out at O(√|E|)
  // (Suri & Vassilvitskii, "Counting Triangles and the Curse of the
  // Last Reducer", WWW 2011 — public algorithm). The harness graph's
  // id order is stated and replayed by the oracle; the degree
  // refinement drops in by swapping the orientation comparator.
  // ------------------------------------------------------------------
  val triangles: Q = Q(
    (s, d) => {
      val ev = Inventory.events(s, d)
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val und = ev
        .withColumn("next_type", lead(col("event_type"), 1).over(byUser))
        .filter(col("next_type").isNotNull && col("next_type") =!= col("event_type"))
        .select(
          least(col("event_type"), col("next_type")).as("a"),
          greatest(col("event_type"), col("next_type")).as("b"))
        .distinct()
      val ab = und
      val bc = und.select(col("a").as("b2"), col("b").as("c"))
      val ac = und.select(col("a").as("a3"), col("b").as("c3"))
      ab.join(bc, col("b") === col("b2"))
        .join(ac, col("a") === col("a3") && col("c") === col("c3"))
        .select(col("a"), col("b"), col("c"))
        .orderBy("a", "b", "c")
    },
    Some("""WITH seq AS (
           |  SELECT event_type,
           |         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
           |  FROM events
           |), e AS (
           |  SELECT DISTINCT least(event_type, next_type) AS a,
           |                  greatest(event_type, next_type) AS b
           |  FROM seq WHERE next_type IS NOT NULL AND next_type <> event_type
           |)
           |SELECT ab.a, ab.b, bc.b AS c
           |FROM e ab
           |JOIN e bc ON ab.b = bc.a
           |JOIN e ac ON ab.a = ac.a AND bc.b = ac.b
           |ORDER BY 1, 2, 3""".stripMargin)
  )

  val queries: Seq[(String, Q)] = Seq(
    "graph_pagerank" -> pagerank,
    "graph_triangles" -> triangles
  )
}
