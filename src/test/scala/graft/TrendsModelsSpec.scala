package graft

import org.apache.spark.sql.functions._

import graft.engine.{DagRunner, MapCatalog, Materialization, Model, NotNull, RunResult, TableSink}
import graft.models.{TrendsFixtures, TrendsModels}

class TrendsModelsSpec extends SparkSpec {

  lazy val run: RunResult = TrendsModels.run(spark)

  test("DAG builds all 7 models, none skipped") {
    assert(run.relations.keySet == TrendsModels.all.map(_.name).toSet)
    assert(run.skipped.isEmpty)
  }

  test("all 68 ported data tests pass") {
    assert(run.tests.size == 68, s"expected 68 test executions, got ${run.tests.size}")
    val failed = run.tests.filterNot(_.passed)
    assert(failed.isEmpty, s"failing: ${failed.mkString(", ")}")
  }

  test("top_terms_comparison: union of both branches, every CASE arm hit") {
    val df = run("top_terms_comparison")
    // 72 intl + 72 us rows, positional union
    assert(df.count() == 144)
    val scopes = df.select("scope").distinct().collect().map(_.getString(0)).toSet
    assert(scopes == Set("international", "us_dma"))
    // us branch injects typed NULL region_name (top_terms_comparison.sql:22)
    assert(df.filter(col("scope") === "us_dma" && col("region_name").isNotNull).isEmpty)
    val rc = df.select("rank_category").distinct().collect().map(_.getString(0)).toSet
    assert(rc == Set("#1 Term", "Top 5", "Top 10", "Other"))
    val il = df.select("interest_level").distinct().collect().map(_.getString(0)).toSet
    assert(il == Set("Very High Interest", "High Interest", "Moderate Interest", "Low Interest", "Very Low Interest"))
    // geo_code is the stringified dma_id on the us side (cast INT→STRING, P6)
    assert(df.filter(col("scope") === "us_dma").select("geo_code").distinct()
      .collect().map(_.getString(0)).toSet == Set("500", "501", "502"))
  }

  test("trending_terms_analysis: every rank_tier and growth_category arm hit") {
    val df = run("trending_terms_analysis")
    assert(df.count() == 144)
    val tiers = df.select("rank_tier").distinct().collect().map(_.getString(0)).toSet
    assert(tiers == Set("Top 5", "Top 10", "Top 25", "Other"))
    val growth = df.select("growth_category").distinct().collect().map(_.getString(0)).toSet
    assert(growth == Set("Explosive (1000%+)", "Very High (500-999%)", "High (200-499%)",
      "Moderate (100-199%)", "Low (<100%)"))
    // boundary semantics: rank=5 → Top 5, rank=6 → Top 10; gain=999 → Very High, 1000 → Explosive
    val byRank = df.select("rank", "rank_tier").distinct().collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byRank(5L) == "Top 5" && byRank(6L) == "Top 10" && byRank(25L) == "Top 25" && byRank(26L) == "Other")
    val byGain = df.select("percent_gain", "growth_category").distinct().collect()
      .map(r => r.getDouble(0) -> r.getString(1)).toMap
    assert(byGain(999d) == "Very High (500-999%)" && byGain(1000d) == "Explosive (1000%+)")
    assert(byGain(99d) == "Low (<100%)" && byGain(100d) == "Moderate (100-199%)")
  }

  test("weekly_trends_summary: 4 trend types × 3 grains, null gains on top branches, global sort") {
    val df = run("weekly_trends_summary")
    val rows = df.collect()
    assert(rows.length == 12) // 4 branches × 3 (week, refresh_date) pairs
    val types = df.select("trend_type").distinct().collect().map(_.getString(0)).toSet
    assert(types == Set("international_rising", "international_top", "us_rising", "us_top"))
    // top branches carry typed NULL gain columns (weekly_trends_summary.sql:24-25,52-53)
    assert(df.filter(col("trend_type").isin("international_top", "us_top"))
      .filter(col("avg_percent_gain").isNotNull || col("max_percent_gain").isNotNull).isEmpty)
    assert(df.filter(col("trend_type").isin("international_rising", "us_rising"))
      .filter(col("avg_percent_gain").isNull).isEmpty)
    // ORDER BY week desc, trend_type (weekly_trends_summary.sql:111)
    val key = rows.map(r => (r.getDate(0).getTime, r.getString(2)))
    val expected = key.sortBy { case (w, t) => (-w, t) }
    assert(key.toSeq == expected.toSeq)
    // unique_geos is the exact distinct count (3 geos per grain)
    assert(rows.forall(_.getLong(7) == 3L))
    // avg_score is rounded to 2dp
    val avgScores = rows.map(_.getDouble(4))
    assert(avgScores.forall(v => math.abs(v * 100 - math.round(v * 100)) < 1e-9))
  }

  test("the ENTIRE DAG authored as SQL text matches the DataFrame authoring") {
    val sqlRun = graft.models.TrendsModelsSql.run(spark)
    assert(sqlRun.tests.size === 68)
    assert(sqlRun.allTestsPassed, sqlRun.tests.filterNot(_.passed).mkString(", "))
    assert(sqlRun.skipped.isEmpty)
    TrendsModels.all.map(_.name).foreach { m =>
      val got = sqlRun(m).collect().map(_.toString).sorted.toSeq
      val want = run(m).collect().map(_.toString).sorted.toSeq
      assert(got === want, s"$m diverges between SQL and DataFrame authoring")
      assert(sqlRun(m).columns.toSeq === run(m).columns.toSeq,
        s"$m column order diverges between authorings")
    }
  }

  test("a model authored as SQL text runs through the DAG identically") {
    // the reference's users write SQL — stg_top_terms re-authored as
    // SQL text must drop into the DAG with no downstream difference
    val sqlStg = Model.sql(
      "stg_top_terms",
      Seq("top_terms"),
      Materialization.View,
      "SELECT dma_id, dma_name, term, refresh_date, week, score, rank FROM top_terms",
      tests = Seq("dma_id", "dma_name", "term", "refresh_date", "week", "score", "rank").map(NotNull))
    val models = TrendsModels.all.map(m => if (m.name == "stg_top_terms") sqlStg else m)
    val sqlRun = new DagRunner(new MapCatalog(TrendsFixtures.catalog(spark)), new TableSink.Cached)
      .run(models)
    assert(sqlRun.tests.size === 68)
    assert(sqlRun.allTestsPassed, sqlRun.tests.filterNot(_.passed).mkString(", "))
    // every mart downstream of the SQL-authored staging model agrees
    Seq("top_terms_comparison", "trending_terms_analysis", "weekly_trends_summary").foreach { m =>
      val got = sqlRun(m).collect().map(_.toString).sorted.toSeq
      val want = run(m).collect().map(_.toString).sorted.toSeq
      assert(got === want, s"$m diverges under SQL authoring")
    }
  }

  test("GraftExtensions functions work from SQL-text models in the DAG") {
    import org.apache.spark.sql.SparkSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder().master("local[2]")
        .withExtensions(new graft.functions.GraftExtensions).getOrCreate()
      import s2.implicits._
      val emb = Seq((1L, Seq(3.0, 0.0)), (2L, Seq(3.0, 4.0))).toDF("id", "v")
      val m = Model.sql("sims", Seq("emb"), Materialization.View,
        """SELECT a.id AS id_a, b.id AS id_b, cosine_similarity(a.v, b.v) AS sim
          |FROM emb a JOIN emb b ON a.id < b.id""".stripMargin)
      val result = new DagRunner(new MapCatalog(Map("emb" -> emb))).run(Seq(m))("sims").head()
      assert(math.abs(result.getDouble(2) - 0.6) < 1e-12)
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("manifest reports lineage, materializations, and test inventory per model") {
    val m = graft.engine.Manifest.manifest(spark, TrendsModels.all).collect()
    assert(m.length === 7)
    val byName = m.map(r => r.getString(0) -> r).toMap
    // staging at depth 0 as views over sources; marts at depth 1 as tables
    assert(byName("stg_top_terms").getString(1) === "view")
    assert(byName("stg_top_terms").getInt(2) === 0)
    assert(byName("stg_top_terms").getSeq[String](4) === Seq("top_terms"))
    assert(byName("weekly_trends_summary").getString(1) === "table")
    assert(byName("weekly_trends_summary").getInt(2) === 1)
    assert(byName("weekly_trends_summary").getSeq[String](3).length === 4)
    // the 68 data tests are all inventoried
    assert(m.map(_.getSeq[String](5).length).sum === 68)
  }

  test("round is HALF_UP like BigQuery ROUND, not banker's (SURVEY §4 trap 1)") {
    import spark.implicits._
    val got = Seq(2.005, 2.015, 2.025).toDF("v")
      .select(round(col("v"), 2).as("r")).collect().map(_.getDouble(0)).toSeq
    // Spark rounds the shortest decimal representation HALF_UP
    assert(got == Seq(2.01, 2.02, 2.03))
  }
}
