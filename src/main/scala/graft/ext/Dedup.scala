package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.engine.Functions.roundPortable
import graft.queries.Inventory.Q
import graft.ext.TextAnalysis.tokens

/** Deduplication operators over the `documents` table:
  *
  *   - exact (hash-groupBy) — one shuffle on the content hash;
  *   - exact n-gram Jaccard (all-pairs) — the O(n²) correctness
  *     baseline the approximate paths are validated against;
  *   - MinHash + LSH banding — the 100 TB path: near-dup candidate
  *     generation via an equi-join on (band, band_hash), so the only
  *     shuffle is hash-partitioned on band keys; candidates are then
  *     verified with exact Jaccard. Cost is O(n·k + candidates),
  *     never O(n²);
  *   - SimHash — 64-bit fingerprints whose Hamming distance bounds
  *     cosine-of-token-vectors; banding the 64 bits into 4×16-bit
  *     blocks gives an equi-joinable key for Hamming ≤ 3 search.
  *
  * Everything is built from codegen'd higher-order functions —
  * xxhash64 / transform / aggregate / zip_with — no UDFs, no RDDs,
  * so the per-document signature stage is a pure map (no shuffle).
  */
object Dedup {

  /** 3-token shingles (distinct), the unit of near-dup comparison. */
  def shingles(text: Column): Column = {
    val toks = tokens(text)
    array_distinct(
      when(size(toks) >= 3,
        transform(sequence(lit(1), size(toks) - 2),
          i => array_join(slice(toks, i, lit(3)), " ")))
        .otherwise(array_remove(array(array_join(toks, " ")), "")))
  }

  private def docShingles(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), shingles(col("text")).as("sh"))

  // ------------------------------------------------------------------
  // Exact dedup: group by content hash, keep the smallest doc_id.
  // Scale: one shuffle, partial aggregation map-side; the hash (not
  // the full text) is the shuffle key, so shuffled bytes stay small.
  // ------------------------------------------------------------------
  val exact: Q = Q(
    (s, d) =>
      s.read.parquet(s"$d/documents.parquet")
        .groupBy(md5(encode(col("text"), "UTF-8")).as("text_hash"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("copies"))
        .orderBy("text_hash"),
    Some("""SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS copies
           |FROM documents GROUP BY 1 ORDER BY text_hash""".stripMargin)
  )

  // ------------------------------------------------------------------
  // Exact n-gram Jaccard, all pairs ≥ 0.3 — the verification oracle
  // for the LSH path. O(n²): correct, and deliberately NOT the scale
  // path (see minhashLsh below).
  // ------------------------------------------------------------------
  val jaccardPairs: Q = Q(
    (s, d) => {
      val a = docShingles(s, d).select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
      val b = docShingles(s, d).select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
      val jac = size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType) /
        size(array_union(col("sh_a"), col("sh_b")))
      a.join(b, col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"), roundPortable(jac, 6).as("jaccard"))
        .filter(col("jaccard") >= 0.3)
        .orderBy("doc_a", "doc_b")
    },
    Some("""WITH s AS (
           |  SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
           |           i -> array_to_string(toks[i:i+2], ' '))) AS sh
           |  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents)
           |)
           |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |  floor(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
           |        / len(list_distinct(a.sh || b.sh)) * 1000000 + 0.5) / 1000000 AS jaccard
           |FROM s a, s b
           |WHERE a.doc_id < b.doc_id
           |  AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(list_distinct(a.sh || b.sh)) >= 0.3
           |ORDER BY doc_a, doc_b""".stripMargin)
  )

  // ------------------------------------------------------------------
  // MinHash + LSH banding. k=32 hash functions (xxhash64 with distinct
  // prefixes), 16 bands × 2 rows: P(candidate | J=0.5) ≈ 0.99.
  // Pipeline: signature (pure map) → explode bands → equi-join on
  // (band, key) → exact-Jaccard verify of the candidates only.
  //
  // Scale notes: the band join is hash-partitioned on (band, key) —
  // no broadcast, no cross product. Degenerate keys (e.g. boilerplate
  // shingles shared by millions of docs) would skew the join, so
  // oversized buckets are dropped with a count-filter first — at the
  // cost of missing dups inside a dropped bucket, which is the
  // standard web-dedup tradeoff.
  // ------------------------------------------------------------------
  val NumHashes = 32
  val Bands = 16
  val RowsPerBand: Int = NumHashes / Bands
  val MaxBucket = 1000

  /** doc_id → (band, key) pairs, one row per band. */
  def lshBands(docs: DataFrame): DataFrame = {
    val sig = array((0 until NumHashes).map(i =>
      array_min(transform(col("sh"), sh => xxhash64(concat(lit(s"m$i:"), sh))))): _*)
    val bands = transform(sequence(lit(0), lit(Bands - 1)),
      j => struct(j.as("band"),
        xxhash64(array_join(transform(slice(col("sig"), j * RowsPerBand + 1, lit(RowsPerBand)),
          x => x.cast("string")), ",")).as("key")))
    docs.select(col("doc_id"), sig.as("sig"))
      .select(col("doc_id"), explode(bands).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
  }

  val minhashLsh: Q = Q(
    (s, d) => {
      val sh = docShingles(s, d)
      val bands = lshBands(sh)
      // guard against degenerate buckets before the self-join
      val sized = bands.join(
        bands.groupBy("band", "key").count().filter(col("count") <= MaxBucket),
        Seq("band", "key"))
      val cand = sized.select(col("band"), col("key"), col("doc_id").as("doc_a"))
        .join(sized.select(col("band"), col("key"), col("doc_id").as("doc_b")),
          Seq("band", "key"))
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct()
      val jac = size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType) /
        size(array_union(col("sh_a"), col("sh_b")))
      cand
        .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
        .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"), roundPortable(jac, 6).as("jaccard"))
        .filter(col("jaccard") >= 0.3)
        .orderBy("doc_a", "doc_b")
    },
    // Not DuckDB-expressible (xxhash64 banding); ScalaTest asserts this
    // equals jaccardPairs (full recall at J ≥ 0.5 with 16×2 bands).
    None
  )

  // ------------------------------------------------------------------
  // SimHash: 64-bit fingerprint = sign of per-bit vote sums over token
  // hashes. Near-dup docs differ in few bits; the 4×16-bit band split
  // yields an equi-join key covering all pairs within Hamming ≤ 3
  // (pigeonhole). Pure map per doc; no shuffle in this query.
  // ------------------------------------------------------------------
  /** Literal 2^j table — lets the per-bit tests stay pure column
    * expressions (Spark's shiftright/shiftleft only take Int shifts).
    */
  private val bitMasks: Column = typedLit((0 until 64).map(j => 1L << j))

  def simhash(toks: Column): Column = {
    val votes = aggregate(
      toks,
      array_repeat(lit(0L), 64),
      (acc, t) =>
        zip_with(acc,
          transform(sequence(lit(0), lit(63)),
            j => when(xxhash64(t).bitwiseAND(element_at(bitMasks, (j + 1).cast("int"))) =!= 0, 1L)
              .otherwise(-1L)),
          (a, b) => a + b))
    aggregate(sequence(lit(0), lit(63)), lit(0L),
      (acc, j) => acc.bitwiseOR(
        when(element_at(votes, (j + 1).cast("int")) > 0,
          element_at(bitMasks, (j + 1).cast("int"))).otherwise(0L)))
  }

  val simhashFingerprints: Q = Q(
    (s, d) => {
      val docs = s.read.parquet(s"$d/documents.parquet")
      val fp = docs.select(col("doc_id"), simhash(array_distinct(tokens(col("text")))).as("simhash"))
      val cols = Seq(col("doc_id"), col("simhash")) ++ (0 until 4).map(b =>
        shiftright(col("simhash"), b * 16).bitwiseAND(0xFFFFL).as(s"band$b"))
      fp.select(cols: _*).orderBy("doc_id")
    },
    None // xxhash64-based; validated in ScalaTest (Hamming vs Jaccard correlation)
  )

  val queries: Seq[(String, Q)] = Seq(
    "dedup_exact" -> exact,
    "dedup_jaccard_pairs" -> jaccardPairs,
    "dedup_minhash_lsh" -> minhashLsh,
    "dedup_simhash" -> simhashFingerprints
  )
}
