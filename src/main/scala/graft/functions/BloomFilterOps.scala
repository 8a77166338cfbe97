package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.lit

/** Column-API access to Spark's own Bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the pair the
  * optimizer injects for runtime join filters, not exposed as SQL
  * functions). Re-used rather than re-implemented: the aggregate's
  * partial states are mergeable sketches (tree-reduced, never
  * collected row-wise), and `might_contain` code-generates against
  * the broadcast binary.
  *
  * The membership-sketch use case this unlocks: an incremental-ingest
  * dedup prefilter where the standing corpus ships as ONE ~MB binary
  * instead of a key shuffle — see `Dedup.bloomPrefilter`.
  */
object BloomFilterOps {

  /** Aggregate a Bloom filter over `itemHash` (must be a LONG — hash
    * first, e.g. `xxhash64(text)`). Sized by `expectedItems` /
    * `numBits` exactly as Spark's runtime-filter planner sizes its
    * own filters.
    */
  def bloomAgg(itemHash: Column, expectedItems: Long, numBits: Long): Column =
    GraftColumnBridge.column(
      new BloomFilterAggregate(
        GraftColumnBridge.expression(itemHash),
        GraftColumnBridge.expression(lit(expectedItems)),
        GraftColumnBridge.expression(lit(numBits))
      ).toAggregateExpression())

  /** Membership probe: true if `valueHash` (same hashing as the
    * build side) may be in `bloom`; false is definitive.
    */
  def mightContain(bloom: Column, valueHash: Column): Column =
    GraftColumnBridge.column(
      BloomFilterMightContain(
        GraftColumnBridge.expression(bloom),
        GraftColumnBridge.expression(valueHash)))
}
