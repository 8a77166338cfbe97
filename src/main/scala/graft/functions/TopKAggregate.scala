package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k largest (score, id) pairs per
  * group in a size-k min-heap — `TypedImperativeAggregate`, the
  * Catalyst extension point for aggregation state that isn't a fixed
  * row (SURVEY.md §7.1-7 preference order (b)).
  *
  * Why it exists: the composable top-k (`row_number().over(Window)`
  * + filter) SORTS every candidate row of a group and gives the
  * window operator ALL of them — at corpus scale that shuffles every
  * candidate to the group's reducer. This aggregate is algebraic:
  * each map task reduces its partition to ≤ k pairs, the shuffle
  * moves k·partitions rows instead of all candidates, and merge is
  * heap-union. Ties break toward the smaller id, so the top-k SET is
  * a pure function of the input set — partial/merge order cannot
  * change the result.
  *
  * Output: `array<struct<score double, id bigint>>`, sorted by
  * (score desc, id asc) — posexplode to get ranked rows.
  */
case class TopKPairs(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, "k must be positive")

  // min-heap: head is the WORST kept pair (lowest score; among equal
  // scores the largest id), evicted first when a better pair arrives
  private val worstFirst: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, i) => (-s, i) }

  override def children: Seq[Expression] = Seq(score, id)

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) =>
        TypeCheckResult.TypeCheckFailure(s"topk_pairs requires (double, bigint), got ($s, $i)")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("id", LongType))),
    containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "topk_pairs"

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  private def push(buf: mutable.PriorityQueue[(Double, Long)], p: (Double, Long)): Unit = {
    // head is the worst kept pair (the heap's max under worstFirst);
    // replace it when the incoming pair ranks strictly better (lower)
    if (buf.size < k) buf.enqueue(p)
    else if (worstFirst.lt(p, buf.head)) { buf.dequeue(); buf.enqueue(p) }
  }

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)], input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    // NaN scores are dropped outright: under worstFirst a NaN would be
    // the first evicted, while the window formulation's ORDER BY desc
    // ranks NaN as LARGEST — skipping them keeps both formulations
    // agreeing by construction (a NaN "similarity" carries no ranking
    // information anyway).
    if (s != null && i != null && !s.asInstanceOf[Double].isNaN)
      push(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(push(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toSeq.sortBy { case (s, i) => (-s, i) }
    new GenericArrayData(sorted.map { case (s, i) => InternalRow(s, i) })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach(_ => buf.enqueue((in.readDouble(), in.readLong())))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKPairs {

  /** Column-API entry point: top-k (score, id) pairs per group as a
    * sorted array column.
    */
  def topk(score: Column, id: Column, k: Int): Column =
    GraftColumnBridge.column(
      TopKPairs(GraftColumnBridge.expression(score), GraftColumnBridge.expression(id), k)
        .toAggregateExpression())
}
