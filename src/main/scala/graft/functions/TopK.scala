package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded-heap top-k aggregate: keeps the k highest-scored (id,
  * score) pairs per group with map-side partial aggregation.
  *
  * The scale story vs. the `row_number() OVER (ORDER BY score)`
  * window: a window must shuffle and SORT every candidate row per
  * group before discarding all but k. This aggregator reduces each
  * map partition to ≤ k rows first, so the shuffle carries
  * O(k × partitions) rows per group and nothing is ever globally
  * sorted — the difference between a terabyte sort and a kilobyte
  * merge at 1e9 candidates/group.
  *
  * Buffer inserts keep a size-2k scratch list and re-truncate on
  * overflow, so per-row cost is amortized O(1) list prepend with an
  * O(2k·log 2k) sort every k rows.
  */
object TopK {

  type Pair = (Long, Double)

  final case class Buf(items: List[Pair])

  private def truncate(items: List[Pair], k: Int): List[Pair] =
    items.sortBy { case (id, s) => (-s, id) }.take(k)

  class TopKAgg(k: Int) extends Aggregator[Pair, Buf, Seq[Pair]] {
    override def zero: Buf = Buf(Nil)
    override def reduce(b: Buf, a: Pair): Buf = {
      val items = a :: b.items
      if (items.length > 2 * k) Buf(truncate(items, k)) else Buf(items)
    }
    override def merge(x: Buf, y: Buf): Buf = Buf(truncate(x.items ++ y.items, k))
    override def finish(b: Buf): Seq[Pair] = truncate(b.items, k)
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Seq[Pair]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Pair]]()
  }

  /** DataFrame-API column: `df.groupBy(g).agg(TopK.topK(5)(idCol, scoreCol))`
    * → `array<struct<_1: bigint, _2: double>>`, highest score first,
    * ties broken by ascending id.
    */
  def topK(k: Int)(id: Column, score: Column): Column =
    udaf(new TopKAgg(k)).apply(id, score)
}
