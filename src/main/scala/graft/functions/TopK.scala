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

  type SPair = (String, Double)

  final case class BufS(items: List[SPair])

  private def truncateS(items: List[SPair], k: Int): List[SPair] =
    items.sortBy { case (id, s) => (-s, id) }.take(k)

  /** String-keyed twin of [[TopKAgg]] — same bounded-heap contract,
    * ties broken by ascending (lexicographic) id, so it reproduces a
    * `row_number() OVER (ORDER BY score DESC, id)` window exactly.
    */
  class TopKStrAgg(k: Int) extends Aggregator[SPair, BufS, Seq[SPair]] {
    override def zero: BufS = BufS(Nil)
    override def reduce(b: BufS, a: SPair): BufS = {
      val items = a :: b.items
      if (items.length > 2 * k) BufS(truncateS(items, k)) else BufS(items)
    }
    override def merge(x: BufS, y: BufS): BufS = BufS(truncateS(x.items ++ y.items, k))
    override def finish(b: BufS): Seq[SPair] = truncateS(b.items, k)
    override def bufferEncoder: Encoder[BufS] = Encoders.product[BufS]
    override def outputEncoder: Encoder[Seq[SPair]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[SPair]]()
  }

  /** `array<struct<_1: string, _2: double>>`, highest score first,
    * ties by ascending id.
    */
  def topKStr(k: Int)(id: Column, score: Column): Column =
    udaf(new TopKStrAgg(k)).apply(id, score)
}
