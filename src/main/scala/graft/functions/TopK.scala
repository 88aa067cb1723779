package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{Bridge, TopKLong, TopKString}

/** Bounded-heap top-k aggregates: keep the k highest-scored (id,
  * score) pairs per group with map-side partial aggregation.
  *
  * The scale story vs. the `row_number() OVER (ORDER BY score)`
  * window: a window must shuffle and SORT every candidate row per
  * group before discarding all but k. This aggregate reduces each
  * map partition to ≤ k rows first, so the shuffle carries
  * O(k × partitions) rows per group and nothing is ever globally
  * sorted — the difference between a terabyte sort and a kilobyte
  * merge at 1e9 candidates/group.
  *
  * Implemented as native [[org.apache.spark.sql.graft.TopKLong]] /
  * [[org.apache.spark.sql.graft.TopKString]] TypedImperativeAggregates
  * (raw primitive-array buffers, 2k-scratch amortized truncation) —
  * the earlier `udaf(Aggregator)` formulation paid an Encoder
  * round-trip per input row, which dominated the multi-million-row
  * candidate paths.
  */
object TopK {

  /** `df.groupBy(g).agg(TopK.topK(5)(idCol, scoreCol))`
    * → `array<struct<_1: bigint, _2: double>>`, highest score first,
    * ties broken by ascending id.
    */
  def topK(k: Int)(id: Column, score: Column): Column =
    Bridge.column(TopKLong(Bridge.expression(id), Bridge.expression(score), k)
      .toAggregateExpression())

  /** `array<struct<_1: string, _2: double>>`, highest score first,
    * ties by ascending (binary/code-point) id — reproduces a
    * `row_number() OVER (ORDER BY score DESC, id)` window exactly.
    */
  def topKStr(k: Int)(id: Column, score: Column): Column =
    Bridge.column(TopKString(Bridge.expression(id), Bridge.expression(score), k)
      .toAggregateExpression())
}
