package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native bounded-heap top-k aggregates (score DESC, id ASC ties).
  *
  * These replace `udaf(Aggregator)` implementations of the same
  * contract: an Aggregator buffer round-trips through its Encoder on
  * every update (List[(Long, Double)] ⇄ InternalRow per input row),
  * which dominated the multi-million-row candidate paths
  * (sim_knn_graph pushes Σ|cell|² rows through the aggregate). A
  * TypedImperativeAggregate keeps the buffer as a raw JVM object —
  * two primitive arrays — so update is two array stores, with the
  * same 2k-scratch amortized truncation as before.
  *
  * Scale contract is unchanged: map-side partial aggregation reduces
  * every partition to ≤ k pairs before the shuffle, so the exchange
  * carries O(k × partitions) rows per group and nothing is globally
  * sorted. Output is `array<struct<_1, _2>>`, highest score first,
  * ties by ascending id — exactly the shape and order the previous
  * Aggregator (and the `row_number` window twin, TopKSpec) produce.
  */
private[graft] final class TopKBufferLong(val k: Int) {
  var n = 0
  var ids = new Array[Long](2 * k)
  var scores = new Array[Double](2 * k)

  def insert(id: Long, s: Double): Unit = {
    if (n == ids.length) truncateTo(k)
    ids(n) = id; scores(n) = s; n += 1
  }

  /** Keep the m best (score DESC, id ASC) entries, sorted. */
  def truncateTo(m: Int): Unit = {
    val idx = Array.range(0, n).sortBy(i => (-scores(i), ids(i)))
    val keep = math.min(m, n)
    val ni = new Array[Long](ids.length)
    val ns = new Array[Double](ids.length)
    var i = 0
    while (i < keep) { ni(i) = ids(idx(i)); ns(i) = scores(idx(i)); i += 1 }
    ids = ni; scores = ns; n = keep
  }
}

case class TopKLong(idExpr: Expression, scoreExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBufferLong]
  with BinaryLike[Expression] with ExpectsInputTypes {
  require(k >= 1, s"k must be positive, got $k")

  override def left: Expression = idExpr
  override def right: Expression = scoreExpr
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, DoubleType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(
    StructField("_1", LongType, nullable = false) ::
    StructField("_2", DoubleType, nullable = false) :: Nil),
    containsNull = false)

  override def createAggregationBuffer(): TopKBufferLong = new TopKBufferLong(k)

  override def update(b: TopKBufferLong, input: InternalRow): TopKBufferLong = {
    val id = idExpr.eval(input)
    val s = scoreExpr.eval(input)
    if (id != null && s != null)
      b.insert(id.asInstanceOf[Long], s.asInstanceOf[Double])
    b
  }

  override def merge(b: TopKBufferLong, o: TopKBufferLong): TopKBufferLong = {
    var i = 0
    while (i < o.n) { b.insert(o.ids(i), o.scores(i)); i += 1 }
    b
  }

  override def eval(b: TopKBufferLong): Any = {
    b.truncateTo(k)
    val rows = new Array[Any](b.n)
    var i = 0
    while (i < b.n) { rows(i) = InternalRow(b.ids(i), b.scores(i)); i += 1 }
    new GenericArrayData(rows)
  }

  override def serialize(b: TopKBufferLong): Array[Byte] = {
    b.truncateTo(k)
    val bb = ByteBuffer.allocate(4 + b.n * 16)
    bb.putInt(b.n)
    var i = 0
    while (i < b.n) { bb.putLong(b.ids(i)); bb.putDouble(b.scores(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBufferLong = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new TopKBufferLong(k)
    val n = bb.getInt()
    var i = 0
    while (i < n) { b.insert(bb.getLong(), bb.getDouble()); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKLong =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKLong =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TopKLong =
    copy(idExpr = l, scoreExpr = r)
  override def prettyName: String = "graft_topk"
}

/** String-keyed twin. Ties break by BINARY UTF-8 order, which equals
  * code-point order — identical to Java/Scala String ordering for
  * every BMP string (tokens here are ASCII) and to DuckDB's default
  * binary collation, keeping the oracle's `ORDER BY word` tiebreak
  * reproducible. UTF8Strings are cloned on insert: the input row's
  * backing buffer is reused by the scan.
  */
private[graft] final class TopKBufferStr(val k: Int) {
  var n = 0
  var ids = new Array[UTF8String](2 * k)
  var scores = new Array[Double](2 * k)

  def insert(id: UTF8String, s: Double): Unit = {
    if (n == ids.length) truncateTo(k)
    ids(n) = id; scores(n) = s; n += 1
  }

  def truncateTo(m: Int): Unit = {
    // total order matching the Long twin's sortBy(-score, id): compare
    // NEGATED scores ascending, so NaN (greatest in Double.compare's
    // total order, and NaN-invariant under negation) sorts LAST —
    // i.e. a NaN score is the worst candidate, never the best. The
    // previous `!=`-based comparator was not a total order for NaN
    // and TimSort could throw.
    val idx = Array.range(0, n).sortWith { (a, b) =>
      val c = java.lang.Double.compare(-scores(a), -scores(b))
      c < 0 || (c == 0 && ids(a).compareTo(ids(b)) < 0)
    }
    val keep = math.min(m, n)
    val ni = new Array[UTF8String](ids.length)
    val ns = new Array[Double](ids.length)
    var i = 0
    while (i < keep) { ni(i) = ids(idx(i)); ns(i) = scores(idx(i)); i += 1 }
    ids = ni; scores = ns; n = keep
  }
}

case class TopKString(idExpr: Expression, scoreExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBufferStr]
  with BinaryLike[Expression] with ExpectsInputTypes {
  require(k >= 1, s"k must be positive, got $k")

  override def left: Expression = idExpr
  override def right: Expression = scoreExpr
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, DoubleType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(
    StructField("_1", StringType, nullable = false) ::
    StructField("_2", DoubleType, nullable = false) :: Nil),
    containsNull = false)

  override def createAggregationBuffer(): TopKBufferStr = new TopKBufferStr(k)

  override def update(b: TopKBufferStr, input: InternalRow): TopKBufferStr = {
    val id = idExpr.eval(input)
    val s = scoreExpr.eval(input)
    if (id != null && s != null)
      b.insert(id.asInstanceOf[UTF8String].clone(), s.asInstanceOf[Double])
    b
  }

  override def merge(b: TopKBufferStr, o: TopKBufferStr): TopKBufferStr = {
    var i = 0
    while (i < o.n) { b.insert(o.ids(i), o.scores(i)); i += 1 }
    b
  }

  override def eval(b: TopKBufferStr): Any = {
    b.truncateTo(k)
    val rows = new Array[Any](b.n)
    var i = 0
    while (i < b.n) { rows(i) = InternalRow(b.ids(i), b.scores(i)); i += 1 }
    new GenericArrayData(rows)
  }

  override def serialize(b: TopKBufferStr): Array[Byte] = {
    b.truncateTo(k)
    var size = 4
    var i = 0
    while (i < b.n) { size += 4 + b.ids(i).numBytes() + 8; i += 1 }
    val bb = ByteBuffer.allocate(size)
    bb.putInt(b.n)
    i = 0
    while (i < b.n) {
      val bytes = b.ids(i).getBytes
      bb.putInt(bytes.length); bb.put(bytes); bb.putDouble(b.scores(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBufferStr = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new TopKBufferStr(k)
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val sb = new Array[Byte](len)
      bb.get(sb)
      b.insert(UTF8String.fromBytes(sb), bb.getDouble())
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKString =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKString =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TopKString =
    copy(idExpr = l, scoreExpr = r)
  override def prettyName: String = "graft_topk_str"
}
