package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{column, expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-heap aggregation state shared by the sketch aggregates: a
  * size-capped binary MAX-heap ordered by (key1, key2, payload) — the
  * payload tiebreak makes the order TOTAL even when two rows share both
  * keys (duplicate sample ids under at-least-once delivery), so the kept
  * set never depends on Spark's task/merge order and the bit-exact
  * oracle parity holds unconditionally, not just on tie-free data.
  * Payload slots ride along with their keys.
  *
  * This is the sketch aggregates' scale story: per-group state is O(k)
  * regardless of group size, partials merge associatively (map-side
  * combine), and no per-group sort ever happens — the window-rank form it
  * replaces sorted every group end to end.
  */
private[expressions] final class BoundedPairHeap(val k: Int) {
  var size = 0
  val k1 = new Array[Long](k)
  val k2 = new Array[Long](k)
  val pay = new Array[Double](k)

  private def less(aK1: Long, aK2: Long, aP: Double,
      bK1: Long, bK2: Long, bP: Double): Boolean =
    aK1 < bK1 || (aK1 == bK1 && (aK2 < bK2 || (aK2 == bK2 && aP < bP)))

  private def swap(i: Int, j: Int): Unit = {
    val a = k1(i); k1(i) = k1(j); k1(j) = a
    val b = k2(i); k2(i) = k2(j); k2(j) = b
    val c = pay(i); pay(i) = pay(j); pay(j) = c
  }

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0 && less(k1((i - 1) / 2), k2((i - 1) / 2), pay((i - 1) / 2),
        k1(i), k2(i), pay(i))) {
      swap(i, (i - 1) / 2); i = (i - 1) / 2
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    var done = false
    while (!done) {
      val l = 2 * i + 1
      val r = 2 * i + 2
      var m = i
      if (l < size && less(k1(m), k2(m), pay(m), k1(l), k2(l), pay(l))) m = l
      if (r < size && less(k1(m), k2(m), pay(m), k1(r), k2(r), pay(r))) m = r
      if (m == i) done = true else { swap(i, m); i = m }
    }
  }

  def insert(a: Long, b: Long, p: Double): Unit =
    if (size < k) {
      k1(size) = a; k2(size) = b; pay(size) = p
      size += 1
      siftUp(size - 1)
    } else if (less(a, b, p, k1(0), k2(0), pay(0))) {
      k1(0) = a; k2(0) = b; pay(0) = p
      siftDown()
    }

  def mergeFrom(o: BoundedPairHeap): Unit = {
    var i = 0
    while (i < o.size) { insert(o.k1(i), o.k2(i), o.pay(i)); i += 1 }
  }

  def serialize(): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + size * 24)
    buf.putInt(size)
    var i = 0
    while (i < size) { buf.putLong(k1(i)); buf.putLong(k2(i)); buf.putDouble(pay(i)); i += 1 }
    buf.array()
  }
}

private[expressions] object BoundedPairHeap {
  def deserialize(k: Int, bytes: Array[Byte]): BoundedPairHeap = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val h = new BoundedPairHeap(k)
    var i = 0
    while (i < n) { h.insert(buf.getLong, buf.getLong, buf.getDouble); i += 1 }
    h
  }
}

/** k smallest values of a long column, as a sorted ascending array —
  * the KMV sketch state. Null inputs are skipped.
  */
case class BoundedMinK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[BoundedPairHeap] {
  require(k >= 1, "k must be >= 1")
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): BoundedPairHeap = new BoundedPairHeap(k)
  override def update(h: BoundedPairHeap, row: InternalRow): BoundedPairHeap = {
    val v = child.eval(row)
    if (v != null) h.insert(v.asInstanceOf[Long], 0L, 0.0)
    h
  }
  override def merge(a: BoundedPairHeap, b: BoundedPairHeap): BoundedPairHeap = {
    a.mergeFrom(b); a
  }
  override def eval(h: BoundedPairHeap): Any =
    new GenericArrayData(h.k1.take(h.size).sorted)
  override def serialize(h: BoundedPairHeap): Array[Byte] = h.serialize()
  override def deserialize(bytes: Array[Byte]): BoundedPairHeap =
    BoundedPairHeap.deserialize(k, bytes)
  override def withNewMutableAggBufferOffset(o: Int): BoundedMinK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedMinK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BoundedMinK =
    copy(child = c.head)
  override def prettyName: String = "bounded_min_k"
}

/** Payloads of the k smallest (key1, key2) pairs, returned SORTED BY
  * PAYLOAD ascending — the bottom-k deterministic row sample, pre-ranked
  * for order-statistic reads. Rows with a null in any input are skipped.
  */
case class BoundedMinKSample(
    key1: Expression,
    key2: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[BoundedPairHeap] {
  require(k >= 1, "k must be >= 1")
  override def children: Seq[Expression] = Seq(key1, key2, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): BoundedPairHeap = new BoundedPairHeap(k)
  override def update(h: BoundedPairHeap, row: InternalRow): BoundedPairHeap = {
    val a = key1.eval(row)
    val b = key2.eval(row)
    val p = payload.eval(row)
    if (a != null && b != null && p != null)
      h.insert(a.asInstanceOf[Long], b.asInstanceOf[Long], p.asInstanceOf[Double])
    h
  }
  override def merge(a: BoundedPairHeap, b: BoundedPairHeap): BoundedPairHeap = {
    a.mergeFrom(b); a
  }
  override def eval(h: BoundedPairHeap): Any =
    new GenericArrayData(h.pay.take(h.size).sorted)
  override def serialize(h: BoundedPairHeap): Array[Byte] = h.serialize()
  override def deserialize(bytes: Array[Byte]): BoundedPairHeap =
    BoundedPairHeap.deserialize(k, bytes)
  override def withNewMutableAggBufferOffset(o: Int): BoundedMinKSample =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedMinKSample =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BoundedMinKSample =
    copy(key1 = c(0), key2 = c(1), payload = c(2))
  override def prettyName: String = "bounded_min_k_sample"
}

object SketchAggregates {
  def boundedMinK(c: Column, k: Int): Column =
    column(BoundedMinK(expression(c), k).toAggregateExpression())
  def boundedMinKSample(key1: Column, key2: Column, payload: Column, k: Int): Column =
    column(BoundedMinKSample(expression(key1), expression(key2),
      expression(payload), k).toAggregateExpression())
}
