package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** K-minimum-values sketch aggregate: keeps the `k` smallest DISTINCT
  * hash values seen — a fixed-size, mergeable summary from which
  * distinct counts, unions, and overlaps are estimated (union = merge,
  * the property HLL lacks for intersections). The buffer is a bounded
  * sorted set: update and merge never hold more than `k` longs per
  * group, so the aggregate is partial-aggregable with O(k) state — the
  * same discipline as [[MinHashAgg]]. When a group's distinct count is
  * ≤ k the sketch degenerates to the exact value set.
  */
case class KmvAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[scala.collection.mutable.TreeSet[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_kmv_agg"

  override def createAggregationBuffer(): scala.collection.mutable.TreeSet[Long] =
    scala.collection.mutable.TreeSet.empty[Long]

  private def add(buf: scala.collection.mutable.TreeSet[Long], x: Long): Unit = {
    if (buf.size < k) buf += x
    else if (x < buf.last && !buf.contains(x)) { buf += x; buf -= buf.last }
  }

  override def update(buf: scala.collection.mutable.TreeSet[Long],
      input: InternalRow): scala.collection.mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: scala.collection.mutable.TreeSet[Long],
      b: scala.collection.mutable.TreeSet[Long]): scala.collection.mutable.TreeSet[Long] = {
    b.foreach(x => add(a, x))
    a
  }

  override def eval(buf: scala.collection.mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: scala.collection.mutable.TreeSet[Long]): Array[Byte] = {
    val arr = buf.toArray
    val bb = java.nio.ByteBuffer.allocate(arr.length * 8)
    arr.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.TreeSet[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val ts = scala.collection.mutable.TreeSet.empty[Long]
    (0 until bytes.length / 8).foreach(_ => ts += bb.getLong)
    ts
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvAgg =
    copy(child = newChildren.head)
}
