package graft.core

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Group-wise top-k as a custom `TypedImperativeAggregate`:
  * `graft_top_k_by(value, id, k)` keeps the k best (value DESC, id ASC)
  * pairs per group in a bounded buffer.
  *
  * Why a custom aggregate: the window `row_number() <= k` form sorts every
  * group's full row set; this aggregate is O(n log k) per partition with
  * map-side partial merge — at 100 TB the shuffle carries k rows per group
  * per mapper instead of the whole group. Returns
  * `array<struct<value:double, id:bigint>>` best-first; pair with
  * `posexplode` for (rank, id, value) rows.
  */
case class TopKBy(
    valueExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Double, Long)]] {

  override def children: Seq[Expression] = Seq(valueExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("value", DoubleType), StructField("id", LongType))))

  // better = larger value; ties broken by smaller id
  private def lt(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 > b._2)

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Double, Long)] =
    mutable.ArrayBuffer.empty

  private def insert(buf: mutable.ArrayBuffer[(Double, Long)],
      e: (Double, Long)): Unit = {
    if (buf.length < k) {
      buf += e
    } else {
      // replace the current worst if e beats it
      var worst = 0
      var i = 1
      while (i < buf.length) { if (lt(buf(i), buf(worst))) worst = i; i += 1 }
      if (lt(buf(worst), e)) buf(worst) = e
    }
  }

  override def update(buf: mutable.ArrayBuffer[(Double, Long)],
      input: InternalRow): mutable.ArrayBuffer[(Double, Long)] = {
    val v = valueExpr.eval(input)
    val id = idExpr.eval(input)
    // NaN is dropped like null: it can't be ranked, and once inside the
    // buffer it would make lt() non-total (never evictable, comparator
    // inconsistent under sortWith)
    if (v != null && id != null && !v.asInstanceOf[Double].isNaN)
      insert(buf, (v.asInstanceOf[Double], id.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: mutable.ArrayBuffer[(Double, Long)],
      other: mutable.ArrayBuffer[(Double, Long)]): mutable.ArrayBuffer[(Double, Long)] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: mutable.ArrayBuffer[(Double, Long)]): Any = {
    val sorted = buf.sortWith((a, b) => lt(b, a)) // best first
    new GenericArrayData(sorted.map { case (v, id) =>
      InternalRow(v, id)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (v, id) => out.writeDouble(v); out.writeLong(id) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < n) { buf += ((in.readDouble(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKBy =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKBy =
    copy(valueExpr = newChildren(0), idExpr = newChildren(1))
  override def prettyName: String = "graft_top_k_by"
}

object TopKBy {
  /** Registration-time builder: casts value→double and id→long, so
    * int/float/decimal callers work and structurally un-castable inputs
    * (arrays, maps) fail at analysis — never a ClassCastException mid-job.
    * (The cleaner `ImplicitCastInputTypes` mixin is `private[sql]`.)
    */
  def withCasts(value: Expression, id: Expression, k: Expression): TopKBy =
    TopKBy(Cast(value, DoubleType), Cast(id, LongType),
      k.eval().asInstanceOf[Number].intValue())
}
