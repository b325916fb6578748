package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded-heap top-k aggregate over (dist: DOUBLE, id: BIGINT|STRING)
  * structs: keeps the k smallest pairs by (dist, id) lexicographic order
  * and emits them as a sorted ARRAY<STRUCT<dist, id>>.
  *
  * This is the scalable form of per-group top-k: a
  * `TypedImperativeAggregate` gets map-side partial aggregation, so each
  * executor ships at most k rows per group into the shuffle — versus the
  * window `row_number` formulation, which shuffles EVERY candidate row
  * to sort it. For batch kNN over (data × queries) candidates that is
  * the difference between shuffling k·|Q| rows and shuffling |data|·|Q|.
  *
  * Buffer is a max-heap of size ≤ k (root = current worst), serialized
  * as a flat (count, dist, id)* byte block for shuffle.
  */
case class TopKAggregate(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Any)]] {

  require(k > 0, "k must be positive")

  private lazy val idType: DataType =
    child.dataType.asInstanceOf[StructType].fields(1).dataType

  private lazy val idOrd: Ordering[Any] = idType match {
    case LongType => Ordering.Long.asInstanceOf[Ordering[Any]]
    case StringType => new Ordering[Any] {
      def compare(a: Any, b: Any): Int =
        a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String])
    }
    case t => throw new IllegalArgumentException(s"unsupported id type $t")
  }

  // max-heap: head is the largest (worst) retained pair
  private lazy val ord: Ordering[(Double, Any)] =
    Ordering.Tuple2(Ordering.Double.TotalOrdering, idOrd)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("dist", DoubleType), StructField("id", idType))))
  override def prettyName: String = "top_k_by_dist"

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Any)] =
    mutable.PriorityQueue.empty[(Double, Any)](ord)

  private def offer(buf: mutable.PriorityQueue[(Double, Any)], pair: (Double, Any)): Unit =
    if (buf.size < k) buf.enqueue(pair)
    else if (ord.lt(pair, buf.head)) { buf.dequeue(); buf.enqueue(pair) }

  override def update(
      buf: mutable.PriorityQueue[(Double, Any)],
      input: InternalRow): mutable.PriorityQueue[(Double, Any)] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      val id = idType match {
        // copy: the input row's backing buffer is reused across rows
        case StringType => row.getUTF8String(1).clone()
        case _ => row.getLong(1)
      }
      offer(buf, (row.getDouble(0), id))
    }
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Double, Any)],
      other: mutable.PriorityQueue[(Double, Any)]): mutable.PriorityQueue[(Double, Any)] = {
    other.foreach(offer(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Any)]): Any =
    new GenericArrayData(buf.toArray.sorted(ord)
      .map { case (d, i) => InternalRow(d, i) }.asInstanceOf[Array[Any]])

  override def serialize(buf: mutable.PriorityQueue[(Double, Any)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (d, i) =>
      out.writeDouble(d)
      idType match {
        case StringType =>
          val b = i.asInstanceOf[UTF8String].getBytes
          out.writeInt(b.length); out.write(b)
        case _ => out.writeLong(i.asInstanceOf[Long])
      }
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Any)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach { _ =>
      val d = in.readDouble()
      val id: Any = idType match {
        case StringType =>
          val b = new Array[Byte](in.readInt()); in.readFully(b)
          UTF8String.fromBytes(b)
        case _ => in.readLong()
      }
      buf.enqueue((d, id))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object TopKAggregate {
  import org.apache.spark.sql.Column

  /** `topK(struct(dist, id), k)` as an aggregate Column; id may be
    * BIGINT or STRING. */
  def topK(pair: Column, k: Int): Column =
    org.apache.spark.sql.GraftShims.column(
      TopKAggregate(org.apache.spark.sql.GraftShims.expression(pair), k)
        .toAggregateExpression())
}
