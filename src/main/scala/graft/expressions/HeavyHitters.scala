package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MISRA-GRIES heavy hitters over a string key — frequent-items at
  * 100 TB without shuffling the key universe: a
  * `TypedImperativeAggregate` gets map-side partial aggregation, so
  * each input partition ships AT MOST `capacity` counters into the
  * shuffle regardless of how many distinct keys it saw (top domains /
  * languages / token classes over a corpus cost `capacity × partitions`
  * wire bytes, versus an exact groupBy's full-universe shuffle).
  *
  * Buffer: ≤ `capacity` (key → count) counters plus one buffer-global
  * DECREMENT TOTAL `err`. Classic MG update (present → +1; room →
  * insert 1; full → insert-then-reduce), with merge by counter addition
  * followed by the same reduction — the mergeable-summaries form
  * (Agarwal et al., PODS'12): when the merged map exceeds capacity, the
  * (capacity+1)-th largest count is subtracted from every counter,
  * non-positive counters drop, and the subtraction adds to `err`.
  *
  * Guarantees (the scaladoc contract the spec pins):
  *   - stored count  ≤  true count  ≤  stored count + err
  *   - err ≤ N / (capacity + 1)  (N = total rows aggregated)
  *   - EXACT REGIME: when the data's distinct-key count ≤ capacity, no
  *     reduction ever fires anywhere (update or merge), err = 0, and
  *     every count is exact — the regime the DuckDB oracle hash-checks
  *     (q_heavy_hitters); the error bound is spec-checked on data with
  *     distinct ≫ capacity.
  *
  * Emits ARRAY<STRUCT<key STRING, cnt BIGINT, err BIGINT>> sorted by
  * (cnt DESC, key ASC) — deterministic under ties, so the output is
  * hashable cross-engine. `err` repeats the buffer-global total on
  * every row (per-row structs keep the consumer SQL-explodable).
  */
case class HeavyHittersAggregate(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HeavyHittersAggregate.Sketch] {
  import HeavyHittersAggregate.Sketch

  require(capacity > 0, "capacity must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", StringType), StructField("cnt", LongType),
    StructField("err", LongType))))
  override def prettyName: String = "heavy_hitters"

  override def createAggregationBuffer(): Sketch = new Sketch

  override def update(buf: Sketch, input: InternalRow): Sketch = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String]
      val cur = buf.counts.getOrElse(key, 0L)
      if (cur > 0L) buf.counts.update(key, cur + 1L)
      else {
        // copy: the input row's backing buffer is reused across rows
        buf.counts.update(key.clone(), 1L)
        if (buf.counts.size > capacity) buf.reduceToCapacity(capacity)
      }
    }
    buf
  }

  override def merge(buf: Sketch, other: Sketch): Sketch = {
    other.counts.foreach { case (k, c) =>
      buf.counts.update(k, buf.counts.getOrElse(k, 0L) + c)
    }
    buf.err += other.err
    if (buf.counts.size > capacity) buf.reduceToCapacity(capacity)
    buf
  }

  override def eval(buf: Sketch): Any = {
    val rows = buf.counts.toArray
      .sortBy { case (k, c) => (-c, k) }(
        Ordering.Tuple2(Ordering.Long, new Ordering[UTF8String] {
          def compare(a: UTF8String, b: UTF8String): Int = a.compareTo(b)
        }))
      .map { case (k, c) =>
        InternalRow(k, c, buf.err): Any
      }
    new GenericArrayData(rows)
  }

  override def serialize(buf: Sketch): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeLong(buf.err)
    out.writeInt(buf.counts.size)
    buf.counts.foreach { case (k, c) =>
      val b = k.getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Sketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Sketch
    buf.err = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.counts.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHittersAggregate =
    copy(child = newChildren.head)
}

object HeavyHittersAggregate {

  /** `heavyHitters(key, capacity)` as an aggregate Column over a STRING
    * key — emits the retained counters as
    * ARRAY<STRUCT<key, cnt, err>> sorted (cnt DESC, key ASC). */
  def heavyHitters(key: org.apache.spark.sql.Column, capacity: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftShims.column(
      HeavyHittersAggregate(
        org.apache.spark.sql.GraftShims.expression(key), capacity)
        .toAggregateExpression())

  /** Mutable MG summary: counters + the buffer-global decrement total. */
  final class Sketch {
    val counts: mutable.HashMap[UTF8String, Long] = mutable.HashMap.empty
    var err: Long = 0L

    /** Subtract the (capacity+1)-th largest count from every counter,
      * dropping non-positives — the mergeable MG reduction. Leaves at
      * most `capacity` counters (every counter ≤ the pivot goes to
      * ≤ 0). */
    def reduceToCapacity(capacity: Int): Unit = {
      if (counts.size <= capacity) return
      val pivot = counts.values.toArray.sorted(Ordering.Long.reverse)
        .apply(capacity) // (capacity+1)-th largest, 0-indexed
      err += pivot
      val dead = counts.iterator.collect {
        case (k, c) if c - pivot <= 0L => k
      }.toArray
      dead.foreach(counts.remove)
      counts.mapValuesInPlace((_, c) => c - pivot)
      ()
    }
  }
}
