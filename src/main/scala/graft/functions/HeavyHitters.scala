package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge.{column, expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a mergeable distributed aggregate.
  *
  * One pass over n items with `capacity` counters yields a candidate set
  * that provably contains EVERY item whose true frequency exceeds
  * n / (capacity + 1); each surviving counter underestimates its item's
  * true count by at most that same bound. Partial sketches merge by
  * summing counters and re-pruning to capacity (Agarwal et al.,
  * "Mergeable Summaries", PODS'12), which preserves the error bound — so
  * the aggregate fits Spark's partial/final two-phase aggregation
  * exactly: each task sketches its partition, the reducer merges the
  * serialized states, and only O(capacity) bytes ever cross the wire per
  * task, independent of data size. That is the whole point at 100 TB:
  * exact `GROUP BY word` over web-scale text shuffles the full type
  * table, while this ships a bounded summary and never spills.
  *
  * The production pattern for EXACT top-k at scale (used by
  * `text_heavy_hitters`): sketch → candidate set (≤ capacity items) →
  * broadcast-join the candidates back over the data for exact counts →
  * top-k of the recount. When the k-th true count exceeds n/(capacity+1)
  * the result equals the exact-aggregation answer with a shuffle that
  * carries only candidate keys.
  *
  * Eval returns the candidate items sorted ascending (counts are kept
  * only as the pruning state — the recount supplies exact numbers), so
  * output order is deterministic regardless of partitioning. Update is
  * the textbook counter algorithm: hit → increment; room → insert;
  * full → decrement all, drop zeros (amortized O(1): each decrement
  * sweep retires `capacity` prior arrivals).
  */
case class HeavyHitters(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (capacity < 1) {
      TypeCheckResult.TypeCheckFailure("heavy_hitters capacity must be >= 1")
    } else if (child.dataType != StringType) {
      TypeCheckResult.TypeCheckFailure(
        s"heavy_hitters requires string, got ${child.dataType.catalogString}")
    } else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val item = v.asInstanceOf[UTF8String].toString
    buf.get(item) match {
      case Some(c) => buf.update(item, c + 1)
      case None if buf.size < capacity => buf.update(item, 1L)
      case None => // full miss: the classic decrement-all step
        val dead = mutable.ArrayBuffer.empty[String]
        buf.mapValuesInPlace((_, c) => c - 1)
        buf.foreach { case (k, c) => if (c == 0L) dead += k }
        dead.foreach(buf.remove)
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    if (a.size > capacity) {
      // subtract the (capacity+1)-th largest count from everything and
      // drop the non-positive — the merge rule that keeps the summed
      // sketch inside the n/(capacity+1) error envelope
      val kth = { val arr = a.valuesIterator.toArray.sortWith(_ > _); arr(capacity) }
      val dead = a.collect { case (k, c) if c - kth <= 0L => k }.toSeq
      dead.foreach(a.remove)
      a.mapValuesInPlace((_, c) => c - kth)
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buf.keysIterator.toArray.sorted.map(UTF8String.fromString(_)))

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) => out.writeUTF(k); out.writeLong(c) }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(data: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(data))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) { buf.update(in.readUTF(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): HeavyHitters =
    copy(inputAggBufferOffset = offset)

  override protected def withNewChildInternal(newChild: Expression)
      : HeavyHitters = copy(child = newChild)

  override def prettyName: String = "heavy_hitters"
}

object HeavyHitters {
  /** Column-API entry: `heavy_hitters(items, capacity)` — array of
    * candidate heavy items, sorted, ≤ capacity entries. */
  def heavy_hitters(items: Column, capacity: Int): Column =
    column(HeavyHitters(expression(items), capacity).toAggregateExpression())
}
