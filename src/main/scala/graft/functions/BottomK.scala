package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic uniform group sampling as a custom
  * `TypedImperativeAggregate` (the UDAF extension surface —
  * SURVEY.md §2.7 notes the reference has none).
  *
  * `bottom_k(struct(sort_key: string, id: long), k)` keeps the k rows
  * with the smallest (sort_key, id) — a bottom-k sketch. With
  * sort_key = md5(content) this is a uniform random-but-deterministic
  * sample per group: order-insensitive (unlike reservoir sampling, which
  * depends on partition order), mergeable (bounded k-element buffers
  * combine associatively at each partial-aggregation level), and
  * oracle-checkable (the same sample falls out of a row_number window in
  * any engine). Memory per group is O(k), shuffle carries only the
  * serialized k-element buffer.
  */
case class BottomK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(String, Long)]] {

  require(k > 0, "bottom_k requires k > 0")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("sort_key", StringType), StructField("id", LongType))))

  // max-heap on (sort_key, id): the head is the largest retained element,
  // evicted when something smaller arrives
  private val ord: Ordering[(String, Long)] =
    Ordering.Tuple2(Ordering.String, Ordering.Long)

  override def createAggregationBuffer(): mutable.PriorityQueue[(String, Long)] =
    mutable.PriorityQueue.empty[(String, Long)](ord)

  override def update(buf: mutable.PriorityQueue[(String, Long)],
      input: InternalRow): mutable.PriorityQueue[(String, Long)] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (!row.isNullAt(0) && !row.isNullAt(1)) {
        val e = (row.getUTF8String(0).toString, row.getLong(1))
        if (buf.size < k) buf.enqueue(e)
        else if (ord.lt(e, buf.head)) { buf.dequeue(); buf.enqueue(e) }
      }
    }
    buf
  }

  override def merge(a: mutable.PriorityQueue[(String, Long)],
      b: mutable.PriorityQueue[(String, Long)]): mutable.PriorityQueue[(String, Long)] = {
    b.foreach { e =>
      if (a.size < k) a.enqueue(e)
      else if (ord.lt(e, a.head)) { a.dequeue(); a.enqueue(e) }
    }
    a
  }

  override def eval(buf: mutable.PriorityQueue[(String, Long)]): Any =
    new GenericArrayData(buf.toSeq.sorted(ord).map { case (s, id) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(s), id))
    }.toArray[Any])

  override def serialize(buf: mutable.PriorityQueue[(String, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, id) => out.writeUTF(s); out.writeLong(id) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(String, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.enqueue((in.readUTF(), in.readLong())))
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): BottomK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BottomK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomK = copy(child = newChildren.head)
}

object BottomK {
  /** Column API: `bottom_k(struct(sortKey, id), k)` → sorted
    * array<struct<sort_key,id>>. */
  def bottom_k(child: Column, k: Int): Column =
    Shim.column(BottomK(Shim.expression(child), k).toAggregateExpression())
}
