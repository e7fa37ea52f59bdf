package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: `top_k_desc(struct, k)` keeps the k largest
  * struct values (lexicographic field order) per group.
  *
  * Why it exists (SURVEY.md §7.3c): "top k per key" via
  * `row_number().over(Window.partitionBy(key).orderBy(...))` shuffles and
  * SORTS every row of every group. This aggregate is a
  * TypedImperativeAggregate with a k-bounded min-heap buffer, so the
  * map side reduces each partition to ≤k rows per group BEFORE the
  * exchange: the shuffle carries k·groups·partitions rows instead of all
  * rows, and nothing is ever fully sorted. At 100 TB with bounded k this
  * is the difference between a top-k and a global sort per key.
  *
  * Determinism: ties are impossible when the struct includes a unique
  * tie-break field (callers embed one, e.g. negated orderkey).
  */
case class TopKDesc(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[InternalRow]] {

  // lazy: child.dataType is NullType until the plan is resolved
  @transient private lazy val structType = child.dataType.asInstanceOf[StructType]
  @transient private lazy val numFields = structType.size

  @transient private lazy val ordering =
    TypeUtils.getInterpretedOrdering(child.dataType)
  @transient private lazy val proj = UnsafeProjection.create(structType)

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): java.util.PriorityQueue[InternalRow] =
    new java.util.PriorityQueue[InternalRow](math.max(k, 1),
      (a: InternalRow, b: InternalRow) => ordering.compare(a, b)) // min-heap

  private def offer(buf: java.util.PriorityQueue[InternalRow], row: InternalRow): Unit =
    if (buf.size < k) buf.add(row.copy())
    else if (ordering.compare(row, buf.peek()) > 0) { buf.poll(); buf.add(row.copy()) }

  override def update(
      buf: java.util.PriorityQueue[InternalRow], input: InternalRow): java.util.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[InternalRow])
    buf
  }

  override def merge(
      buf: java.util.PriorityQueue[InternalRow],
      other: java.util.PriorityQueue[InternalRow]): java.util.PriorityQueue[InternalRow] = {
    other.forEach(r => offer(buf, r))
    buf
  }

  override def eval(buf: java.util.PriorityQueue[InternalRow]): Any = {
    val arr = buf.toArray(new Array[InternalRow](buf.size))
    java.util.Arrays.sort(arr, (a: InternalRow, b: InternalRow) => ordering.compare(b, a))
    new GenericArrayData(arr.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: java.util.PriorityQueue[InternalRow]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.forEach { r =>
      val u = proj(r)
      out.writeInt(u.getSizeInBytes)
      u.writeToStream(out, null)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[InternalRow] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val size = in.readInt()
      val rowBytes = new Array[Byte](size)
      in.readFully(rowBytes)
      val row = new UnsafeRow(numFields)
      row.pointTo(rowBytes, size)
      buf.add(row) // already ≤k entries; fresh backing array, no copy needed
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKDesc =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKDesc =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object TopK {
  /** Top-k rows per group, largest first by the struct's lexicographic
    * field order. Embed a unique tie-break field for determinism.
    */
  def top_k_desc(structCol: Column, k: Int): Column =
    Bridge.column(TopKDesc(Bridge.expression(structCol), k).toAggregateExpression())
}
