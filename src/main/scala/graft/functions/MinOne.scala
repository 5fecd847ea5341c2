package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types.DataType

/** Single-minimum aggregate over ANY orderable value (structs included),
  * as a TypedImperativeAggregate (r18).
  *
  * Why next to the builtin `min`: `min(struct(...))` is the engine's
  * argmax/argmin idiom ("best score, deterministic tie field"), but
  * Min's DECLARATIVE buffer holds a struct — not a mutable primitive —
  * so Spark plans the whole aggregation as SortAggregate: a full sort of
  * the input by group key on both sides of the shuffle (measured: the NB
  * per-doc argmax got SLOWER than the row_number window it replaced).
  * A typed-imperative buffer routes through ObjectHashAggregate instead —
  * hash-grouped, map-side combining, no sort — with exactly one buffered
  * value per group on every side of the shuffle.
  *
  * Ordering is the SAME interpreted ordering `min` uses
  * (TypeUtils.getInterpretedOrdering), so `graft_min1(x) ≡ min(x)`
  * value-for-value; nulls are ignored like every Spark min.
  */
case class MinOne(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(child.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_min1 expects an orderable type, got ${child.dataType.simpleString}")

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_min1"

  @transient private lazy val ord =
    TypeUtils.getInterpretedOrdering(child.dataType)
  // buffer representation: the candidate value serialized as a 1-field
  // UnsafeRow's bytes (null buffer = no value yet) — already the shape
  // serialize/deserialize need, so a partial's buffer ships as-is
  @transient private lazy val proj = UnsafeProjection.create(Array(child.dataType))
  @transient private lazy val holder = new Array[Any](1)

  private def toBytes(v: Any): Array[Byte] = {
    holder(0) = v
    val row = proj(InternalRow.fromSeq(holder.toIndexedSeq))
    row.getBytes.clone()
  }

  private def fromBytes(b: Array[Byte]): Any = {
    val row = new UnsafeRow(1)
    row.pointTo(b, b.length)
    row.get(0, child.dataType)
  }

  override def createAggregationBuffer(): Array[Byte] = null

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buf
    else if (buf == null || ord.compare(v, fromBytes(buf)) < 0) toBytes(v)
    else buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] =
    if (other == null) buf
    else if (buf == null || ord.compare(fromBytes(other), fromBytes(buf)) < 0) other
    else buf

  override def eval(buf: Array[Byte]): Any =
    if (buf == null) null
    else InternalRow.copyValue(fromBytes(buf))

  override def serialize(buf: Array[Byte]): Array[Byte] =
    if (buf == null) Array.emptyByteArray else buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] =
    if (bytes.isEmpty) null else bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): MinOne =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinOne =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
