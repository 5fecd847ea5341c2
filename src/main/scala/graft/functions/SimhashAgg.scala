package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** 64-bit Charikar SimHash as a native aggregate (SURVEY §2C).
  *
  * Buffer = 64 vote counters + a token count (260 bytes, constant — partial
  * aggregation ships 65 ints per group regardless of token volume). The
  * declarative alternatives are strictly worse at scale: 64 separate
  * `sum(CASE ...)` aggregates generate a multi-thousand-line Janino class
  * per plan, and exploding (token × bit) rows multiplies shuffle input 64×.
  *
  * Input: the token's 64-bit hash as TWO 32-bit halves (hi = md5 hex chars
  * 1-8, lo = chars 9-16), each a long — a single 64-bit hash column can't be
  * assembled portably under ANSI mode (a 16-hex-char conv overflows signed
  * long), so both engines vote per-half instead. Bits 32-63 of the signature
  * vote from `hi`, bits 0-31 from `lo`.
  *
  * Output: struct(simhash: long, n_tokens: long) — bit j of simhash is the
  * majority vote sign; bit 63 set makes the long negative, which is fine:
  * banding masks (`(simhash >> s) & 65535`) and `bit_count(xor)` agree
  * between Spark and DuckDB for negative values (both shift arithmetically
  * and mask/count over all 64 bits).
  */
case class SimhashAgg(
    hi: Expression,
    lo: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(hi, lo)

  override def checkInputDataTypes(): TypeCheckResult =
    if (hi.dataType == LongType && lo.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects two long hash columns (hi, lo), got " +
        s"${hi.dataType.simpleString}, ${lo.dataType.simpleString}")

  override def dataType: DataType = StructType(Seq(
    StructField("simhash", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "graft_simhash"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](65)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val vh = hi.eval(input)
    val vl = lo.eval(input)
    if (vh != null && vl != null) {
      val thHi = vh.asInstanceOf[Long]
      val thLo = vl.asInstanceOf[Long]
      var j = 0
      while (j < 32) {
        buf(j) += (if (((thLo >> j) & 1L) == 1L) 1 else -1)
        buf(j + 32) += (if (((thHi >> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      buf(64) += 1
    }
    buf
  }

  override def merge(buf: Array[Int], other: Array[Int]): Array[Int] = {
    var j = 0
    while (j < 65) { buf(j) += other(j); j += 1 }
    buf
  }

  override def eval(buf: Array[Int]): Any = {
    var sim = 0L
    var j = 0
    while (j < 64) {
      if (buf(j) > 0) sim |= (1L << j)
      j += 1
    }
    new GenericInternalRow(Array[Any](sim, buf(64).toLong))
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(65 * 4)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(65)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimhashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimhashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(hi = newChildren(0), lo = newChildren(1))
}
